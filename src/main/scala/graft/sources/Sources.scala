package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ArrowBridge
import graft.Tables
import graft.Tables.t

/** Source/sink surface beyond parquet+CSV — SURVEY §2.2 rows 17/18/21.
  *
  * - Regex-parsed text source: the reference's RegexParserDataWrapper
  *   (`DataMgr/ForeignStorage/RegexFileBufferParser.cpp` in
  *   /root/reference) exposes log files as tables. Spark-first:
  *   `spark.read.text` + `regexp_extract` projection — the regex runs
  *   codegen'd per partition, so a 100 TB log directory parses with the
  *   same scan parallelism as parquet (no pre-load step).
  * - Arrow result/ingest path: `sql_execute_df`
  *   (`QueryEngine/ArrowResultSetConverter.cpp`) — see ArrowBridge;
  *   serialization happens executor-side, partition-parallel.
  * - System/catalog tables: `InternalCatalogDataWrapper.cpp` exposes the
  *   catalog as queryable tables; here the session catalog's table and
  *   column metadata become DataFrames.
  */
object Sources {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(
    // Log lines → regex projection → aggregate: the full text-source
    // path (write side stands in for an external log producer).
    "q77_regex_source" -> ((s, d) => {
      val dir = graft.Stage.scratchDir("graft_logs") + "/events"
      t(s, d, "events").select(format_string(
          "ts=%d user=%d type=%s value=%s",
          unix_micros(col("ts")), col("user_id"),
          col("event_type"), col("value")).as("line"))
        .write.mode("overwrite").text(dir)
      s.read.text(dir).select(
          regexp_extract(col("value"), "user=(\\d+)", 1)
            .cast("long").as("user_id"),
          regexp_extract(col("value"), "type=(\\w+)", 1).as("event_type"),
          regexp_extract(col("value"), "value=([-0-9.eE]+)", 1)
            .cast("double").as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("user_id")).as("user_sum"),
          sum(col("v")).as("value_sum"))
    }),

    // Aggregate → Arrow IPC batches (executor-side) → deserialize →
    // result must be byte-for-byte the same relation.
    "q78_arrow_roundtrip" -> ((s, d) => {
      val agg = t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice")).as("total"))
      val batches = ArrowBridge.toArrowBatches(agg, maxRecordsPerBatch = 512)
      ArrowBridge.fromArrowBatches(s, batches, agg.schema.json)
    }),

    // Catalog-as-table: fixture tables with their column counts.
    "q79_catalog_tables" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      Tables.names.sorted
        .map(n => (n, t(s, d, n).schema.length))
        .toDF("table_name", "n_cols")
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q77_regex_source" ->
      """SELECT event_type, count(*) AS n,
                sum(user_id)::BIGINT AS user_sum,
                sum(value) AS value_sum
         FROM events GROUP BY event_type""",
    "q78_arrow_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total
         FROM orders GROUP BY o_orderstatus""",
    "q79_catalog_tables" ->
      """SELECT * FROM (VALUES
           ('customer', 5), ('documents', 5), ('embeddings', 3),
           ('events', 6), ('lineitem', 11), ('nation', 3),
           ('orders', 6), ('part', 6), ('region', 2), ('supplier', 4))
         v(table_name, n_cols)"""
  )
}
