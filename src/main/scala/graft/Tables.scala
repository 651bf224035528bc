package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access. Mirrors the reference's catalog-backed table
  * resolution (`Catalog/Catalog.h` in /root/reference) with plain parquet
  * reads: Spark's vectorized parquet reader + row-group min/max pruning
  * replace HeavyDB fragments/chunks (SURVEY.md §1.1).
  *
  * At 100 TB these would be partitioned/bucketed managed tables; the read
  * path (columnar scan, predicate pushdown, column pruning) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS); Spark's µs `TimestampType`
    * can't hold it natively (SURVEY.md §7.4 — reference TIMESTAMP(9),
    * `Shared/sqltypes.h:77`). We read nanos as long and truncate to µs,
    * matching DuckDB's ns→µs truncation so oracle comparisons line up.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // Integer `div`, NOT `/`: ns epoch values exceed 2^53, so double
      // division loses the low microsecond bit (off-by-1 µs timestamps).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register every fixture table as a temp view (for spark.sql queries).
    * Idempotent while the session keeps pointing at the same dir —
    * repeated calls don't re-read 10 parquet footers each time — but a
    * dir switch (test fixtures vs sf dirs) re-registers.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = System.identityHashCode(spark).toString
    if (registeredDir.put(key, dir) != dir)
      names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
  }
}
