package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingest + windowed aggregation.
  *
  * The reference has no streaming query engine — only Kafka/stdin ingest
  * (`ImportExport/KafkaImporter.cpp:476`, `StreamImporter.cpp:189` in
  * /root/reference; SURVEY §2.11). Parity = an append-ingest path; the
  * tumbling-window aggregate is the free Spark capability-add. In
  * production the source is `readStream.format("kafka")`; here the same
  * events parquet drives the stream (file source, identical plan shape),
  * run to completion synchronously via processAllAvailable.
  *
  * Scale: the sink is `foreachBatch` writing the (small, bounded) window
  * aggregate to a parquet result table — nothing is materialized in
  * driver memory, unlike a memory-format sink. Watermark + windowed state
  * are per (window, event_type) — state size is bounded by window count ×
  * type cardinality, not row count.
  */
object StreamingIngest {

  type Q = (SparkSession, String) => DataFrame

  /** Streamed tumbling 1-hour window aggregate over events. The stream
    * runs in complete mode through foreachBatch, each batch atomically
    * overwriting the parquet result table (idempotent restart semantics —
    * the reference's append-ingest path with exactly-once sink writes).
    */
  def streamedHourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    // File-source schema must be declared (ts is ns in the fixture —
    // read as long, convert to µs timestamp like Tables.t).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    // FileStreamSource monitors a directory; the fixture is a single
    // file — stage it behind a symlink (production: a Kafka topic or a
    // landing directory receiving appended files).
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_stream_src")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(schema)
      .parquet(srcDir.toString)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_agg").toString
    val q = agg.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir)
  }

  val queries: Seq[(String, Q)] = Seq(
    "q70_stream_hourly_agg" -> ((s, d) => streamedHourlyAgg(s, d))
  )

  /** The streamed result must equal the batch hourly aggregate — DuckDB
    * computes it directly over the same events table (ns ts truncated to
    * µs on both sides).
    */
  val oracles: Seq[(String, String)] = Seq(
    "q70_stream_hourly_agg" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP)::TIMESTAMP AS win_start,
                event_type, count(*) AS n_events,
                sum(value) AS total_value
         FROM events GROUP BY 1, 2"""
  )
}
