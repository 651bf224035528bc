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
  * Scale: watermark + windowed state are per (window, event_type) — state
  * size is bounded by window count × type cardinality, not row count.
  */
object StreamingIngest {

  /** Streamed tumbling 1-hour window aggregate over events; returns the
    * final (complete-mode) result as a batch DataFrame.
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
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val name = "graft_stream_agg"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    // Materialize: the memory sink table is session-scoped; copy out so
    // the result outlives the stopped query.
    val out = spark.table(name)
    out.cache(); out.count()
    out
  }
}
