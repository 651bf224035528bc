package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE-native skew handling on the q237 zipf key — the runtime
  * counterpart to the compile-time salted path (SkewJoin.saltedJoin).
  *
  * At 100 TB the first line of defense against a hot key is Spark's
  * adaptive skew-join split (AQE rewrites the sort-merge join's skewed
  * partitions into multiple tasks at runtime); manual salting (q154/
  * q237) is the portable fallback when AQE can't fire (e.g. the skewed
  * side feeds another operator that pins partitioning). This spec pins
  * that the SAME zipf remap q237 uses IS detected and split by AQE, so
  * the engine's skew story covers both paths.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("AQE splits the zipf-skewed join without manual salting") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Fixture-sized thresholds: the hot key's partition is ~hundreds
      // of KB, not the production 256 MB default.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // The shared test session runs few shuffle partitions; skew
      // detection compares a partition to the MEDIAN partition, so give
      // the fixture enough reduce partitions that the hot key stands out.
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val h = conv(substring(md5(col("o_orderkey").cast("string")),
        1, 15), 16, 10).cast("long")
      val v = pmod(h, lit(1000L))
      val ord = Tables.t(spark, sf, "orders")
        .withColumn("sk_custkey",
          when(v < 400, 1L).otherwise(col("o_custkey")))
        .select(col("sk_custkey"), col("o_totalprice"))
        // AQE splits a skewed reduce partition along map-task
        // boundaries; the sf0.01 parquet is one file = one mapper, so
        // give the map side real parallelism (as any 100 TB scan has).
        .repartition(16)
      val cust = Tables.t(spark, sf, "customer")
        .select(col("c_custkey").as("sk_custkey"), col("c_mktsegment"))
      val joined = ord.join(cust, "sk_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // AQE finalizes the plan only on execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        plan.take(3000))
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
