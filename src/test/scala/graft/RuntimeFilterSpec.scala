package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark's native runtime bloom-filter injection — the production
  * counterpart of q256's explicit portable filter: when one join side
  * carries a selective predicate, Catalyst plants a bloom_filter_agg on
  * the creation side and a might_contain filter on the probe side scan,
  * cutting the probe shuffle before the join (the same map-side
  * semi-join reduction the reference gets from its hash-table build
  * filters). q256 proves the mechanism with an engine-portable oracle;
  * this spec pins that the NATIVE optimizer path fires on the TPC-H
  * shape, so at 100 TB the engine gets the pruning without the manual
  * construction.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("native runtime bloom filter fires on the selective dim join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // Fixture-sized thresholds: production defaults ask for a 10 GB
      // probe-side scan before the filter pays for itself.
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // Force a shuffle join so the probe side has a shuffle to prune.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.t(spark, sf, "lineitem")
        .select(col("l_partkey"), col("l_quantity"))
      val dim = Tables.t(spark, sf, "part")
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val joined = li.join(dim, li("l_partkey") === dim("p_partkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") ||
        plan.contains("bloomFilter"), plan.take(3000))
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
