package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning on the q195 partition_key layout — the
  * scan-side companion to RuntimeFilterSpec's row-level bloom filter:
  * when the fact table is directory-partitioned and the join's dim side
  * carries a selective predicate, Catalyst turns the dim values into a
  * runtime PartitionFilter (`dynamicpruning` subquery) so entire
  * partitions are never read. This is the 100 TB default: a date- or
  * domain-partitioned fact joined to a filtered dim must scan only the
  * matching directories (the reference's fragment skipping, at the
  * storage layout level).
  */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("dynamic partition pruning fires on the partitioned fact scan") {
    val dir = Stage.scratchDir("dpp_fact")
    Tables.t(spark, sf, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // The dim must be a real scan with a surviving filter predicate
    // (a LocalRelation folds the filter away and the DPP rule sees no
    // pruning opportunity) — exactly the production shape, where dims
    // are tables.
    val dimDir = Stage.scratchDir("dpp_dim")
    locally {
      import spark.implicits._
      Seq(("purchase", 1.0), ("signup", 2.0), ("view", 0.5),
        ("click", 0.7), ("error", 0.1))
        .toDF("etype", "weight")
        .write.mode("overwrite").parquet(dimDir)
    }
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // Estimation at fixture scale undervalues the pruning; force the
      // benefit heuristic to accept.
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0",
      // The dim side is tiny; let it broadcast so DPP reuses the
      // broadcast values as the partition filter (the cheap mode).
      "spark.sql.autoBroadcastJoinThreshold" -> "10MB")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = spark.read.parquet(dimDir).filter(col("weight") > 1.5)
      val fact = spark.read.parquet(dir)
      val q = fact.join(dim, fact("event_type") === dim("etype"))
        .agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan.take(3000))
      // And the pruned result is correct: only signup rows are counted.
      val n = q.collect()(0).getLong(0)
      val expect = Tables.t(spark, sf, "events")
        .filter(col("event_type") === "signup").count()
      assert(n == expect, s"$n != $expect")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
