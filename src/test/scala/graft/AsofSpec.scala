package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("asof join: latest prior match, equal-ts inclusion, no-match null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
      (3L, 1L, 9.0)).toDF("k", "ts", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "ts", "ts")
      .select(col("tag"), col("asof.v"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("p1") == Some(2.0)) // equal ts counts (<= semantics)
    assert(got("p2") == Some(3.0)) // latest prior, not first
    assert(got("p3") == None)      // key with no right rows → null
  }

  test("asof join plans as one shuffle, no range replication") {
    import spark.implicits._
    val left = spark.range(0, 1000)
      .select(pmod(col("id"), lit(10)).as("k"), col("id").as("ts"))
    val right = spark.range(0, 1000)
      .select(pmod(col("id"), lit(10)).as("k"), col("id").as("ts"),
        (col("id") * 2).as("v"))
    val plan = AsofJoin.asofJoin(left, right, "k", "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      plan.take(1500))
  }
}
