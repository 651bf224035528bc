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

  test("forward as-of: match is the earliest future purchase; " +
      "tolerance nulls matches beyond 1h") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q326_asof_forward_tolerance")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    val purch: Map[Long, Seq[Long]] = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(_._2).sorted
      }
    var matched = 0
    rows.foreach { r =>
      val (u, ts) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      val next = purch.getOrElse(u, Seq.empty).find(_ >= ts)
      val want = next.filter(_ - ts <= 3600L * 1000000L)
      val got = Option(r.getAs[java.lang.Long]("purchase_ts"))
        .map(_.longValue)
      assert(got == want, s"user $u click $ts: $got vs $want")
      if (got.isDefined) {
        matched += 1
        assert(r.getAs[Long]("wait_s") == (want.get - ts) / 1000000L)
      }
    }
    assert(matched > 0, "tolerance window matched nothing at all")
  }
}
