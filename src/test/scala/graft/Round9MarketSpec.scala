package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AE (q487-q489). */
class Round9MarketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q487: VWAP and TWAP sit inside the per-brand price range") {
    import org.apache.spark.sql.functions._
    val rows = q("q487_vwap_twap").collect()
    assert(rows.nonEmpty)
    val bounds = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(min(floor(col("l_extendedprice") / col("l_quantity") * 100)
        .cast("long")).as("lo"),
        max(floor(col("l_extendedprice") / col("l_quantity") * 100)
          .cast("long")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("brand"))
      val v = r.getAs[Long]("vwap_cents")
      val t = r.getAs[Long]("twap_cents")
      assert(v >= lo - 1 && v <= hi, s"vwap outside range: $r")
      assert(t >= lo - 1 && t <= hi, s"twap outside range: $r")
    }
  }

  test("q488: spans are positive, bounded by elapsed days, and a " +
      "running-max day has span = day - d0 + 1") {
    val rows = q("q488_stock_span").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day"))
      val d0 = sorted.head.getAs[Long]("day")
      var runMax = Long.MinValue
      sorted.foreach { r =>
        val span = r.getAs[Long]("span")
        val day = r.getAs[Long]("day")
        assert(span >= 1 && span <= day - d0 + 1, s"span bound: $r")
        if (r.getAs[Long]("rev") >= runMax) {
          runMax = r.getAs[Long]("rev")
          // new running max -> span covers everything back to d0
          assert(span == day - d0 + 1, s"running-max span wrong: $r")
        }
      }
    }
  }

  test("q489: cumulative reach is monotone, >= dau, and ends at the " +
      "total distinct user count") {
    val rows = q("q489_cumulative_reach").collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val reaches = rows.map(_.getAs[Long]("cumulative_reach"))
    assert(reaches.zip(reaches.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getAs[Long]("cumulative_reach") >=
      r.getAs[Long]("dau")))
    val users = graft.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(reaches.last == users)
  }
}
