package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AD (q484-q486). */
class Round9MonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q484: sample size shrinks quadratically with the MDE") {
    val rows = q("q484_power_mde").collect()
      .sortBy(_.getAs[Long]("mde_cents"))
    assert(rows.length == 5)
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b },
      "n_per_arm not strictly decreasing in MDE")
    // doubling the MDE divides n by ~4 (ceil slack)
    val n100 = ns(0); val n200 = ns(1)
    assert(math.abs(n100 - 4 * n200) <= 4,
      s"quadratic law violated: $n100 vs 4*$n200")
  }

  test("q485: pattern counts partition the corpus and marginals " +
      "match the knockout rules") {
    import org.apache.spark.sql.functions._
    val rows = q("q485_missingness_patterns").collect()
    val total = rows.map(_.getAs[Long]("observed")).sum
    val n = graft.Tables.t(spark, sf, "events").count()
    assert(total == n, "patterns do not partition the rows")
    // m1 marginal: patterns with bit 1 sum to the %13 rule count
    val m1 = rows.filter(r => (r.getAs[Long]("pattern") & 1L) == 1L)
      .map(_.getAs[Long]("observed")).sum
    val expect = graft.Tables.t(spark, sf, "events")
      .filter(col("event_id") % 13 === 0).count()
    assert(m1 == expect)
  }

  test("q486: weekly top-8 overlap is within [0,8] and jaccard " +
      "consistent with the overlap") {
    val rows = q("q486_topk_stability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kept = r.getAs[Long]("kept")
      assert(kept >= 0 && kept <= 8)
      assert(r.getAs[Long]("churned") == 8 - kept)
      assert(r.getAs[Long]("jaccard_milli") ==
        kept * 1000 / (16 - kept))
    }
  }
}
