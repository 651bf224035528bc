package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BG (q571-q573). */
class Round9RankTestsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q571: 5 groups, H non-negative and small for label-random " +
      "priorities (chi2_{4, 0.999} ~ 18.5)") {
    val r = q("q571_kruskal_wallis").collect().head
    assert(r.getAs[Long]("k") == 5)
    assert(r.getAs[Long]("df") == 4)
    val h = r.getAs[Long]("h_milli")
    assert(h >= 0, s"H negative: $h")
    assert(h < 30000L, s"H implausibly large for random labels: $h")
  }

  test("q572: energies non-negative; Parseval-flavored sanity — " +
      "approx sum equals the 16-day series total") {
    val rows = q("q572_haar_energy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("energy_l1") >= 0)
      assert(r.getAs[Long]("energy_l2") >= 0)
      assert(r.getAs[Long]("energy_l3") >= 0)
      // a3 entries are sums of disjoint 8-day blocks: their total is
      // the 16-day sum, which is positive for revenue series
      assert(r.getAs[Long]("approx_sum") > 0)
    }
  }

  test("q573: lag-1 ACF within [-1, 1] in milli; LB Q non-negative") {
    val rows = q("q573_ljung_box").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 10)
      assert(r.getAs[Long]("lb_q_milli") >= 0)
      val a = r.getAs[Long]("acf1_milli")
      assert(a >= -1000L && a <= 1000L, s"ACF out of range: $a")
    }
  }
}
