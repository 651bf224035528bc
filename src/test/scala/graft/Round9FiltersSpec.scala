package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AX (q544-q546). */
class Round9FiltersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q544: posterior variance converges to ~sqrt(QR) and gain is " +
      "a valid ppm") {
    val rows = q("q544_kalman_level").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("p_var_milli2")
      // steady state p* = (Q + sqrt(Q² + 4QR))/2 ≈ 1025 for Q=50,
      // R=20000; after 25+ steps the recursion is within a few units
      assert(p > 900 && p < 1300, s"p_var off steady state: $r")
      val k = r.getAs[Long]("next_gain_ppm")
      assert(k > 0 && k < 1000000L)
      // gain consistency: k = (p+Q)·1e6 DIV (p+Q+R)
      assert(k == (p + 50L) * 1000000L / (p + 50L + 20000L))
    }
  }

  test("q545: Croston state is positive; rate = size/interval in " +
      "milli; intervals at least 1 day") {
    val rows = q("q545_croston_demand").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (z, v, rate) = (r.getAs[Long]("size_est"),
        r.getAs[Long]("interval_est_days"),
        r.getAs[Long]("rate_milli_per_day"))
      assert(z > 0, s"nonpositive size: $r")
      assert(v >= 0)
      assert(rate == math.floor(z * 1000.0 / math.max(v, 1L)).toLong)
    }
  }

  test("q546: AMS estimate is positive and within 60% of exact F2 " +
      "(16 copies: std ≈ 0.35·F2)") {
    val r = q("q546_ams_f2_sketch").collect().head
    val (exact, est, err) = (r.getAs[Long]("exact_f2"),
      r.getAs[Long]("est_mean"), r.getAs[Long]("err_ppm"))
    assert(exact > 0 && est > 0)
    assert(err == math.abs(est - exact) * 1000000L / exact)
    assert(err < 600000L, s"AMS estimate off by ${err} ppm")
  }
}
