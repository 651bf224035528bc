package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the metric-movement batch (q428-q430) that the hash
  * gate cannot express: bridge additivity, grid completeness, argmin
  * uniqueness.
  */
class Round9DecompSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q428: segment shares sum to ~1e6 ppm and the mix+rate bridge " +
      "reconstructs the overall average change") {
    val rows = q("q428_mix_rate_decomp").collect()
    assert(rows.nonEmpty)
    val w1 = rows.map(_.getAs[Long]("w1_ppm")).sum
    val w2 = rows.map(_.getAs[Long]("w2_ppm")).sum
    // integer DIV rounds each share down by <1 ppm
    assert(math.abs(w1 - 1000000L) <= rows.length &&
      math.abs(w2 - 1000000L) <= rows.length, s"shares w1=$w1 w2=$w2")
    val bridge = rows.map(r =>
      r.getAs[Long]("mix_eff_micro") + r.getAs[Long]("rate_eff_micro")).sum
    val n1 = rows.map(_.getAs[Long]("n1")).sum
    val n2 = rows.map(_.getAs[Long]("n2")).sum
    val r1 = rows.map(r => r.getAs[Long]("r1_cents") * r.getAs[Long]("n1"))
      .sum / n1
    val r2 = rows.map(r => r.getAs[Long]("r2_cents") * r.getAs[Long]("n2"))
      .sum / n2
    val actual = 1000000L * (r2 - r1)
    // each term carries <=1 ppm share rounding (* r <= ~3e7 micro) and
    // <=1 cent rate rounding (* w <= 1e6 micro)
    val tol = rows.length * 4e7 + 2e6
    assert(math.abs(bridge - actual) <= tol,
      s"bridge=$bridge actual=$actual tol=$tol")
  }

  test("q429: every grid day is fully covered (known+filled = hours) " +
      "and interpolated totals are positive") {
    val rows = q("q429_interp_resample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("known_hours")
      val f = r.getAs[Long]("filled_hours")
      assert(k + f >= 1 && k + f <= 24, s"day coverage out of range: $r")
      assert(r.getAs[Long]("day_total_micro") > 0, s"non-positive day: $r")
    }
    // interior days of each series are complete 24-hour grids
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, days) =>
      val interior = days.sortBy(_.getAs[String]("day")).drop(1).dropRight(1)
      assert(interior.forall(r => r.getAs[Long]("known_hours") +
        r.getAs[Long]("filled_hours") == 24),
        "interior day with incomplete hour grid")
    }
  }

  test("q430: exactly one best knot, SSE non-negative, and sides " +
      "partition the parts") {
    val rows = q("q430_piecewise_knot").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("is_best")).sum == 1L)
    val total = rows.head.getAs[Long]("n_left") +
      rows.head.getAs[Long]("n_right")
    rows.foreach { r =>
      assert(r.getAs[Double]("sse_total") >= 0.0, s"negative SSE: $r")
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == total)
    }
  }
}
