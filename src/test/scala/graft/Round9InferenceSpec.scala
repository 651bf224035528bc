package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch V (q460-q462). */
class Round9InferenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q460: log-rank components are coherent (O within risk-set " +
      "bounds, variance positive, chi2 consistent with O-E and V)") {
    val r = q("q460_logrank_test").collect().head
    val o = r.getAs[Long]("observed_g1")
    val eMilli = r.getAs[Long]("expected_g1_milli")
    val vMilli = r.getAs[Long]("variance_milli")
    val chi2 = r.getAs[Long]("chi2_milli")
    assert(r.getAs[Long]("n_death_times") > 0)
    assert(o >= 0 && eMilli > 0 && vMilli > 0)
    // chi2 ~= (O - E)^2 / V (milli-quantized on both sides -> allow
    // 2 milli of floor slack)
    val expect = math.pow(o - eMilli / 1000.0, 2) / (vMilli / 1000.0)
    assert(math.abs(chi2 - math.floor(expect * 1000)) <= 2,
      s"chi2=$chi2 expect~${expect * 1000}")
  }

  test("q461: BH finds the planted purchase@12h effect and " +
      "rejections are exactly ranks 1..cutoff, p monotone") {
    val rows = q("q461_fdr_bh").collect()
    assert(rows.exists(r => r.getAs[String]("event_type") == "purchase"
      && r.getAs[Number]("hr").longValue == 12L),
      "planted effect not rejected")
    if (rows.nonEmpty) {
      val cutoff = rows.head.getAs[Long]("n_rejected")
      assert(rows.length == cutoff)
      val ranks = rows.map(_.getAs[Int]("rk")).sorted
      assert(ranks.sameElements(1 to cutoff.toInt), "rank gap")
      val ps = rows.sortBy(_.getAs[Int]("rk"))
        .map(_.getAs[Long]("p_ppm"))
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
        "p not monotone in rank")
      // every rejected p is at most the cutoff line p <= cutoff*α/m
      // (step-up property: the cutoff rank itself satisfies the line)
      assert(ps.last <= math.ceil(cutoff * 0.05 / 120 * 1e6),
        "cutoff rank above its own BH line")
    }
  }

  test("q462: Hamilton allocation sums exactly to 1,000,000 and " +
      "every nation gets floor-quota or floor-quota+1") {
    val rows = q("q462_largest_remainder").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == 1000000L, s"allocation total $total != 1e6")
    rows.foreach { r =>
      val base = r.getAs[Long]("base")
      val alloc = r.getAs[Long]("alloc")
      assert(alloc == base || alloc == base + 1, s"non-Hamilton: $r")
    }
    // pro-rata sanity: allocation ordering follows revenue ordering
    val byRev = rows.sortBy(-_.getAs[Long]("cents"))
      .map(_.getAs[Long]("alloc"))
    assert(byRev.zip(byRev.tail).forall { case (a, b) => a >= b - 1 },
      "allocation violates revenue monotonicity beyond rounding")
  }
}
