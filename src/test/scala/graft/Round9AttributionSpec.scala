package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AW (q541-q543). */
class Round9AttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q541: one row per transient channel; shares sum to ~1e6; " +
      "removal effects in [0, 1e6]") {
    val rows = q("q541_markov_attribution").collect()
    assert(rows.length == 4) // click, error, signup, view
    rows.foreach { r =>
      val re = r.getAs[Long]("removal_ppm")
      assert(re >= 0 && re <= 1000000L, s"removal out of range: $r")
    }
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // each floor() can shave <1 ppm
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L,
      s"shares sum to $shareSum")
  }

  test("q542: <=3 neighbors per item, ranks contiguous, cosine^2 " +
      "monotone within item and bounded by 1e9") {
    val rows = q("q542_item_item_cf").collect()
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length))
      val cos = sorted.map(_.getAs[Long]("cos2_ppb"))
      assert(cos.forall(c => c >= 0 && c <= 1000000000L))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q543: top-20 rules, lift-ordered, support above threshold, " +
      "confidence >= support") {
    val rows = q("q543_association_rules").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val lifts = rows.sortBy(_.getAs[Long]("rk"))
      .map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("support_ppm") >= 2000)
      // conf = c/n_i >= c/N = support since n_i <= N
      assert(r.getAs[Long]("confidence_ppm") >=
        r.getAs[Long]("support_ppm"))
    }
  }
}
