package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch X (q466-q468). */
class Round9RankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q466: Bradley-Terry strengths are positive, normalized to " +
      "the brand count, and correlate with raw wins") {
    val rows = q("q466_bradley_terry").collect()
    assert(rows.length > 10, "expected ~25 brands")
    rows.foreach(r =>
      assert(r.getAs[Long]("strength_micro") >= 0))
    // sum-normalization: mean strength ~= 1.0 (floor slack)
    val total = rows.map(_.getAs[Long]("strength_micro")).sum
    assert(math.abs(total - rows.length * 1000000L) <= rows.length,
      s"normalization drifted: $total for ${rows.length} brands")
    // the strongest brand must not have fewer wins than the weakest
    val byS = rows.sortBy(-_.getAs[Long]("strength_micro"))
    assert(byS.head.getAs[Long]("wins") >=
      rows.map(_.getAs[Long]("wins")).min)
  }

  test("q467: support is symmetric-bounded and confidence <= 1e6") {
    val rows = q("q467_seq_pattern_support").collect()
    assert(rows.length == 20, "5 types -> 20 ordered pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("support_users") <= r.getAs[Long]("users_a"))
      val c = r.getAs[Long]("confidence_ppm")
      assert(c >= 0 && c <= 1000000L)
    }
  }

  test("q468: the knee sits strictly inside the curve with a " +
      "positive concentration gap") {
    val r = q("q468_knee_detection").collect().head
    val knee = r.getAs[Long]("knee_rank")
    val n = r.getAs[Long]("n")
    assert(knee >= 1 && knee < n, s"knee $knee outside (1, $n)")
    // revenue curves are concave -> the max gap is positive
    assert(r.getAs[Long]("gap_ppm") > 0)
    assert(r.getAs[Long]("cum_cents_at_knee") > 0)
  }
}
