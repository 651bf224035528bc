package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BF (q568-q570). */
class Round9ProcessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q568: p90 >= median per edge; counts positive; the map " +
      "covers all observed src states") {
    val rows = q("q568_process_map").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Long]("p90_lat10") >=
        r.getAs[Long]("median_lat10"))
      assert(r.getAs[Long]("median_lat10") >= 0)
    }
    val srcs = rows.map(_.getAs[String]("src")).toSet
    assert(srcs.size >= 2)
  }

  test("q569: group sizes partition the table; doubled U within " +
      "[0, 2·n1·n2]") {
    val r = q("q569_mann_whitney_u").collect().head
    val (n1, n2, n) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("n"))
    assert(n1 + n2 == n && n1 > 0 && n2 > 0)
    val u2 = r.getAs[Long]("u2")
    assert(u2 >= 0 && u2 <= 2 * n1 * n2, s"U out of range: $u2")
    // priorities are label-random vs price → |z| should be modest
    assert(math.abs(r.getAs[Long]("z_milli")) < 10000L)
  }

  test("q570: weighted quartiles are ordered within each flag") {
    val rows = q("q570_weighted_quantiles").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, m, b) = (r.getAs[Long]("wp25_cents"),
        r.getAs[Long]("wmedian_cents"), r.getAs[Long]("wp75_cents"))
      assert(a <= m && m <= b, s"quartiles unordered: $r")
      assert(r.getAs[Long]("total_weight") > 0)
    }
  }
}
