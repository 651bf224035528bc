package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch U (q457-q459). */
class Round9PatternsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q457: every signup lands in exactly one of clean / blocked / " +
      "never-converted") {
    val rows = q("q457_pattern_negation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("clean_conversions") +
        r.getAs[Long]("error_blocked") +
        r.getAs[Long]("never_converted") == r.getAs[Long]("n_signups"),
        s"partition violated: $r")
    }
  }

  test("q458: Top-N + Other conserves total revenue and order counts") {
    import org.apache.spark.sql.functions._
    val rows = q("q458_topn_other").collect()
    val totalRev = rows.map(_.getAs[Long]("revenue_cents")).sum
    val totalOrders = rows.map(_.getAs[Long]("n_orders")).sum
    val base = graft.Tables.t(spark, sf, "orders")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")),
        count(lit(1))).collect().head
    assert(totalRev == base.getLong(0), "revenue not conserved")
    assert(totalOrders == base.getLong(1), "orders not conserved")
    assert(rows.count(_.getAs[String]("bucket") != "OTHER") <= 8)
    assert(rows.exists(_.getAs[String]("bucket") == "OTHER"))
  }

  test("q459: the planted cluster cell is flagged hot and hot cells " +
      "all sit near the plant or are justified by their z") {
    val rows = q("q459_spatial_hotspots").collect()
    val hot = rows.filter(_.getAs[Long]("hot") == 1L)
    assert(hot.nonEmpty, "planted hotspot not detected")
    // the plant concentrates around (51,51) -> cell (10,10); every
    // hot cell's 3x3 neighborhood must touch the planted cell block
    assert(hot.exists(r => r.getAs[Long]("cx") == 10 &&
      r.getAs[Long]("cy") == 10), "central planted cell missed")
    rows.foreach { r =>
      val z = r.getAs[Long]("z_milli")
      assert((r.getAs[Long]("hot") == 1L) == (z >= 2576L))
      assert(z >= 2576L || z <= -2576L, "unflagged row in output")
    }
  }
}
