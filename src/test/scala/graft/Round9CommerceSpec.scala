package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BI (q577-q579). */
class Round9CommerceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q577: top-20 rules count-ordered; confidence is a valid " +
      "ppm; categories in the 20-cat domain") {
    val rows = q("q577_next_purchase_rules").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty && rows.length <= 20)
    val cs = rows.map(_.getAs[Long]("c"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val conf = r.getAs[Long]("confidence_ppm")
      assert(conf > 0 && conf <= 1000000L)
      assert(r.getAs[Long]("cat_a") >= 0 && r.getAs[Long]("cat_a") < 20)
      assert(r.getAs[Long]("cat_b") >= 0 && r.getAs[Long]("cat_b") < 20)
    }
  }

  test("q578: cells within the 7x24 grid; shares sum to ~1e6; " +
      "exactly 5 peak cells when the grid is full") {
    val rows = q("q578_dow_hour_heatmap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") < 7)
      assert(r.getAs[Long]("hour") >= 0 && r.getAs[Long]("hour") < 24)
    }
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
    assert(rows.map(_.getAs[Long]("peak")).sum ==
      math.min(5, rows.length))
  }

  test("q579: buckets cover only non-final orders; shares sum to " +
      "~1e6; bucket labels from the fixed set") {
    val rows = q("q579_aging_report").collect()
    assert(rows.nonEmpty)
    val labels = Set("0_030", "031_060", "061_090", "091_180",
      "181_365", "365_plus")
    rows.foreach { r =>
      assert(labels.contains(r.getAs[String]("bucket")))
      assert(r.getAs[Long]("n_orders") > 0)
    }
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }
}
