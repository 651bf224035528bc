package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AB (q478-q480). */
class Round9HygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q478: every type reports the same dense day span (calendar " +
      "grid, not data-driven)") {
    val rows = q("q478_densify_calendar").collect()
    assert(rows.nonEmpty)
    val spans = rows.map(_.getAs[Long]("n_days")).distinct
    assert(spans.length == 1,
      s"dense spans differ across types: ${spans.mkString(",")}")
    rows.foreach(r => assert(r.getAs[Long]("up_days") <=
      r.getAs[Long]("n_days")))
  }

  test("q479: kept + dropped == total and kept <= 3 * user-day " +
      "group count") {
    val rows = q("q479_frequency_cap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") + r.getAs[Long]("dropped") ==
        r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("worst_burst") >= 1L)
      if (r.getAs[Long]("worst_burst") <= 3L)
        assert(r.getAs[Long]("dropped") == 0L)
    }
  }

  test("q480: reconciliation partitions every order and quantifies " +
      "the fixture's known totals drift") {
    val rows = q("q480_order_reconciliation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("matched") + r.getAs[Long]("mismatched") +
        r.getAs[Long]("no_lines") == r.getAs[Long]("n_orders"),
        s"orders not partitioned: $r")
      // the synthetic generator does NOT enforce the TPC-H identity:
      // the audit must surface that as nonzero drift, not hide it
      if (r.getAs[Long]("mismatched") > 0L)
        assert(r.getAs[Long]("max_drift_cents") > 100L)
    }
    assert(rows.map(_.getAs[Long]("mismatched")).sum > 0L,
      "expected the fixture's totals drift to be detected")
  }
}
