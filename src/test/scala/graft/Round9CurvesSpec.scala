package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch T (q454-q456). */
class Round9CurvesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q454: training size grows with k and validation SSE stays " +
      "finite and positive") {
    val rows = q("q454_learning_curve").collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.length == 9)
    val ns = rows.map(_.getAs[Long]("n_train"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b > a })
    rows.foreach { r =>
      val sse = r.getAs[Double]("sse_val")
      assert(!sse.isNaN && sse > 0)
    }
  }

  test("q455: positional de-biasing conserves clicks — expected " +
      "clicks sum to ~actual clicks across items") {
    val rows = q("q455_click_coec").collect()
    assert(rows.nonEmpty)
    val exp = rows.map(_.getAs[Long]("expected_clicks_micro")).sum
    val act = rows.map(_.getAs[Long]("actual_clicks")).sum * 1000000L
    // integer ctr floors lose <1 ppm per impression
    val imp = rows.map(_.getAs[Long]("impressions")).sum
    assert(math.abs(exp - act) <= imp,
      s"COEC calibration broken: exp=$exp act=$act imp=$imp")
    rows.foreach(r => assert(r.getAs[Long]("coec_ppm") >= 0))
  }

  test("q456: the detector catches most planted corruptions and " +
      "flags almost nothing else") {
    val r = q("q456_mahalanobis_outliers").collect().head
    val planted = r.getAs[Long]("n_planted")
    val caught = r.getAs[Long]("n_planted_caught")
    assert(planted > 0, "fixture has no planted rows")
    assert(caught * 10 >= planted * 8, s"recall < 80%: $r")
    val falsePos = r.getAs[Long]("n_outliers") - caught
    assert(falsePos * 100 <= r.getAs[Long]("n_rows"),
      s"false-positive rate above 1%: $r")
  }
}
