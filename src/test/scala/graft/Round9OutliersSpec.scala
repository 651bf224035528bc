package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BD (q562-q564). */
class Round9OutliersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q562: top-10 outliers score-ordered; every score >= its " +
      "cluster median baseline only for true outliers (>= 1e6 at " +
      "rank 1)") {
    val rows = q("q562_knn_outlier_gate").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the global top outlier must be at or above its cluster median
    assert(scores.head >= 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("dk_d2_micro") > 0))
  }

  test("q563: allocations sum exactly to the 1000-probe budget and " +
      "every stratum gets a non-negative count") {
    val rows = q("q563_neyman_allocation").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") >= 0)
      assert(r.getAs[Long]("sigma_milli") >= 0)
    }
  }

  test("q564: every page satisfies both window thresholds; burn " +
      "rates are exact integer ratios") {
    val rows = q("q564_slo_burn_alerts").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("burn1_milli") >= 2000L)
      assert(r.getAs[Long]("burn6_milli") >= 1000L)
      assert(r.getAs[Long]("burn1_milli") ==
        r.getAs[Long]("errs") * 4000L / r.getAs[Long]("tot"))
      assert(r.getAs[Long]("page") == 1L)
    }
  }
}
