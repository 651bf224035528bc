package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the training-mix planning family (q264-q265). */
class MixturePlanningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q264: every language lands within budget, never over") {
    val rows = SparkEntry.queries("q264_token_budget_mix")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = r.getAs[Long]("tokens_selected")
      val bud = r.getAs[Long]("budget")
      assert(tok <= bud, r.toString)
      val util = r.getAs[Double]("utilization")
      assert(util > 0.5 && util <= 1.0,
        s"selection should nearly fill the budget: $r")
    }
  }

  test("q265: pairs have positive margin and distinct sides") {
    val rows = SparkEntry.queries("q265_preference_pairs")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("margin") > 0, r.toString)
      assert(r.getAs[Long]("chosen_doc") != r.getAs[Long]("rejected_doc"),
        r.toString)
      assert(r.getAs[Long]("chosen_score") > r.getAs[Long]("rejected_score"),
        r.toString)
    }
  }
}
