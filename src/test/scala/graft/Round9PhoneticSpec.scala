package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BB (q556-q558). */
class Round9PhoneticSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q556: codes are letter + 3 digits; pair counts are " +
      "n(n-1)/2; blocks size-ordered") {
    val rows = q("q556_soundex_blocking").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_names"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val code = r.getAs[String]("code")
      assert(code.matches("[A-Z][0-6]{3}"), s"malformed code: $code")
      val n = r.getAs[Long]("n_names")
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
      assert(r.getAs[Long]("n_distinct") <= n)
    }
  }

  test("q557: sMAPE <= 2e6 (its hard bound) and sMAPE <= MAPE is " +
      "not required, but both non-negative; scored days positive") {
    val rows = q("q557_seasonal_naive_backtest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_scored") > 0)
      assert(r.getAs[Long]("mae_milli") >= 0)
      assert(r.getAs[Long]("mape_ppm") >= 0)
      val sm = r.getAs[Long]("smape_ppm")
      assert(sm >= 0 && sm <= 2000000L, s"sMAPE out of bound: $sm")
    }
  }

  test("q558: distances within 4 hops, harmonic consistent with " +
      "reach (each reached node adds >= 250 milli), closeness ppm " +
      "formula holds") {
    val rows = q("q558_khop_centrality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nr, sd, h, c) = (r.getAs[Long]("n_reach4"),
        r.getAs[Long]("sum_dist4"),
        r.getAs[Long]("harmonic_milli"),
        r.getAs[Long]("closeness_micro"))
      assert(sd >= nr && sd <= 4 * nr, s"distances outside 1..4: $r")
      assert(h >= nr * 250 && h <= nr * 1000)
      assert(c == nr * 1000000L / math.max(sd, 1L))
    }
  }
}
