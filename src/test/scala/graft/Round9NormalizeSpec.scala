package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BE (q565-q567). */
class Round9NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q565: 9 deciles per source, monotone within source, shift " +
      "= ref - src everywhere") {
    val rows = q("q565_quantile_normalization").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val byDec = rs.sortBy(_.getAs[Long]("dec"))
      assert(byDec.map(_.getAs[Long]("dec")).toSeq == (1L to 9L))
      val qs = byDec.map(_.getAs[Long]("src_q"))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("shift_chars") ==
        r.getAs[Long]("ref_q") - r.getAs[Long]("src_q"))
    }
  }

  test("q566: hapax <= vocab <= tokens; unseen mass in (0, 1e6); " +
      "Heaps beta in (0, 1000) — sublinear vocab growth") {
    val rows = q("q566_vocab_statistics").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, h) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("vocab"), r.getAs[Long]("hapax"))
      assert(h <= v && v <= n)
      val m = r.getAs[Long]("unseen_mass_ppm")
      assert(m >= 0 && m < 1000000L)
    }
    val beta = rows.head.getAs[Long]("heaps_beta_milli")
    assert(beta > 0 && beta < 1000L,
      s"Heaps beta outside sublinear range: $beta")
  }

  test("q567: weighted Jaccard in (0, 1e6]; ranked descending; " +
      "smin <= denominator") {
    val rows = q("q567_weighted_jaccard_sources").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty)
    val js = rows.map(_.getAs[Long]("wjaccard_ppm"))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val j = r.getAs[Long]("wjaccard_ppm")
      assert(j > 0 && j <= 1000000L)
      assert(r.getAs[Long]("smin") > 0)
      assert(r.getAs[Long]("excl") >= 0)
    }
  }
}
