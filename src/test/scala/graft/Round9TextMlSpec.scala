package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AY (q547-q549). */
class Round9TextMlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q547: 20 keywords, rank-ordered by score, scores are valid " +
      "probabilities in ppb") {
    val rows = q("q547_textrank_keywords").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.length == 20)
    val prs = rows.map(_.getAs[Long]("pr_ppb"))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    // PageRank mass: each score < 1, and top-20 sum below total 1e9
    assert(prs.forall(p => p > 0 && p < 1000000000L))
    assert(prs.sum < 1000000000L)
  }

  test("q548: confusion matrix counts exactly the deterministic test " +
      "split, one prediction per doc") {
    val rows = q("q548_naive_bayes_langid").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val expected = graft.Tables.t(spark, sf, "documents")
      .filter("doc_id % 5 = 0").count()
    assert(total == expected,
      s"confusion covers $total docs, test split has $expected")
    val langs = Set("de", "en", "es", "fr", "zh")
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("true_lang")))
      assert(langs.contains(r.getAs[String]("pred_lang")))
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("q549: MI is non-negative, ranked descending, and bounded by " +
      "ln(5) (5-class label entropy)") {
    val rows = q("q549_mutual_info_features").collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty && rows.length <= 15)
    val mis = rows.map(_.getAs[Long]("mi_nano"))
    assert(mis.zip(mis.tail).forall { case (a, b) => a >= b })
    val maxMi = (math.log(5.0) * 1e9).toLong
    mis.foreach(m => assert(m >= 0 && m <= maxMi,
      s"MI out of [0, ln 5]: $m"))
  }
}
