package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the exact-similarity family (q282 prefix-filter join,
  * q283 phrase search, q284 MMR rerank).
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("similarity-index table names are injective in the fixture " +
      "path: dirs sharing a 48-char sanitized suffix get distinct " +
      "suffixes (round-13 ADVICE)") {
    val tail = "x" * 48
    val a = s"/data/fixtureA/$tail"
    val b = s"/data/fixtureB/$tail"
    // the old takeRight(48) collapsed these to the same table name
    assert(a.replaceAll("[^A-Za-z0-9]", "_").takeRight(48) ==
      b.replaceAll("[^A-Za-z0-9]", "_").takeRight(48),
      "fixture paths no longer collide under the OLD scheme — " +
        "pick a longer shared tail")
    assert(graft.operators.Similarity.indexTableSuffix(a) !=
      graft.operators.Similarity.indexTableSuffix(b))
    // deterministic: same dir, same suffix (the cache key contract)
    assert(graft.operators.Similarity.indexTableSuffix(a) ==
      graft.operators.Similarity.indexTableSuffix(a))
    assert(graft.operators.Similarity.indexTableSuffix(a)
      .matches("[0-9a-f]{32}"))
  }

  test("prefix-filter join is COMPLETE: equals brute-force all-pairs " +
      "exact Jaccard at the same threshold") {
    // The whole point of q282 over LSH (q42): recall 1.0 by theorem.
    // Brute-force the same shingle-set universe and diff the pair sets.
    import spark.implicits._
    val got = SparkEntry.queries("q282_exact_similarity_join")(spark, sf)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        split(regexp_replace(trim(lower(col("text"))), "[^a-z0-9 ]", ""),
          " +").as("toks"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(toks) < 3 THEN array(concat_ws(' ', toks))
           ELSE transform(sequence(1, size(toks) - 2),
             i -> concat_ws(' ', element_at(toks, i),
                            element_at(toks, i + 1),
                            element_at(toks, i + 2))) END""").as("shs"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, shs) => id -> shs.toSet }
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      // q282 rounds jaccard to 6 dp before thresholding; mirror it.
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.6
    } yield (a, b)).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.nonEmpty) // fixture plants verbatim duplicates
  }

  test("phrase search counts match a token-level sliding-window replay") {
    import spark.implicits._
    val rows = SparkEntry.queries("q283_phrase_search")(spark, sf).collect()
    assert(rows.length == 10)
    val phrase = rows.head.getAs[String]("phrase").split(" ")
    val toks = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        split(regexp_replace(trim(lower(col("text"))), "[^a-z0-9 ]", ""),
          " +").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { r =>
      val ts = toks(r.getAs[Long]("doc_id"))
      val n = ts.sliding(2).count(w =>
        w.length == 2 && w(0) == phrase(0) && w(1) == phrase(1))
      assert(n == r.getAs[Long]("n_occ"))
    }
  }

  test("mmr: rank 1 is the relevance argmax and later picks maximize " +
      "the rounded marginal-relevance objective") {
    val rows = SparkEntry.queries("q284_mmr_rerank")(spark, sf)
      .orderBy("mmr_rank").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("mmr_rank")).toSeq == Seq(1, 2, 3, 4, 5))
    // rank 1: score == rel (no diversity term yet)
    assert(rows.head.getAs[Double]("mmr_score") ==
      rows.head.getAs[Double]("rel"))
    // Full greedy replay from the raw embeddings: the query must have
    // selected exactly the argmax sequence of the rounded objective.
    import spark.implicits._
    val emb = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (dot, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, x, y), (u, v)) =>
          (d + u.toDouble * v.toDouble, x + u.toDouble * u.toDouble,
            y + v.toDouble * v.toDouble)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val q0 = emb(0L)
    val pool = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(v, q0))) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var sel = Vector(pool.maxBy { case (id, rel) => (rel, -id) })
    for (_ <- 2 to 5) {
      val next = pool.filterNot(p => sel.exists(_._1 == p._1))
        .map { case (id, rel) =>
          val maxSim = sel.map(s => r6(cos(emb(id), emb(s._1)))).max
          (id, rel, r6(0.7 * rel - 0.3 * maxSim))
        }
        .minBy { case (id, _, sc) => (-sc, id) }
      sel :+= ((next._1, next._2))
    }
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == sel.map(_._1))
  }

  test("q309: deletion-signature join equals brute-force ed<=1 over " +
      "the vocabulary (FastSS completeness)") {
    val rows = SparkEntry.queries("q309_typo_pairs")(spark, sf).collect()
    assert(rows.nonEmpty, "planted corruption produced no typo pairs")
    // brute-force truth over the same corrupted vocabulary
    val vocab = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(when(col("doc_id") % 5 === 0 && length(col("tok")) >= 4,
        concat(substring(col("tok"), 1, 1), expr("substring(tok, 3)")))
        .otherwise(col("tok")).as("tok"))
      .distinct().collect().map(_.getString(0))
    def ed1(a: String, b: String): Boolean = {
      if (math.abs(a.length - b.length) > 1) false
      else if (a.length == b.length)
        a.zip(b).count { case (x, y) => x != y } <= 1
      else { // one insertion: longer must equal shorter with one skip
        val (sh, lo) = if (a.length < b.length) (a, b) else (b, a)
        (0 to sh.length).exists(i =>
          lo == sh.substring(0, i) + lo(i) + sh.substring(i))
      }
    }
    val truth = (for {
      a <- vocab; b <- vocab if a < b && ed1(a, b)
    } yield (a, b)).toSet
    val got = rows.map(r =>
      (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))).toSet
    assert(got == truth,
      s"missing=${truth -- got} spurious=${got -- truth}")
  }
}
