package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions.cosine_similarity

/** Hybrid retrieval — the RAG-serving read path of a training-data
  * pipeline, composing the engine's two retrieval primitives (q167 BM25
  * full-text, q37 embedding cosine) the way production retrievers do:
  * per-modality top-K, then Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009: score = Σ 1/(60+rank)). The reference's
  * similarity surface is tf_feature_similarity
  * (`QueryEngine/TableFunctions/SystemFunctions/os/
  * SimilarityTableFunctions.hpp:162` in /root/reference); hybrid fusion
  * is the standard composition a user of that surface builds next.
  *
  * Scale shape: each modality reduces to a bounded top-K FIRST
  * (TakeOrderedAndProject — streaming top-k, no full sort), so the rank
  * assignment and the fusion join run on 2×K rows regardless of corpus
  * size. Ranks come from sort_array + posexplode over the K-row
  * collect_list — bounded by construction, so no unpartitioned window
  * ever touches corpus-scale data (the round-6 invariant).
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  private val TOPK = 50
  private val RRF_K = 60
  private val QTERMS = Seq("spark", "query", "join")

  /** BM25 (k1=1.2, b=0.75) scores for QTERMS over documents — the q167
    * scoring chain (one token-explode scan; per-term stats filter to the
    * query terms before any shuffle).
    */
  private def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val dl = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = toks.filter(col("term").isin(QTERMS: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .withColumn("idf",
        log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    val scored = tf.join(broadcast(idf), "term").join(dl, "doc_id")
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl")
          / lit(avgdl))))
    def termScore(q: String) =
      coalesce(max(when(col("term") === q, col("s"))), lit(0.0))
    scored.groupBy(col("doc_id"))
      .agg(termScore(QTERMS(0)).as("s0"), termScore(QTERMS(1)).as("s1"),
        termScore(QTERMS(2)).as("s2"))
      .select(col("doc_id"),
        (col("s0") + col("s1") + col("s2")).as("score"))
  }

  /** Bounded rank table: top-K of (score desc, id asc) → (id, rank).
    * The limit is a TakeOrderedAndProject (streaming top-k); ranks are
    * then a posexplode over ONE K-row sorted array — never a window,
    * never corpus-scale. struct(-score, id) sorted ascending gives the
    * (score desc, id asc) order with the tie-break the fusion needs.
    */
  private def rankTopK(scored: DataFrame, idCol: String, scoreCol: String,
      rankName: String): DataFrame = {
    val top = scored
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .limit(TOPK)
      .select(struct((-col(scoreCol)).as("neg"), col(idCol).as("id"))
        .as("kv"))
    top.agg(sort_array(collect_list(col("kv"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pos", "kv")))
      .select(col("kv.id").as(idCol),
        (col("pos") + 1).cast("int").as(rankName))
  }

  val queries: Seq[(String, Q)] = Seq(

    // Hybrid BM25 + embedding-cosine retrieval fused by RRF. The two
    // modalities are blind to each other (the multi-modal-sweep rule):
    // lexical rank catches exact-term matches embeddings smear, vector
    // rank catches paraphrases BM25 misses; 1/(60+rank) needs no score
    // normalization across incomparable scales — that is WHY production
    // retrievers fuse on rank, not score. doc_id keys both tables (the
    // fixture embeds document i as vector i).
    "q251_hybrid_rrf" -> ((s, d) => {
      val bmRanks = rankTopK(bm25Scores(s, d), "doc_id", "score", "r_bm")
      val emb = t(s, d, "embeddings")
      val q0 = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")))
      val vecScores = emb.crossJoin(q0)
        .select(col("vec_id").as("doc_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
      val vecRanks = rankTopK(vecScores, "doc_id", "sim", "r_vec")
      bmRanks.join(vecRanks, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("r_bm"), col("r_vec"),
          (coalesce(lit(1.0) / (lit(RRF_K) + col("r_bm")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RRF_K) + col("r_vec")), lit(0.0)))
            .as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id").asc)
        .limit(20)
    }),

    // Hard-negative mining (DPR, Karpukhin et al. 2020; ANCE, Xiong et
    // al. 2021): for each anchor, the top-5 most-cosine-similar vectors
    // carrying a DIFFERENT label — the negatives that actually move a
    // contrastive loss, vs q211's random negatives. Also the engine's
    // "filtered vector search" shape (predicate + top-k in one pass):
    // the label filter evaluates BEFORE ranking, so the window ranks
    // only surviving candidates. Anchors broadcast; one corpus scan; the
    // per-anchor window is partitioned by anchor (never global). At
    // 100 TB the same query runs against the q99 IVF layout with the
    // label predicate pruning inside probed cells.
    "q252_hard_negatives" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val anchors = broadcast(emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("embedding").as("a_emb")))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("sim").desc, col("n_id").asc)
      emb.crossJoin(anchors)
        .filter(col("label") =!= col("a_label"))
        .select(col("a_id"), col("vec_id").as("n_id"),
          col("label").as("n_label"),
          cosine_similarity(col("embedding"), col("a_emb")).as("sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("a_id"), col("n_id"), col("n_label"),
          col("rnk"), col("sim"))
    }),

    // Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
    // parallel-corpus alignment step of a multilingual training
    // pipeline): candidate pair score = cos(a,b) normalized by the mean
    // of each side's k-NN similarities, which cancels hubness; a pair is
    // mined when its best margin exceeds 1. Two "languages" are the
    // vec_id parity classes. Scale shape = q252's filtered vector
    // search: side A is the bounded broadcast batch (at 100 TB the
    // mining batch), ONE corpus scan builds the A×B similarity block,
    // and both directions' k-NN means come from that same staged block
    // (windows partitioned by a_id / b_id — never global). All scores
    // rounded to 6 before ranking so both engines rank identically.
    "q332_bitext_margin" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val K = 4
      val a = broadcast(emb
        .filter(col("vec_id") % 2 === 0 && col("vec_id") < 80)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb")))
      val b = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      val pairs = graft.Stage(
        b.crossJoin(a).select(col("a_id"), col("b_id"),
          round(cosine_similarity(col("a_emb"), col("b_emb")), 6)
            .as("cos")),
        "q332_pairs")
      val wa = Window.partitionBy(col("a_id"))
        .orderBy(col("cos").desc, col("b_id").asc)
      val wb = Window.partitionBy(col("b_id"))
        .orderBy(col("cos").desc, col("a_id").asc)
      val aTop = pairs.withColumn("rk", row_number().over(wa))
        .filter(col("rk") <= K).groupBy(col("a_id"))
        .agg(round(avg(col("cos")), 6).as("avg_a"))
      val bTop = pairs.withColumn("rk", row_number().over(wb))
        .filter(col("rk") <= K).groupBy(col("b_id"))
        .agg(round(avg(col("cos")), 6).as("avg_b"))
      val m = pairs.join(broadcast(aTop), "a_id")
        .join(broadcast(bTop), "b_id")
        .withColumn("margin",
          round(col("cos") / ((col("avg_a") + col("avg_b")) / 2), 6))
      val wBest = Window.partitionBy(col("a_id"))
        .orderBy(col("margin").desc, col("b_id").asc)
      m.withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1 && col("margin") > 1.0)
        .select(col("a_id"), col("b_id"), col("cos"), col("margin"))
    }),

    // k-NN majority-vote classification — the eval loop of a
    // retrieval-based labeler: for each test vector (bounded broadcast
    // batch), the 5 nearest train vectors by cosine vote on the label;
    // ties break to the smaller label. Same filtered-vector-search
    // shape as q252 (one corpus scan, per-anchor windows), plus the
    // vote aggregate and a correctness flag against the true label.
    "q370_knn_classify" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val test = broadcast(emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("t_id"), col("label").as("true_label"),
          col("embedding").as("t_emb")))
      val train = emb.filter(col("vec_id") >= 30)
      val w = Window.partitionBy(col("t_id"))
        .orderBy(col("sim").desc, col("n_id").asc)
      val nn = train.crossJoin(test)
        .select(col("t_id"), col("true_label"),
          col("vec_id").as("n_id"), col("label").as("n_label"),
          round(cosine_similarity(col("embedding"), col("t_emb")), 6)
            .as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
      val wv = Window.partitionBy(col("t_id"))
        .orderBy(col("c").desc, col("n_label").asc)
      nn.groupBy(col("t_id"), col("true_label"), col("n_label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("vr", row_number().over(wv))
        .filter(col("vr") === 1)
        .select(col("t_id"), col("true_label"),
          col("n_label").as("pred_label"), col("c").as("votes"),
          (col("n_label") === col("true_label")).as("correct"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q251_hybrid_rrf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         toks2 AS (SELECT * FROM toks WHERE term <> ''),
         dl AS (
           SELECT doc_id, count(*)::DOUBLE AS dl FROM toks2
           GROUP BY doc_id),
         stats AS (
           SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
         tf AS (
           SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks2
           WHERE term IN ('spark', 'query', 'join')
           GROUP BY doc_id, term),
         idf AS (
           SELECT term, ln(((SELECT n FROM stats) - count(*) + 0.5)
                           / (count(*) + 0.5) + 1.0) AS idf
           FROM tf GROUP BY term),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  idf.idf * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                    / (SELECT avgdl FROM stats))) AS s
           FROM tf
           JOIN idf ON idf.term = tf.term
           JOIN dl ON dl.doc_id = tf.doc_id),
         bm AS (
           SELECT doc_id,
                  coalesce(max(CASE WHEN term = 'spark' THEN s END), 0.0)
                  + coalesce(max(CASE WHEN term = 'query' THEN s END), 0.0)
                  + coalesce(max(CASE WHEN term = 'join' THEN s END), 0.0)
                    AS score
           FROM scored GROUP BY doc_id),
         bm_top AS (
           SELECT doc_id, score FROM bm
           ORDER BY score DESC, doc_id ASC LIMIT 50),
         bm_rank AS (
           SELECT doc_id, CAST(row_number() OVER (
             ORDER BY score DESC, doc_id ASC) AS INT) AS r_bm
           FROM bm_top),
         vec AS (
           SELECT e.vec_id AS doc_id,
                  list_cosine_similarity(e.embedding::DOUBLE[],
                    q.embedding::DOUBLE[]) AS sim
           FROM embeddings e,
                (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
         vec_top AS (
           SELECT doc_id, sim FROM vec
           ORDER BY sim DESC, doc_id ASC LIMIT 50),
         vec_rank AS (
           SELECT doc_id, CAST(row_number() OVER (
             ORDER BY sim DESC, doc_id ASC) AS INT) AS r_vec
           FROM vec_top)
         SELECT coalesce(b.doc_id, v.doc_id) AS doc_id, b.r_bm, v.r_vec,
                coalesce(1.0 / (60 + b.r_bm), 0.0)
                + coalesce(1.0 / (60 + v.r_vec), 0.0) AS rrf_score
         FROM bm_rank b FULL OUTER JOIN vec_rank v
           ON b.doc_id = v.doc_id
         ORDER BY rrf_score DESC, doc_id ASC
         LIMIT 20""",
    "q252_hard_negatives" ->
      """WITH scored AS (
           SELECT a.vec_id AS a_id, e.vec_id AS n_id, e.label AS n_label,
                  list_cosine_similarity(e.embedding::DOUBLE[],
                    a.embedding::DOUBLE[]) AS sim
           FROM embeddings e
           JOIN embeddings a ON a.vec_id < 8 AND e.label <> a.label),
         ranked AS (
           SELECT a_id, n_id, n_label, sim,
                  CAST(row_number() OVER (PARTITION BY a_id
                    ORDER BY sim DESC, n_id ASC) AS INT) AS rnk
           FROM scored)
         SELECT a_id, n_id, n_label, rnk, sim FROM ranked
         WHERE rnk <= 5""",
    "q332_bitext_margin" ->
      """WITH a AS (
           SELECT vec_id AS a_id, embedding AS a_emb FROM embeddings
           WHERE vec_id % 2 = 0 AND vec_id < 80),
         b AS (
           SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings
           WHERE vec_id % 2 = 1),
         pairs AS (
           SELECT a_id, b_id,
                  round(list_cosine_similarity(a_emb::DOUBLE[],
                    b_emb::DOUBLE[]), 6) AS cos
           FROM a, b),
         atop AS (
           SELECT a_id, round(avg(cos), 6) AS avg_a FROM (
             SELECT a_id, cos, row_number() OVER (PARTITION BY a_id
               ORDER BY cos DESC, b_id ASC) AS rk FROM pairs)
           WHERE rk <= 4 GROUP BY a_id),
         btop AS (
           SELECT b_id, round(avg(cos), 6) AS avg_b FROM (
             SELECT b_id, cos, row_number() OVER (PARTITION BY b_id
               ORDER BY cos DESC, a_id ASC) AS rk FROM pairs)
           WHERE rk <= 4 GROUP BY b_id),
         m AS (
           SELECT p.a_id, p.b_id, p.cos,
                  round(p.cos / ((avg_a + avg_b) / 2), 6) AS margin
           FROM pairs p
           JOIN atop USING (a_id) JOIN btop USING (b_id)),
         best AS (
           SELECT a_id, b_id, cos, margin,
                  row_number() OVER (PARTITION BY a_id
                    ORDER BY margin DESC, b_id ASC) AS rk
           FROM m)
         SELECT a_id, b_id, cos, margin FROM best
         WHERE rk = 1 AND margin > 1.0""",
    "q370_knn_classify" ->
      """WITH test AS (
           SELECT vec_id AS t_id, label AS true_label,
                  embedding AS t_emb
           FROM embeddings WHERE vec_id < 30),
         train AS (
           SELECT vec_id AS n_id, label AS n_label, embedding
           FROM embeddings WHERE vec_id >= 30),
         nn AS (
           SELECT t_id, true_label, n_id, n_label,
                  round(list_cosine_similarity(embedding::DOUBLE[],
                    t_emb::DOUBLE[]), 6) AS sim,
                  row_number() OVER (PARTITION BY t_id
                    ORDER BY round(list_cosine_similarity(
                      embedding::DOUBLE[], t_emb::DOUBLE[]), 6) DESC,
                    n_id ASC) AS rk
           FROM train, test),
         votes AS (
           SELECT t_id, true_label, n_label, count(*)::BIGINT AS c
           FROM nn WHERE rk <= 5 GROUP BY 1, 2, 3),
         best AS (
           SELECT t_id, true_label, n_label, c,
                  row_number() OVER (PARTITION BY t_id
                    ORDER BY c DESC, n_label ASC) AS vr
           FROM votes)
         SELECT t_id, true_label, n_label AS pred_label, c AS votes,
                n_label = true_label AS correct
         FROM best WHERE vr = 1"""
  )
}
