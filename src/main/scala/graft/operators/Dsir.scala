package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Data-selection scoring for LLM training corpora (q246-q247):
  * hashed-n-gram importance weights (DSIR; Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") and a
  * unigram-LM negative-log-likelihood quality score (the perplexity
  * proxy of CCNet; Wenzek et al. 2020).
  *
  * Both are corpus-statistic → per-document-score pipelines, the shape
  * that matters at 100 TB: ONE tokenizing scan builds the statistics
  * table (hash-bucket counts / unigram counts), which is then joined
  * back against the token stream — no per-document model state, no
  * driver-side loop. The DSIR feature table is fixed-size (1024 hash
  * buckets → broadcast); the unigram table is vocab-sized and joins by
  * shuffle (a real vocabulary at corpus scale is heavy-tailed and NOT
  * broadcastable — Catalyst picks the strategy from stats).
  *
  * Hashing is the engine-portable 60-bit md5 prefix ([[Dedup.hash60]]),
  * so the DuckDB oracle reproduces bucket assignment bit-for-bit and the
  * hash gate checks scores, not just shapes. Scores are rounded to 4
  * decimals IN BOTH ENGINES before any order/limit so float ulps can't
  * flip top-k membership.
  */
object Dsir {

  type Q = (SparkSession, String) => DataFrame

  private val Buckets = 1024

  /** Lowercased alnum tokens, one row per instance (q203's recipe). */
  private def toks(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        explode(split(regexp_replace(trim(lower(col("text"))),
          "[^a-z0-9 ]", ""), " +")).as("w"))
      .filter(col("w") =!= "")

  val queries: Seq[(String, Q)] = Seq(
    // DSIR: target domain = lang 'en'; raw = whole corpus. Importance
    // weight of bucket b is log p_target(b) - log p_raw(b) with add-1
    // smoothing; a document's score sums the weights of its token
    // instances. Top-20 most-target-like documents.
    "q246_dsir_importance" -> ((s, d) => {
      val tk = toks(s, d)
        .withColumn("b", pmod(Dedup.hash60(col("w")), lit(Buckets.toLong)))
      val bs = tk.groupBy(col("b")).agg(
        count(lit(1)).as("cr"),
        count(when(col("lang") === "en", 1)).as("ct"))
      val tot = bs.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      val lw = bs.crossJoin(broadcast(tot)).select(col("b"),
        (log((col("ct") + 1.0) / (col("nt") + Buckets.toDouble)) -
          log((col("cr") + 1.0) / (col("nr") + Buckets.toDouble)))
          .as("logw"))
      tk.join(broadcast(lw), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("logw")), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Unigram-LM surprise: -mean log p(token) under the corpus's own
    // unigram distribution — the CCNet perplexity-bucket filter with the
    // LM reduced to order 0 (offline-honest: no external LM weights).
    // Reported per language (avg/extremes), the filter's audit view.
    "q247_unigram_surprise" -> ((s, d) => {
      val tk = toks(s, d)
      val wc = tk.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val nTot = tk.agg(count(lit(1)).cast("double").as("n_corpus"))
      val perDoc = tk.join(wc, Seq("w"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(avg(log(col("c"))).as("mean_log_c"))
        .crossJoin(broadcast(nTot))
        .select(col("doc_id"), col("lang"),
          (log(col("n_corpus")) - col("mean_log_c")).as("sur"))
      perDoc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("sur")), 4).as("avg_surprise"),
        round(min(col("sur")), 4).as("min_surprise"),
        round(max(col("sur")), 4).as("max_surprise"))
    })
  )

  private val tokSql =
    """SELECT doc_id, lang, w
       FROM (SELECT doc_id, lang,
                    unnest(string_split_regex(regexp_replace(
                      trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +')) AS w
             FROM documents WHERE length(trim(text)) > 0)
       WHERE w <> ''"""

  val oracles: Seq[(String, String)] = Seq(
    "q246_dsir_importance" ->
      s"""WITH tok AS (
            SELECT doc_id, lang, w,
                   ('0x' || substr(md5(w), 1, 15))::BIGINT % 1024 AS b
            FROM ($tokSql)),
          bs AS (
            SELECT b, count(*) AS cr,
                   count(*) FILTER (WHERE lang = 'en') AS ct
            FROM tok GROUP BY b),
          tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bs),
          lw AS (
            SELECT b, ln((ct + 1.0) / (nt + 1024.0))
                      - ln((cr + 1.0) / (nr + 1024.0)) AS logw
            FROM bs, tot)
          SELECT doc_id, round(sum(logw), 4) AS score
          FROM tok JOIN lw USING (b)
          GROUP BY doc_id
          ORDER BY score DESC, doc_id
          LIMIT 20""",
    "q247_unigram_surprise" ->
      s"""WITH tok AS ($tokSql),
          wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
          tot AS (SELECT count(*)::DOUBLE AS n_corpus FROM tok),
          per_doc AS (
            SELECT doc_id, lang,
                   ln(n_corpus) - avg(ln(c)) AS sur
            FROM tok JOIN wc USING (w), tot
            GROUP BY doc_id, lang, n_corpus)
          SELECT lang, count(*) AS n_docs,
                 round(avg(sur), 4) AS avg_surprise,
                 round(min(sur), 4) AS min_surprise,
                 round(max(sur), 4) AS max_surprise
          FROM per_doc GROUP BY lang"""
  )
}
