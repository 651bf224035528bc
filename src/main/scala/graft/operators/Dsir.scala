package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Data-selection scoring for LLM training corpora (q246-q248):
  * hashed-n-gram importance weights (DSIR; Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"), a
  * unigram-LM negative-log-likelihood quality score (the perplexity
  * proxy of CCNet; Wenzek et al. 2020), and a train-split bigram LM
  * with Stupid Backoff (Brants et al. 2007, "Large Language Models in
  * Machine Translation") scoring held-out documents.
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
      // staged once: the bucket stats and the per-doc scoring pass
      // otherwise each re-run the tokenize+md5-bucket projection
      val tk = graft.Stage(toks(s, d)
        .withColumn("b", pmod(Dedup.hash60(col("w")), lit(Buckets.toLong)))
        .select(col("doc_id"), col("lang"), col("b")), "q246_tk")
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

    // Bigram LM with Stupid Backoff (Brants et al. 2007) — the next
    // model order above q247's unigram proxy, and the first one where
    // train/eval separation matters: the model is COUNTED ON THE TRAIN
    // SPLIT ONLY (q168's Knuth-hash split), so eval-doc bigrams genuinely
    // back off (unseen bigram -> 0.4 * c1(w2)/N; unseen unigram -> the
    // 1e-9 floor, identical literal in both engines). Score = mean log S
    // per eval doc, rolled up per language with integer backoff/OOV
    // counts as the float-free part of the gate.
    //
    // Scale: bigram extraction is a per-row zip_with over the token
    // array (zero shuffle); the model tables are corpus-derived and join
    // by hash on their keys (vocab and bigram-vocab are heavy-tailed —
    // NOT broadcast); the train-total is a broadcast 1-row aggregate.
    "q248_bigram_backoff" -> ((s, d) => {
      val knuth = (col("doc_id").bitwiseAND(lit(2147483647L)) *
        lit(2654435761L)) % lit(4294967296L) % 100
      val base = t(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .withColumn("split", when(knuth < 80, "train").otherwise("eval"))
        .withColumn("a", filter(
          split(regexp_replace(trim(lower(col("text"))), "[^a-z0-9 ]", ""),
            " +"), w => w =!= ""))
      val uni = base.select(col("split"), explode(col("a")).as("w"))
      val trainUni = uni.filter(col("split") === "train")
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val nTrain = trainUni.agg(sum(col("c1")).cast("double").as("n_train"))
      val bg = base.filter(size(col("a")) >= 2)
        .select(col("doc_id"), col("lang"), col("split"),
          explode(zip_with(
            slice(col("a"), lit(1), size(col("a")) - 1),
            slice(col("a"), lit(2), size(col("a")) - 1),
            (x, y) => struct(x.as("w1"), y.as("w2")))).as("z"))
        .select(col("doc_id"), col("lang"), col("split"),
          col("z.w1"), col("z.w2"))
      val trainBig = bg.filter(col("split") === "train")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val scored = bg.filter(col("split") === "eval")
        .join(trainBig, Seq("w1", "w2"), "left")
        .join(trainUni.select(col("w").as("w1"), col("c1").as("c1w1")),
          Seq("w1"), "left")
        .join(trainUni.select(col("w").as("w2"), col("c1").as("c1w2")),
          Seq("w2"), "left")
        .crossJoin(broadcast(nTrain))
        .select(col("doc_id"), col("lang"),
          col("c2").isNull.as("backed"),
          (col("c2").isNull && col("c1w2").isNull).as("oov"),
          log(greatest(
            when(col("c2").isNotNull, col("c2") / col("c1w1"))
              .otherwise(lit(0.4) * coalesce(col("c1w2"), lit(0L)) /
                col("n_train")),
            lit(1e-9))).as("log_s"))
      scored.groupBy(col("doc_id"), col("lang"))
        .agg(avg(col("log_s")).as("mls"),
          sum(when(col("backed"), 1L).otherwise(0L)).as("nb"),
          sum(when(col("oov"), 1L).otherwise(0L)).as("no"),
          count(lit(1)).as("nbg"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("mls")), 4).as("avg_logscore"),
          sum(col("nb")).as("n_backoff"),
          sum(col("no")).as("n_oov"),
          sum(col("nbg")).as("n_bigrams"))
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
    "q248_bigram_backoff" ->
      """WITH d AS (
           SELECT doc_id, lang,
                  CASE WHEN ((doc_id & 2147483647) * 2654435761)
                            % 4294967296 % 100 < 80
                       THEN 'train' ELSE 'eval' END AS split,
                  list_filter(string_split_regex(regexp_replace(
                    trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +'),
                    w -> w <> '') AS a
           FROM documents WHERE length(trim(text)) > 0),
         uni AS (SELECT split, unnest(a) AS w FROM d),
         tu AS (SELECT w, count(*) AS c1 FROM uni
                WHERE split = 'train' GROUP BY w),
         nt AS (SELECT sum(c1)::DOUBLE AS n_train FROM tu),
         bg AS (
           SELECT doc_id, lang, split, z[1] AS w1, z[2] AS w2
           FROM (SELECT doc_id, lang, split,
                        unnest(list_zip(a[:-2], a[2:])) AS z
                 FROM d WHERE len(a) >= 2)),
         scored AS (
           SELECT b.doc_id, b.lang,
                  tb.c2 IS NULL AS backed,
                  (tb.c2 IS NULL AND u2.c1 IS NULL) AS oov,
                  ln(greatest(
                    CASE WHEN tb.c2 IS NOT NULL
                         THEN tb.c2 / u1.c1
                         ELSE 0.4 * coalesce(u2.c1, 0) / nt.n_train END,
                    1e-9)) AS log_s
           FROM bg b
           LEFT JOIN (SELECT w1, w2, count(*) AS c2 FROM bg
                      WHERE split = 'train' GROUP BY w1, w2) tb
             ON b.w1 = tb.w1 AND b.w2 = tb.w2
           LEFT JOIN tu u1 ON b.w1 = u1.w
           LEFT JOIN tu u2 ON b.w2 = u2.w
           CROSS JOIN nt
           WHERE b.split = 'eval'),
         per_doc AS (
           SELECT doc_id, lang, avg(log_s) AS mls,
                  sum(CASE WHEN backed THEN 1 ELSE 0 END)::BIGINT AS nb,
                  sum(CASE WHEN oov THEN 1 ELSE 0 END)::BIGINT AS no,
                  count(*)::BIGINT AS nbg
           FROM scored GROUP BY doc_id, lang)
         SELECT lang, count(*)::BIGINT AS n_docs,
                round(avg(mls), 4) AS avg_logscore,
                sum(nb)::BIGINT AS n_backoff,
                sum(no)::BIGINT AS n_oov,
                sum(nbg)::BIGINT AS n_bigrams
         FROM per_doc GROUP BY lang""",
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
