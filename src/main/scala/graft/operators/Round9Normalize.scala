package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BE (q565-q567) — distribution alignment and corpus
  * statistics (public algorithms: quantile normalization
  * [Bolstad et al. 2003], Heaps'-law vocabulary growth + the simple
  * Good-Turing unseen-mass estimate [Heaps 1978; Gale-Sampson 1995],
  * and weighted Jaccard similarity on count vectors [Ioffe 2010 gives
  * the sketch; here the exact min/max-sum form]):
  *
  *  - q565: quantile normalization of per-source document lengths —
  *    each source's decile values read off a VALUE-GRAIN cumulative
  *    histogram (nearest-rank via cum-count, the q539 discipline —
  *    never a per-source row sort), the reference distribution =
  *    integer mean of the source deciles, and the per-source shift
  *    the normalization would apply. The cross-source feature
  *    alignment step of a mixing pipeline.
  *  - q566: corpus vocabulary statistics per source: token count N,
  *    vocab V, hapax count N1, Good-Turing unseen mass N1/N in ppm,
  *    and the pooled Heaps-law fit ln V = ln k + β ln N by exact-
  *    moment OLS over the 20 source points (β in milli). The sizing
  *    arithmetic a tokenizer-training plan starts from.
  *  - q567: weighted Jaccard between source token-count vectors —
  *    Σ min(c_A, c_B) / Σ max(c_A, c_B) on the token grain, exact
  *    integers end-to-end via a full outer join per source pair
  *    (|sources|² bounded pair set, one token shuffle), top-15 most
  *    similar pairs. The corpus-overlap readout that decides whether
  *    two crawls should be deduped jointly.
  */
object Round9Normalize {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q565_quantile_normalization" -> ((s, d) => {
      val hist = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
      val wS = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = graft.Stage(hist
        .withColumn("cum", sum(col("cnt")).over(wS)), "q565_cum")
      val ns = hist.groupBy(col("source"))
        .agg(sum(col("cnt")).as("ns"))
      val decs = broadcast(s.range(1, 10)
        .select(col("id").as("dec")))
      // nearest-rank decile: smallest value whose cum count reaches
      // rank 1 + (ns-1)·d/10 — a bounded join on the value grain
      val targets = ns.crossJoin(decs)
        .select(col("source"), col("dec"),
          expr("1 + (ns - 1) * dec DIV 10").as("r"))
      val srcQ = targets
        .join(cum, Seq("source"))
        .filter(col("cum") >= col("r"))
        .groupBy(col("source"), col("dec"))
        .agg(min(col("n_chars")).as("src_q"))
      val ref = srcQ.groupBy(col("dec"))
        .agg(expr("sum(src_q) DIV count(*)").as("ref_q"))
      srcQ.join(broadcast(ref), Seq("dec"))
        .select(col("source"), col("dec"), col("src_q"), col("ref_q"),
          (col("ref_q") - col("src_q")).as("shift_chars"))
        .orderBy(col("source"), col("dec"))
    }),

    "q566_vocab_statistics" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("source"), explode(expr(
          """filter(split(regexp_replace(trim(lower(text)),
             '[^a-z0-9 ]', ''), ' +'), x -> x <> '')""")).as("tok"))
      val tf = graft.Stage(toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c")), "q566_tf")
      val perSrc = tf.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
        .withColumn("unseen_mass_ppm",
          expr("hapax * 1000000 DIV n_tokens"))
      // pooled Heaps fit over the source points: β and ln k by OLS
      // on (ln N, ln V); the 20-point regression is one fixed-shape
      // aggregate, coefficients quantized to milli
      val fit = perSrc.agg(count(lit(1)).as("np"),
        sum(expr("ln(CAST(n_tokens AS DOUBLE))")).as("sx"),
        sum(expr("ln(CAST(vocab AS DOUBLE))")).as("sy"),
        sum(expr("ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))"))
          .as("sxy"),
        sum(expr("ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE))"))
          .as("sxx"))
        .select(
          expr("""CAST(floor((np * sxy - sx * sy) * 1000
                  / (np * sxx - sx * sx)) AS BIGINT)""")
            .as("heaps_beta_milli"),
          expr("""CAST(floor((sy - (np * sxy - sx * sy)
                  / (np * sxx - sx * sx) * sx) / np * 1000)
                  AS BIGINT)""").as("heaps_lnk_milli"))
      perSrc.crossJoin(broadcast(fit))
        .select(col("source"), col("n_tokens"), col("vocab"),
          col("hapax"), col("unseen_mass_ppm"),
          col("heaps_beta_milli"), col("heaps_lnk_milli"))
        .orderBy(col("source"))
    }),

    "q567_weighted_jaccard_sources" -> ((s, d) => {
      val tf = graft.Stage(t(s, d, "documents")
        .select(col("source"), explode(expr(
          """filter(split(regexp_replace(trim(lower(text)),
             '[^a-z0-9 ]', ''), ' +'), x -> x <> '')""")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c")), "q566_tf")
      val a = tf.select(col("source").as("sa"), col("tok"),
        col("c").as("ca"))
      val b = tf.select(col("source").as("sb"), col("tok"),
        col("c").as("cb"))
      val pairs = a.join(b, Seq("tok"), "inner")
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(sum(least(col("ca"), col("cb"))).as("smin"),
          sum(greatest(col("ca"), col("cb"))).as("smax_shared"))
      val totals = tf.groupBy(col("source"))
        .agg(sum(col("c")).as("tot"))
      // Σmax over ALL tokens = ta + tb − smin (shared tokens
      // contribute max = ca + cb − min; exclusives their full count)
      val j = pairs
        .join(broadcast(totals.select(col("source").as("sa"),
          col("tot").as("ta"))), Seq("sa"))
        .join(broadcast(totals.select(col("source").as("sb"),
          col("tot").as("tb"))), Seq("sb"))
        .select(col("sa"), col("sb"), col("smin"),
          (col("ta") + col("tb") - col("smin") - col("smax_shared"))
            .as("excl"),
          expr("""smin * 1000000
                  DIV (ta + tb - smin)""").as("wjaccard_ppm"))
      val wAll = Window.orderBy(col("wjaccard_ppm").desc, col("sa"),
        col("sb"))
      j.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 15)
        .select(col("sa"), col("sb"), col("smin"), col("excl"),
          col("wjaccard_ppm"), col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q565_quantile_normalization" ->
      """WITH hist AS (
           SELECT source, n_chars, count(*)::BIGINT AS cnt
           FROM documents GROUP BY source, n_chars),
         cum AS (
           SELECT source, n_chars, cnt,
                  sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM hist),
         ns AS (
           SELECT source, sum(cnt)::BIGINT AS ns FROM hist
           GROUP BY source),
         targets AS (
           SELECT n.source, d.range::BIGINT AS dec,
                  1 + (n.ns - 1) * d.range // 10 AS r
           FROM ns n, range(1, 10) d),
         srcq AS (
           SELECT t.source, t.dec, min(c.n_chars)::BIGINT AS src_q
           FROM targets t JOIN cum c ON t.source = c.source
           WHERE c.cum >= t.r
           GROUP BY t.source, t.dec),
         ref AS (
           SELECT dec, (sum(src_q) // count(*))::BIGINT AS ref_q
           FROM srcq GROUP BY dec)
         SELECT s.source, s.dec, s.src_q, r.ref_q,
                (r.ref_q - s.src_q)::BIGINT AS shift_chars
         FROM srcq s JOIN ref r ON s.dec = r.dec
         ORDER BY s.source, s.dec""",

    "q566_vocab_statistics" ->
      """WITH toks AS (
           SELECT source, unnest(list_filter(string_split_regex(
                    regexp_replace(trim(lower(text)), '[^a-z0-9 ]',
                    '', 'g'), ' +'), x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT source, tok, count(*)::BIGINT AS c FROM toks
           GROUP BY source, tok),
         persrc AS (
           SELECT source, sum(c)::BIGINT AS n_tokens,
                  count(*)::BIGINT AS vocab,
                  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS hapax
           FROM tf GROUP BY source),
         withmass AS (
           SELECT *, (hapax * 1000000 // n_tokens)::BIGINT
                    AS unseen_mass_ppm
           FROM persrc),
         fit AS (
           SELECT count(*)::BIGINT AS np,
                  sum(ln(CAST(n_tokens AS DOUBLE))) AS sx,
                  sum(ln(CAST(vocab AS DOUBLE))) AS sy,
                  sum(ln(CAST(n_tokens AS DOUBLE))
                      * ln(CAST(vocab AS DOUBLE))) AS sxy,
                  sum(ln(CAST(n_tokens AS DOUBLE))
                      * ln(CAST(n_tokens AS DOUBLE))) AS sxx
           FROM persrc),
         coef AS (
           SELECT CAST(floor((np * sxy - sx * sy) * 1000
                    / (np * sxx - sx * sx)) AS BIGINT)
                    AS heaps_beta_milli,
                  CAST(floor((sy - (np * sxy - sx * sy)
                    / (np * sxx - sx * sx) * sx) / np * 1000)
                    AS BIGINT) AS heaps_lnk_milli
           FROM fit)
         SELECT w.source, w.n_tokens, w.vocab, w.hapax,
                w.unseen_mass_ppm, c.heaps_beta_milli,
                c.heaps_lnk_milli
         FROM withmass w, coef c ORDER BY w.source""",

    "q567_weighted_jaccard_sources" ->
      """WITH toks AS (
           SELECT source, unnest(list_filter(string_split_regex(
                    regexp_replace(trim(lower(text)), '[^a-z0-9 ]',
                    '', 'g'), ' +'), x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT source, tok, count(*)::BIGINT AS c FROM toks
           GROUP BY source, tok),
         pairs AS (
           SELECT a.source AS sa, b.source AS sb,
                  sum(least(a.c, b.c))::BIGINT AS smin,
                  sum(greatest(a.c, b.c))::BIGINT AS smax_shared
           FROM tf a JOIN tf b
             ON a.tok = b.tok AND a.source < b.source
           GROUP BY a.source, b.source),
         totals AS (
           SELECT source, sum(c)::BIGINT AS tot FROM tf
           GROUP BY source),
         j AS (
           SELECT p.sa, p.sb, p.smin,
                  (ta.tot + tb.tot - p.smin - p.smax_shared)::BIGINT
                    AS excl,
                  (p.smin * 1000000
                    // (ta.tot + tb.tot - p.smin))::BIGINT
                    AS wjaccard_ppm
           FROM pairs p
           JOIN totals ta ON p.sa = ta.source
           JOIN totals tb ON p.sb = tb.source),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY wjaccard_ppm DESC,
                    sa, sb) AS rk
           FROM j)
         SELECT sa, sb, smin, excl, wjaccard_ppm, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 15 ORDER BY rk"""
  )
}
