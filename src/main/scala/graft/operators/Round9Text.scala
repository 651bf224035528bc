package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch K (q411-q413): PPMI word co-occurrence, cohort
  * lifetime-value curves, and asymmetric containment mining (the
  * quote/inclusion detector Jaccard misses). Hash-gated vs DuckDB.
  */
object Round9Text {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Positive PMI co-occurrence — the count-based word-association
    // matrix distributional semantics starts from (Church & Hanks
    // 1990): token pairs within a 4-token forward window, PPMI =
    // max(0, ln((c_ab/T) / ((c_a/N)(c_b/N)))), stopwords excluded,
    // pairs unordered. The pair explode is a PURE PROJECTION (nested
    // transform + flatten per token row — no self-join); the only
    // shuffles are the two grouped counts. Top-20 associations with
    // support >= 5.
    "q411_ppmi_cooccurrence" -> ((s, d) => {
      val stop = Seq("the", "a", "an", "of", "and", "to", "in", "is",
        "on", "for", "with", "as", "by", "at", "or", "it", "are",
        "was", "that", "this")
      val toks = graft.Stage(t(s, d, "documents")
        .select(col("doc_id"),
          split(lower(trim(col("text"))), "[^a-z0-9]+").as("tk"))
        .select(col("doc_id"),
          filter(col("tk"), x =>
            length(x) > 1 && !x.isin(stop: _*)).as("tk")),
        "q411_toks")
      val uni = toks.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val nTok = uni.agg(sum(col("cw")).as("n"))
      val pairs = toks.select(explode(expr(
        """flatten(transform(tk, (x, i) ->
             transform(slice(tk, i + 2, 4), y ->
               named_struct('a', least(x, y), 'b', greatest(x, y)))))"""))
        .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5 && col("a") =!= col("b"))
      val tPairs = pairs.agg(sum(col("cab")).as("tp"))
      pairs
        .join(uni.select(col("w").as("a"), col("cw").as("ca")), "a")
        .join(uni.select(col("w").as("b"), col("cw").as("cb")), "b")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(tPairs))
        .select(col("a"), col("b"), col("cab"),
          round(greatest(lit(0.0),
            log((col("cab").cast("double") / col("tp"))
              / ((col("ca").cast("double") / col("n"))
                 * (col("cb").cast("double") / col("n"))))), 4)
            .as("ppmi"))
        .orderBy(col("ppmi").desc, col("a"), col("b")).limit(20)
    }),

    // Cohort lifetime-value curves — cumulative revenue per signup-week
    // cohort by age-in-weeks, absolute and per-user milli-cents: the
    // payback chart next to q262's retention grid. One user-keyed pass
    // for cohorts, one (cohort, age) aggregate, a cumulative window
    // over the bounded week grid.
    "q412_cohort_ltv" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cohorts = ev.groupBy(col("user_id"))
        .agg((unix_date(min(col("ts")).cast("date")) / 7).cast("long")
          .as("cweek"))
      val sizes = cohorts.groupBy(col("cweek"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohorts, "user_id")
        .groupBy(col("cweek"),
          ((unix_date(col("ts").cast("date")) / 7).cast("long")
            - col("cweek")).as("age_weeks"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("wk_cents"))
      val wCum = Window.partitionBy(col("cweek")).orderBy(col("age_weeks"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_cents", sum(col("wk_cents")).over(wCum))
        .join(sizes, "cweek")
        .select(col("cweek"), col("age_weeks"), col("n_users"),
          col("cum_cents"),
          expr("cum_cents * 1000 DIV n_users").as("ltv_milli_per_user"))
        .orderBy(col("cweek"), col("age_weeks"))
    }),

    // Asymmetric containment mining — |A ∩ B| / |A| over distinct
    // 5-gram sets: the quote / template-inclusion detector that
    // symmetric Jaccard (q41/q390) misses when a small doc is wholly
    // contained in a large one. Same one-join-on-the-gram-hash shape
    // as q390 (pairs form only through co-occurring grams); emits the
    // top pairs by the SMALLER side's containment.
    "q413_containment_pairs" -> ((s, d) => {
      val grams = graft.Stage(t(s, d, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("tk")) - 5),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(5))))).as("g"))
        .select(col("doc_id"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .distinct(), "q413_grams")
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      grams.as("x").join(grams.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter") >= 10)
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")),
          "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")),
          "d2")
        .select(col("d1"), col("d2"), col("inter"),
          expr("inter * 1000000 DIV least(sz1, sz2)")
            .as("containment_ppm"),
          expr("inter * 1000000 DIV (sz1 + sz2 - inter)")
            .as("jaccard_ppm"))
        .orderBy(col("containment_ppm").desc, col("d1"), col("d2"))
        .limit(20)
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q411_ppmi_cooccurrence" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)),
                    '[^a-z0-9]+'),
                    x -> len(x) > 1 AND x NOT IN ('the','a','an','of',
                      'and','to','in','is','on','for','with','as','by',
                      'at','or','it','are','was','that','this')) AS tk
           FROM documents),
         uni AS (
           SELECT w, count(*)::BIGINT AS cw
           FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
         n AS (SELECT sum(cw)::BIGINT AS n FROM uni),
         pairs AS (
           SELECT least(a, b) AS a, greatest(a, b) AS b,
                  count(*)::BIGINT AS cab
           FROM (
             SELECT tk[i + 1] AS a, tk[i + 1 + j.range] AS b
             FROM toks,
                  unnest(generate_series(0, len(tk) - 1)) t(i),
                  range(1, 5) j
             WHERE i + 1 + j.range <= len(tk))
           GROUP BY 1, 2
           HAVING count(*) >= 5 AND least(a, b) <> greatest(a, b))
         , tp AS (SELECT sum(cab)::BIGINT AS tp FROM pairs)
         SELECT p.a, p.b, p.cab,
                round(greatest(0.0,
                  ln((p.cab::DOUBLE / tp)
                     / ((ua.cw::DOUBLE / n.n)
                        * (ub.cw::DOUBLE / n.n)))), 4) AS ppmi
         FROM pairs p
         JOIN uni ua ON ua.w = p.a
         JOIN uni ub ON ub.w = p.b
         CROSS JOIN n CROSS JOIN tp
         ORDER BY ppmi DESC, p.a, p.b LIMIT 20""",
    "q412_cohort_ltv" ->
      """WITH cohorts AS (
           SELECT user_id,
                  date_diff('day', DATE '1970-01-01',
                    min(ts::TIMESTAMP)::DATE) // 7 AS cweek
           FROM events GROUP BY user_id),
         sizes AS (
           SELECT cweek, count(DISTINCT user_id)::BIGINT AS n_users
           FROM cohorts GROUP BY cweek),
         rev AS (
           SELECT c.cweek,
                  date_diff('day', DATE '1970-01-01',
                    e.ts::TIMESTAMP::DATE) // 7 - c.cweek AS age_weeks,
                  sum(floor(e.value * 100)::BIGINT)::BIGINT AS wk_cents
           FROM events e JOIN cohorts c ON c.user_id = e.user_id
           WHERE e.event_type = 'purchase'
           GROUP BY 1, 2),
         cum AS (
           SELECT cweek, age_weeks, wk_cents,
                  (sum(wk_cents) OVER (PARTITION BY cweek
                    ORDER BY age_weeks
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    ::BIGINT AS cum_cents
           FROM rev)
         SELECT cweek::BIGINT AS cweek, age_weeks::BIGINT AS age_weeks,
                n_users, cum_cents,
                (cum_cents * 1000 // n_users)::BIGINT
                  AS ltv_milli_per_user
         FROM cum JOIN sizes USING (cweek)
         ORDER BY cweek, age_weeks""",
    "q413_containment_pairs" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
           FROM documents
           WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
         grams AS (
           SELECT DISTINCT doc_id,
                  ('0x' || substr(md5(array_to_string(
                     tk[i+1 : i+5], ' ')), 1, 15))::BIGINT AS h
           FROM docs, unnest(generate_series(0, len(tk) - 5)) t(i)),
         sizes AS (
           SELECT doc_id, count(*)::BIGINT AS sz FROM grams
           GROUP BY doc_id),
         inter AS (
           SELECT x.doc_id AS d1, y.doc_id AS d2,
                  count(*)::BIGINT AS inter
           FROM grams x JOIN grams y
             ON x.h = y.h AND x.doc_id < y.doc_id
           GROUP BY 1, 2
           HAVING count(*) >= 10)
         SELECT d1, d2, inter,
                (inter * 1000000 // least(s1.sz, s2.sz))::BIGINT
                  AS containment_ppm,
                (inter * 1000000 // (s1.sz + s2.sz - inter))::BIGINT
                  AS jaccard_ppm
         FROM inter
         JOIN sizes s1 ON s1.doc_id = d1
         JOIN sizes s2 ON s2.doc_id = d2
         ORDER BY containment_ppm DESC, d1, d2 LIMIT 20"""
  )
}
