package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AC (q481-q483) — uplift + point-process signals:
  *
  *  - q481: uplift Qini-lite — treated (user_id odd) vs control
  *    conversion by score decile (score = per-user mean value),
  *    cumulative incremental conversions down the ranking. Deciles
  *    come from ntile over the per-user summary (users are
  *    dimension-sized vs events; the 100 TB form swaps in the q343
  *    ExactSelection boundaries). Everything else is exact integer
  *    arithmetic.
  *  - q482: Markov transition entropy — H(next type | current type)
  *    per current type from bigram counts (lead over per-user
  *    streams), plus the predictability gap vs the uniform maximum.
  *    ln on exact ratios, milli-quantized.
  *  - q483: burstiness — per event type: interarrival coefficient
  *    of variation (CV, from exact first/second moments of lagged
  *    gaps) and the burstiness index B = (cv-1)/(cv+1); Poisson
  *    streams score B ~ 0, bursty streams -> 1.
  */
object Round9Signals {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q481_uplift_qini" -> ((s, d) => {
      // exact cent sums -> the ranking key is order-deterministic
      // (a double sum's addition order is not)
      val users = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg((sum(floor(col("value") * 100).cast("long")) /
            count(lit(1)).cast("double")).as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .withColumn("treated", (col("user_id") % 2).cast("int"))
      // decile by score over the user summary (dimension-sized)
      val ranked = users.withColumn("dec",
        ntile(10).over(Window.orderBy(col("score").desc,
          col("user_id"))))
      val byDec = ranked.groupBy(col("dec"))
        .agg(sum(when(col("treated") === 1, 1L).otherwise(0L))
            .as("n_t"),
          sum(when(col("treated") === 1, col("conv")).otherwise(0L))
            .as("c_t"),
          sum(when(col("treated") === 0, 1L).otherwise(0L))
            .as("n_c"),
          sum(when(col("treated") === 0, col("conv")).otherwise(0L))
            .as("c_c"))
      val wCum = Window.orderBy(col("dec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDec
        .withColumn("cum_ct", sum(col("c_t")).over(wCum))
        .withColumn("cum_nt", sum(col("n_t")).over(wCum))
        .withColumn("cum_cc", sum(col("c_c")).over(wCum))
        .withColumn("cum_nc", sum(col("n_c")).over(wCum))
        // Qini: cumulative treated conversions minus control scaled
        // to the treated exposure, in milli-conversions (NULL until
        // a control user enters the ranking — tiny-SF edge)
        .withColumn("qini_milli", when(col("cum_nc") > 0,
          floor(lit(1000.0) *
            (col("cum_ct") - col("cum_cc") * col("cum_nt") /
              col("cum_nc").cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")))
        .select(col("dec"), col("n_t"), col("c_t"), col("n_c"),
          col("c_c"), col("qini_milli"))
        .orderBy(col("dec"))
    }),

    "q482_transition_entropy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val bigrams = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      val totals = bigrams.groupBy(col("cur"))
        .agg(sum(col("n")).as("tot"),
          count(lit(1)).as("n_targets"))
      bigrams.join(broadcast(totals), "cur")
        .withColumn("p", col("n") / col("tot").cast("double"))
        .withColumn("term", -col("p") * log(col("p")))
        .groupBy(col("cur"), col("tot"), col("n_targets"))
        .agg(floor(sum(col("term")) * 1000).cast("long")
          .as("entropy_milli"))
        .withColumn("max_entropy_milli",
          floor(log(col("n_targets").cast("double")) * 1000)
            .cast("long"))
        .withColumn("predictability_milli",
          col("max_entropy_milli") - col("entropy_milli"))
        .select(col("cur"), col("tot").as("n_transitions"),
          col("entropy_milli"), col("max_entropy_milli"),
          col("predictability_milli"))
        .orderBy(col("cur"))
    }),

    "q483_burstiness" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = t(s, d, "events")
        .select(col("event_type"), col("ts"), col("event_id"))
        .withColumn("gap",
          unix_timestamp(col("ts")) -
            unix_timestamp(lag(col("ts"), 1).over(w)))
        .filter(col("gap").isNotNull)
      gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("gap")).as("sg"),
          sum(col("gap") * col("gap")).as("sgg"))
        .withColumn("mean_s", col("sg") / col("n").cast("double"))
        .withColumn("cv", sqrt(col("sgg") / col("n") -
          (col("sg") / col("n")) * (col("sg") / col("n"))) /
          (col("sg") / col("n")))
        .select(col("event_type"), col("n").as("n_gaps"),
          floor(col("mean_s")).cast("long").as("mean_gap_s"),
          floor(col("cv") * 1000).cast("long").as("cv_milli"),
          floor((col("cv") - 1) / (col("cv") + 1) * 1000)
            .cast("long").as("burstiness_milli"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q481_uplift_qini" ->
      """WITH users AS (
           SELECT user_id,
                  sum(floor(value * 100)::BIGINT)
                    / CAST(count(*) AS DOUBLE) AS score,
                  max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END)::BIGINT AS conv,
                  (user_id % 2)::INT AS treated
           FROM events GROUP BY user_id),
         ranked AS (
           SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id)
             AS dec
           FROM users),
         by_dec AS (
           SELECT dec,
                  sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_t,
                  sum(CASE WHEN treated = 1 THEN conv ELSE 0
                      END)::BIGINT AS c_t,
                  sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)::BIGINT
                    AS n_c,
                  sum(CASE WHEN treated = 0 THEN conv ELSE 0
                      END)::BIGINT AS c_c
           FROM ranked GROUP BY dec),
         cum AS (
           SELECT dec, n_t, c_t, n_c, c_c,
                  sum(c_t) OVER wc AS cum_ct,
                  sum(n_t) OVER wc AS cum_nt,
                  sum(c_c) OVER wc AS cum_cc,
                  sum(n_c) OVER wc AS cum_nc
           FROM by_dec
           WINDOW wc AS (ORDER BY dec ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW))
         SELECT dec, n_t, c_t, n_c, c_c,
                (CASE WHEN cum_nc > 0
                 THEN floor(1000.0 * (cum_ct - cum_cc * cum_nt
                   / CAST(cum_nc AS DOUBLE)))
                 ELSE NULL END)::BIGINT AS qini_milli
         FROM cum ORDER BY dec""",

    "q482_transition_entropy" ->
      """WITH ev AS (
           SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                  event_type AS cur
           FROM events),
         bigrams AS (
           SELECT cur, nxt, count(*)::BIGINT AS n FROM (
             SELECT cur, lead(cur) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
             FROM ev) q
           WHERE nxt IS NOT NULL GROUP BY cur, nxt),
         totals AS (
           SELECT cur, sum(n)::BIGINT AS tot,
                  count(*)::BIGINT AS n_targets
           FROM bigrams GROUP BY cur),
         terms AS (
           SELECT b.cur, t.tot, t.n_targets,
                  -(b.n / CAST(t.tot AS DOUBLE))
                    * ln(b.n / CAST(t.tot AS DOUBLE)) AS term
           FROM bigrams b JOIN totals t ON b.cur = t.cur)
         SELECT cur, tot AS n_transitions,
                floor(sum(term) * 1000)::BIGINT AS entropy_milli,
                floor(ln(CAST(n_targets AS DOUBLE)) * 1000)::BIGINT
                  AS max_entropy_milli,
                (floor(ln(CAST(n_targets AS DOUBLE)) * 1000)
                  - floor(sum(term) * 1000))::BIGINT
                  AS predictability_milli
         FROM terms GROUP BY cur, tot, n_targets
         ORDER BY cur""",

    "q483_burstiness" ->
      """WITH gaps AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP))::BIGINT
                    - floor(epoch(lag(ts::TIMESTAMP) OVER (
                        PARTITION BY event_type
                        ORDER BY ts::TIMESTAMP, event_id)))::BIGINT
                    AS gap
           FROM events),
         agg AS (
           SELECT event_type, count(*)::BIGINT AS n,
                  sum(gap)::BIGINT AS sg, sum(gap * gap) AS sgg
           FROM gaps WHERE gap IS NOT NULL GROUP BY event_type),
         cvd AS (
           SELECT event_type, n, sg,
                  sqrt(sgg / n - (CAST(sg AS DOUBLE) / n)
                    * (CAST(sg AS DOUBLE) / n))
                    / (CAST(sg AS DOUBLE) / n) AS cv
           FROM agg)
         SELECT event_type, n AS n_gaps,
                floor(CAST(sg AS DOUBLE) / n)::BIGINT AS mean_gap_s,
                floor(cv * 1000)::BIGINT AS cv_milli,
                floor((cv - 1) / (cv + 1) * 1000)::BIGINT
                  AS burstiness_milli
         FROM cvd ORDER BY event_type"""
  )
}
