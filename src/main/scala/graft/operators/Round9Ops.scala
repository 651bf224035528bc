package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch A (q372-q376): k-fold cross-validation with
  * closed-form per-fold OLS, event-sequence perplexity under a
  * first-order Markov model, probability-calibration reliability bins
  * (Brier / per-bin confidence vs accuracy), Kaplan-Meier survival over
  * user lifetimes with right-censoring, and rendezvous-hash shard
  * assignment with rebalancing cost. All hash-gated vs DuckDB; every
  * randomized step uses the engine-independent Knuth multiplicative
  * hash recipe (q168) so the oracle replays it exactly.
  */
object Round9Ops {

  type Q = (SparkSession, String) => DataFrame

  /** Knuth multiplicative hash on a BIGINT key -> [0, 2^32): the
    * engine-portable determinism recipe shared with q168/q183.
    */
  private def knuth(key: org.apache.spark.sql.Column) =
    (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % lit(4294967296L)

  val queries: Seq[(String, Q)] = Seq(

    // k-fold cross-validation (the eval loop a training pipeline runs
    // before committing to a model): 5 deterministic hash-folds over
    // lineitem, per-fold OLS of extendedprice ~ quantity fit on the
    // OTHER four folds via closed-form leave-fold-out sums (total sums
    // minus the fold's own — ONE corpus scan for all five models, a
    // 5-row broadcast back, then per-row residuals aggregated per
    // fold). No per-fold re-scan, no MLlib iteration: at 100 TB this
    // is one pass + one 5-row join regardless of k.
    "q372_kfold_cv" -> ((s, d) => {
      val rows = t(s, d, "lineitem").select(
        (knuth(col("l_orderkey") * 10 + col("l_linenumber")) % 5)
          .cast("long").as("fold"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
      val perFold = rows.groupBy(col("fold")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val tot = perFold.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
        sum(col("sy")).as("tsy"), sum(col("sxx")).as("tsxx"),
        sum(col("sxy")).as("tsxy"))
      val coef = perFold.crossJoin(broadcast(tot)).select(col("fold"),
        ((col("tn") - col("n")) * (col("tsxy") - col("sxy"))
          - (col("tsx") - col("sx")) * (col("tsy") - col("sy"))).as("num"),
        ((col("tn") - col("n")) * (col("tsxx") - col("sxx"))
          - (col("tsx") - col("sx")) * (col("tsx") - col("sx"))).as("den"),
        (col("tn") - col("n")).as("ntr"),
        (col("tsx") - col("sx")).as("mx_n"),
        (col("tsy") - col("sy")).as("my_n"))
        .select(col("fold"), (col("num") / col("den")).as("slope"),
          ((col("my_n") - col("num") / col("den") * col("mx_n"))
            / col("ntr")).as("icept"))
      rows.join(broadcast(coef), "fold")
        .select(col("fold"),
          (col("y") - col("slope") * col("x") - col("icept")).as("r"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_test"),
          round(sqrt(avg(col("r") * col("r"))), 4).as("rmse"))
        .orderBy(col("fold"))
    }),

    // Event-sequence perplexity under a first-order Markov model — the
    // sequence analogue of q247's unigram surprise: global transition
    // probabilities with add-one smoothing over the event-type
    // vocabulary, then each user's mean negative log2 transition
    // probability. Bot/anomaly screening signal (too-predictable or
    // too-random sessions). Plan: per-user lag windows (bounded by the
    // user's own history), a V^2-row transition table broadcast back,
    // one aggregate — the corpus never shuffles twice.
    "q373_seq_perplexity" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val steps = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val vocab = steps.agg(countDistinct(col("cur")).as("v"))
      val trans = steps.groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val outdeg = trans.groupBy(col("cur")).agg(sum(col("c")).as("tot"))
      val probs = trans.join(outdeg, "cur").crossJoin(broadcast(vocab))
        .select(col("cur"), col("nxt"),
          ((col("c") + 1).cast("double")
            / (col("tot") + col("v"))).as("p"))
      steps.join(broadcast(probs), Seq("cur", "nxt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_steps"),
          round(avg(-log2(col("p"))), 4).as("avg_nll"))
        .orderBy(col("avg_nll").desc, col("user_id")).limit(20)
    }),

    // Probability-calibration reliability diagram + Brier score — the
    // classifier-eval staple q343-q346 omit: 10 equal-width confidence
    // bins, per-bin mean confidence vs observed positive rate (the ECE
    // summands) and the global Brier score on every row. The
    // "prediction" is a deterministic hash-derived pseudo-probability
    // and the label its thresholded value, so both engines replay the
    // exact same score stream. One scan, one 10-row aggregate.
    "q374_calibration_bins" -> ((s, d) => {
      val scored = t(s, d, "events").select(
        (knuth(col("event_id")).cast("double") / 4294967296.0).as("p"),
        when(col("value") >= 100.0, 1.0).otherwise(0.0).as("y"))
      scored
        .groupBy(least(floor(col("p") * 10), lit(9L)).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("p")), 4).as("conf"),
          round(avg(col("y")), 4).as("acc"),
          round(avg((col("p") - col("y")) * (col("p") - col("y"))), 4)
            .as("brier"))
        .orderBy(col("bin"))
    }),

    // Kaplan-Meier survival estimator — time-to-event with RIGHT
    // CENSORING, which q262's cohort grid cannot express: duration =
    // days from a user's first event to their first high-value
    // purchase (value >= 150); users who never reach one are censored
    // at the observation horizon, contributing to the risk sets but
    // never to the death counts. Durations are day-grain, so the risk
    // table is calendar-bounded: the cumulative product
    // S(t) = prod(1 - d/n) runs as one window over the <=60-row
    // duration aggregate (the q358 bounded-day-grain pattern), never
    // over the corpus.
    "q375_kaplan_meier" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"),
          col("event_type"), col("value"))
      val horizon = ev.agg(max(col("day")).as("end_day"))
      val users = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"),
          min(when(col("event_type") === "purchase" &&
            col("value") >= 150.0, col("day"))).as("conv_day"))
        .crossJoin(broadcast(horizon))
        .select(
          datediff(coalesce(col("conv_day"), col("end_day")),
            col("first_day")).cast("long").as("life"),
          col("conv_day").isNull.as("censored"))
      val byLife = users.groupBy(col("life"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(!col("censored"), 1L).otherwise(0L)).as("d"))
      val wOrd = Window.orderBy(col("life"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byLife
        .withColumn("n_risk",
          sum(col("n_total")).over(
            Window.orderBy(col("life"))
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .withColumn("surv",
          exp(sum(log(lit(1.0) - col("d").cast("double") / col("n_risk")))
            .over(wOrd)))
        .filter(col("d") > 0)
        .select(col("life"), col("n_risk"), col("d"),
          round(col("surv"), 4).as("survival"))
        .orderBy(col("life"))
    }),

    // Rendezvous (highest-random-weight) sharding + rebalancing cost —
    // the data-ops operator behind consistent shard assignment at
    // 100 TB: each doc picks the shard with the highest portable hash
    // weight; growing the ring 8 -> 9 shards moves only the docs whose
    // new shard wins (HRW's ~1/9 movement optimum, vs ~8/9 for mod-N).
    // The argmax runs as a codegen'd higher-order fold per row — a pure
    // projection, zero shuffle before the 8-row rollup.
    "q376_rendezvous_sharding" -> ((s, d) => {
      def pick(nShards: Int) =
        s"""aggregate(sequence(0L, ${nShards - 1}L),
              named_struct('s', -1L, 'w', -1L),
              (acc, x) -> CASE WHEN
                  (doc_id * 31 + x) % 2147483648L * 2654435761L
                    % 4294967296L > acc.w
                THEN named_struct('s', x,
                  'w', (doc_id * 31 + x) % 2147483648L * 2654435761L
                    % 4294967296L)
                ELSE acc END).s"""
      t(s, d, "documents").select(col("doc_id"),
          expr(pick(8)).as("shard_old"), expr(pick(9)).as("shard_new"))
        .groupBy(col("shard_old").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard_old") =!= col("shard_new"), 1L)
            .otherwise(0L)).as("n_moved"))
        .orderBy(col("shard"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q372_kfold_cv" ->
      """WITH rows_ AS (
           SELECT ((l_orderkey * 10 + l_linenumber) % 2147483648
                   * 2654435761) % 4294967296 % 5 AS fold,
                  l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y
           FROM lineitem),
         pf AS (
           SELECT fold, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM rows_ GROUP BY fold),
         tot AS (
           SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
                  sum(sxx) AS tsxx, sum(sxy) AS tsxy
           FROM pf),
         coef AS (
           SELECT fold,
                  ((tn-n)*(tsxy-sxy) - (tsx-sx)*(tsy-sy))
                    / ((tn-n)*(tsxx-sxx) - (tsx-sx)*(tsx-sx)) AS slope,
                  ((tsy-sy) - ((tn-n)*(tsxy-sxy) - (tsx-sx)*(tsy-sy))
                    / ((tn-n)*(tsxx-sxx) - (tsx-sx)*(tsx-sx)) * (tsx-sx))
                    / (tn-n) AS icept
           FROM pf CROSS JOIN tot)
         SELECT r.fold, count(*)::BIGINT AS n_test,
                round(sqrt(avg((y - slope*x - icept)
                              * (y - slope*x - icept))), 4) AS rmse
         FROM rows_ r JOIN coef USING (fold)
         GROUP BY r.fold ORDER BY r.fold""",
    "q373_seq_perplexity" ->
      """WITH steps AS (
           SELECT user_id, event_type AS cur,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts::TIMESTAMP, event_id) AS nxt
           FROM events),
         st AS (SELECT * FROM steps WHERE nxt IS NOT NULL),
         v AS (SELECT count(DISTINCT cur) AS v FROM st),
         trans AS (
           SELECT cur, nxt, count(*) AS c FROM st GROUP BY cur, nxt),
         outdeg AS (SELECT cur, sum(c)::BIGINT AS tot FROM trans
                    GROUP BY cur),
         probs AS (
           SELECT t.cur, t.nxt,
                  (t.c + 1)::DOUBLE / (o.tot + (SELECT v FROM v)) AS p
           FROM trans t JOIN outdeg o USING (cur))
         SELECT user_id, count(*)::BIGINT AS n_steps,
                round(avg(-log2(p)), 4) AS avg_nll
         FROM st JOIN probs USING (cur, nxt)
         GROUP BY user_id
         ORDER BY avg_nll DESC, user_id LIMIT 20""",
    "q374_calibration_bins" ->
      """WITH scored AS (
           SELECT (event_id % 2147483648 * 2654435761 % 4294967296)
                    ::DOUBLE / 4294967296 AS p,
                  CASE WHEN value >= 100.0 THEN 1.0 ELSE 0.0 END AS y
           FROM events)
         SELECT least(floor(p * 10), 9)::BIGINT AS bin,
                count(*)::BIGINT AS n,
                round(avg(p), 4) AS conf,
                round(avg(y), 4) AS acc,
                round(avg((p - y) * (p - y)), 4) AS brier
         FROM scored GROUP BY 1 ORDER BY bin""",
    "q375_kaplan_meier" ->
      """WITH ev AS (
           SELECT user_id, ts::TIMESTAMP::DATE AS day, event_type, value
           FROM events),
         horizon AS (SELECT max(day) AS end_day FROM ev),
         users AS (
           SELECT date_diff('day', min(day),
                    coalesce(min(CASE WHEN event_type = 'purchase'
                        AND value >= 150.0 THEN day END),
                      (SELECT end_day FROM horizon)))::BIGINT AS life,
                  min(CASE WHEN event_type = 'purchase'
                      AND value >= 150.0 THEN day END) IS NULL
                    AS censored
           FROM ev GROUP BY user_id),
         by_life AS (
           SELECT life, count(*)::BIGINT AS n_total,
                  sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT
                    AS d
           FROM users GROUP BY life),
         risk AS (
           SELECT life, n_total, d,
                  sum(n_total) OVER (ORDER BY life
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    ::BIGINT AS n_risk
           FROM by_life),
         km AS (
           SELECT life, n_risk, d,
                  exp(sum(ln(1 - d::DOUBLE / n_risk))
                      OVER (ORDER BY life
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)) AS surv
           FROM risk)
         SELECT life, n_risk, d, round(surv, 4) AS survival
         FROM km WHERE d > 0 ORDER BY life""",
    "q376_rendezvous_sharding" ->
      """WITH w AS (
           SELECT doc_id, i.range AS s,
                  (doc_id * 31 + i.range) % 2147483648
                    * 2654435761 % 4294967296 AS wt
           FROM documents CROSS JOIN range(9) i),
         pick8 AS (
           SELECT doc_id, s AS shard_old FROM (
             SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
               ORDER BY wt DESC, s) AS rn
             FROM w WHERE s < 8) WHERE rn = 1),
         pick9 AS (
           SELECT doc_id, s AS shard_new FROM (
             SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
               ORDER BY wt DESC, s) AS rn
             FROM w) WHERE rn = 1)
         SELECT shard_old AS shard, count(*)::BIGINT AS n_docs,
                sum(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END)
                  ::BIGINT AS n_moved
         FROM pick8 JOIN pick9 USING (doc_id)
         GROUP BY 1 ORDER BY shard"""
  )
}
