package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch N (q434-q436): the ML-ops loop around a trained
  * policy/model that earlier rounds' eval family (q343-q346, q374,
  * q377) feeds into:
  *
  *  - q434: inverse-propensity-score OFFLINE policy evaluation
  *    (Horvitz-Thompson / counterfactual "what would the new policy
  *    have earned on the logged traffic" — Li et al., WSDM'11 replay),
  *    with the direct-method estimate alongside,
  *  - q435: information-gain feature ranking (the entropy sibling of
  *    q415's Gini best-split finder) over unpivoted features,
  *  - q436: multi-window SLO error-budget burn-rate alerting (the
  *    1-day fast / 7-day slow window pattern), the paging layer above
  *    q423's EWMA chart and q360's CUSUM.
  *
  * IPS stays exact: matched rewards are grouped per segment first, so
  * the single integer division per segment happens on exact sums
  * (reward micros x segment counts), never per row. Every corpus-scale
  * stage is one keyed aggregate; policy/ranking/alert logic runs on
  * bounded rows (10 segments, <=4 features, day grain).
  */
object Round9MlOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Logged bandit replay: context = user segment (user_id % 10),
    // action = event_type, reward = value micros. The target policy is
    // argmax of the TRAIN half's average reward (tie-break on action
    // name); it is evaluated on the EVAL half with empirical logging
    // propensities. Per segment: IPS value = sum(matched reward) *
    // n_seg / n_seg_action (exact integers, one DIV), DM value = eval
    // average of the chosen action.
    "q434_ips_policy_eval" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        (col("user_id") % 10).as("seg"), col("event_type").as("action"),
        floor(col("value") * 1000000).cast("long").as("r"),
        (col("event_id") % 2).as("half"))
      val trainSegAct = ev.filter(col("half") === 0)
        .groupBy(col("seg"), col("action"))
        .agg(count(lit(1)).as("n_sa_t"), sum(col("r")).as("sum_r_t"))
      val wPick = Window.partitionBy(col("seg"))
        .orderBy(expr("sum_r_t DIV n_sa_t").desc, col("action"))
      val policy = trainSegAct // <=5 actions/seg
        .withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("seg"), col("action").as("pi_action"),
          col("n_sa_t"))
      val trainSeg = trainSegAct.groupBy(col("seg"))
        .agg(sum(col("n_sa_t")).as("n_s_t"))
      val eval0 = ev.filter(col("half") === 1)
      val segAct = eval0.groupBy(col("seg"), col("action"))
        .agg(count(lit(1)).as("n_sa"), sum(col("r")).as("sum_r"))
      val segTot = segAct.groupBy(col("seg"))
        .agg(sum(col("n_sa")).as("n_s"))
      // propensity of the chosen action comes from the TRAIN half (the
      // logging-policy model); rewards/counts from the EVAL half — so
      // IPS and DM genuinely differ (with same-half propensities they
      // coincide algebraically)
      // both sides descend from the same `ev` lineage — explicit
      // aliases keep the join predicate unambiguous (dataset-handle
      // column refs on shared lineage log the trivially-true-predicate
      // warning and break silently under refactors)
      policy.alias("pol")
        .join(segAct.alias("sa"), col("pol.seg") === col("sa.seg") &&
          col("pol.pi_action") === col("sa.action"), "left")
        .drop(col("sa.seg")).drop(col("sa.action"))
        .join(segTot, "seg").join(trainSeg, "seg")
        .select(col("seg"), col("pi_action"), col("n_s").as("n_eval"),
          coalesce(col("n_sa"), lit(0L)).as("n_matched"),
          expr("1000000 * n_sa_t DIV n_s_t").as("prop_ppm"),
          expr("coalesce(sum_r, 0) * n_s_t DIV greatest(n_sa_t, 1) DIV n_s")
            .as("ips_value_micro"),
          expr("coalesce(sum_r, 0) DIV greatest(n_sa, 1)")
            .as("dm_value_micro"))
        .orderBy(col("seg"))
    }),

    // Information gain of each candidate feature for predicting
    // l_returnflag, from the additive decomposition
    //   IG = ln N - S_c/N - S_v/N + S_vc/N,  S_x = sum n_x ln n_x.
    // Each ln is quantized to integer micro-nats BEFORE any sum — a
    // cross-engine float sum over the per-value terms bit-diverges
    // (observed 12th-significant-digit STRICT diffs), while floor'd
    // integer terms sum exactly in any order. One unpivoted scan ->
    // one (feature, value, class) aggregate; the entropy algebra runs
    // on <=3 features x 12 values x 3 classes.
    "q435_infogain_ranking" -> ((s, d) => {
      val feat = t(s, d, "lineitem").select(
        expr("""stack(3,
            'linestatus', l_linestatus,
            'shipmonth', cast(month(l_shipdate) AS STRING),
            'qty_bucket', cast(least(9, cast(l_quantity AS BIGINT) DIV 5)
              AS STRING))""").as(Seq("feature", "v")),
        col("l_returnflag").as("y"))
      val nvc = feat.groupBy(col("feature"), col("v"), col("y"))
        .agg(count(lit(1)).as("n"))
      val lmicro = (c: org.apache.spark.sql.Column) =>
        floor(log(c) * 1000000).cast("long")
      val byFeat = nvc.groupBy(col("feature")).agg(
        sum(col("n")).as("nn"),
        sum(col("n") * lmicro(col("n"))).as("svc"))
      val sv = nvc.groupBy(col("feature"), col("v"))
        .agg(sum(col("n")).as("n"))
        .groupBy(col("feature"))
        .agg(sum(col("n") * lmicro(col("n"))).as("sv"),
          count(lit(1)).as("n_values"))
      val sc = nvc.groupBy(col("feature"), col("y"))
        .agg(sum(col("n")).as("n"))
        .groupBy(col("feature"))
        .agg(sum(col("n") * lmicro(col("n"))).as("sc"))
      val ig = byFeat.join(sv, "feature").join(sc, "feature")
        .select(col("feature"), col("n_values"),
          (lmicro(col("nn")) - expr("sc DIV nn") - expr("sv DIV nn")
            + expr("svc DIV nn")).as("ig_micro_nats"))
      val wRank = Window.orderBy(col("ig_micro_nats").desc, col("feature"))
      ig.withColumn("rank", row_number().over(wRank)) // 3 rows
        .orderBy(col("rank"))
    }),

    // Error-budget burn: per day, the 'error' share of all events in
    // ppm, against a 200000-ppm budget; fast window = the day itself,
    // slow window = trailing 7 days. Page when fast >= 1.05x AND slow
    // >= 1.02x budget (multiwindow suppresses one-day blips). Day
    // grain bounds every window.
    "q436_burn_rate_alert" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"), count(lit(1)).as("total"))
      val w7 = Window.orderBy(col("dayi")).rangeBetween(-6, 0) // day grain
      val burn = daily
        .withColumn("dayi", datediff(col("day"), lit("2024-01-01")))
        .withColumn("errs7", sum(col("errs")).over(w7))
        .withColumn("total7", sum(col("total")).over(w7))
        .select(col("day").cast("string").as("day"),
          col("errs"), col("total"),
          expr("1000000 * errs DIV total").as("err_ppm"),
          expr("1000000 * errs7 DIV total7").as("err7_ppm"),
          expr("(1000000 * (1000000 * errs DIV total)) DIV 200000")
            .as("burn_fast_ppm"),
          expr("(1000000 * (1000000 * errs7 DIV total7)) DIV 200000")
            .as("burn_slow_ppm"))
        .withColumn("alert",
          (col("burn_fast_ppm") >= 1050000L &&
            col("burn_slow_ppm") >= 1020000L).cast("long"))
      burn.orderBy(col("day"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q434_ips_policy_eval" ->
      """WITH ev AS (
           SELECT (user_id % 10)::BIGINT AS seg, event_type AS action,
                  floor(value * 1000000)::BIGINT AS r,
                  (event_id % 2)::BIGINT AS half
           FROM events),
         train_seg_act AS (
           SELECT seg, action, count(*)::BIGINT AS n_sa_t,
                  sum(r)::BIGINT AS sum_r_t
           FROM ev WHERE half = 0 GROUP BY 1, 2),
         policy AS (
           SELECT seg, action AS pi_action, n_sa_t
           FROM (SELECT seg, action, n_sa_t,
                        row_number() OVER (PARTITION BY seg
                          ORDER BY sum_r_t // n_sa_t DESC, action) AS rk
                 FROM train_seg_act) WHERE rk = 1),
         train_seg AS (
           SELECT seg, sum(n_sa_t)::BIGINT AS n_s_t
           FROM train_seg_act GROUP BY 1),
         seg_act AS (
           SELECT seg, action, count(*)::BIGINT AS n_sa,
                  sum(r)::BIGINT AS sum_r
           FROM ev WHERE half = 1 GROUP BY 1, 2),
         seg_tot AS (
           SELECT seg, sum(n_sa)::BIGINT AS n_s FROM seg_act GROUP BY 1)
         SELECT p.seg, p.pi_action, t.n_s AS n_eval,
                coalesce(a.n_sa, 0)::BIGINT AS n_matched,
                ((1000000 * p.n_sa_t) // ts.n_s_t)::BIGINT AS prop_ppm,
                ((coalesce(a.sum_r, 0) * ts.n_s_t
                  // greatest(p.n_sa_t, 1)) // t.n_s)::BIGINT
                  AS ips_value_micro,
                (coalesce(a.sum_r, 0)
                  // greatest(coalesce(a.n_sa, 0), 1))::BIGINT
                  AS dm_value_micro
         FROM policy p
         LEFT JOIN seg_act a ON p.seg = a.seg AND p.pi_action = a.action
         JOIN seg_tot t ON p.seg = t.seg
         JOIN train_seg ts ON p.seg = ts.seg
         ORDER BY p.seg""",

    "q435_infogain_ranking" ->
      """WITH feat AS (
           SELECT 'linestatus' AS feature, l_linestatus AS v,
                  l_returnflag AS y FROM lineitem
           UNION ALL
           SELECT 'shipmonth', CAST(month(l_shipdate) AS VARCHAR),
                  l_returnflag FROM lineitem
           UNION ALL
           SELECT 'qty_bucket',
                  CAST(least(9, CAST(l_quantity AS BIGINT) // 5)
                    AS VARCHAR),
                  l_returnflag FROM lineitem),
         nvc AS (
           SELECT feature, v, y, count(*)::BIGINT AS n
           FROM feat GROUP BY 1, 2, 3),
         byfeat AS (
           SELECT feature, sum(n)::BIGINT AS nn,
                  sum(n * floor(ln(n) * 1000000)::BIGINT)::BIGINT AS svc
           FROM nvc GROUP BY 1),
         sv AS (
           SELECT feature,
                  sum(n * floor(ln(n) * 1000000)::BIGINT)::BIGINT AS sv,
                  count(*)::BIGINT AS n_values
           FROM (SELECT feature, v, sum(n)::BIGINT AS n
                 FROM nvc GROUP BY 1, 2) GROUP BY 1),
         sc AS (
           SELECT feature,
                  sum(n * floor(ln(n) * 1000000)::BIGINT)::BIGINT AS sc
           FROM (SELECT feature, y, sum(n)::BIGINT AS n
                 FROM nvc GROUP BY 1, 2) GROUP BY 1),
         ig AS (
           SELECT b.feature, s.n_values,
                  (floor(ln(b.nn) * 1000000)::BIGINT
                   - c.sc // b.nn - s.sv // b.nn + b.svc // b.nn)::BIGINT
                    AS ig_micro_nats
           FROM byfeat b JOIN sv s ON b.feature = s.feature
           JOIN sc c ON b.feature = c.feature)
         SELECT feature, n_values, ig_micro_nats,
                row_number() OVER (ORDER BY ig_micro_nats DESC, feature)
                  ::BIGINT AS rank
         FROM ig ORDER BY rank""",

    "q436_burn_rate_alert" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
                  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                      END)::BIGINT AS errs,
                  count(*)::BIGINT AS total
           FROM events GROUP BY 1),
         burn AS (
           SELECT day, errs, total,
                  sum(errs) OVER w7::BIGINT AS errs7,
                  sum(total) OVER w7::BIGINT AS total7
           FROM daily
           WINDOW w7 AS (ORDER BY datediff('day', DATE '2024-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT CAST(day AS VARCHAR) AS day, errs, total,
                ((1000000 * errs) // total)::BIGINT AS err_ppm,
                ((1000000 * errs7) // total7)::BIGINT AS err7_ppm,
                ((1000000 * ((1000000 * errs) // total)) // 200000)
                  ::BIGINT AS burn_fast_ppm,
                ((1000000 * ((1000000 * errs7) // total7)) // 200000)
                  ::BIGINT AS burn_slow_ppm,
                (CASE WHEN (1000000 * ((1000000 * errs) // total))
                        // 200000 >= 1050000
                       AND (1000000 * ((1000000 * errs7) // total7))
                        // 200000 >= 1020000
                      THEN 1 ELSE 0 END)::BIGINT AS alert
         FROM burn ORDER BY day"""
  )
}
