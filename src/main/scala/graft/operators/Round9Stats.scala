package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch G (q395-q399): experimentation + robust-statistics
  * operators — CUPED variance reduction, quantile treatment effects on
  * ExactSelection order statistics, a derandomized hash-bootstrap
  * confidence interval, the Mann-Kendall trend test with tie
  * correction, and Theil-Sen robust slopes. All deterministic and
  * hash-gated vs DuckDB.
  */
object Round9Stats {

  type Q = (SparkSession, String) => DataFrame

  private def knuth(key: org.apache.spark.sql.Column) =
    (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % lit(4294967296L)

  val queries: Seq[(String, Q)] = Seq(

    // CUPED variance reduction (Deng et al. 2013) — the experiment-
    // sensitivity standard: per user, Y = second-half purchase cents,
    // X = first-half (pre-period) cents; theta = cov(X,Y)/var(X) from
    // explicit sums, adjusted Y' = Y - theta (X - mean X), and the
    // variance-reduction ratio 1 - var(Y')/var(Y) (= corr^2). One
    // user-keyed aggregate, then scalar algebra on a single stats row.
    "q395_cuped" -> ((s, d) => {
      val per = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < "2024-01-16",
            floor(col("value") * 100).cast("long")).otherwise(0L))
            .cast("double").as("x"),
          sum(when(col("ts") >= "2024-01-16",
            floor(col("value") * 100).cast("long")).otherwise(0L))
            .cast("double").as("y"))
      per.agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").cast("long").as("n_users"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")), 4)
            .as("theta"),
          round(lit(1.0) -
            (lit(1.0) -
              (col("n") * col("sxy") - col("sx") * col("sy"))
              * (col("n") * col("sxy") - col("sx") * col("sy"))
              / ((col("n") * col("sxx") - col("sx") * col("sx"))
                 * (col("n") * col("syy") - col("sy") * col("sy")))),
            4).as("var_reduction"))
    }),

    // Quantile treatment effects — A/B deciles compared at matched
    // order statistics (rank k = ceil(d n / 10), the ExactSelection
    // contract), showing WHERE in the distribution a treatment moves
    // the metric, which the mean (q267) hides. Two bounded
    // ExactSelection walks; the per-variant metric aggregate is the
    // only corpus shuffle.
    "q396_qte_deciles" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val per = graft.Stage(t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          (knuth(col("user_id")) % 2 === 1).as("is_b"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents")),
        "q396_per_user")
      def deciles(isB: Boolean): Seq[(Int, Double)] = {
        val g = per.filter(col("is_b") === isB)
        val n = g.count()
        val ks = (1 to 9).map(dd => (dd * n + 9) / 10)
        (1 to 9).zip(ExactSelection.kthAll(g, "cents", ks).map(_.value))
      }
      val a = deciles(isB = false).toMap
      val b = deciles(isB = true).toMap
      (1 to 9).map(dd => (dd.toLong, a(dd).toLong, b(dd).toLong,
          b(dd).toLong - a(dd).toLong))
        .toDF("decile", "q_a_cents", "q_b_cents", "qte_cents")
    }),

    // Hash-bootstrap confidence interval — the resampling machine at
    // corpus scale: 32 replicates whose per-row multiplicities are a
    // discretized Poisson(1) drawn from the portable hash of (row,
    // replicate), so every engine / worker / restart resamples
    // identically. One explode(x32) pass, a 32-row replicate table,
    // CI from the sorted replicate means (indices 2 / 31 of 32 ~=
    // 5%/95%). The pattern the Efraimidis sampler (q342) does for
    // selection, applied to uncertainty.
    "q397_hash_bootstrap" -> ((s, d) => {
      val rows = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      val reps = rows
        .withColumn("b", explode(sequence(lit(0), lit(31))))
        .select(col("b"), col("cents"),
          (knuth(col("event_id") * 37 + col("b")) % 1000).as("u"))
        .select(col("b"), col("cents"),
          when(col("u") < 368, 0L).when(col("u") < 736, 1L)
            .when(col("u") < 920, 2L).otherwise(3L).as("w"))
        .groupBy(col("b"))
        .agg((sum(col("w") * col("cents")).cast("double")
          / sum(col("w"))).as("m"))
      val base = rows.agg(avg(col("cents")).as("mean0"),
        count(lit(1)).as("n_rows"))
      reps.agg(sort_array(collect_list(col("m"))).as("ms"))
        .crossJoin(broadcast(base))
        .select(col("n_rows"), round(col("mean0"), 4).as("point_mean"),
          round(element_at(col("ms"), 2), 4).as("ci_lo"),
          round(element_at(col("ms"), 31), 4).as("ci_hi"),
          size(col("ms")).cast("long").as("n_replicates"))
    }),

    // Mann-Kendall trend test with tie correction — the
    // non-parametric "is this series drifting" gate (complements
    // q360's CUSUM changepoints): S = sum of sign(m_j - m_i) over day
    // pairs (bounded: day-grain squared per series), tie-corrected
    // variance, normal-approximation Z with continuity correction,
    // verdict at |Z| > 1.96. Pairs form per series only — never across
    // the corpus.
    "q398_mann_kendall" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m")), "q398_daily")
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day") < col("b.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(signum(col("b.m") - col("a.m")).cast("long"))
          .as("s_stat"))
      val nd = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"))
      val ties = daily.groupBy(col("event_type"), col("m"))
        .agg(count(lit(1)).as("tc"))
        .groupBy(col("event_type"))
        .agg(sum(col("tc") * (col("tc") - 1) * (col("tc") * 2 + 5))
          .as("tie_term"))
      pairs.join(nd, "event_type").join(ties, "event_type")
        .select(col("event_type"), col("nd").as("n_days"), col("s_stat"),
          round((col("s_stat") - signum(col("s_stat")))
            / sqrt((col("nd") * (col("nd") - 1) * (col("nd") * 2 + 5)
              - col("tie_term")).cast("double") / 18.0), 4).as("z"))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("z"),
          when(col("z") > 1.96, "increasing")
            .when(col("z") < -1.96, "decreasing")
            .otherwise("no_trend").as("trend"))
        .orderBy(col("event_type"))
    }),

    // Theil-Sen robust slope — the median-of-pairwise-slopes estimator
    // outliers cannot move (the robust sibling of q363's Holt trend):
    // per series, all day-pair slopes (bounded by day-grain squared),
    // LOWER median via the sorted bounded list on both engines, plus
    // Sen's intercept from the lower medians of value and day index.
    "q399_theil_sen" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
        .withColumn("di", unix_date(col("day").cast("date"))
          .cast("long")), "q399_daily")
      val slopes = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.di") < col("b.di"))
        .select(col("a.event_type").as("event_type"),
          ((col("b.m") - col("a.m")).cast("double")
            / (col("b.di") - col("a.di"))).as("sl"))
      val med = slopes.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("sl"))).as("sls"))
        .select(col("event_type"),
          size(col("sls")).cast("long").as("n_pairs"),
          expr("element_at(sls, int((size(sls) + 1) div 2))")
            .as("slope"))
      val mids = daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("m"))).as("ms"),
          sort_array(collect_list(col("di"))).as("dis"))
        .select(col("event_type"),
          expr("double(element_at(ms, int((size(ms) + 1) div 2)))")
            .as("med_m"),
          expr("double(element_at(dis, int((size(dis) + 1) div 2)))")
            .as("med_di"))
      med.join(mids, "event_type")
        .select(col("event_type"), col("n_pairs"),
          round(col("slope"), 6).as("sen_slope"),
          round(col("med_m") - col("slope") * col("med_di"), 4)
            .as("sen_intercept"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q395_cuped" ->
      """WITH per AS (
           SELECT user_id,
                  sum(CASE WHEN ts::TIMESTAMP
                        < TIMESTAMP '2024-01-16 00:00:00'
                      THEN floor(value * 100)::BIGINT ELSE 0 END)
                    ::DOUBLE AS x,
                  sum(CASE WHEN ts::TIMESTAMP
                        >= TIMESTAMP '2024-01-16 00:00:00'
                      THEN floor(value * 100)::BIGINT ELSE 0 END)
                    ::DOUBLE AS y
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id),
         agg AS (
           SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
           FROM per)
         SELECT n::BIGINT AS n_users,
                round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS theta,
                round(1.0 - (1.0 - (n*sxy - sx*sy)*(n*sxy - sx*sy)
                  / ((n*sxx - sx*sx)*(n*syy - sy*sy))), 4)
                  AS var_reduction
         FROM agg""",
    "q396_qte_deciles" ->
      """WITH per AS (
           SELECT user_id,
                  (user_id % 2147483648 * 2654435761 % 4294967296)
                    % 2 = 1 AS is_b,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS cents
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1, 2),
         ranked AS (
           SELECT is_b, cents,
                  row_number() OVER (PARTITION BY is_b ORDER BY cents)
                    AS rn,
                  count(*) OVER (PARTITION BY is_b) AS n
           FROM per),
         d AS (SELECT unnest(generate_series(1, 9)) AS decile)
         SELECT d.decile::BIGINT AS decile,
                a.cents AS q_a_cents, b.cents AS q_b_cents,
                (b.cents - a.cents)::BIGINT AS qte_cents
         FROM d
         JOIN ranked a ON NOT a.is_b
           AND a.rn = (d.decile * a.n + 9) // 10
         JOIN ranked b ON b.is_b
           AND b.rn = (d.decile * b.n + 9) // 10
         ORDER BY decile""",
    "q397_hash_bootstrap" ->
      """WITH rows_ AS (
           SELECT event_id, floor(value * 100)::BIGINT AS cents
           FROM events WHERE event_type = 'purchase'),
         reps AS (
           SELECT b.range AS b, cents,
                  ((event_id * 37 + b.range) % 2147483648
                    * 2654435761 % 4294967296) % 1000 AS u
           FROM rows_ CROSS JOIN range(32) b),
         wtd AS (
           SELECT b, cents,
                  CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
                       WHEN u < 920 THEN 2 ELSE 3 END AS w
           FROM reps),
         means AS (
           SELECT b, sum(w * cents)::DOUBLE / sum(w) AS m
           FROM wtd GROUP BY b),
         ms AS (SELECT list_sort(list(m)) AS ms FROM means),
         base AS (
           SELECT avg(cents) AS mean0, count(*)::BIGINT AS n_rows
           FROM rows_)
         SELECT n_rows, round(mean0, 4) AS point_mean,
                round(ms[2], 4) AS ci_lo, round(ms[31], 4) AS ci_hi,
                len(ms)::BIGINT AS n_replicates
         FROM ms CROSS JOIN base""",
    "q398_mann_kendall" ->
      """WITH daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
                  sum(sign(b.m - a.m))::BIGINT AS s_stat
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         nd AS (
           SELECT event_type, count(*)::BIGINT AS n_days FROM daily
           GROUP BY 1),
         ties AS (
           SELECT event_type,
                  sum(tc * (tc - 1) * (2 * tc + 5))::BIGINT AS tie_term
           FROM (SELECT event_type, m, count(*)::BIGINT AS tc
                 FROM daily GROUP BY 1, 2)
           GROUP BY 1),
         z AS (
           SELECT s.event_type, n_days, s_stat,
                  round((s_stat - sign(s_stat))
                    / sqrt((n_days * (n_days - 1) * (2 * n_days + 5)
                            - tie_term)::DOUBLE / 18.0), 4) AS z
           FROM s JOIN nd USING (event_type)
           JOIN ties USING (event_type))
         SELECT event_type, n_days, s_stat, z,
                CASE WHEN z > 1.96 THEN 'increasing'
                     WHEN z < -1.96 THEN 'decreasing'
                     ELSE 'no_trend' END AS trend
         FROM z ORDER BY event_type""",
    "q399_theil_sen" ->
      """WITH daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         d2 AS (
           SELECT event_type, m,
                  date_diff('day', DATE '1970-01-01', day::DATE)
                    ::BIGINT AS di
           FROM daily),
         slopes AS (
           SELECT a.event_type,
                  (b.m - a.m)::DOUBLE / (b.di - a.di) AS sl
           FROM d2 a JOIN d2 b
             ON a.event_type = b.event_type AND a.di < b.di),
         med AS (
           SELECT event_type, list_sort(list(sl)) AS sls
           FROM slopes GROUP BY event_type),
         mids AS (
           SELECT event_type,
                  list_sort(list(m))[(count(*) + 1) // 2]::DOUBLE
                    AS med_m,
                  list_sort(list(di))[(count(*) + 1) // 2]::DOUBLE
                    AS med_di
           FROM d2 GROUP BY event_type)
         SELECT m.event_type AS event_type, len(sls)::BIGINT AS n_pairs,
                round(sls[((len(sls) + 1) // 2)::INT], 6) AS sen_slope,
                round(mi.med_m
                  - sls[((len(sls) + 1) // 2)::INT] * mi.med_di, 4)
                  AS sen_intercept
         FROM med m JOIN mids mi ON m.event_type = mi.event_type
         ORDER BY 1"""
  )
}
