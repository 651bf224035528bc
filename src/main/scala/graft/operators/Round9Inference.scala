package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch V (q460-q462) — classical inference + allocation:
  *
  *  - q460: two-cohort log-rank test — the hypothesis-test companion
  *    to q375's Kaplan-Meier estimator (reference surface:
  *    Benchmarks-style survival reporting). Death = first purchase
  *    after a user's first event; censoring at the corpus horizon.
  *    At-risk counts come from cumulative sums over the time-ordered
  *    per-duration death/enter table (distinct durations are
  *    hour-grain bounded — calendar-bounded, not corpus-bounded), so
  *    no per-user x per-time expansion ever materializes.
  *  - q461: Benjamini-Hochberg FDR step-up over 120 (event_type x
  *    hour) mean-shift hypotheses. z from exact integer sums; p via
  *    the published Abramowitz-Stegun 7.1.26 erf polynomial replayed
  *    verbatim by the oracle; the step-up cutoff is max{rank: p <=
  *    rank*alpha/m} computed with a bounded window (m = 120 rows).
  *  - q462: largest-remainder (Hamilton) apportionment — allocate
  *    exactly 1,000,000 budget units across nations pro-rata to
  *    order revenue. All arithmetic in DECIMAL(38,0)/HUGEINT
  *    (seats*cents overflows BIGINT at large SF), floor quota +
  *    top-R remainders; the allocation sums to the budget EXACTLY,
  *    which the spec pins.
  */
object Round9Inference {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q460_logrank_test" -> ((s, d) => {
      val ev = t(s, d, "events")
      // per-user duration (hours from first event to first purchase;
      // censored at the corpus horizon) — one bounded aggregate
      val horizon = ev.agg(max(col("ts")).as("hmax"))
      val durs = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          (col("user_id") % 2).cast("int").as("grp"),
          when(col("tp").isNotNull, lit(1L)).otherwise(lit(0L))
            .as("death"),
          floor((unix_timestamp(coalesce(col("tp"), col("hmax"))) -
            unix_timestamp(col("t0"))) / 3600L).cast("long").as("dur"))
      // per-duration group counts; at-risk via reverse cumulative sums
      val byT = durs.groupBy(col("dur"))
        .agg(sum(when(col("grp") === 0, col("death")).otherwise(0L))
            .as("d0"),
          sum(when(col("grp") === 1, col("death")).otherwise(0L))
            .as("d1"),
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("e0"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("e1"))
      // distinct durations are calendar-hour bounded -> this global
      // window is over a bounded set (q375 contract)
      val wGe = Window.orderBy(col("dur"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = byT
        .withColumn("n0", sum(col("e0")).over(wGe))
        .withColumn("n1", sum(col("e1")).over(wGe))
        .filter(col("d0") + col("d1") > 0)
        .withColumn("dtot", col("d0") + col("d1"))
        .withColumn("ntot", col("n0") + col("n1"))
        .withColumn("exp1", col("dtot") * col("n1") /
          col("ntot").cast("double"))
        .withColumn("vr", when(col("ntot") > 1,
          col("dtot") * (col("n1") / col("ntot").cast("double")) *
            (col("n0") / col("ntot").cast("double")) *
            (col("ntot") - col("dtot")) / (col("ntot") - lit(1)))
          .otherwise(lit(0.0)))
      risk.agg(
          count(lit(1)).as("n_death_times"),
          sum(col("d1")).as("observed_g1"),
          floor(sum(col("exp1")) * 1000).cast("long")
            .as("expected_g1_milli"),
          floor(sum(col("vr")) * 1000).cast("long").as("variance_milli"),
          floor(pow(sum(col("d1")) - sum(col("exp1")), 2) /
            sum(col("vr")) * 1000).cast("long").as("chi2_milli"))
    }),

    "q461_fdr_bh" -> ((s, d) => {
      // planted effect: purchase@12h values are shifted +100 so the
      // procedure has a true positive to find; every other cell is
      // null-true and BH must (mostly) keep it
      val ev = t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).as("hr"),
          (col("value") + when(col("event_type") === "purchase" &&
            hour(col("ts")) === 12, lit(100.0)).otherwise(lit(0.0)))
            .as("value"))
      // global moments (exact sums -> double once)
      val g = ev.agg(sum(col("value")).as("gs"),
        sum(col("value") * col("value")).as("gss"),
        count(lit(1)).as("gn"))
      val cells = ev.groupBy(col("event_type"), col("hr"))
        .agg(sum(col("value")).as("cs"), count(lit(1)).as("cn"))
        .crossJoin(broadcast(g))
        .withColumn("gmean", col("gs") / col("gn"))
        .withColumn("gsd", sqrt(col("gss") / col("gn") -
          (col("gs") / col("gn")) * (col("gs") / col("gn"))))
        .withColumn("z", abs((col("cs") / col("cn") - col("gmean")) /
          (col("gsd") / sqrt(col("cn").cast("double")))))
      // two-sided p via Abramowitz-Stegun 7.1.26 erf (x = z/sqrt(2)):
      // erf(x) ~ 1 - poly(t) * exp(-x^2), t = 1/(1 + 0.3275911 x)
      val scored = cells
        .withColumn("x", col("z") / sqrt(lit(2.0)))
        .withColumn("tt", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("x")))
        .withColumn("erf", lit(1.0) -
          (lit(0.254829592) * col("tt") -
            lit(0.284496736) * pow(col("tt"), 2) +
            lit(1.421413741) * pow(col("tt"), 3) -
            lit(1.453152027) * pow(col("tt"), 4) +
            lit(1.061405429) * pow(col("tt"), 5)) *
            exp(-col("x") * col("x")))
        .withColumn("p", lit(1.0) - col("erf"))
      // BH step-up at alpha = 0.05 over the m = |cells| hypotheses —
      // bounded window (<= 5 types x 24 hours rows)
      val m = scored.agg(count(lit(1)).as("m"))
      val wP = Window.orderBy(col("p"), col("event_type"), col("hr"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val ranked = scored.crossJoin(broadcast(m))
        .withColumn("rk", row_number().over(wP))
        .withColumn("ok", when(col("p") <= col("rk") * lit(0.05) / col("m"),
          col("rk")).otherwise(lit(0)))
        .withColumn("cutoff", max(col("ok")).over(wAll))
      ranked.filter(col("rk") <= col("cutoff"))
        .select(col("event_type"), col("hr"),
          floor(col("z") * 1000).cast("long").as("z_milli"),
          floor(col("p") * 1000000).cast("long").as("p_ppm"),
          col("rk"), col("cutoff").cast("long").as("n_rejected"))
        .orderBy(col("rk"))
    }),

    "q462_largest_remainder" -> ((s, d) => {
      val seats = lit(1000000L).cast("decimal(38,0)")
      val rev = t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .cast("decimal(38,0)").as("cents"))
      val tot = rev.agg(sum(col("cents")).as("total"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val wRem = Window.orderBy(col("rem").desc, col("n_nationkey"))
      val quotas = rev.crossJoin(broadcast(tot))
        // seats*cents stays exact in DECIMAL(38,0) (BIGINT would
        // overflow once total cents exceeds ~9.2e12)
        .withColumn("base", expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * cents) DIV total" +
            " AS BIGINT)"))
        .withColumn("rem", expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * cents) % total" +
            " AS BIGINT)"))
      val alloc = quotas
        .withColumn("residual", lit(1000000L) - sum(col("base")).over(wAll))
        .withColumn("rk", row_number().over(wRem))
        .withColumn("alloc",
          col("base") + when(col("rk") <= col("residual"), 1L)
            .otherwise(0L))
      alloc.select(col("n_name"), col("cents").cast("long").as("cents"),
          col("base"), col("rem"), col("alloc"))
        .orderBy(col("alloc").desc, col("n_name"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q460_logrank_test" ->
      """WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type
                     FROM events),
         hz AS (SELECT max(ts) AS hmax FROM ev),
         durs AS (
           -- floor(epoch) per endpoint (not of the interval): Spark's
           -- unix_timestamp truncates sub-second parts per timestamp
           SELECT user_id, (user_id % 2)::INT AS grp,
                  (CASE WHEN tp IS NOT NULL THEN 1 ELSE 0
                   END)::BIGINT AS death,
                  floor((floor(epoch(coalesce(tp,
                        (SELECT hmax FROM hz))))
                      - floor(epoch(t0))) / 3600)::BIGINT AS dur
           FROM (SELECT user_id, min(ts) AS t0,
                        min(CASE WHEN event_type = 'purchase'
                            THEN ts END) AS tp
                 FROM ev GROUP BY user_id) u),
         byt AS (
           SELECT dur,
                  sum(CASE WHEN grp = 0 THEN death ELSE 0 END)::BIGINT
                    AS d0,
                  sum(CASE WHEN grp = 1 THEN death ELSE 0 END)::BIGINT
                    AS d1,
                  sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS e0,
                  sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS e1
           FROM durs GROUP BY dur),
         risk AS (
           SELECT dur, d0, d1,
                  sum(e0) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS n0,
                  sum(e1) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS n1
           FROM byt),
         terms AS (
           SELECT d1, (d0 + d1) AS dtot, (n0 + n1) AS ntot,
                  (d0 + d1) * n1 / CAST(n0 + n1 AS DOUBLE) AS exp1,
                  CASE WHEN n0 + n1 > 1
                       THEN (d0 + d1)
                            * (n1 / CAST(n0 + n1 AS DOUBLE))
                            * (n0 / CAST(n0 + n1 AS DOUBLE))
                            * (n0 + n1 - d0 - d1)
                            / (n0 + n1 - 1)
                       ELSE 0.0 END AS vr
           FROM risk WHERE d0 + d1 > 0)
         SELECT count(*)::BIGINT AS n_death_times,
                sum(d1)::BIGINT AS observed_g1,
                floor(sum(exp1) * 1000)::BIGINT AS expected_g1_milli,
                floor(sum(vr) * 1000)::BIGINT AS variance_milli,
                floor(pow(sum(d1) - sum(exp1), 2) / sum(vr)
                  * 1000)::BIGINT AS chi2_milli
         FROM terms""",

    "q461_fdr_bh" ->
      """WITH ev AS (SELECT event_type,
                  extract(hour FROM ts::TIMESTAMP)::BIGINT AS hr,
                  value + (CASE WHEN event_type = 'purchase'
                           AND extract(hour FROM ts::TIMESTAMP) = 12
                           THEN 100.0 ELSE 0.0 END) AS value
           FROM events),
         g AS (SELECT sum(value) AS gs, sum(value * value) AS gss,
                      count(*)::BIGINT AS gn FROM ev),
         cells AS (
           SELECT event_type, hr, sum(value) AS cs,
                  count(*)::BIGINT AS cn
           FROM ev GROUP BY event_type, hr),
         zed AS (
           SELECT event_type, hr,
                  abs((cs / cn - gs / gn)
                    / (sqrt(gss / gn - (gs / gn) * (gs / gn))
                       / sqrt(CAST(cn AS DOUBLE)))) AS z
           FROM cells CROSS JOIN g),
         scored AS (
           SELECT event_type, hr, z,
                  1.0 - (1.0 - (0.254829592 * tt
                                - 0.284496736 * pow(tt, 2)
                                + 1.421413741 * pow(tt, 3)
                                - 1.453152027 * pow(tt, 4)
                                + 1.061405429 * pow(tt, 5))
                               * exp(-x * x)) AS p
           FROM (SELECT event_type, hr, z, z / sqrt(2.0) AS x,
                        1.0 / (1.0 + 0.3275911 * (z / sqrt(2.0))) AS tt
                 FROM zed) q),
         m AS (SELECT count(*)::BIGINT AS m FROM scored),
         ranked AS (
           SELECT event_type, hr, z, p,
                  row_number() OVER (ORDER BY p, event_type, hr) AS rk,
                  (SELECT m FROM m) AS m
           FROM scored),
         cut AS (
           SELECT max(CASE WHEN p <= rk * 0.05 / m THEN rk ELSE 0 END)
             AS cutoff FROM ranked)
         SELECT event_type, hr,
                floor(z * 1000)::BIGINT AS z_milli,
                floor(p * 1000000)::BIGINT AS p_ppm,
                rk, (SELECT cutoff FROM cut)::BIGINT AS n_rejected
         FROM ranked
         WHERE rk <= (SELECT cutoff FROM cut)
         ORDER BY rk""",

    "q462_largest_remainder" ->
      """WITH rev AS (
           SELECT n_nationkey, n_name,
                  sum(floor(o_totalprice * 100)::BIGINT)::HUGEINT
                    AS cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_nationkey, n_name),
         tot AS (SELECT sum(cents) AS total FROM rev),
         quotas AS (
           SELECT n_nationkey, n_name, cents,
                  ((1000000::HUGEINT * cents) // total)::BIGINT AS base,
                  ((1000000::HUGEINT * cents) % total)::BIGINT AS rem
           FROM rev CROSS JOIN tot),
         alloc AS (
           SELECT n_name, cents, base, rem,
                  1000000 - sum(base) OVER () AS residual,
                  row_number() OVER (ORDER BY rem DESC, n_nationkey)
                    AS rk
           FROM quotas)
         SELECT n_name, cents::BIGINT AS cents, base, rem,
                (base + CASE WHEN rk <= residual THEN 1 ELSE 0
                 END)::BIGINT AS alloc
         FROM alloc
         ORDER BY alloc DESC, n_name"""
  )
}
