package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AQ (q523-q525) — unit economics, robust fitting,
  * and classical seasonal adjustment:
  *
  *  - q523: cohort payback period — cumulative per-user purchase
  *    revenue by week-since-acquisition against a fixed acquisition
  *    cost; the first week where cumulative revenue covers CAC is
  *    the payback week (-1 if not reached in horizon). Cohort×week
  *    grid is calendar-bounded; one corpus aggregate.
  *  - q524: one-step Huber M-estimation of price~quantity — OLS
  *    first pass, per-row Huber weights w = min(1, c/|r|) QUANTIZED
  *    to ppm integers (so the reweighted sums stay exact integer /
  *    DECIMAL and engine float-sum order cannot drift), weighted
  *    second pass in closed form. Reports both fits and how many
  *    rows were down-weighted — the robust alternative to q470's
  *    rolling OLS when tails are heavy.
  *  - q525: ratio-to-moving-average seasonal indices — the classical
  *    decomposition used for weekday adjustment: centered 7-day MA
  *    (full windows only), per-row ratio kept integral as
  *    rev·7·10⁶ / sum7, averaged per weekday, then normalized so the
  *    7 indices sum to 7·10⁶. Day-grain windows only.
  */
object Round9Payback {

  type Q = (SparkSession, String) => DataFrame

  private val CAC_CENTS = 5000L

  val queries: Seq[(String, Q)] = Seq(

    "q523_cohort_payback" -> ((s, d) => {
      val purch = graft.Stage(t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("floor(unix_timestamp(ts) / 86400) DIV 7").as("aw"),
          floor(col("value") * 100).cast("long").as("cents")),
        "q523_purch")
      val first = purch.groupBy(col("user_id"))
        .agg(min(col("aw")).as("cw"))
      val sizes = first.groupBy(col("cw"))
        .agg(count(lit(1)).as("cohort_size"))
      val grid = purch.join(first, Seq("user_id"))
        .withColumn("k", col("aw") - col("cw"))
        .filter(col("k").between(0, 3))
        .groupBy(col("cw"), col("k"))
        .agg(sum(col("cents")).as("rev"))
      val wk = Window.partitionBy(col("cw")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid.withColumn("cum_rev", sum(col("rev")).over(wk))
        .join(sizes, Seq("cw"))
      val payback = cum
        .filter(col("cum_rev") >= lit(CAC_CENTS) * col("cohort_size"))
        .groupBy(col("cw")).agg(min(col("k")).as("pk"))
      cum.groupBy(col("cw"), col("cohort_size"))
        .agg(sum(when(col("k") === 0, col("rev"))).as("rev_w0"),
          sum(when(col("k") === 1, col("rev"))).as("rev_w1"),
          sum(when(col("k") === 2, col("rev"))).as("rev_w2"),
          sum(when(col("k") === 3, col("rev"))).as("rev_w3"))
        .join(payback, Seq("cw"), "left")
        .select(col("cw").as("cohort_week"), col("cohort_size"),
          coalesce(col("rev_w0"), lit(0L)).as("rev_w0"),
          coalesce(col("rev_w1"), lit(0L)).as("rev_w1"),
          coalesce(col("rev_w2"), lit(0L)).as("rev_w2"),
          coalesce(col("rev_w3"), lit(0L)).as("rev_w3"),
          coalesce(col("pk"), lit(-1L)).as("payback_week"))
        .orderBy(col("cohort_week"))
    }),

    "q524_huber_regression" -> ((s, d) => {
      val base = graft.Stage(t(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y")),
        "q524_base")
      val p1 = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
        .withColumn("b1",
          (col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx").cast("decimal(38,0)") * col("sy")).cast("double")
            / (col("n").cast("decimal(38,0)") * col("sxx")
              - col("sx").cast("decimal(38,0)") * col("sx"))
              .cast("double"))
        .withColumn("a1",
          (col("sy").cast("double") - col("b1") * col("sx").cast("double"))
            / col("n").cast("double"))
      // |residual| floored to cents -> exact scale; Huber c = 1.345·s̄
      val scored = graft.Stage(base.crossJoin(broadcast(p1
          .select(col("a1"), col("b1"), col("n"))))
        .withColumn("rc",
          floor(abs(col("y").cast("double")
            - (col("a1") + col("b1") * col("x").cast("double"))))
            .cast("long")), "q524_scored")
      val scale = scored.agg(sum(col("rc")).as("sr"),
        first(col("n")).as("n"))
        .select((col("sr").cast("double") / col("n") * 1.345).as("c"))
      val weighted = scored.crossJoin(broadcast(scale))
        .withColumn("w_ppm",
          when(col("rc").cast("double") <= col("c"), 1000000L)
            .otherwise(floor(col("c") * 1e6 / col("rc").cast("double"))
              .cast("long")))
      val p2 = weighted.agg(
        sum(col("w_ppm")).as("sw"),
        sum(col("w_ppm").cast("decimal(38,0)") * col("x")).as("swx"),
        sum(col("w_ppm").cast("decimal(38,0)") * col("y")).as("swy"),
        sum(col("w_ppm").cast("decimal(38,0)") * col("x") * col("y"))
          .as("swxy"),
        sum(col("w_ppm").cast("decimal(38,0)") * col("x") * col("x"))
          .as("swxx"),
        sum(when(col("w_ppm") < 1000000L, 1L).otherwise(0L))
          .as("n_downweighted"),
        first(col("a1")).as("a1"), first(col("b1")).as("b1"),
        first(col("n")).as("n"))
        .withColumn("b2",
          (col("sw").cast("decimal(38,0)") * col("swxy")
            - col("swx") * col("swy")).cast("double")
            / (col("sw").cast("decimal(38,0)") * col("swxx")
              - col("swx") * col("swx")).cast("double"))
        .withColumn("a2",
          (col("swy").cast("double") - col("b2") * col("swx").cast("double"))
            / col("sw").cast("double"))
      p2.select(col("n"),
        floor(col("b1") * 1e6).cast("long").as("slope_ols_micro"),
        floor(col("b2") * 1e6).cast("long").as("slope_huber_micro"),
        floor(col("a1")).cast("long").as("intercept_ols_cents"),
        floor(col("a2")).cast("long").as("intercept_huber_cents"),
        col("n_downweighted"))
    }),

    "q525_seasonal_index" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L)
          .cast("long").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("rev"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3) // day grain
      val ratios = daily
        .withColumn("sum7", sum(col("rev")).over(w7))
        .withColumn("cnt7", count(lit(1)).over(w7))
        .filter(col("cnt7") === 7) // full centered windows only
        .withColumn("ratio_ppm",
          expr("rev * 7 * 1000000 DIV sum7"))
        .withColumn("dow", col("day") % 7)
      val byDow = ratios.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("ratio_ppm")).as("sr"))
        .withColumn("raw_index_ppm",
          expr("sr DIV n_days"))
      val tot = byDow.agg(sum(col("raw_index_ppm")).as("t"))
      byDow.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_days"), col("raw_index_ppm"),
          expr("raw_index_ppm * 7000000 DIV t").as("norm_index_ppm"))
        .orderBy(col("dow"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q523_cohort_payback" ->
      s"""WITH purch AS (
           SELECT user_id,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT // 7
                    AS aw,
                  floor(value * 100)::BIGINT AS cents
           FROM events WHERE event_type = 'purchase'),
         first_w AS (
           SELECT user_id, min(aw) AS cw FROM purch GROUP BY user_id),
         sizes AS (
           SELECT cw, count(*)::BIGINT AS cohort_size
           FROM first_w GROUP BY cw),
         grid AS (
           SELECT f.cw, p.aw - f.cw AS k, sum(p.cents)::BIGINT AS rev
           FROM purch p JOIN first_w f ON p.user_id = f.user_id
           WHERE p.aw - f.cw BETWEEN 0 AND 3
           GROUP BY 1, 2),
         cum AS (
           SELECT g.cw, g.k, g.rev, s.cohort_size,
                  sum(g.rev) OVER (PARTITION BY g.cw ORDER BY g.k
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_rev
           FROM grid g JOIN sizes s ON g.cw = s.cw),
         payback AS (
           SELECT cw, min(k)::BIGINT AS pk
           FROM cum WHERE cum_rev >= $CAC_CENTS * cohort_size
           GROUP BY cw),
         piv AS (
           SELECT cw, cohort_size,
                  coalesce(sum(CASE WHEN k = 0 THEN rev END), 0)
                    ::BIGINT AS rev_w0,
                  coalesce(sum(CASE WHEN k = 1 THEN rev END), 0)
                    ::BIGINT AS rev_w1,
                  coalesce(sum(CASE WHEN k = 2 THEN rev END), 0)
                    ::BIGINT AS rev_w2,
                  coalesce(sum(CASE WHEN k = 3 THEN rev END), 0)
                    ::BIGINT AS rev_w3
           FROM cum GROUP BY cw, cohort_size)
         SELECT p.cw AS cohort_week, p.cohort_size,
                p.rev_w0, p.rev_w1, p.rev_w2, p.rev_w3,
                coalesce(b.pk, -1)::BIGINT AS payback_week
         FROM piv p LEFT JOIN payback b ON p.cw = b.cw
         ORDER BY cohort_week""",

    "q524_huber_regression" ->
      """WITH base AS (
           SELECT CAST(l_quantity AS BIGINT) AS x,
                  floor(l_extendedprice * 100)::BIGINT AS y
           FROM lineitem),
         p1 AS (
           SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                  sum(y)::BIGINT AS sy,
                  sum(x::HUGEINT * y) AS sxy,
                  sum(x::HUGEINT * x) AS sxx
           FROM base),
         fit1 AS (
           SELECT n, sx, sy,
             CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
               / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
               AS b1
           FROM p1),
         fit1b AS (
           SELECT n, b1,
             (CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a1
           FROM fit1),
         scored AS (
           SELECT b.x, b.y, f.a1, f.b1, f.n,
             floor(abs(CAST(b.y AS DOUBLE)
               - (f.a1 + f.b1 * CAST(b.x AS DOUBLE))))::BIGINT AS rc
           FROM base b, fit1b f),
         scale AS (
           SELECT CAST(sum(rc) AS DOUBLE) / any_value(n) * 1.345 AS c
           FROM scored),
         weighted AS (
           SELECT s.x, s.y, s.a1, s.b1, s.n,
             (CASE WHEN CAST(s.rc AS DOUBLE) <= sc.c THEN 1000000
              ELSE floor(sc.c * 1e6 / CAST(s.rc AS DOUBLE))::BIGINT
              END)::BIGINT AS w_ppm
           FROM scored s, scale sc),
         p2 AS (
           SELECT sum(w_ppm)::BIGINT AS sw,
                  sum(w_ppm::HUGEINT * x) AS swx,
                  sum(w_ppm::HUGEINT * y) AS swy,
                  sum(w_ppm::HUGEINT * x * y) AS swxy,
                  sum(w_ppm::HUGEINT * x * x) AS swxx,
                  sum(CASE WHEN w_ppm < 1000000 THEN 1 ELSE 0 END)
                    ::BIGINT AS n_downweighted,
                  any_value(a1) AS a1, any_value(b1) AS b1,
                  any_value(n) AS n
           FROM weighted),
         fit2 AS (
           SELECT n, a1, b1, n_downweighted, sw, swx, swy,
             CAST(sw::HUGEINT * swxy - swx * swy AS DOUBLE)
               / CAST(sw::HUGEINT * swxx - swx * swx AS DOUBLE) AS b2
           FROM p2),
         fit2b AS (
           SELECT n, a1, b1, b2, n_downweighted,
             (CAST(swy AS DOUBLE) - b2 * CAST(swx AS DOUBLE))
               / CAST(sw AS DOUBLE) AS a2
           FROM fit2)
         SELECT n,
                floor(b1 * 1e6)::BIGINT AS slope_ols_micro,
                floor(b2 * 1e6)::BIGINT AS slope_huber_micro,
                floor(a1)::BIGINT AS intercept_ols_cents,
                floor(a2)::BIGINT AS intercept_huber_cents,
                n_downweighted
         FROM fit2b""",

    "q525_seasonal_index" ->
      """WITH daily AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1),
         ma AS (
           SELECT day, rev,
             sum(rev) OVER w AS sum7,
             count(*) OVER w AS cnt7
           FROM daily
           WINDOW w AS (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         ratios AS (
           SELECT day % 7 AS dow,
                  (rev * 7 * 1000000 // sum7)::BIGINT AS ratio_ppm
           FROM ma WHERE cnt7 = 7),
         by_dow AS (
           SELECT dow, count(*)::BIGINT AS n_days,
                  (sum(ratio_ppm) // count(*))::BIGINT
                    AS raw_index_ppm
           FROM ratios GROUP BY dow),
         tot AS (
           SELECT sum(raw_index_ppm)::BIGINT AS t FROM by_dow)
         SELECT b.dow, b.n_days, b.raw_index_ppm,
                (b.raw_index_ppm * 7000000 // t.t)::BIGINT
                  AS norm_index_ppm
         FROM by_dow b, tot t
         ORDER BY b.dow"""
  )
}
