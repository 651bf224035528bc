package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch L (q428-q430): metric-movement explanation operators —
  * the "why did the number change" layer a warehouse owner reaches for
  * right after the dashboards the earlier rounds built (WoW report
  * q366, seasonality q382, PSI drift q383):
  *
  *  - q428: period-over-period mix/rate decomposition (the standard
  *    two-factor bridge: how much of the average-order-value change is
  *    segment MIX shift vs per-segment RATE change),
  *  - q429: linear-interpolation resampling of a sparse hourly series
  *    onto a dense grid (the gap-filling sibling of q260's LOCF),
  *  - q430: piecewise-linear fit with a grid-searched knot (segmented
  *    regression — the regression sibling of q415's best-split finder).
  *
  * All arithmetic is anchored in exact integers (cents / micros / ppm,
  * integer DIV) so both engines agree bit-for-bit; q430's SSE is a
  * fixed expression tree over exact integer sums, so its DOUBLE is
  * reproducible. Every corpus-scale stage is one keyed aggregate; the
  * decomposition/knot/grid logic runs on bounded rows (5 segments, 41
  * knots, <=720 grid hours per series).
  */
object Round9Decomp {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Average-order-value bridge 1995 -> 1996 by o_orderpriority.
    // Per segment: share w_p (ppm of period orders) and rate r_p
    // (avg cents, integer DIV); the bridge terms are
    //   mix_eff  = (w2 - w1) * r1   [micro-cents]
    //   rate_eff = w2 * (r2 - r1)   [micro-cents]
    // One corpus aggregate; everything after runs on 5x2 rows.
    "q428_mix_rate_decomp" -> ((s, d) => {
      val seg = t(s, d, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy(col("o_orderpriority").as("segment"),
          year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val tot = seg.groupBy(col("y"))
        .agg(sum(col("n")).as("tn"), sum(col("cents")).as("tc"))
      val w = seg.join(broadcast(tot), "y")
        .select(col("segment"), col("y"), col("n"),
          expr("1000000 * n DIV tn").as("w_ppm"),
          expr("cents DIV n").as("r_cents"))
      val p1 = w.filter(col("y") === 1995)
        .select(col("segment"), col("n").as("n1"),
          col("w_ppm").as("w1_ppm"), col("r_cents").as("r1_cents"))
      val p2 = w.filter(col("y") === 1996)
        .select(col("segment"), col("n").as("n2"),
          col("w_ppm").as("w2_ppm"), col("r_cents").as("r2_cents"))
      p1.join(p2, "segment")
        .select(col("segment"), col("n1"), col("n2"),
          col("w1_ppm"), col("w2_ppm"), col("r1_cents"), col("r2_cents"),
          ((col("w2_ppm") - col("w1_ppm")) * col("r1_cents"))
            .as("mix_eff_micro"),
          (col("w2_ppm") * (col("r2_cents") - col("r1_cents")))
            .as("rate_eff_micro"))
        .orderBy(col("segment"))
    }),

    // Linear-interpolation resample: per event_type, the hourly
    // sum(value) series has gaps (868 of 3600 hours known at sf0.001);
    // fill each missing grid hour between the series' first and last
    // known hour with v_prev + (v_next - v_prev) * gap_pos DIV gap_len
    // (integer micros). Report per (type, day): known hours, filled
    // hours, and the day's interpolated total. The corpus sees one
    // aggregate; the grid is <=720 rows per series.
    "q429_interp_resample" -> ((s, d) => {
      val known = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(floor(col("value") * 1000000).cast("long")).as("v"))
      val bounds = known.groupBy(col("event_type"))
        .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val grid = bounds.select(col("event_type"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("h"))
      val joined = grid.join(known, Seq("event_type", "h"), "left")
      val wAsc = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.partitionBy(col("event_type"))
        .orderBy(col("h").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = joined
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wAsc))
        .withColumn("ph", last(when(col("v").isNotNull, col("h")),
          ignoreNulls = true).over(wAsc))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wDesc))
        .withColumn("nh", last(when(col("v").isNotNull, col("h")),
          ignoreNulls = true).over(wDesc))
        // floor() on the double ratio on BOTH sides: Spark's
        // cast(double AS long) truncates while DuckDB's rounds, so the
        // shared integer anchor is floor of an identical IEEE
        // expression tree over exact integer inputs.
        .withColumn("iv", when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + floor((col("nv") - col("pv")) *
            expr("(unix_timestamp(h) - unix_timestamp(ph))") /
            expr("(unix_timestamp(nh) - unix_timestamp(ph))"))))
      filled.groupBy(col("event_type"),
          to_date(col("h")).cast("string").as("day"))
        .agg(sum(when(col("v").isNotNull, 1L).otherwise(0L))
            .as("known_hours"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("filled_hours"),
          sum(col("iv")).as("day_total_micro"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Segmented regression: fit y = a + b*x separately left/right of a
    // knot over (x = p_size, y = p_retailprice cents), for every knot
    // in 5..45; SSE per side from the closed form
    //   SSE = (Syy - Sy^2/n) - (Sxy - Sx*Sy/n)^2 / (Sxx - Sx^2/n)
    // computed from exact integer prefix sums over the 50 size buckets.
    // One corpus aggregate; the knot search is a 41-row window scan.
    "q430_piecewise_knot" -> ((s, d) => {
      val buck = t(s, d, "part")
        .select(col("p_size").cast("long").as("x"),
          floor(col("p_retailprice") * 100).cast("long").as("y"))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("n"), sum(col("x") * col("x")).as("sxx0"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("sx", col("x") * col("n"))
      val wc = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = buck // 50 rows: the single-partition window is bounded
        .withColumn("cn", sum(col("n")).over(wc))
        .withColumn("csx", sum(col("sx")).over(wc))
        .withColumn("csy", sum(col("sy")).over(wc))
        .withColumn("csxx", sum(col("sxx0")).over(wc))
        .withColumn("csxy", sum(col("sxy")).over(wc))
        .withColumn("csyy", sum(col("syy")).over(wc))
      val totals = cum.orderBy(col("x").desc).limit(1)
        .select(col("cn").as("tn"), col("csx").as("tsx"),
          col("csy").as("tsy"), col("csxx").as("tsxx"),
          col("csxy").as("tsxy"), col("csyy").as("tsyy"))
      def sse(n: String, sx: String, sy: String, sxx: String,
          sxy: String, syy: String): String =
        s"""(($syy - CAST($sy AS DOUBLE) * $sy / $n)
            - ($sxy - CAST($sx AS DOUBLE) * $sy / $n)
              * ($sxy - CAST($sx AS DOUBLE) * $sy / $n)
              / ($sxx - CAST($sx AS DOUBLE) * $sx / $n))"""
      val knots = cum.filter(col("x").between(5, 45))
        .crossJoin(broadcast(totals))
        .select(col("x").as("knot"), col("cn").as("n_left"),
          (col("tn") - col("cn")).as("n_right"),
          (expr(sse("cn", "csx", "csy", "csxx", "csxy", "csyy")) +
            expr(sse("(tn - cn)", "(tsx - csx)", "(tsy - csy)",
              "(tsxx - csxx)", "(tsxy - csxy)", "(tsyy - csyy)")))
            .as("sse_total"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing) // 41 rows
      knots.withColumn("is_best",
          (col("sse_total") === min(col("sse_total")).over(wAll))
            .cast("long"))
        .orderBy(col("knot"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q428_mix_rate_decomp" ->
      """WITH seg AS (
           SELECT o_orderpriority AS segment,
                  year(o_orderdate) AS y, count(*)::BIGINT AS n,
                  sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS cents
           FROM orders WHERE year(o_orderdate) IN (1995, 1996)
           GROUP BY 1, 2),
         tot AS (SELECT y, sum(n)::BIGINT AS tn FROM seg GROUP BY y),
         w AS (
           SELECT s.segment, s.y, s.n,
                  (1000000 * s.n) // t.tn AS w_ppm,
                  s.cents // s.n AS r_cents
           FROM seg s JOIN tot t ON s.y = t.y)
         SELECT p1.segment, p1.n AS n1, p2.n AS n2,
                p1.w_ppm AS w1_ppm, p2.w_ppm AS w2_ppm,
                p1.r_cents AS r1_cents, p2.r_cents AS r2_cents,
                ((p2.w_ppm - p1.w_ppm) * p1.r_cents)::BIGINT
                  AS mix_eff_micro,
                (p2.w_ppm * (p2.r_cents - p1.r_cents))::BIGINT
                  AS rate_eff_micro
         FROM w p1 JOIN w p2 ON p1.segment = p2.segment
         WHERE p1.y = 1995 AND p2.y = 1996
         ORDER BY p1.segment""",

    "q429_interp_resample" ->
      """WITH known AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
                  sum(floor(value * 1000000)::BIGINT)::BIGINT AS v
           FROM events GROUP BY 1, 2),
         bounds AS (
           SELECT event_type, min(h) AS lo, max(h) AS hi
           FROM known GROUP BY 1),
         allh AS (
           -- generate_series needs constant bounds in this DuckDB: use
           -- a fixed over-wide year grid, then clamp to each series'
           -- [lo, hi] (the events fixture lives inside 2024).
           SELECT g.h
           FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-12-31 23:00:00',
                                INTERVAL 1 HOUR) AS g(h)),
         grid AS (
           SELECT b.event_type, a.h
           FROM bounds b JOIN allh a ON a.h BETWEEN b.lo AND b.hi),
         joined AS (
           SELECT g.event_type, g.h, k.v
           FROM grid g LEFT JOIN known k
             ON g.event_type = k.event_type AND g.h = k.h),
         filled AS (
           SELECT event_type, h, v,
                  last_value(v IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS pv,
                  last_value(CASE WHEN v IS NOT NULL THEN h END
                    IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS ph,
                  last_value(v IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY h DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS nv,
                  last_value(CASE WHEN v IS NOT NULL THEN h END
                    IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY h DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS nh
           FROM joined),
         iv AS (
           SELECT event_type, h, v,
                  CASE WHEN v IS NOT NULL THEN v
                       ELSE pv + CAST(floor((nv - pv)
                         * (epoch(h) - epoch(ph))
                         / (epoch(nh) - epoch(ph))) AS BIGINT) END AS iv
           FROM filled)
         SELECT event_type, CAST(CAST(h AS DATE) AS VARCHAR) AS day,
                sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                  AS known_hours,
                sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS filled_hours,
                sum(iv)::BIGINT AS day_total_micro
         FROM iv GROUP BY 1, 2 ORDER BY 1, 2""",

    "q430_piecewise_knot" ->
      """WITH buck AS (
           SELECT p_size::BIGINT AS x, count(*)::BIGINT AS n,
                  sum(p_size::BIGINT * p_size::BIGINT)::BIGINT AS sxx0,
                  sum(floor(p_retailprice * 100)::BIGINT)::BIGINT AS sy,
                  sum(p_size::BIGINT
                      * floor(p_retailprice * 100)::BIGINT)::BIGINT
                    AS sxy,
                  sum(floor(p_retailprice * 100)::BIGINT
                      * floor(p_retailprice * 100)::BIGINT)::BIGINT
                    AS syy
           FROM part GROUP BY 1),
         cum AS (
           SELECT x,
                  sum(n) OVER w::BIGINT AS cn,
                  sum(x * n) OVER w::BIGINT AS csx,
                  sum(sy) OVER w::BIGINT AS csy,
                  sum(sxx0) OVER w::BIGINT AS csxx,
                  sum(sxy) OVER w::BIGINT AS csxy,
                  sum(syy) OVER w::BIGINT AS csyy
           FROM buck
           WINDOW w AS (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         tot AS (
           SELECT cn AS tn, csx AS tsx, csy AS tsy, csxx AS tsxx,
                  csxy AS tsxy, csyy AS tsyy
           FROM cum ORDER BY x DESC LIMIT 1),
         knots AS (
           SELECT x AS knot, cn AS n_left, (tn - cn)::BIGINT AS n_right,
                  ((csyy - CAST(csy AS DOUBLE) * csy / cn)
                   - (csxy - CAST(csx AS DOUBLE) * csy / cn)
                     * (csxy - CAST(csx AS DOUBLE) * csy / cn)
                     / (csxx - CAST(csx AS DOUBLE) * csx / cn))
                  +
                  (((tsyy - csyy) - CAST(tsy - csy AS DOUBLE)
                      * (tsy - csy) / (tn - cn))
                   - ((tsxy - csxy) - CAST(tsx - csx AS DOUBLE)
                       * (tsy - csy) / (tn - cn))
                     * ((tsxy - csxy) - CAST(tsx - csx AS DOUBLE)
                         * (tsy - csy) / (tn - cn))
                     / ((tsxx - csxx) - CAST(tsx - csx AS DOUBLE)
                         * (tsx - csx) / (tn - cn)))
                    AS sse_total
           FROM cum CROSS JOIN tot WHERE x BETWEEN 5 AND 45)
         SELECT knot, n_left, n_right, sse_total,
                (CASE WHEN sse_total = min(sse_total) OVER ()
                      THEN 1 ELSE 0 END)::BIGINT AS is_best
         FROM knots ORDER BY knot"""
  )
}
