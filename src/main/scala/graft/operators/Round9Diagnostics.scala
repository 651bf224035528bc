package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AU (q535-q537) — regression and contingency
  * diagnostics:
  *
  *  - q535: Durbin-Watson autocorrelation test on the residuals of
  *    the daily-revenue trend fit — THE standard "is my time-series
  *    regression lying to me" diagnostic. Residuals are floored to
  *    whole cents before the lag-difference sums so both engines
  *    sum exact integers (day-grain lag windows only);
  *    DW ≈ 2(1−ρ̂₁) read out with the conventional 1.5/2.5 verdict.
  *  - q536: first-order partial correlation r(quantity, price |
  *    discount) — the confounder-adjusted association from the
  *    closed form over three exact-moment Pearson correlations
  *    (products of sums DECIMAL-lifted). Reports all three raw
  *    correlations next to the partial.
  *  - q537: chi-square independence with per-cell ADJUSTED residuals
  *    (Haberman) for returnflag × linestatus — not just "is there
  *    dependence" (q406 Cramér's V) but WHICH cells deviate;
  *    |z| > 2.576 flags at the 1% level. Cell grid is
  *    category-bounded; one corpus aggregate.
  */
object Round9Diagnostics {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q535_durbin_watson" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L)
          .cast("long").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      val wD = Window.orderBy(col("day")) // calendar-bounded grain
      val idx = graft.Stage(daily
        .withColumn("x", row_number().over(wD).cast("long")),
        "q535_idx")
      val fit = idx.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
        .withColumn("b",
          (col("n").cast("decimal(38,0)") * col("sxy")
            - col("sx").cast("decimal(38,0)") * col("sy")).cast("double")
            / (col("n").cast("decimal(38,0)") * col("sxx")
              - col("sx").cast("decimal(38,0)") * col("sx"))
              .cast("double"))
        .withColumn("a",
          (col("sy").cast("double") - col("b") * col("sx").cast("double"))
            / col("n").cast("double"))
      val resid = idx.crossJoin(broadcast(fit.select(col("a"), col("b"),
          col("n"))))
        .withColumn("e",
          floor(col("y").cast("double")
            - (col("a") + col("b") * col("x").cast("double")))
            .cast("long"))
        .withColumn("e_lag", lag(col("e"), 1).over(wD))
      resid.agg(first(col("n")).as("n_days"),
        sum(col("e").cast("decimal(38,0)") * col("e")).as("see"),
        sum(when(col("e_lag").isNotNull,
          (col("e") - col("e_lag")).cast("decimal(38,0)")
            * (col("e") - col("e_lag"))).otherwise(lit(0)))
          .as("sdd"))
        .select(col("n_days"),
          floor(col("sdd").cast("double") / col("see").cast("double")
            * 1000).cast("long").as("dw_milli"),
          when(col("sdd").cast("double") / col("see").cast("double")
            < 1.5, lit("positive_autocorr"))
            .when(col("sdd").cast("double") / col("see").cast("double")
              > 2.5, lit("negative_autocorr"))
            .otherwise(lit("none")).as("verdict"))
    }),

    "q536_partial_correlation" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"),
        floor(col("l_discount") * 10000).cast("long").as("z"))
      val sums = base.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("z")).as("sxz"),
        sum(col("y").cast("decimal(38,0)") * col("z")).as("syz"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("z").cast("decimal(38,0)") * col("z")).as("szz"))
      def corr(ab: String, aa: String, bb: String, a: String,
               b: String) =
        (col("n").cast("decimal(38,0)") * col(ab)
          - col(a).cast("decimal(38,0)") * col(b)).cast("double") /
          (sqrt((col("n").cast("decimal(38,0)") * col(aa)
            - col(a).cast("decimal(38,0)") * col(a)).cast("double"))
            * sqrt((col("n").cast("decimal(38,0)") * col(bb)
              - col(b).cast("decimal(38,0)") * col(b)).cast("double")))
      sums
        .withColumn("rxy", corr("sxy", "sxx", "syy", "sx", "sy"))
        .withColumn("rxz", corr("sxz", "sxx", "szz", "sx", "sz"))
        .withColumn("ryz", corr("syz", "syy", "szz", "sy", "sz"))
        .withColumn("partial",
          (col("rxy") - col("rxz") * col("ryz"))
            / (sqrt(lit(1.0) - col("rxz") * col("rxz"))
              * sqrt(lit(1.0) - col("ryz") * col("ryz"))))
        .select(col("n").as("n_rows"),
          floor(col("rxy") * 1e6).cast("long").as("r_xy_ppm"),
          floor(col("rxz") * 1e6).cast("long").as("r_xz_ppm"),
          floor(col("ryz") * 1e6).cast("long").as("r_yz_ppm"),
          floor(col("partial") * 1e6).cast("long")
            .as("r_xy_given_z_ppm"))
    }),

    "q537_chi_residual_cells" -> ((s, d) => {
      val cells = graft.Stage(t(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("a"),
          col("l_linestatus").as("b"))
        .agg(count(lit(1)).as("obs")), "q537_cells")
      val rowT = cells.groupBy(col("a")).agg(sum(col("obs")).as("ra"))
      val colT = cells.groupBy(col("b")).agg(sum(col("obs")).as("cb"))
      val tot = cells.agg(sum(col("obs")).as("nn"))
      cells.join(broadcast(rowT), Seq("a"))
        .join(broadcast(colT), Seq("b"))
        .crossJoin(broadcast(tot))
        .withColumn("expd",
          (col("ra").cast("decimal(38,0)") * col("cb")).cast("double")
            / col("nn").cast("double"))
        .withColumn("adj_z",
          (col("obs").cast("double") - col("expd"))
            / sqrt(col("expd")
              * (lit(1.0) - col("ra").cast("double") / col("nn"))
              * (lit(1.0) - col("cb").cast("double") / col("nn"))))
        .select(col("a"), col("b"), col("obs"),
          floor(col("expd") * 1000).cast("long").as("expected_milli"),
          floor(col("adj_z") * 1000).cast("long").as("adj_z_milli"),
          when(abs(col("adj_z")) > 2.576, 1L).otherwise(0L)
            .as("deviant_1pct"))
        .orderBy(col("a"), col("b"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q535_durbin_watson" ->
      """WITH daily AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS y
           FROM events GROUP BY 1),
         idx AS (
           SELECT day, y,
                  row_number() OVER (ORDER BY day)::BIGINT AS x
           FROM daily),
         p AS (
           SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                  sum(y)::BIGINT AS sy,
                  sum(x::HUGEINT * y) AS sxy,
                  sum(x::HUGEINT * x) AS sxx
           FROM idx),
         fit AS (
           SELECT n, sx, sy,
             CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
               / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
               AS b
           FROM p),
         fit2 AS (
           SELECT n, b,
             (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
           FROM fit),
         resid AS (
           SELECT i.day, f.n,
             floor(CAST(i.y AS DOUBLE)
               - (f.a + f.b * CAST(i.x AS DOUBLE)))::BIGINT AS e
           FROM idx i, fit2 f),
         lagged AS (
           SELECT n, e, lag(e, 1) OVER (ORDER BY day) AS e_lag
           FROM resid),
         sums AS (
           SELECT any_value(n)::BIGINT AS n_days,
                  sum(e::HUGEINT * e) AS see,
                  sum(CASE WHEN e_lag IS NOT NULL
                      THEN (e - e_lag)::HUGEINT * (e - e_lag)
                      ELSE 0 END) AS sdd
           FROM lagged)
         SELECT n_days,
                floor(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                  * 1000)::BIGINT AS dw_milli,
                (CASE WHEN CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                        < 1.5 THEN 'positive_autocorr'
                      WHEN CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                        > 2.5 THEN 'negative_autocorr'
                      ELSE 'none' END) AS verdict
         FROM sums""",

    "q536_partial_correlation" ->
      """WITH base AS (
           SELECT CAST(l_quantity AS BIGINT) AS x,
                  floor(l_extendedprice * 100)::BIGINT AS y,
                  floor(l_discount * 10000)::BIGINT AS z
           FROM lineitem),
         s AS (
           SELECT count(*)::BIGINT AS n,
                  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                  sum(z)::BIGINT AS sz,
                  sum(x::HUGEINT * y) AS sxy,
                  sum(x::HUGEINT * z) AS sxz,
                  sum(y::HUGEINT * z) AS syz,
                  sum(x::HUGEINT * x) AS sxx,
                  sum(y::HUGEINT * y) AS syy,
                  sum(z::HUGEINT * z) AS szz
           FROM base),
         r AS (
           SELECT n,
             CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
               / (sqrt(CAST(n::HUGEINT * sxx - sx::HUGEINT * sx
                   AS DOUBLE))
                 * sqrt(CAST(n::HUGEINT * syy - sy::HUGEINT * sy
                     AS DOUBLE))) AS rxy,
             CAST(n::HUGEINT * sxz - sx::HUGEINT * sz AS DOUBLE)
               / (sqrt(CAST(n::HUGEINT * sxx - sx::HUGEINT * sx
                   AS DOUBLE))
                 * sqrt(CAST(n::HUGEINT * szz - sz::HUGEINT * sz
                     AS DOUBLE))) AS rxz,
             CAST(n::HUGEINT * syz - sy::HUGEINT * sz AS DOUBLE)
               / (sqrt(CAST(n::HUGEINT * syy - sy::HUGEINT * sy
                   AS DOUBLE))
                 * sqrt(CAST(n::HUGEINT * szz - sz::HUGEINT * sz
                     AS DOUBLE))) AS ryz
           FROM s)
         SELECT n AS n_rows,
                floor(rxy * 1e6)::BIGINT AS r_xy_ppm,
                floor(rxz * 1e6)::BIGINT AS r_xz_ppm,
                floor(ryz * 1e6)::BIGINT AS r_yz_ppm,
                floor((rxy - rxz * ryz)
                  / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz))
                  * 1e6)::BIGINT AS r_xy_given_z_ppm
         FROM r""",

    "q537_chi_residual_cells" ->
      """WITH cells AS (
           SELECT l_returnflag AS a, l_linestatus AS b,
                  count(*)::BIGINT AS obs
           FROM lineitem GROUP BY 1, 2),
         rt AS (SELECT a, sum(obs)::BIGINT AS ra FROM cells GROUP BY a),
         ct AS (SELECT b, sum(obs)::BIGINT AS cb FROM cells GROUP BY b),
         tt AS (SELECT sum(obs)::BIGINT AS nn FROM cells),
         scored AS (
           SELECT c.a, c.b, c.obs,
             CAST(r.ra::HUGEINT * x.cb AS DOUBLE)
               / CAST(t.nn AS DOUBLE) AS expd,
             (CAST(c.obs AS DOUBLE)
               - CAST(r.ra::HUGEINT * x.cb AS DOUBLE)
                 / CAST(t.nn AS DOUBLE))
               / sqrt((CAST(r.ra::HUGEINT * x.cb AS DOUBLE)
                   / CAST(t.nn AS DOUBLE))
                 * (1.0 - CAST(r.ra AS DOUBLE) / t.nn)
                 * (1.0 - CAST(x.cb AS DOUBLE) / t.nn)) AS adj_z
           FROM cells c
           JOIN rt r ON c.a = r.a
           JOIN ct x ON c.b = x.b, tt t)
         SELECT a, b, obs,
                floor(expd * 1000)::BIGINT AS expected_milli,
                floor(adj_z * 1000)::BIGINT AS adj_z_milli,
                (CASE WHEN abs(adj_z) > 2.576 THEN 1 ELSE 0 END)
                  ::BIGINT AS deviant_1pct
         FROM scored ORDER BY a, b"""
  )
}
