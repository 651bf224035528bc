package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AL (q508-q510) — inventory policy, inequality
  * decomposition, and stationarity testing:
  *
  *  - q508: safety-stock / reorder-point calculator — per-part daily
  *    demand moments over the FULL calendar span (absent days are
  *    zero demand, handled by dividing present-day sums by the
  *    global day count instead of densifying), reorder point =
  *    ⌈L·μ + 1.645·√(L·σ²)⌉ at 7-day lead time. The classic
  *    newsvendor-adjacent policy readout. One (part, day) aggregate
  *    + one part-grain aggregate; the day-span scalar broadcasts.
  *  - q509: Theil-T inequality decomposition of customer revenue
  *    into between-nation and within-nation components. Per-customer
  *    contributions r·ln r are floored to 1e-9 units BEFORE the
  *    corpus-wide sum (float-sum order cannot drift the result);
  *    ratios are exact-integer products (DECIMAL-lifted where they
  *    exceed 2^63) cast to double once. Between-group terms get the
  *    same integer-sum treatment over the ≤25 nation rows.
  *  - q510: (augmented-lite) Dickey-Fuller unit-root test on the
  *    daily revenue series: Δy_t = α + ρ·y_{t−1}, DF = ρ̂/se(ρ̂),
  *    compared to the 5% critical value −2.86. All OLS moments are
  *    exact integer cents sums (products of sums DECIMAL-lifted);
  *    SSE via Σz² − α̂Σz − ρ̂Σxz so no second pass over the data.
  *    Day-grain lag windows only.
  */
object Round9Stationarity {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q508_safety_stock" -> ((s, d) => {
      val demand = t(s, d, "lineitem")
        .select(col("l_partkey").as("partkey"),
          floor(unix_timestamp(col("l_shipdate")) / 86400L)
            .cast("long").as("day"),
          col("l_quantity").cast("long").as("q"))
      val span = demand.agg(
        (max(col("day")) - min(col("day")) + 1L).as("n_days"))
      val byDay = demand.groupBy(col("partkey"), col("day"))
        .agg(sum(col("q")).as("qd"))
      val perPart = byDay.groupBy(col("partkey"))
        .agg(count(lit(1)).as("active_days"),
          sum(col("qd")).as("total_qty"),
          sum(col("qd").cast("decimal(38,0)") * col("qd")).as("s2"))
      perPart.crossJoin(broadcast(span))
        .withColumn("mean", col("total_qty").cast("double")
          / col("n_days"))
        .withColumn("variance", col("s2").cast("double") / col("n_days")
          - col("mean") * col("mean"))
        .withColumn("rop_units",
          ceil(lit(7.0) * col("mean")
            + lit(1.645) * sqrt(lit(7.0) * col("variance")))
            .cast("long"))
        .orderBy(col("total_qty").desc, col("partkey").asc)
        .limit(10)
        .select(col("partkey"), col("total_qty"), col("active_days"),
          col("n_days"),
          floor(col("mean") * 1000).cast("long").as("mean_qty_milli"),
          col("rop_units"))
    }),

    "q509_theil_decomposition" -> ((s, d) => {
      val cust = t(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("y"))
        .join(t(s, d, "customer")
          .select(col("c_custkey").as("custkey"),
            col("c_nationkey").cast("long").as("nation")), Seq("custkey"))
      val cstats = graft.Stage(cust, "q509_cust")
      val tot = cstats.agg(count(lit(1)).as("nn"), sum(col("y")).as("yy"))
      // per-customer r·ln r floored to nano units, then exact int sum
      val total = cstats.crossJoin(broadcast(tot))
        .withColumn("r",
          (col("y").cast("decimal(38,0)") * col("nn")).cast("double")
            / col("yy").cast("double"))
        .withColumn("c_nano",
          floor(col("r") * log(col("r")) * 1e9).cast("long"))
        .agg(sum(col("c_nano")).as("sum_nano"),
          first(col("nn")).as("nn"))
        .select(col("nn"),
          floor(col("sum_nano").cast("double") / 1e9 / col("nn") * 1e6)
            .cast("long").as("theil_total_micro"))
      val grp = cstats.groupBy(col("nation"))
        .agg(count(lit(1)).as("ng"), sum(col("y")).as("yg"))
      val between = grp.crossJoin(broadcast(tot))
        .withColumn("rg",
          (col("yg").cast("decimal(38,0)") * col("nn")).cast("double")
            / (col("yy").cast("decimal(38,0)") * col("ng"))
              .cast("double"))
        .withColumn("b_nano",
          floor(col("ng").cast("double") / col("nn")
            * col("rg") * log(col("rg")) * 1e9).cast("long"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("b_nano")).as("sb_nano"))
        .select(col("n_groups"),
          floor(col("sb_nano").cast("double") / 1e9 * 1e6)
            .cast("long").as("theil_between_micro"))
      total.crossJoin(between)
        .select(col("nn").as("n_customers"), col("n_groups"),
          col("theil_total_micro"), col("theil_between_micro"),
          (col("theil_total_micro") - col("theil_between_micro"))
            .as("theil_within_micro"))
    }),

    "q510_adf_unit_root" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L)
          .cast("long").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      val wDay = Window.orderBy(col("day")) // calendar-bounded grain
      val lagged = daily
        .withColumn("x", lag(col("y"), 1).over(wDay))
        .filter(col("x").isNotNull)
        .withColumn("z", col("y") - col("x"))
      val sums = lagged.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(col("x").cast("decimal(38,0)") * col("z")).as("sxz"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("z").cast("decimal(38,0)") * col("z")).as("szz"))
      sums
        .withColumn("den",
          (col("n").cast("decimal(38,0)") * col("sxx")
            - col("sx").cast("decimal(38,0)") * col("sx"))
            .cast("double"))
        .withColumn("rho",
          (col("n").cast("decimal(38,0)") * col("sxz")
            - col("sx").cast("decimal(38,0)") * col("sz"))
            .cast("double") / col("den"))
        .withColumn("alpha",
          (col("sz").cast("double") - col("rho") * col("sx").cast("double"))
            / col("n").cast("double"))
        .withColumn("sse",
          col("szz").cast("double") - col("alpha") * col("sz").cast("double")
            - col("rho") * col("sxz").cast("double"))
        .withColumn("df_stat", col("rho")
          / sqrt(col("sse") / (col("n") - 2).cast("double")
            * col("n").cast("double") / col("den")))
        .select(col("n").as("n_obs"),
          floor(col("rho") * 1e6).cast("long").as("rho_micro"),
          floor(col("df_stat") * 1000).cast("long").as("df_stat_milli"),
          when(col("df_stat") < -2.86, 1L).otherwise(0L)
            .as("stationary_5pct"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q508_safety_stock" ->
      """WITH demand AS (
           SELECT l_partkey AS partkey,
                  floor(epoch(l_shipdate::TIMESTAMP) / 86400)::BIGINT
                    AS day,
                  CAST(l_quantity AS BIGINT) AS q
           FROM lineitem),
         span AS (
           SELECT (max(day) - min(day) + 1)::BIGINT AS n_days
           FROM demand),
         by_day AS (
           SELECT partkey, day, sum(q)::BIGINT AS qd
           FROM demand GROUP BY partkey, day),
         per_part AS (
           SELECT partkey, count(*)::BIGINT AS active_days,
                  sum(qd)::BIGINT AS total_qty,
                  sum(qd::HUGEINT * qd) AS s2
           FROM by_day GROUP BY partkey)
         SELECT p.partkey, p.total_qty, p.active_days, s.n_days,
           floor(CAST(p.total_qty AS DOUBLE) / s.n_days * 1000)::BIGINT
             AS mean_qty_milli,
           ceil(7.0 * (CAST(p.total_qty AS DOUBLE) / s.n_days)
             + 1.645 * sqrt(7.0 * (CAST(p.s2 AS DOUBLE) / s.n_days
               - (CAST(p.total_qty AS DOUBLE) / s.n_days)
                 * (CAST(p.total_qty AS DOUBLE) / s.n_days))))::BIGINT
             AS rop_units
         FROM per_part p, span s
         ORDER BY p.total_qty DESC, p.partkey LIMIT 10""",

    "q509_theil_decomposition" ->
      """WITH cust AS (
           SELECT o.o_custkey AS custkey,
                  sum(floor(o.o_totalprice * 100)::BIGINT)::BIGINT
                    AS y,
                  any_value(c.c_nationkey)::BIGINT AS nation
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY o.o_custkey),
         tot AS (
           SELECT count(*)::BIGINT AS nn, sum(y)::BIGINT AS yy
           FROM cust),
         total AS (
           SELECT t.nn,
             floor(CAST(sum(floor(
               (CAST(c.y::HUGEINT * t.nn AS DOUBLE)
                  / CAST(t.yy AS DOUBLE))
               * ln(CAST(c.y::HUGEINT * t.nn AS DOUBLE)
                  / CAST(t.yy AS DOUBLE)) * 1e9)::BIGINT)
               AS DOUBLE) / 1e9 / t.nn * 1e6)::BIGINT
               AS theil_total_micro
           FROM cust c, tot t GROUP BY t.nn),
         grp AS (
           SELECT nation, count(*)::BIGINT AS ng, sum(y)::BIGINT AS yg
           FROM cust GROUP BY nation),
         between_t AS (
           SELECT count(*)::BIGINT AS n_groups,
             floor(CAST(sum(floor(
               CAST(g.ng AS DOUBLE) / t.nn
               * (CAST(g.yg::HUGEINT * t.nn AS DOUBLE)
                  / CAST(t.yy::HUGEINT * g.ng AS DOUBLE))
               * ln(CAST(g.yg::HUGEINT * t.nn AS DOUBLE)
                  / CAST(t.yy::HUGEINT * g.ng AS DOUBLE))
               * 1e9)::BIGINT) AS DOUBLE) / 1e9 * 1e6)::BIGINT
               AS theil_between_micro
           FROM grp g, tot t)
         SELECT t.nn AS n_customers, b.n_groups,
                tt.theil_total_micro, b.theil_between_micro,
                (tt.theil_total_micro - b.theil_between_micro)::BIGINT
                  AS theil_within_micro
         FROM tot t, total tt, between_t b""",

    "q510_adf_unit_root" ->
      """WITH daily AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS y
           FROM events GROUP BY 1),
         lagged AS (
           SELECT y, lag(y, 1) OVER (ORDER BY day) AS x
           FROM daily),
         lz AS (
           SELECT x, (y - x)::BIGINT AS z
           FROM lagged WHERE x IS NOT NULL),
         sums AS (
           SELECT count(*)::BIGINT AS n,
                  sum(x)::BIGINT AS sx, sum(z)::BIGINT AS sz,
                  sum(x::HUGEINT * z) AS sxz,
                  sum(x::HUGEINT * x) AS sxx,
                  sum(z::HUGEINT * z) AS szz
           FROM lz),
         fit AS (
           SELECT n,
             CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
               AS den,
             CAST(n::HUGEINT * sxz - sx::HUGEINT * sz AS DOUBLE)
               / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
               AS rho,
             sx, sz, sxz, szz
           FROM sums),
         fit2 AS (
           SELECT n, den, rho,
             (CAST(sz AS DOUBLE) - rho * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS alpha,
             sz, sxz, szz
           FROM fit),
         fit3 AS (
           SELECT n, den, rho,
             CAST(szz AS DOUBLE) - alpha * CAST(sz AS DOUBLE)
               - rho * CAST(sxz AS DOUBLE) AS sse
           FROM fit2),
         df AS (
           SELECT n, rho,
             rho / sqrt(sse / CAST(n - 2 AS DOUBLE)
               * CAST(n AS DOUBLE) / den) AS df_stat
           FROM fit3)
         SELECT n AS n_obs,
                floor(rho * 1e6)::BIGINT AS rho_micro,
                floor(df_stat * 1000)::BIGINT AS df_stat_milli,
                (CASE WHEN df_stat < -2.86 THEN 1 ELSE 0 END)::BIGINT
                  AS stationary_5pct
         FROM df"""
  )
}
