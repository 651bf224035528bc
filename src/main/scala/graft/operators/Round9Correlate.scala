package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AJ (q502-q504) — shrinkage estimation and rank /
  * lag dependence:
  *
  *  - q502: empirical-Bayes beta-binomial shrinkage of per-part
  *    return rates — the standard small-n de-noising before ranking
  *    entities by a rate (a 30-lineitem part with 40% returns is not
  *    "worse" than a 10k-lineitem part at 30%). Beta(α, β) is
  *    moment-matched from the across-parts ppm-rate mean/variance
  *    (exact integer sums, DECIMAL-lifted squares), each part's rate
  *    shrunk to (k+α)/(n+α+β), and the 10 most-moved parts reported
  *    via TakeOrdered top-k (no global window).
  *  - q503: Spearman rank correlation between part size and part
  *    popularity — Pearson over tie-averaged ranks, with ranks kept
  *    integral as r2 = 2·cnt_less + cnt_eq + 1 (= 2·avg_rank) and
  *    computed on the VALUE grain (p_size ≤ 50 distinct values,
  *    popularity counts a small bounded domain), so the only windows
  *    run over value-domain-bounded frames — never a corpus-sized
  *    sort. Products of rank sums lifted to DECIMAL(38)/HUGEINT.
  *  - q504: cross-correlation lag finder between the daily 'view'
  *    and 'purchase' revenue series — Pearson at each lead of 0..10
  *    days via an equi-join on (day + lag) over the calendar-bounded
  *    day grain, all moments exact integer cents (DECIMAL-lifted
  *    products), the best lag flagged by a deterministic
  *    (corr desc, lag asc) rank over the 11-row lag grain.
  */
object Round9Correlate {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q502_eb_shrinkage" -> ((s, d) => {
      val pk = t(s, d, "lineitem")
        .groupBy(col("l_partkey").as("partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("k"))
        .withColumn("raw_ppm", expr("k * 1000000 DIV n"))
      val g = pk.agg(count(lit(1)).as("np"),
        sum(col("raw_ppm").cast("decimal(38,0)")).as("s1"),
        sum(col("raw_ppm").cast("decimal(38,0)") * col("raw_ppm"))
          .as("s2"))
        .withColumn("m",
          col("s1").cast("double") / col("np") / 1e6)
        .withColumn("v",
          (col("s2").cast("double") / col("np")
            - (col("s1").cast("double") / col("np"))
              * (col("s1").cast("double") / col("np"))) / 1e12)
        .withColumn("f", col("m") * (lit(1.0) - col("m")) / col("v")
          - lit(1.0))
        .select((col("m") * col("f")).as("alpha"),
          ((lit(1.0) - col("m")) * col("f")).as("beta"))
      pk.crossJoin(broadcast(g))
        .withColumn("shrunk_ppm",
          floor((col("k").cast("double") + col("alpha")) * 1e6
            / (col("n").cast("double") + col("alpha") + col("beta")))
            .cast("long"))
        .withColumn("gap_ppm", abs(col("raw_ppm") - col("shrunk_ppm")))
        .orderBy(col("gap_ppm").desc, col("partkey").asc)
        .limit(10)
        .select(col("partkey"), col("n"), col("k"), col("raw_ppm"),
          col("shrunk_ppm"), col("gap_ppm"))
    }),

    "q503_spearman_rank_corr" -> ((s, d) => {
      val pop = t(s, d, "lineitem")
        .groupBy(col("l_partkey").as("partkey"))
        .agg(count(lit(1)).as("y"))
      val base0 = t(s, d, "part")
        .select(col("p_partkey").as("partkey"),
          col("p_size").cast("long").as("x"))
        .join(pop, Seq("partkey"))
      val staged = graft.Stage(base0, "q503_base")
      // tie-averaged rank ×2 on the value grain: r2 = 2·less + eq + 1
      def rank2(df: DataFrame, c: String): DataFrame = {
        val w = Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.groupBy(col(c)).agg(count(lit(1)).as("eq"))
          .withColumn("cum", sum(col("eq")).over(w)) // ≤ value-domain rows
          .select(col(c),
            ((col("cum") - col("eq")) * 2 + col("eq") + 1).as(s"r$c"))
      }
      val ranked = staged
        .join(broadcast(rank2(staged, "x")), Seq("x"))
        .join(broadcast(rank2(staged, "y")), Seq("y"))
      val sums = ranked.agg(count(lit(1)).as("n_parts"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum(col("rx").cast("decimal(38,0)") * col("ry")).as("sxy"),
        sum(col("rx").cast("decimal(38,0)") * col("rx")).as("sxx"),
        sum(col("ry").cast("decimal(38,0)") * col("ry")).as("syy"))
      sums.select(col("n_parts"),
        floor(
          (col("n_parts") * col("sxy") - col("sx") * col("sy"))
            .cast("double") * 1e6
            / (sqrt((col("n_parts") * col("sxx")
              - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n_parts") * col("syy")
                - col("sy") * col("sy")).cast("double"))))
          .cast("long").as("rho_ppm"))
    }),

    "q504_xcorr_lag" -> ((s, d) => {
      def daily(ty: String, v: String, dy: String): DataFrame =
        t(s, d, "events").filter(col("event_type") === ty)
          .groupBy(floor(unix_timestamp(col("ts")) / 86400L)
            .cast("long").as(dy))
          .agg(sum(floor(col("value") * 100).cast("long")).as(v))
      val x = daily("view", "xv", "day")
        .withColumn("lag", explode(array((0 to 10).map(lit(_)): _*)))
        .withColumn("day2", col("day") + col("lag"))
      val joined = x.join(daily("purchase", "yv", "day2"), Seq("day2"))
      val perLag = joined.groupBy(col("lag").cast("long").as("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("xv").cast("decimal(38,0)")).as("sx"),
          sum(col("yv").cast("decimal(38,0)")).as("sy"),
          sum(col("xv").cast("decimal(38,0)") * col("yv")).as("sxy"),
          sum(col("xv").cast("decimal(38,0)") * col("xv")).as("sxx"),
          sum(col("yv").cast("decimal(38,0)") * col("yv")).as("syy"))
        .withColumn("xcorr_ppm", floor(
          (col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") * 1e6
            / (sqrt((col("n_days") * col("sxx")
              - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n_days") * col("syy")
                - col("sy") * col("sy")).cast("double"))))
          .cast("long"))
      val w = Window.orderBy(col("xcorr_ppm").desc, col("lag").asc)
      perLag // 11-row lag grain
        .withColumn("is_best",
          when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select(col("lag"), col("n_days"), col("xcorr_ppm"),
          col("is_best"))
        .orderBy(col("lag"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q502_eb_shrinkage" ->
      """WITH pk AS (
           SELECT l_partkey AS partkey, count(*)::BIGINT AS n,
                  sum(CASE WHEN l_returnflag = 'R' THEN 1
                      ELSE 0 END)::BIGINT AS k
           FROM lineitem GROUP BY l_partkey),
         pk2 AS (
           SELECT partkey, n, k,
                  (k * 1000000 // n)::BIGINT AS raw_ppm
           FROM pk),
         g AS (
           SELECT count(*)::BIGINT AS np,
                  sum(raw_ppm::HUGEINT) AS s1,
                  sum(raw_ppm::HUGEINT * raw_ppm) AS s2
           FROM pk2),
         ab AS (
           SELECT
             (CAST(s1 AS DOUBLE) / np / 1e6)
               * ((CAST(s1 AS DOUBLE) / np / 1e6)
                  * (1.0 - CAST(s1 AS DOUBLE) / np / 1e6)
                  / ((CAST(s2 AS DOUBLE) / np
                      - (CAST(s1 AS DOUBLE) / np)
                        * (CAST(s1 AS DOUBLE) / np)) / 1e12)
                  - 1.0) AS alpha,
             (1.0 - CAST(s1 AS DOUBLE) / np / 1e6)
               * ((CAST(s1 AS DOUBLE) / np / 1e6)
                  * (1.0 - CAST(s1 AS DOUBLE) / np / 1e6)
                  / ((CAST(s2 AS DOUBLE) / np
                      - (CAST(s1 AS DOUBLE) / np)
                        * (CAST(s1 AS DOUBLE) / np)) / 1e12)
                  - 1.0) AS beta
           FROM g)
         SELECT p.partkey, p.n, p.k, p.raw_ppm,
                floor((CAST(p.k AS DOUBLE) + a.alpha) * 1e6
                  / (CAST(p.n AS DOUBLE) + a.alpha + a.beta))::BIGINT
                  AS shrunk_ppm,
                abs(p.raw_ppm - floor((CAST(p.k AS DOUBLE) + a.alpha)
                  * 1e6 / (CAST(p.n AS DOUBLE) + a.alpha + a.beta))
                  ::BIGINT)::BIGINT AS gap_ppm
         FROM pk2 p, ab a
         ORDER BY gap_ppm DESC, partkey LIMIT 10""",

    "q503_spearman_rank_corr" ->
      """WITH pop AS (
           SELECT l_partkey AS partkey, count(*)::BIGINT AS y
           FROM lineitem GROUP BY l_partkey),
         base AS (
           SELECT p.p_partkey AS partkey,
                  CAST(p.p_size AS BIGINT) AS x, o.y
           FROM part p JOIN pop o ON p.p_partkey = o.partkey),
         rx AS (
           SELECT x,
             ((sum(count(*)) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - count(*)) * 2 + count(*) + 1)::BIGINT AS rx
           FROM base GROUP BY x),
         ry AS (
           SELECT y,
             ((sum(count(*)) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - count(*)) * 2 + count(*) + 1)::BIGINT AS ry
           FROM base GROUP BY y),
         ranked AS (
           SELECT b.partkey, r1.rx, r2.ry
           FROM base b
           JOIN rx r1 ON b.x = r1.x
           JOIN ry r2 ON b.y = r2.y),
         sums AS (
           SELECT count(*)::BIGINT AS n_parts,
                  sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
                  sum(rx::HUGEINT * ry) AS sxy,
                  sum(rx::HUGEINT * rx) AS sxx,
                  sum(ry::HUGEINT * ry) AS syy
           FROM ranked)
         SELECT n_parts,
                floor(CAST(n_parts * sxy - sx * sy AS DOUBLE) * 1e6
                  / (sqrt(CAST(n_parts * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n_parts * syy - sy * sy AS DOUBLE))))
                  ::BIGINT AS rho_ppm
         FROM sums""",

    "q504_xcorr_lag" ->
      """WITH xd AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS xv
           FROM events WHERE event_type = 'view' GROUP BY 1),
         yd AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day2,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS yv
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         joined AS (
           SELECT l.range::BIGINT AS lag, x.xv, y.yv
           FROM xd x
           CROSS JOIN range(0, 11) l
           JOIN yd y ON y.day2 = x.day + l.range),
         per_lag AS (
           SELECT lag, count(*)::BIGINT AS n_days,
                  sum(xv::HUGEINT) AS sx, sum(yv::HUGEINT) AS sy,
                  sum(xv::HUGEINT * yv) AS sxy,
                  sum(xv::HUGEINT * xv) AS sxx,
                  sum(yv::HUGEINT * yv) AS syy
           FROM joined GROUP BY lag),
         scored AS (
           SELECT lag, n_days,
                  floor(CAST(n_days * sxy - sx * sy AS DOUBLE) * 1e6
                    / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                       * sqrt(CAST(n_days * syy - sy * sy
                           AS DOUBLE))))::BIGINT AS xcorr_ppm
           FROM per_lag)
         SELECT lag, n_days, xcorr_ppm,
                CASE WHEN row_number() OVER (
                  ORDER BY xcorr_ppm DESC, lag) = 1 THEN 1
                ELSE 0 END::BIGINT AS is_best
         FROM scored ORDER BY lag"""
  )
}
