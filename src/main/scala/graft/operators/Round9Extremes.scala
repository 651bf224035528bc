package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AK (q505-q507) — long-range dependence, extreme
  * values, and coverage-maximizing selection:
  *
  *  - q505: Hurst exponent by rescaled-range (R/S) analysis of the
  *    hourly revenue series. Within each block of size s ∈ {8,16,32,
  *    64}, deviations are kept INTEGER by scaling: dev_i = s·x_i −
  *    Σx (so the block mean never becomes a float mid-computation);
  *    R/S = (max−min cumdev) / sqrt(s·Σx² − (Σx)²) touches doubles
  *    only at the final per-block scalar, floored to ppm before the
  *    cross-block average so engine sum order cannot drift. H is
  *    the 4-point log-log OLS slope. All windows run on the
  *    calendar-bounded day/block grain.
  *  - q506: greedy set-cover document selection — the classic
  *    coverage-maximizing subset pick for training-data curation
  *    (choose k docs whose union vocabulary is largest; greedy is
  *    the (1−1/e) approximation). 5 rounds, each one anti-join +
  *    keyed count + a SINGLE-ROW argmax to the driver (bounded);
  *    ties break to the smaller doc_id on both engines.
  *  - q507: Gumbel extreme-value fit on daily maxima of hourly
  *    revenue, method of moments (β = sd·√6/π, μ = mean − γβ), with
  *    10/52/365-block return levels — the capacity-
  *    planning readout (what daily peak to provision for). Moments
  *    from exact integer cents (squares DECIMAL-lifted); doubles
  *    only on the final bounded scalars.
  */
object Round9Extremes {

  type Q = (SparkSession, String) => DataFrame

  private val EULER = 0.5772156649015329 // Euler-Mascheroni

  val queries: Seq[(String, Q)] = Seq(

    "q505_hurst_rs" -> ((s, d) => {
      // hourly grain: the fixture spans 30 days — 720 hourly points
      // give 11..90 full blocks per size; still calendar-bounded
      val hourly = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      val wHr = Window.orderBy(col("hr")) // hour grain, calendar-bounded
      val idx = hourly.withColumn("i", row_number().over(wHr) - 1)
      val sizes = Seq(8, 16, 32, 64)
      val perSize = sizes.map { bs =>
        val blocks = idx.withColumn("blk", expr(s"i DIV $bs"))
          .withColumn("j", col("i") % bs)
        val stats = blocks.groupBy(col("blk"))
          .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"),
            sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
          .filter(col("cnt") === bs) // full blocks only
        val wBlk = Window.partitionBy(col("blk")).orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rs = blocks.join(stats, Seq("blk"))
          // integer deviations: dev = bs*x - sum(x); cum over ≤bs rows
          .withColumn("dev", lit(bs.toLong) * col("x") - col("sx"))
          .withColumn("cum", sum(col("dev")).over(wBlk))
          .groupBy(col("blk"), col("sx"), col("sxx"))
          .agg((greatest(max(col("cum")), lit(0L))
            - least(min(col("cum")), lit(0L))).as("r_int"))
          // R/S = (r_int/bs) / (sqrt(bs*sxx - sx^2)/bs) = r_int/sqrt(..)
          .withColumn("rs_ppm",
            floor(col("r_int").cast("double") * 1e6
              / sqrt((lit(bs.toLong).cast("decimal(38,0)") * col("sxx")
                - col("sx").cast("decimal(38,0)") * col("sx"))
                .cast("double"))).cast("long"))
        rs.agg(count(lit(1)).as("n_blocks"),
          sum(col("rs_ppm")).as("rs_sum"))
          .select(floor(col("rs_sum").cast("double") / col("n_blocks"))
            .cast("long").as(s"rs${bs}_ppm"))
      }
      // u = log2(s) is exactly {3,4,5,6}, so the OLS slope collapses
      // to the closed form (3*(w64-w8) + (w32-w16)) / 10 — fixed
      // operation order, no 4-row float-sum ambiguity across engines
      val one = perSize.reduce(_ crossJoin _)
      def w(bs: Int) = log(col(s"rs${bs}_ppm").cast("double") / 1e6)
      one.select(col("rs8_ppm"), col("rs16_ppm"), col("rs32_ppm"),
        col("rs64_ppm"),
        floor((lit(3.0) * (w(64) - w(8)) + (w(32) - w(16)))
          / 10.0 * 1e6).cast("long").as("hurst_ppm"))
    }),

    "q506_greedy_set_cover" -> ((s, d) => {
      // coverage universe = word bigrams (the fixture's unigram
      // vocabulary is 24 words — trivially covered by one doc); the
      // per-row zip keeps shingling shuffle-free (q283 pattern)
      val toks = graft.Stage(t(s, d, "documents")
        .select(col("doc_id"),
          split(lower(col("text")), " +").as("tk"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(tk) < 2 THEN array()
             ELSE zip_with(slice(tk, 1, size(tk) - 1),
                           slice(tk, 2, size(tk) - 1),
                           (a, b) -> concat(a, ' ', b)) END""")).as("tok"))
        .distinct(), "q506_toks")
      var covered = toks.select(col("tok")).limit(0)
      var picked = Vector.empty[(Long, Long, Long)] // (step, doc, gain)
      var exhausted = false
      for (step <- 1 to 5 if !exhausted) {
        val marg = toks.join(covered, Seq("tok"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
          .collect() // bounded: at most one argmax row per round
        if (marg.isEmpty) exhausted = true // vocabulary fully covered
        else {
          val (doc, gain) = (marg.head.getLong(0), marg.head.getLong(1))
          picked :+= ((step.toLong, doc, gain))
          covered = covered.unionByName(
            toks.filter(col("doc_id") === doc).select(col("tok")))
        }
      }
      val spark = s
      import spark.implicits._
      val cum = picked.scanLeft(0L)(_ + _._3).tail
      picked.zip(cum).map { case ((st, doc, g), c) => (st, doc, g, c) }
        .toDF("step", "doc_id", "gain", "covered_total")
    }),

    "q507_gumbel_return_levels" -> ((s, d) => {
      // block maxima: per-day max of HOURLY revenue (the fixture
      // spans 30 days -> 30 blocks of 24 hourly observations)
      val dailyMax = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 3600L)
          .cast("long").as("hr"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
        .groupBy(expr("hr DIV 24").as("day"))
        .agg(max(col("x")).as("mx"))
      val m = dailyMax.agg(count(lit(1)).as("n"),
        sum(col("mx")).as("s1"),
        sum(col("mx").cast("decimal(38,0)") * col("mx")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("sd", sqrt(
          (col("n").cast("decimal(38,0)") * col("s2")
            - col("s1").cast("decimal(38,0)") * col("s1"))
            .cast("double"))
          / col("n").cast("double"))
        .withColumn("beta",
          col("sd") * math.sqrt(6.0) / math.Pi)
        .withColumn("mu", col("mean") - lit(EULER) * col("beta"))
      def rl(tt: Int) = floor(col("mu") - col("beta")
        * log(-log(lit(1.0) - lit(1.0) / tt))).cast("long")
        .as(s"rl_${tt}_cents")
      m.select(col("n").as("n_blocks"),
        floor(col("mu")).cast("long").as("mu_cents"),
        floor(col("beta")).cast("long").as("beta_cents"),
        rl(10), rl(52), rl(365))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q505_hurst_rs" -> {
      val per = Seq(8, 16, 32, 64).map { bs =>
        s"""rs$bs AS (
           SELECT floor(CAST(sum(rs_ppm) AS DOUBLE) / count(*))::BIGINT
               AS rs${bs}_ppm
           FROM (
             SELECT b.blk,
               floor(CAST(greatest(max(b.cum), 0)
                   - least(min(b.cum), 0) AS DOUBLE) * 1e6
                 / sqrt(CAST($bs::HUGEINT * any_value(st.sxx)
                   - any_value(st.sx)::HUGEINT * any_value(st.sx)
                   AS DOUBLE)))::BIGINT AS rs_ppm
             FROM (
               SELECT i.blk, i.j,
                 sum($bs * i.x - st.sx) OVER (
                   PARTITION BY i.blk ORDER BY i.j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
               FROM (SELECT i // $bs AS blk, i % $bs AS j, x
                     FROM idx) i
               JOIN (SELECT i // $bs AS blk,
                       count(*)::BIGINT AS cnt,
                       sum(x)::BIGINT AS sx,
                       sum(x::HUGEINT * x) AS sxx
                     FROM idx GROUP BY 1) st
                 ON i.blk = st.blk AND st.cnt = $bs) b
             JOIN (SELECT i // $bs AS blk, sum(x)::BIGINT AS sx,
                     sum(x::HUGEINT * x) AS sxx
                   FROM idx GROUP BY 1) st ON b.blk = st.blk
             GROUP BY b.blk))"""
      }.mkString(",\n         ")
      s"""WITH hourly AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT AS hr,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS x
           FROM events GROUP BY 1),
         idx AS (
           SELECT (row_number() OVER (ORDER BY hr) - 1)::BIGINT AS i,
                  x
           FROM hourly),
         $per
         SELECT rs8_ppm, rs16_ppm, rs32_ppm, rs64_ppm,
                floor((3.0 * (ln(CAST(rs64_ppm AS DOUBLE) / 1e6)
                    - ln(CAST(rs8_ppm AS DOUBLE) / 1e6))
                  + (ln(CAST(rs32_ppm AS DOUBLE) / 1e6)
                    - ln(CAST(rs16_ppm AS DOUBLE) / 1e6)))
                  / 10.0 * 1e6)::BIGINT AS hurst_ppm
         FROM rs8, rs16, rs32, rs64"""
    },

    "q506_greedy_set_cover" -> {
      // unrolled greedy: w_k = argmax marginal gain given cov_{k-1}
      val rounds = (1 to 5).map { k =>
        val anti = if (k == 1) ""
        else s"WHERE tok NOT IN (SELECT tok FROM cov${k - 1})"
        val covPrev = if (k == 1) "SELECT tok FROM toks WHERE 1=0"
        else s"SELECT tok FROM cov${k - 1}"
        s"""w$k AS (
           SELECT $k::BIGINT AS step, doc_id,
                  count(*)::BIGINT AS gain
           FROM toks $anti
           GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
         cov$k AS (
           SELECT tok FROM ($covPrev)
           UNION
           SELECT t.tok FROM toks t, w$k
           WHERE t.doc_id = w$k.doc_id)"""
      }.mkString(",\n         ")
      s"""WITH tk AS (
           SELECT doc_id, string_split_regex(lower(text), ' +') AS tk
           FROM documents),
         toks AS (
           SELECT DISTINCT doc_id,
                  tk[i + 1] || ' ' || tk[i + 2] AS tok
           FROM tk, unnest(generate_series(0, len(tk) - 2)) t(i)
           WHERE len(tk) >= 2),
         $rounds,
         allw AS (
           SELECT * FROM w1 UNION ALL SELECT * FROM w2
           UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4
           UNION ALL SELECT * FROM w5)
         SELECT step, doc_id, gain,
                (sum(gain) OVER (ORDER BY step
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  ::BIGINT AS covered_total
         FROM allw ORDER BY step"""
    },

    "q507_gumbel_return_levels" ->
      s"""WITH hourly AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT AS hr,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS x
           FROM events GROUP BY 1),
         wm AS (
           SELECT hr // 24 AS day, max(x)::BIGINT AS mx
           FROM hourly GROUP BY 1),
         m AS (
           SELECT count(*)::BIGINT AS n, sum(mx)::BIGINT AS s1,
                  sum(mx::HUGEINT * mx) AS s2
           FROM wm),
         fit AS (
           SELECT n,
             CAST(s1 AS DOUBLE) / n AS mean,
             sqrt(CAST(n::HUGEINT * s2 - s1::HUGEINT * s1 AS DOUBLE))
               / CAST(n AS DOUBLE) AS sd
           FROM m),
         gm AS (
           SELECT n, mean, sd * sqrt(6.0) / pi() AS beta,
                  mean - $EULER * (sd * sqrt(6.0) / pi()) AS mu
           FROM fit)
         SELECT n AS n_blocks,
                floor(mu)::BIGINT AS mu_cents,
                floor(beta)::BIGINT AS beta_cents,
                floor(mu - beta * ln(-ln(1.0 - 1.0 / 10)))::BIGINT
                  AS rl_10_cents,
                floor(mu - beta * ln(-ln(1.0 - 1.0 / 52)))::BIGINT
                  AS rl_52_cents,
                floor(mu - beta * ln(-ln(1.0 - 1.0 / 365)))::BIGINT
                  AS rl_365_cents
         FROM gm"""
  )
}
