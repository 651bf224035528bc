package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AT (q532-q534) — factorial designs, count-model
  * diagnostics, and concentration curves:
  *
  *  - q532: two-way ANOVA (returnflag × linestatus on price) — main
  *    effect and interaction sums of squares from exact per-cell
  *    integer moments via the standard SS identities (all
  *    DECIMAL-lifted), F statistics only at the final bounded
  *    scalars. Extends q474's one-way design to the factorial case.
  *  - q533: overdispersion diagnostic for per-user purchase counts —
  *    dispersion index var/mean (Poisson ⇒ 1), the Cameron-Trivedi
  *    flavored z on exact count moments, and the method-of-moments
  *    negative-binomial (r, p) fit that a count model would use
  *    instead. One user-grain aggregate, one global aggregate.
  *  - q534: Lorenz curve + Gini for customer-revenue concentration —
  *    exact G = 2·Σ rank·y / (n·Σy) − (n+1)/n with GLOBAL ranks from
  *    the q345 range-partition pattern (per-partition windows +
  *    broadcast offsets, never a single-partition sort), plus the
  *    cumulative-share curve at each decile boundary. The
  *    concentration companion to q509's Theil decomposition.
  */
object Round9Anova2 {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q532_two_way_anova" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("a"), col("l_linestatus").as("b"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      val cells = graft.Stage(base.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("q")),
        "q532_cells")
      val tot = cells.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
        sum(col("q")).as("qq"), count(lit(1)).as("n_cells"))
      val aM = cells.groupBy(col("a"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      val bM = cells.groupBy(col("b"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      // SS contributions Σ s²/n, each an exact-decimal ratio -> double
      val ssA = aM.agg(sum((col("s").cast("decimal(38,0)") * col("s"))
        .cast("double") / col("n").cast("double")).as("va"),
        count(lit(1)).as("ka"))
      val ssB = bM.agg(sum((col("s").cast("decimal(38,0)") * col("s"))
        .cast("double") / col("n").cast("double")).as("vb"),
        count(lit(1)).as("kb"))
      val ssC = cells.agg(sum((col("s").cast("decimal(38,0)") * col("s"))
        .cast("double") / col("n").cast("double")).as("vc"))
      tot.crossJoin(ssA).crossJoin(ssB).crossJoin(ssC)
        .withColumn("cf", (col("ss").cast("decimal(38,0)") * col("ss"))
          .cast("double") / col("nn").cast("double"))
        .withColumn("ss_total", col("qq").cast("double") - col("cf"))
        .withColumn("ss_a", col("va") - col("cf"))
        .withColumn("ss_b", col("vb") - col("cf"))
        .withColumn("ss_ab",
          col("vc") - col("va") - col("vb") + col("cf"))
        .withColumn("ss_err", col("qq").cast("double") - col("vc"))
        .withColumn("df_a", col("ka") - 1)
        .withColumn("df_b", col("kb") - 1)
        .withColumn("df_ab", (col("ka") - 1) * (col("kb") - 1))
        .withColumn("df_err", col("nn") - col("n_cells"))
        .select(col("nn").as("n_rows"),
          floor(col("ss_a") / col("df_a")
            / (col("ss_err") / col("df_err")) * 1000).cast("long")
            .as("f_a_milli"),
          floor(col("ss_b") / col("df_b")
            / (col("ss_err") / col("df_err")) * 1000).cast("long")
            .as("f_b_milli"),
          floor(col("ss_ab") / col("df_ab")
            / (col("ss_err") / col("df_err")) * 1000).cast("long")
            .as("f_ab_milli"),
          floor(col("ss_ab") * 1e6 / col("ss_total")).cast("long")
            .as("interaction_share_ppm"))
    }),

    "q533_overdispersion" -> ((s, d) => {
      val counts = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
      val m = counts.agg(count(lit(1)).as("n"), sum(col("k")).as("s1"),
        sum(col("k") * col("k")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("variance",
          (col("s2").cast("double")
            - col("n") * col("mean") * col("mean"))
            / (col("n") - 1))
        .withColumn("dispersion", col("variance") / col("mean"))
      // MoM NB fit: p = m/v, r = m^2/(v-m)  (only when v > m)
      m.select(col("n").as("n_users"), col("s1").as("n_purchases"),
        floor(col("mean") * 1000).cast("long").as("mean_milli"),
        floor(col("variance") * 1000).cast("long").as("var_milli"),
        floor(col("dispersion") * 1000).cast("long")
          .as("dispersion_milli"),
        when(col("variance") > col("mean"),
          floor(col("mean") * col("mean")
            / (col("variance") - col("mean")) * 1000).cast("long"))
          .otherwise(lit(-1L)).as("nb_r_milli"),
        when(col("variance") > col("mean"),
          floor(col("mean") / col("variance") * 1e6).cast("long"))
          .otherwise(lit(-1L)).as("nb_p_ppm"))
    }),

    "q534_lorenz_gini" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val y = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("y"))
      val parts = y.repartitionByRange(8, col("y"), col("o_custkey"))
        .withColumn("pid", spark_partition_id())
      val wR = Window.partitionBy(col("pid"))
        .orderBy(col("y"), col("o_custkey"))
      val local = graft.Stage(parts
        .withColumn("lrank", row_number().over(wR))
        .withColumn("lcum", sum(col("y")).over(wR.rowsBetween(
          Window.unboundedPreceding, Window.currentRow))), "q534_local")
      val per = local.groupBy(col("pid"))
        .agg(count(lit(1)).as("c"), sum(col("y")).as("sy"))
        .collect().sortBy(_.getInt(0)) // bounded: one row per partition
      val offC = per.scanLeft((0, 0L)) { case ((_, acc), r) =>
        (r.getInt(0), acc + r.getLong(1)) }
      val offS = per.scanLeft((0, 0L)) { case ((_, acc), r) =>
        (r.getInt(0), acc + r.getLong(2)) }
      val offDf = offC.init.zip(offC.tail).zip(offS.init.zip(offS.tail))
        .map { case (((_, cb), (pid, _)), ((_, sb), _)) => (pid, cb, sb) }
        .toSeq.toDF("pid", "coff", "soff")
      val ranked = graft.Stage(local.join(broadcast(offDf), Seq("pid"))
        .withColumn("rank", col("coff") + col("lrank"))
        .withColumn("cum", col("soff") + col("lcum")), "q534_ranked")
      val tot = ranked.agg(max(col("rank")).as("n"),
        sum(col("y")).as("yy"),
        sum(col("rank").cast("decimal(38,0)") * col("y")).as("ry"))
      val gini = tot.select(col("n"), col("yy"),
        floor((lit(2.0) * col("ry").cast("double")
          / (col("n").cast("double") * col("yy").cast("double"))
          - (col("n") + 1).cast("double") / col("n").cast("double"))
          * 1e6).cast("long").as("gini_ppm"))
      // Lorenz share at each decile boundary rank ⌊k·n/10⌋
      val curve = ranked.crossJoin(broadcast(tot))
        .filter(col("rank") * 10 % col("n") < 10) // rank = floor(k n/10)
        .withColumn("decile", expr("rank * 10 DIV n"))
        .groupBy(col("decile"))
        .agg(max(expr("cum * 1000000 DIV yy")).as("cum_share_ppm"))
        .filter(col("decile").between(1, 9))
      curve.crossJoin(broadcast(gini))
        .select(col("decile"), col("cum_share_ppm"), col("n"),
          col("gini_ppm"))
        .orderBy(col("decile"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q532_two_way_anova" ->
      """WITH base AS (
           SELECT l_returnflag AS a, l_linestatus AS b,
                  floor(l_extendedprice * 100)::BIGINT AS y
           FROM lineitem),
         cells AS (
           SELECT a, b, count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
                  sum(y::HUGEINT * y) AS q
           FROM base GROUP BY a, b),
         tot AS (
           SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss,
                  sum(q) AS qq, count(*)::BIGINT AS n_cells
           FROM cells),
         am AS (
           SELECT sum(CAST(s2.s::HUGEINT * s2.s AS DOUBLE)
               / s2.n) AS va,
             count(*)::BIGINT AS ka
           FROM (SELECT a, sum(n)::BIGINT AS n, sum(s)::BIGINT AS s
                 FROM cells GROUP BY a) s2),
         bm AS (
           SELECT sum(CAST(s2.s::HUGEINT * s2.s AS DOUBLE)
               / s2.n) AS vb,
             count(*)::BIGINT AS kb
           FROM (SELECT b, sum(n)::BIGINT AS n, sum(s)::BIGINT AS s
                 FROM cells GROUP BY b) s2),
         cm AS (
           SELECT sum(CAST(s::HUGEINT * s AS DOUBLE) / n) AS vc
           FROM cells),
         calc AS (
           SELECT t.nn,
             CAST(t.ss::HUGEINT * t.ss AS DOUBLE) / t.nn AS cf,
             CAST(t.qq AS DOUBLE) AS qd,
             a.va, a.ka, b.vb, b.kb, c.vc, t.n_cells
           FROM tot t, am a, bm b, cm c),
         fin AS (
           SELECT nn,
             qd - cf AS ss_total,
             va - cf AS ss_a, vb - cf AS ss_b,
             vc - va - vb + cf AS ss_ab,
             qd - vc AS ss_err,
             ka - 1 AS df_a, kb - 1 AS df_b,
             (ka - 1) * (kb - 1) AS df_ab,
             nn - n_cells AS df_err
           FROM calc)
         SELECT nn AS n_rows,
                floor(ss_a / df_a / (ss_err / df_err) * 1000)::BIGINT
                  AS f_a_milli,
                floor(ss_b / df_b / (ss_err / df_err) * 1000)::BIGINT
                  AS f_b_milli,
                floor(ss_ab / df_ab / (ss_err / df_err) * 1000)::BIGINT
                  AS f_ab_milli,
                floor(ss_ab * 1e6 / ss_total)::BIGINT
                  AS interaction_share_ppm
         FROM fin""",

    "q533_overdispersion" ->
      """WITH counts AS (
           SELECT user_id, count(*)::BIGINT AS k
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id),
         m AS (
           SELECT count(*)::BIGINT AS n, sum(k)::BIGINT AS s1,
                  sum(k * k)::BIGINT AS s2
           FROM counts),
         st AS (
           SELECT n, s1,
             CAST(s1 AS DOUBLE) / n AS mean,
             (CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n)
               * (CAST(s1 AS DOUBLE) / n)) / (n - 1) AS variance
           FROM m)
         SELECT n AS n_users, s1 AS n_purchases,
                floor(mean * 1000)::BIGINT AS mean_milli,
                floor(variance * 1000)::BIGINT AS var_milli,
                floor(variance / mean * 1000)::BIGINT
                  AS dispersion_milli,
                (CASE WHEN variance > mean
                 THEN floor(mean * mean / (variance - mean) * 1000)
                 ELSE -1 END)::BIGINT AS nb_r_milli,
                (CASE WHEN variance > mean
                 THEN floor(mean / variance * 1e6)
                 ELSE -1 END)::BIGINT AS nb_p_ppm
         FROM st""",

    "q534_lorenz_gini" ->
      """WITH y AS (
           SELECT o_custkey,
                  sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS y
           FROM orders GROUP BY o_custkey),
         ranked AS (
           SELECT y, o_custkey,
                  row_number() OVER (ORDER BY y, o_custkey)::BIGINT
                    AS rank,
                  sum(y) OVER (ORDER BY y, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    ::BIGINT AS cum
           FROM y),
         tot AS (
           SELECT max(rank)::BIGINT AS n, sum(y)::BIGINT AS yy,
                  sum(rank::HUGEINT * y) AS ry
           FROM ranked),
         gini AS (
           SELECT n, yy,
             floor((2.0 * CAST(ry AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(yy AS DOUBLE))
               - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE))
               * 1e6)::BIGINT AS gini_ppm
           FROM tot),
         curve AS (
           SELECT (r.rank * 10 // t.n)::BIGINT AS decile,
                  max(r.cum * 1000000 // t.yy)::BIGINT
                    AS cum_share_ppm
           FROM ranked r, tot t
           WHERE (r.rank * 10) % t.n < 10
           GROUP BY 1)
         SELECT c.decile, c.cum_share_ppm, g.n, g.gini_ppm
         FROM curve c, gini g
         WHERE c.decile BETWEEN 1 AND 9
         ORDER BY c.decile"""
  )
}
