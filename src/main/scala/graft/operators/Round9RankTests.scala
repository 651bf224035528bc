package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BG (q571-q573) — k-sample rank tests and signal
  * decomposition (public algorithms: Kruskal-Wallis [1952], the Haar
  * wavelet transform [Haar 1910], and the Ljung-Box portmanteau test
  * [Ljung-Box 1978]):
  *
  *  - q571: Kruskal-Wallis H across the five order priorities on the
  *    cent-value grain — doubled midranks (q569's trick) keep every
  *    rank sum an exact integer under ties; Σ R_j²/n_j runs in
  *    DECIMAL(38,0)/HUGEINT (R_j ~ n² overflows int64 past ~150k
  *    rows); tie-corrected H lands in milli with one final float
  *    expression.
  *  - q572: unnormalized integer Haar decomposition of the first 16
  *    days of each event-type's daily revenue — detail energies at
  *    three levels plus the level-3 approximation, all exact integer
  *    array folds on the calendar-bounded day grain. The
  *    multi-resolution "where does the variance live" readout.
  *  - q573: Ljung-Box Q over lags 1-5 of daily revenue —
  *    autocovariances computed EXACTLY as Σ(n·x_i − S)(n·x_{i+k} − S)
  *    (integer, centered without division), Q assembled in one fixed
  *    float expression per series. The "is this series white noise"
  *    gate before any forecasting model.
  */
object Round9RankTests {

  type Q = (SparkSession, String) => DataFrame

  private val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  /** Exact integer autocovariance numerator at lag k over arr with
    * row count nn and sum ss (Spark HOF text). The products grow as
    * (nn·deviation)² — a decade-scale day grain with milli-scaled
    * means can clear int64, so the fold accumulates in DECIMAL(38,0)
    * (the oracle's list_sum widens the same way via HUGEINT); the
    * c_k values only feed double expressions downstream. */
  private def ckSpark(k: Int): String =
    s"""aggregate(sequence(1, int(nn) - $k),
        CAST(0 AS DECIMAL(38,0)),
        (acc, i) -> acc
          + CAST(nn * element_at(arr, i) - ss AS DECIMAL(38,0))
          * (nn * element_at(arr, i + $k) - ss))"""

  private def ckDuck(k: Int): String =
    s"""list_sum(list_transform(range(1, (nn - $k + 1)::INT),
        i -> (nn * ms[i::INT] - ss)::HUGEINT
          * (nn * ms[(i + $k)::INT] - ss)))"""

  val queries: Seq[(String, Q)] = Seq(

    "q571_kruskal_wallis" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
          .as("v"), col("o_orderpriority").as("prio"))
      val grain = graft.Stage(base.groupBy(col("v"), col("prio"))
        .agg(count(lit(1)).as("c")), "q571_grain")
      val vTot = grain.groupBy(col("v"))
        .agg(sum(col("c")).as("tc"))
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = vTot
        .withColumn("cumb", coalesce(sum(col("tc")).over(wv), lit(0L)))
        .withColumn("r2", lit(2L) * col("cumb") + col("tc") + 1L)
      val perGroup = grain.join(ranked, Seq("v"))
        .groupBy(col("prio"))
        .agg(sum(col("c")).as("nj"),
          sum(col("c") * col("r2")).as("r2j"))
      val ties = ranked.agg(
        sum(col("tc") * col("tc") * col("tc") - col("tc"))
          .as("tieterm"))
      perGroup.agg(count(lit(1)).as("k"),
        sum(col("nj")).as("n"),
        sum(expr("""CAST(r2j AS DECIMAL(38,0)) * r2j
                    DIV (4 * nj)""")).as("sr2"))
        .crossJoin(broadcast(ties))
        .select(col("k"), col("n"),
          // H = [12/(n(n+1))·ΣR²/n_j − 3(n+1)] / (1 − Σ(t³−t)/(n³−n))
          expr("""CAST(floor(1000.0 *
              (12.0 * CAST(sr2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
              / (1.0 - CAST(tieterm AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n * n - n))) AS BIGINT)""")
            .as("h_milli"),
          (col("k") - 1L).as("df"))
    }),

    "q572_haar_energy" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"))
        .filter(size(col("series")) >= 16)
        .select(col("event_type"),
          expr("slice(transform(series, s -> s.m), 1, 16)").as("x"))
        // unnormalized Haar: a_i = x_{2i-1}+x_{2i}, d_i = x_{2i-1}−x_{2i}
        .withColumn("a1", expr(
          """transform(sequence(1, 8), i ->
             element_at(x, 2*int(i) - 1) + element_at(x, 2*int(i)))"""))
        .withColumn("e1", expr(
          """aggregate(sequence(1, 8), 0L, (acc, i) -> acc
             + (element_at(x, 2*int(i) - 1) - element_at(x, 2*int(i)))
             * (element_at(x, 2*int(i) - 1) - element_at(x, 2*int(i))))"""))
        .withColumn("a2", expr(
          """transform(sequence(1, 4), i ->
             element_at(a1, 2*int(i) - 1) + element_at(a1, 2*int(i)))"""))
        .withColumn("e2", expr(
          """aggregate(sequence(1, 4), 0L, (acc, i) -> acc
             + (element_at(a1, 2*int(i) - 1) - element_at(a1, 2*int(i)))
             * (element_at(a1, 2*int(i) - 1) - element_at(a1, 2*int(i))))"""))
        .withColumn("e3", expr(
          """aggregate(sequence(1, 2), 0L, (acc, i) -> acc
             + (element_at(a2, 2*int(i) - 1) - element_at(a2, 2*int(i)))
             * (element_at(a2, 2*int(i) - 1) - element_at(a2, 2*int(i))))"""))
        .withColumn("approx3", expr(
          """aggregate(a2, 0L, (acc, v) -> acc + v)"""))
        .select(col("event_type"), col("e1").as("energy_l1"),
          col("e2").as("energy_l2"), col("e3").as("energy_l3"),
          col("approx3").as("approx_sum"))
        .orderBy(col("event_type"))
    }),

    "q573_ljung_box" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      val ser = daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"))
        .select(col("event_type"),
          expr("transform(series, s -> s.m)").as("arr"))
        .withColumn("nn", size(col("arr")).cast("long"))
        .withColumn("ss", expr("aggregate(arr, 0L, (a, v) -> a + v)"))
        .filter(col("nn") >= 10)
      val withCk = (0 to 5).foldLeft(ser) { (df, k) =>
        df.withColumn(s"c$k", expr(ckSpark(k)))
      }
      val qTerms = (1 to 5).map { k =>
        s"""(CAST(c$k AS DOUBLE) / c0) * (CAST(c$k AS DOUBLE) / c0)
            / (nn - $k)"""
      }.mkString(" + ")
      withCk.select(col("event_type"), col("nn").as("n_days"),
        expr(s"""CAST(floor(1000.0 * nn * (nn + 2) * ($qTerms))
                 AS BIGINT)""").as("lb_q_milli"),
        expr("""CAST(floor(1000.0 * c1 / c0) AS BIGINT)""")
          .as("acf1_milli"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q571_kruskal_wallis" ->
      """WITH base AS (
           SELECT floor(o_totalprice * 100)::BIGINT AS v,
                  o_orderpriority AS prio
           FROM orders),
         grain AS (
           SELECT v, prio, count(*)::BIGINT AS c FROM base
           GROUP BY v, prio),
         vtot AS (
           SELECT v, sum(c)::BIGINT AS tc FROM grain GROUP BY v),
         ranked AS (
           SELECT *, coalesce(sum(tc) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS cumb,
                  2 * coalesce(sum(tc) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + tc + 1 AS r2
           FROM vtot),
         pergroup AS (
           SELECT g.prio, sum(g.c)::BIGINT AS nj,
                  sum(g.c * r.r2)::BIGINT AS r2j
           FROM grain g JOIN ranked r ON g.v = r.v
           GROUP BY g.prio),
         ties AS (
           SELECT sum(tc * tc * tc - tc)::BIGINT AS tieterm
           FROM ranked),
         agg AS (
           SELECT count(*)::BIGINT AS k, sum(nj)::BIGINT AS n,
                  sum(r2j::HUGEINT * r2j // (4 * nj)) AS sr2
           FROM pergroup)
         SELECT k, n,
                CAST(floor(1000.0 *
                  (12.0 * CAST(sr2 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                  / (1.0 - CAST(tieterm AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * n - n))) AS BIGINT)
                  AS h_milli,
                (k - 1)::BIGINT AS df
         FROM agg, ties""",

    "q572_haar_energy" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, list(m ORDER BY day) AS ms,
                  count(*)::BIGINT AS n
           FROM daily GROUP BY event_type),
         lvl AS (
           SELECT event_type, ms[1:16] AS x,
                  list_transform(range(1, 9),
                    i -> ms[(2*i - 1)::INT]::BIGINT
                       + ms[(2*i)::INT]::BIGINT) AS a1
           FROM ser WHERE n >= 16),
         lvl2 AS (
           SELECT *, list_transform(range(1, 5),
                    i -> a1[(2*i - 1)::INT] + a1[(2*i)::INT]) AS a2
           FROM lvl)
         SELECT event_type,
                list_sum(list_transform(range(1, 9),
                  i -> (x[(2*i - 1)::INT]::BIGINT - x[(2*i)::INT])
                     * (x[(2*i - 1)::INT]::BIGINT - x[(2*i)::INT])))
                  ::BIGINT AS energy_l1,
                list_sum(list_transform(range(1, 5),
                  i -> (a1[(2*i - 1)::INT] - a1[(2*i)::INT])
                     * (a1[(2*i - 1)::INT] - a1[(2*i)::INT])))
                  ::BIGINT AS energy_l2,
                list_sum(list_transform(range(1, 3),
                  i -> (a2[(2*i - 1)::INT] - a2[(2*i)::INT])
                     * (a2[(2*i - 1)::INT] - a2[(2*i)::INT])))
                  ::BIGINT AS energy_l3,
                list_sum(a2)::BIGINT AS approx_sum
         FROM lvl2 ORDER BY event_type""",

    "q573_ljung_box" -> {
      val cks = (0 to 5).map(k => s"${ckDuck(k)} AS c$k")
        .mkString(",\n                ")
      val qTerms = (1 to 5).map { k =>
        s"""(CAST(c$k AS DOUBLE) / c0) * (CAST(c$k AS DOUBLE) / c0)
            / (nn - $k)"""
      }.mkString(" + ")
      s"""WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, list(m ORDER BY day) AS ms,
                  count(*)::BIGINT AS nn,
                  sum(m)::BIGINT AS ss
           FROM daily GROUP BY event_type),
         withck AS (
           SELECT event_type, nn,
                $cks
           FROM ser WHERE nn >= 10)
         SELECT event_type, nn AS n_days,
                CAST(floor(1000.0 * nn * (nn + 2) * ($qTerms))
                  AS BIGINT) AS lb_q_milli,
                CAST(floor(1000.0 * c1 / c0) AS BIGINT)
                  AS acf1_milli
         FROM withck ORDER BY event_type"""
    }
  )
}
