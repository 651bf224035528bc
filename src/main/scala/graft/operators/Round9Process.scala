package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BF (q568-q570) — process mining and rank statistics
  * (public algorithms: the directly-follows process map [van der
  * Aalst, Process Mining 2011], the Mann-Whitney U test with tie
  * correction [Mann-Whitney 1947], and weighted quantiles):
  *
  *  - q568: directly-follows process map — per (src → dst) event
  *    transition: traversal count plus median and p90 latency, read
  *    off a 10-second-grain latency HISTOGRAM per edge (cumulative
  *    counts over a time-domain-bounded grain — never a per-edge row
  *    sort). The bottleneck readout of every process-mining tool.
  *  - q569: Mann-Whitney U between urgent and non-urgent order
  *    prices, computed EXACTLY on the cent-value grain: doubled
  *    midranks (2r = 2·cum_before + t + 1) keep ranks integer under
  *    ties, U from the doubled rank sum, and the tie-corrected
  *    normal z in milli with the single float step at the final
  *    sqrt. All O(|value domain|) after one grain aggregation.
  *  - q570: weighted median and quartiles — revenue cents weighted
  *    by quantity per returnflag, each quantile the first value
  *    whose cumulative weight reaches q·W (lower weighted quantile),
  *    via the same value-grain cumulative discipline (q539/q565).
  */
object Round9Process {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q568_process_map" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("src"),
          col("ts"), col("event_id"),
          lead(col("event_type"), 1).over(wU).as("dst"),
          ((lead(unix_timestamp(col("ts")), 1).over(wU)
            - unix_timestamp(col("ts"))) / 10L).cast("long")
            .as("lat10"))
        .filter(col("dst").isNotNull)
      val hist = graft.Stage(trans
        .groupBy(col("src"), col("dst"), col("lat10"))
        .agg(count(lit(1)).as("cnt")), "q568_hist")
      val tot = hist.groupBy(col("src"), col("dst"))
        .agg(sum(col("cnt")).as("n"))
      val wE = Window.partitionBy(col("src"), col("dst"))
        .orderBy(col("lat10"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(wE))
        .join(broadcast(tot), Seq("src", "dst"))
      val med = cum.filter(col("cum") * 2 >= col("n"))
        .groupBy(col("src"), col("dst"))
        .agg(min(col("lat10")).as("median_lat10"))
      val p90 = cum.filter(col("cum") * 10 >= col("n") * 9)
        .groupBy(col("src"), col("dst"))
        .agg(min(col("lat10")).as("p90_lat10"))
      tot.join(med, Seq("src", "dst"))
        .join(p90, Seq("src", "dst"))
        .select(col("src"), col("dst"), col("n"),
          col("median_lat10"), col("p90_lat10"))
        .orderBy(col("src"), col("dst"))
    }),

    "q569_mann_whitney_u" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
          .as("v"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("g"))
      val grain = graft.Stage(base.groupBy(col("v"))
        .agg(count(lit(1)).as("tc"),
          sum(col("g")).as("c1")), "q569_grain")
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // doubled midrank of value v: 2r = 2·cum_before + t + 1
      val ranked = grain
        .withColumn("cumb", coalesce(sum(col("tc")).over(wv), lit(0L)))
        .withColumn("r2", lit(2L) * col("cumb") + col("tc") + 1L)
      val agg = ranked.agg(
        sum(col("c1") * col("r2")).as("r2sum1"),
        sum(col("c1")).as("n1"),
        sum(col("tc")).as("n"),
        sum(col("tc") * col("tc") * col("tc") - col("tc"))
          .as("tieterm"))
      agg.select(col("n1"), (col("n") - col("n1")).as("n2"),
          col("n"),
          // U1 = R1 − n1(n1+1)/2, with R1 = r2sum1/2 (exact: r2sum1
          // is even iff …; keep doubled: 2U = r2sum1 − n1(n1+1))
          (col("r2sum1") - col("n1") * (col("n1") + 1L)).as("u2"),
          col("tieterm"))
        .select(col("n1"), col("n2"), col("n"), col("u2"),
          // z = (U − n1n2/2) / sqrt(var), var = n1n2/12·((n+1) −
          // tieterm/(n(n−1))); computed on doubled U to stay integer
          // in the numerator: 2U − n1n2, denominator 2·sqrt(var)
          expr("""CAST(floor(
              (u2 - n1 * n2) * 1000.0 /
              (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                * ((n + 1) - CAST(tieterm AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1))))))
              AS BIGINT)""").as("z_milli"))
    }),

    "q570_weighted_quantiles" -> ((s, d) => {
      val grain = graft.Stage(t(s, d, "lineitem")
        .select(col("l_returnflag").as("rf"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            .as("v"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("rf"), col("v"))
        .agg(sum(col("w")).as("w")), "q570_grain")
      val tot = grain.groupBy(col("rf"))
        .agg(sum(col("w")).as("tw"))
      val wR = Window.partitionBy(col("rf")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grain.withColumn("cw", sum(col("w")).over(wR))
        .join(broadcast(tot), Seq("rf"))
      def quant(num: Int, den: Int, name: String): DataFrame =
        cum.filter(col("cw") * den >= col("tw") * num)
          .groupBy(col("rf"))
          .agg(min(col("v")).as(name))
      tot.join(quant(1, 4, "wp25_cents"), Seq("rf"))
        .join(quant(1, 2, "wmedian_cents"), Seq("rf"))
        .join(quant(3, 4, "wp75_cents"), Seq("rf"))
        .select(col("rf"), col("tw").as("total_weight"),
          col("wp25_cents"), col("wmedian_cents"), col("wp75_cents"))
        .orderBy(col("rf"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q568_process_map" ->
      """WITH trans AS (
           SELECT event_type AS src,
                  lead(event_type, 1) OVER w AS dst,
                  ((lead(floor(epoch(ts::TIMESTAMP))::BIGINT, 1)
                      OVER w
                    - floor(epoch(ts::TIMESTAMP))::BIGINT) // 10)
                    ::BIGINT AS lat10
           FROM events
           WINDOW w AS (PARTITION BY user_id
             ORDER BY ts::TIMESTAMP, event_id)),
         hist AS (
           SELECT src, dst, lat10, count(*)::BIGINT AS cnt
           FROM trans WHERE dst IS NOT NULL
           GROUP BY src, dst, lat10),
         tot AS (
           SELECT src, dst, sum(cnt)::BIGINT AS n FROM hist
           GROUP BY src, dst),
         cum AS (
           SELECT h.src, h.dst, h.lat10, t.n,
                  sum(h.cnt) OVER (PARTITION BY h.src, h.dst
                    ORDER BY h.lat10
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM hist h JOIN tot t ON h.src = t.src
             AND h.dst = t.dst),
         med AS (
           SELECT src, dst, min(lat10)::BIGINT AS median_lat10
           FROM cum WHERE cum * 2 >= n GROUP BY src, dst),
         p90 AS (
           SELECT src, dst, min(lat10)::BIGINT AS p90_lat10
           FROM cum WHERE cum * 10 >= n * 9 GROUP BY src, dst)
         SELECT t.src, t.dst, t.n, m.median_lat10, p.p90_lat10
         FROM tot t
         JOIN med m ON t.src = m.src AND t.dst = m.dst
         JOIN p90 p ON t.src = p.src AND t.dst = p.dst
         ORDER BY t.src, t.dst""",

    "q569_mann_whitney_u" ->
      """WITH base AS (
           SELECT floor(o_totalprice * 100)::BIGINT AS v,
                  (CASE WHEN o_orderpriority IN ('1-URGENT',
                    '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS g
           FROM orders),
         grain AS (
           SELECT v, count(*)::BIGINT AS tc, sum(g)::BIGINT AS c1
           FROM base GROUP BY v),
         ranked AS (
           SELECT *, coalesce(sum(tc) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS cumb
           FROM grain),
         agg AS (
           SELECT sum(c1 * (2 * cumb + tc + 1))::BIGINT AS r2sum1,
                  sum(c1)::BIGINT AS n1,
                  sum(tc)::BIGINT AS n,
                  sum(tc * tc * tc - tc)::BIGINT AS tieterm
           FROM ranked),
         u AS (
           SELECT n1, (n - n1)::BIGINT AS n2, n,
                  (r2sum1 - n1 * (n1 + 1))::BIGINT AS u2, tieterm
           FROM agg)
         SELECT n1, n2, n, u2,
                CAST(floor(
                  (u2 - n1 * n2) * 1000.0 /
                  (2.0 * sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                    * ((n + 1) - CAST(tieterm AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1))))))
                  AS BIGINT) AS z_milli
         FROM u""",

    "q570_weighted_quantiles" ->
      """WITH grain AS (
           SELECT l_returnflag AS rf,
                  floor(l_extendedprice * 100)::BIGINT AS v,
                  sum(l_quantity::BIGINT)::BIGINT AS w
           FROM lineitem GROUP BY 1, 2),
         tot AS (
           SELECT rf, sum(w)::BIGINT AS tw FROM grain GROUP BY rf),
         cum AS (
           SELECT g.rf, g.v, t.tw,
                  sum(g.w) OVER (PARTITION BY g.rf ORDER BY g.v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cw
           FROM grain g JOIN tot t ON g.rf = t.rf),
         q25 AS (
           SELECT rf, min(v)::BIGINT AS wp25_cents FROM cum
           WHERE cw * 4 >= tw * 1 GROUP BY rf),
         q50 AS (
           SELECT rf, min(v)::BIGINT AS wmedian_cents FROM cum
           WHERE cw * 2 >= tw * 1 GROUP BY rf),
         q75 AS (
           SELECT rf, min(v)::BIGINT AS wp75_cents FROM cum
           WHERE cw * 4 >= tw * 3 GROUP BY rf)
         SELECT t.rf, t.tw AS total_weight, a.wp25_cents,
                b.wmedian_cents, c.wp75_cents
         FROM tot t
         JOIN q25 a ON t.rf = a.rf
         JOIN q50 b ON t.rf = b.rf
         JOIN q75 c ON t.rf = c.rf
         ORDER BY t.rf"""
  )
}
