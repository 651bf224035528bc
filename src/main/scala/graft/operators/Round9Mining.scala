package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch L (q414-q416): temporal scan statistic (most
  * anomalous contiguous window), the decision-tree best-split finder
  * over a bounded feature domain, and market-basket association rules.
  * Hash-gated vs DuckDB.
  */
object Round9Mining {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Temporal scan statistic (Kulldorff) — the most anomalous
    // CONTIGUOUS day window per series by Poisson likelihood ratio:
    // c ln(c/e) + (C-c) ln((C-c)/(C-e)) for window count c vs expected
    // e = C len/N. All O(days^2) window pairs form from the BOUNDED
    // day-grain prefix-sum table (<=465 pairs per series at 30 days) —
    // never from the corpus. Complements q360's CUSUM (changepoint)
    // with cluster detection.
    "q414_scan_statistic" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("di", dense_rank().over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))))
        .withColumn("pre", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))),
        "q414_daily")
      val tot = daily.groupBy(col("event_type"))
        .agg(max(col("pre")).as("ct"), max(col("di")).as("nd"))
      val wins = daily.as("i").join(daily.as("j"),
          col("i.event_type") === col("j.event_type") &&
            col("i.di") <= col("j.di"))
        .select(col("i.event_type").as("event_type"),
          col("i.di").as("st"), (col("j.di") - col("i.di") + 1).as("len"),
          (col("j.pre") - col("i.pre") + col("i.c")).as("c"))
        .join(tot, "event_type")
        .filter(col("len") < col("nd")) // full-series window is not a cluster
        .select(col("event_type"), col("st"), col("len"), col("c"),
          col("ct"), col("nd"),
          (col("ct").cast("double") * col("len") / col("nd")).as("e"))
        .filter(col("c") > col("e"))
        .select(col("event_type"), col("st"), col("len"), col("c"),
          (col("c") * log(col("c") / col("e"))
            + (col("ct") - col("c"))
              * log((col("ct") - col("c")).cast("double")
                / (col("ct") - col("e")))).as("llr"))
      wins.withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("llr").desc, col("st"), col("len"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("st").as("win_start_idx"),
          col("len").as("win_len"), col("c").as("win_count"),
          round(col("llr"), 4).as("llr"))
        .orderBy(col("event_type"))
    }),

    // Decision-tree best-split finder — the inner loop of tree
    // training (q93/q157's fitted trees) exposed as a first-class
    // operator: Gini gain of every threshold over the bounded integer
    // feature domain, from ONE cumulative pass over the 50-row
    // value-grouped class counts. Top-5 thresholds. At 100 TB this is
    // exactly how a distributed tree library evaluates splits:
    // value-histogram aggregation, then driver-sized threshold math.
    "q415_best_split" -> ((s, d) => {
      val rows = t(s, d, "lineitem").select(
        floor(col("l_quantity")).cast("long").as("v"),
        when(col("l_extendedprice") > 38000.0, 1L).otherwise(0L).as("y"))
      val byVal = rows.groupBy(col("v"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byVal
        .withColumn("nl", sum(col("n")).over(wCum))
        .withColumn("pl", sum(col("pos")).over(wCum))
        .crossJoin(broadcast(byVal.agg(sum(col("n")).as("nt"),
          sum(col("pos")).as("pt"))))
        .filter(col("nl") < col("nt")) // both sides non-empty
      def gini(p: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column) = {
        val f = p.cast("double") / n
        lit(1.0) - f * f - (lit(1.0) - f) * (lit(1.0) - f)
      }
      cum.select(col("v").as("threshold"), col("nl").as("n_left"),
          (gini(col("pt"), col("nt"))
            - col("nl") / col("nt").cast("double")
              * gini(col("pl"), col("nl"))
            - (col("nt") - col("nl")) / col("nt").cast("double")
              * gini(col("pt") - col("pl"), col("nt") - col("nl")))
            .as("gain"))
        .select(col("threshold"), col("n_left"),
          round(col("gain"), 6).as("gini_gain"))
        .orderBy(col("gini_gain").desc, col("threshold")).limit(5)
    }),

    // Market-basket association rules — support / confidence (both
    // directions) / lift for event-type pairs within (user, day)
    // baskets, all in exact integer ppm/milli. Baskets distinct first
    // (one shuffle), pairs from the <=5-item per-basket set (bounded
    // per-row), dimension-sized rule table.
    "q416_association_rules" -> ((s, d) => {
      val items = graft.Stage(t(s, d, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).as("day"), col("event_type"))
        .distinct(), "q416_items")
      val nBaskets = items.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("nb"))
      val itemCounts = items.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ci"))
      val pairs = items.as("a").join(items.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ia"),
          col("b.event_type").as("ib"))
        .agg(count(lit(1)).as("cab"))
      pairs
        .join(itemCounts.select(col("event_type").as("ia"),
          col("ci").as("ca")), "ia")
        .join(itemCounts.select(col("event_type").as("ib"),
          col("ci").as("cb")), "ib")
        .crossJoin(broadcast(nBaskets))
        .select(col("ia"), col("ib"), col("cab"),
          expr("cab * 1000000 DIV nb").as("support_ppm"),
          expr("cab * 1000000 DIV ca").as("conf_a_to_b_ppm"),
          expr("cab * 1000000 DIV cb").as("conf_b_to_a_ppm"),
          expr("cab * nb * 1000 DIV (ca * cb)").as("lift_milli"))
        .orderBy(col("ia"), col("ib"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q414_scan_statistic" ->
      """WITH daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  count(*)::BIGINT AS c
           FROM events GROUP BY 1, 2),
         pre AS (
           SELECT event_type, day, c,
                  dense_rank() OVER (PARTITION BY event_type
                    ORDER BY day) AS di,
                  (sum(c) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    ::BIGINT AS pre
           FROM daily),
         tot AS (
           SELECT event_type, max(pre)::BIGINT AS ct,
                  max(di)::BIGINT AS nd
           FROM pre GROUP BY 1),
         wins AS (
           SELECT i.event_type, i.di AS st, j.di - i.di + 1 AS len,
                  j.pre - i.pre + i.c AS c, t.ct, t.nd,
                  t.ct::DOUBLE * (j.di - i.di + 1) / t.nd AS e
           FROM pre i
           JOIN pre j ON j.event_type = i.event_type
             AND i.di <= j.di
           JOIN tot t ON t.event_type = i.event_type
           WHERE j.di - i.di + 1 < t.nd),
         scored AS (
           SELECT event_type, st, len, c,
                  c * ln(c / e)
                  + (ct - c) * ln((ct - c)::DOUBLE / (ct - e)) AS llr
           FROM wins WHERE c > e),
         best AS (
           SELECT event_type, st, len, c, llr,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY llr DESC, st, len) AS rn
           FROM scored)
         SELECT event_type, st::BIGINT AS win_start_idx,
                len::BIGINT AS win_len, c::BIGINT AS win_count,
                round(llr, 4) AS llr
         FROM best WHERE rn = 1 ORDER BY event_type""",
    "q415_best_split" ->
      """WITH rows_ AS (
           SELECT floor(l_quantity)::BIGINT AS v,
                  CASE WHEN l_extendedprice > 38000.0 THEN 1
                       ELSE 0 END AS y
           FROM lineitem),
         byv AS (
           SELECT v, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
           FROM rows_ GROUP BY v),
         tot AS (
           SELECT sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS pt
           FROM byv),
         cum AS (
           SELECT v, n, pos,
                  (sum(n) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    ::BIGINT AS nl,
                  (sum(pos) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                    ::BIGINT AS pl
           FROM byv),
         gains AS (
           SELECT v AS threshold, nl AS n_left,
                  (1.0 - (pt::DOUBLE/nt)*(pt::DOUBLE/nt)
                       - (1.0 - pt::DOUBLE/nt)*(1.0 - pt::DOUBLE/nt))
                  - nl::DOUBLE/nt
                    * (1.0 - (pl::DOUBLE/nl)*(pl::DOUBLE/nl)
                         - (1.0 - pl::DOUBLE/nl)*(1.0 - pl::DOUBLE/nl))
                  - (nt - nl)::DOUBLE/nt
                    * (1.0 - ((pt-pl)::DOUBLE/(nt-nl))
                             *((pt-pl)::DOUBLE/(nt-nl))
                         - (1.0 - (pt-pl)::DOUBLE/(nt-nl))
                           *(1.0 - (pt-pl)::DOUBLE/(nt-nl))) AS gain
           FROM cum CROSS JOIN tot
           WHERE nl < nt)
         SELECT threshold, n_left, round(gain, 6) AS gini_gain
         FROM gains ORDER BY gini_gain DESC, threshold LIMIT 5""",
    "q416_association_rules" ->
      """WITH items AS (
           SELECT DISTINCT user_id,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  event_type
           FROM events),
         nb AS (
           SELECT count(*)::BIGINT AS nb
           FROM (SELECT DISTINCT user_id, day FROM items)),
         ic AS (
           SELECT event_type, count(*)::BIGINT AS ci FROM items
           GROUP BY 1),
         pairs AS (
           SELECT a.event_type AS ia, b.event_type AS ib,
                  count(*)::BIGINT AS cab
           FROM items a JOIN items b
             ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT ia, ib, cab,
                (cab * 1000000 // nb)::BIGINT AS support_ppm,
                (cab * 1000000 // x.ci)::BIGINT AS conf_a_to_b_ppm,
                (cab * 1000000 // y.ci)::BIGINT AS conf_b_to_a_ppm,
                (cab * nb * 1000 // (x.ci * y.ci))::BIGINT
                  AS lift_milli
         FROM pairs
         JOIN ic x ON x.event_type = ia
         JOIN ic y ON y.event_type = ib
         CROSS JOIN nb
         ORDER BY ia, ib"""
  )
}
