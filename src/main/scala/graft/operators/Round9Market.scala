package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AE (q487-q489) — market/time-series staples:
  *
  *  - q487: VWAP + TWAP per brand — volume-weighted average price
  *    (exact cents x quantity sums) and time-weighted average price
  *    (each fill weighted by its holding interval to the next fill
  *    via lead(), the open interval closed at the horizon). One
  *    keyed aggregate over per-brand fill streams.
  *  - q488: stock span — for each (type, day): how many consecutive
  *    trailing days (incl. today) had revenue <= today's. The span
  *    is day − (last prior higher-rev day), computed on the
  *    day-grain table with a bounded per-type self-join (day tables
  *    are calendar-bounded; the classic monotonic-stack problem as
  *    a relational query).
  *  - q489: cumulative reach — running count of DISTINCT users ever
  *    seen, per day. Exact at any scale WITHOUT rolling sets: a
  *    user contributes at its min(day) only, then a day-grain
  *    cumulative sum (the first-seen trick; contrast q358's
  *    windowed exact sets).
  */
object Round9Market {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q487_vwap_twap" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          col("l_shipdate").cast("timestamp").as("ft"),
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") / col("l_quantity") * 100)
            .cast("long").as("px_cents"),
          col("l_quantity").cast("long").as("qty"))
      val hz = li.agg(max(col("ft")).as("hmax"))
      val wB = Window.partitionBy(col("brand"))
        .orderBy(col("ft"), col("l_orderkey"), col("l_linenumber"))
      li.crossJoin(broadcast(hz))
        .withColumn("next_ft",
          coalesce(lead(col("ft"), 1).over(wB), col("hmax")))
        .withColumn("hold_s",
          (unix_timestamp(col("next_ft")) - unix_timestamp(col("ft")))
            .cast("long"))
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n_fills"),
          expr("sum(px_cents * qty) DIV sum(qty)").as("vwap_cents"),
          expr("""CASE WHEN sum(hold_s) > 0
                  THEN sum(px_cents * hold_s) DIV sum(hold_s)
                  ELSE sum(px_cents) DIV count(*) END""")
            .as("twap_cents"))
        .orderBy(col("brand"))
    }),

    "q488_stock_span" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("rev"))
      val cur = daily.select(col("event_type"), col("day"), col("rev"))
      val prior = daily.select(col("event_type").as("et_p"),
        col("day").as("day_p"), col("rev").as("rev_p"))
      // last prior day with strictly higher revenue (day-grain x
      // day-grain per type: calendar-bounded quadratic)
      cur.join(prior, col("event_type") === col("et_p") &&
          col("day_p") < col("day") && col("rev_p") > col("rev"),
          "left")
        .groupBy(col("event_type"), col("day"), col("rev"))
        .agg(max(col("day_p")).as("last_higher"))
        .join(daily.groupBy(col("event_type"))
          .agg(min(col("day")).as("d0")), "event_type")
        .withColumn("span",
          when(col("last_higher").isNotNull,
            col("day") - col("last_higher"))
            .otherwise(col("day") - col("d0") + 1))
        .select(col("event_type"), col("day"), col("rev"), col("span"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q489_cumulative_reach" -> ((s, d) => {
      val firstSeen = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(min(floor(unix_timestamp(col("ts")) / 86400L).cast("long"))
          .as("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      val activity = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long")
          .as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      // day-grain bounded window (q375 contract)
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      activity.join(firstSeen, Seq("day"), "left")
        .na.fill(0L, Seq("new_users"))
        .withColumn("cumulative_reach", sum(col("new_users")).over(wCum))
        .select(col("day"), col("dau"), col("new_users"),
          col("cumulative_reach"))
        .orderBy(col("day"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q487_vwap_twap" ->
      """WITH li AS (
           SELECT p_brand AS brand, l_shipdate::TIMESTAMP AS ft,
                  l_orderkey, l_linenumber,
                  floor(l_extendedprice / l_quantity * 100)::BIGINT
                    AS px_cents,
                  l_quantity::BIGINT AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         hz AS (SELECT max(ft) AS hmax FROM li),
         held AS (
           SELECT brand, px_cents, qty,
                  (floor(epoch(coalesce(lead(ft) OVER (
                      PARTITION BY brand
                      ORDER BY ft, l_orderkey, l_linenumber),
                    (SELECT hmax FROM hz))))
                   - floor(epoch(ft)))::BIGINT AS hold_s
           FROM li)
         SELECT brand, count(*)::BIGINT AS n_fills,
                (sum(px_cents * qty) // sum(qty))::BIGINT AS vwap_cents,
                (CASE WHEN sum(hold_s) > 0
                 THEN sum(px_cents * hold_s) // sum(hold_s)
                 ELSE sum(px_cents) // count(*) END)::BIGINT
                  AS twap_cents
         FROM held GROUP BY brand ORDER BY brand""",

    "q488_stock_span" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1, 2),
         spans AS (
           SELECT c.event_type, c.day, c.rev,
                  max(p.day) AS last_higher
           FROM daily c LEFT JOIN daily p
             ON c.event_type = p.event_type
            AND p.day < c.day AND p.rev > c.rev
           GROUP BY c.event_type, c.day, c.rev),
         d0 AS (
           SELECT event_type, min(day) AS d0
           FROM daily GROUP BY event_type)
         SELECT s.event_type, s.day, s.rev,
                (CASE WHEN s.last_higher IS NOT NULL
                 THEN s.day - s.last_higher
                 ELSE s.day - d0.d0 + 1 END)::BIGINT AS span
         FROM spans s JOIN d0 ON s.event_type = d0.event_type
         ORDER BY s.event_type, s.day""",

    "q489_cumulative_reach" ->
      """WITH fs AS (
           SELECT min(floor(epoch(ts::TIMESTAMP) / 86400))::BIGINT
             AS day
           FROM events GROUP BY user_id),
         new_users AS (
           SELECT day, count(*)::BIGINT AS new_users
           FROM fs GROUP BY day),
         activity AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  count(DISTINCT user_id)::BIGINT AS dau
           FROM events GROUP BY 1)
         SELECT a.day, a.dau,
                coalesce(n.new_users, 0)::BIGINT AS new_users,
                sum(coalesce(n.new_users, 0)) OVER (ORDER BY a.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                  )::BIGINT AS cumulative_reach
         FROM activity a LEFT JOIN new_users n ON a.day = n.day
         ORDER BY a.day"""
  )
}
