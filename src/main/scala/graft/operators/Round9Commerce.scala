package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BI (q577-q579) — commerce analytics staples:
  *
  *  - q577: next-purchase recommendation — per customer, consecutive
  *    order pairs (window lead on the order grain), category pairs
  *    through the two baskets (order-pair join is basket-bounded),
  *    confidence in exact ppm against the antecedent-category
  *    occurrence count, top-20 rules. "Customers who bought X next
  *    bought Y" — the sequential sibling of q543's association rules.
  *  - q578: day-of-week × hour traffic heatmap — grid cells via
  *    epoch arithmetic (epoch-day mod 7 / epoch-hour mod 24, engine-
  *    independent, no dialect dow convention), revenue share in ppm,
  *    top-5 peak cells flagged. The 168-cell grid is domain-bounded.
  *  - q579: receivables-style aging report — non-final orders
  *    bucketed by age against the corpus horizon (0-30/31-60/61-90/
  *    91-180/181-365/365+ days), count, value cents, and share ppm
  *    per bucket. One scan, schema-bounded output.
  */
object Round9Commerce {

  type Q = (SparkSession, String) => DataFrame

  /** Age-bucket CASE shared verbatim by both dialects. */
  private val ageBucket =
    """CASE WHEN age <= 30 THEN '0_030'
            WHEN age <= 60 THEN '031_060'
            WHEN age <= 90 THEN '061_090'
            WHEN age <= 180 THEN '091_180'
            WHEN age <= 365 THEN '181_365'
            ELSE '365_plus' END"""

  val queries: Seq[(String, Q)] = Seq(

    "q577_next_purchase_rules" -> ((s, d) => {
      val wC = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val pairs = graft.Stage(t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey").as("ok1"),
          lead(col("o_orderkey"), 1).over(wC).as("ok2"))
        .filter(col("ok2").isNotNull)
        .select(col("ok1"), col("ok2")), "q577_pairs")
      val basket = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % 20).cast("long").as("cat"))
        .distinct()
      val catPairs = pairs
        .join(basket.select(col("ok").as("ok1"),
          col("cat").as("cat_a")), Seq("ok1"))
        .join(basket.select(col("ok").as("ok2"),
          col("cat").as("cat_b")), Seq("ok2"))
      val counts = catPairs.groupBy(col("cat_a"), col("cat_b"))
        .agg(count(lit(1)).as("c"))
      val na = counts.groupBy(col("cat_a"))
        .agg(sum(col("c")).as("na"))
      val rules = counts.join(broadcast(na), Seq("cat_a"))
        .select(col("cat_a"), col("cat_b"), col("c"),
          expr("c * 1000000 DIV na").as("confidence_ppm"))
      val wAll = Window.orderBy(col("c").desc, col("cat_a"),
        col("cat_b"))
      rules.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 20)
        .select(col("cat_a"), col("cat_b"), col("c"),
          col("confidence_ppm"), col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    }),

    "q578_dow_hour_heatmap" -> ((s, d) => {
      val cells = t(s, d, "events")
        .select(
          expr("""CAST(floor(unix_timestamp(ts) / 86400) % 7
                  AS BIGINT)""").as("dow"),
          expr("""CAST(floor(unix_timestamp(ts) / 3600) % 24
                  AS BIGINT)""").as("hour"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("rev"))
      val tot = cells.agg(sum(col("rev")).as("trev"))
      val wAll = Window.orderBy(col("rev").desc, col("dow"),
        col("hour"))
      cells.crossJoin(broadcast(tot))
        .withColumn("rk", row_number().over(wAll))
        .select(col("dow"), col("hour"), col("n_events"),
          col("rev").as("rev_milli"),
          expr("rev * 1000000 DIV trev").as("share_ppm"),
          when(col("rk") <= 5, 1L).otherwise(0L).as("peak"))
        .orderBy(col("dow"), col("hour"))
    }),

    "q579_aging_report" -> ((s, d) => {
      val hz = t(s, d, "orders")
        .agg(max(col("o_orderdate")).as("h"))
      val aged = t(s, d, "orders")
        .filter(col("o_orderstatus") =!= "F")
        .crossJoin(broadcast(hz))
        .select(datediff(col("h"), col("o_orderdate")).cast("long")
          .as("age"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            .as("cents"))
        .select(expr(ageBucket).as("bucket"), col("cents"))
      val buckets = aged.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).as("value_cents"))
      val tot = buckets.agg(sum(col("value_cents")).as("tv"))
      buckets.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_orders"), col("value_cents"),
          expr("value_cents * 1000000 DIV tv").as("share_ppm"))
        .orderBy(col("bucket"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q577_next_purchase_rules" ->
      """WITH op AS (
           SELECT o_orderkey AS ok1,
                  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate::TIMESTAMP, o_orderkey)
                    AS ok2
           FROM orders),
         pairs AS (SELECT ok1, ok2 FROM op WHERE ok2 IS NOT NULL),
         basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 20)::BIGINT AS cat
           FROM lineitem),
         catpairs AS (
           SELECT b1.cat AS cat_a, b2.cat AS cat_b
           FROM pairs p
           JOIN basket b1 ON p.ok1 = b1.ok
           JOIN basket b2 ON p.ok2 = b2.ok),
         counts AS (
           SELECT cat_a, cat_b, count(*)::BIGINT AS c
           FROM catpairs GROUP BY cat_a, cat_b),
         na AS (
           SELECT cat_a, sum(c)::BIGINT AS na FROM counts
           GROUP BY cat_a),
         rules AS (
           SELECT c.cat_a, c.cat_b, c.c,
                  (c.c * 1000000 // n.na)::BIGINT AS confidence_ppm,
                  row_number() OVER (ORDER BY c.c DESC, c.cat_a,
                    c.cat_b) AS rk
           FROM counts c JOIN na n ON c.cat_a = n.cat_a)
         SELECT cat_a, cat_b, c, confidence_ppm, rk::BIGINT AS rk
         FROM rules WHERE rk <= 20 ORDER BY rk""",

    "q578_dow_hour_heatmap" ->
      """WITH cells AS (
           SELECT (floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT % 7)
                    AS dow,
                  (floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT % 24)
                    AS hour,
                  count(*)::BIGINT AS n_events,
                  sum(floor(value * 1000)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1, 2),
         tot AS (SELECT sum(rev)::BIGINT AS trev FROM cells),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY rev DESC, dow,
                    hour) AS rk
           FROM cells)
         SELECT r.dow, r.hour, r.n_events, r.rev AS rev_milli,
                (r.rev * 1000000 // t.trev)::BIGINT AS share_ppm,
                (CASE WHEN r.rk <= 5 THEN 1 ELSE 0 END)::BIGINT
                  AS peak
         FROM ranked r, tot t ORDER BY r.dow, r.hour""",

    "q579_aging_report" ->
      s"""WITH hz AS (
           SELECT max(o_orderdate::TIMESTAMP) AS h FROM orders),
         aged AS (
           SELECT date_diff('day', o_orderdate::TIMESTAMP, z.h)
                    ::BIGINT AS age,
                  floor(o_totalprice * 100)::BIGINT AS cents
           FROM orders, hz z WHERE o_orderstatus <> 'F'),
         bucketed AS (
           SELECT ($ageBucket) AS bucket, cents FROM aged),
         buckets AS (
           SELECT bucket, count(*)::BIGINT AS n_orders,
                  sum(cents)::BIGINT AS value_cents
           FROM bucketed GROUP BY bucket),
         tot AS (SELECT sum(value_cents)::BIGINT AS tv FROM buckets)
         SELECT bucket, n_orders, value_cents,
                (value_cents * 1000000 // tv)::BIGINT AS share_ppm
         FROM buckets, tot ORDER BY bucket"""
  )
}
