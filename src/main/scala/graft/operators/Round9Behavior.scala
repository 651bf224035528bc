package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch Z (q472-q474) — behavioral analytics:
  *
  *  - q472: ordered-subsequence occurrence counting — how many
  *    (signup < click < purchase) index triples each user's stream
  *    contains (the strict "funnel instances" count, not just
  *    funnel reach). For each click: (#signups before) x
  *    (#purchases after), summed — two per-user cumulative windows,
  *    no DP array and no self-join, O(events) at any scale.
  *  - q473: bipartite co-occurrence projection (item-item CF prep):
  *    project the customer x brand purchase graph onto brands,
  *    cosine-normalize co-purchase counts by brand degrees. The
  *    pair stage self-joins the DISTINCT (customer, brand) edge
  *    list — per-customer fanout is catalog-bounded (~25 brands),
  *    the classic bounded-basket argument.
  *  - q474: one-way ANOVA F across day-of-week groups on event
  *    value — is any weekday different? SSB/SSW from exact
  *    per-group sums; k and n are integers; F and eta² quantized.
  */
object Round9Behavior {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q472_subsequence_count" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wBefore = wU.rowsBetween(Window.unboundedPreceding, -1)
      val wAfter = wU.rowsBetween(1, Window.unboundedFollowing)
      val counted = ev
        .withColumn("s_before", coalesce(sum(
          when(col("event_type") === "signup", 1L).otherwise(0L))
          .over(wBefore), lit(0L)))
        .withColumn("p_after", coalesce(sum(
          when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(wAfter), lit(0L)))
        .filter(col("event_type") === "click")
        .select(col("user_id"),
          (col("s_before") * col("p_after")).as("triples"))
      counted.groupBy((col("user_id") % 10).as("cohort"))
        .agg(sum(col("triples")).as("funnel_instances"),
          count(lit(1)).as("n_clicks"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"))
    }),

    "q473_brand_cooccurrence" -> ((s, d) => {
      val edges = t(s, d, "orders")
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("brand"))
        .distinct()
      val deg = edges.groupBy(col("brand"))
        .agg(count(lit(1)).as("deg"))
      val a = edges.select(col("cust"), col("brand").as("ba"))
      val b = edges.select(col("cust").as("cust_b"),
        col("brand").as("bb"))
      val co = a.join(b, col("cust") === col("cust_b") &&
          col("ba") < col("bb"))
        .groupBy(col("ba"), col("bb"))
        .agg(count(lit(1)).as("co"))
      co.join(broadcast(deg.withColumnRenamed("brand", "ba")
            .withColumnRenamed("deg", "dega")), "ba")
        .join(broadcast(deg.withColumnRenamed("brand", "bb")
            .withColumnRenamed("deg", "degb")), "bb")
        .withColumn("cosine_milli", floor(lit(1000.0) * col("co") /
          sqrt(col("dega").cast("double") * col("degb")))
          .cast("long"))
        .select(col("ba"), col("bb"), col("co"), col("dega"),
          col("degb"), col("cosine_milli"))
        .orderBy(col("cosine_milli").desc, col("ba"), col("bb"))
        .limit(15)
    }),

    "q474_anova_f" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(dayofweek(col("ts")).as("dow"), col("value"))
      val grp = ev.groupBy(col("dow"))
        .agg(sum(col("value")).as("gs"), count(lit(1)).as("gn"))
      val tot = grp.agg(sum(col("gs")).as("ts_"), sum(col("gn")).as("tn"),
        count(lit(1)).as("k"))
      val ssw = ev.groupBy(col("dow"))
        .agg(sum(col("value") * col("value")).as("gss"),
          sum(col("value")).as("gs"), count(lit(1)).as("gn"))
        .select((col("gss") - col("gs") * col("gs") / col("gn"))
          .as("ssw_g"))
        .agg(sum(col("ssw_g")).as("ssw"))
      val ssb = grp.crossJoin(broadcast(tot))
        .select((col("gs") * col("gs") / col("gn")).as("term"),
          col("ts_"), col("tn"), col("k"))
        .groupBy(col("ts_"), col("tn"), col("k"))
        .agg(sum(col("term")).as("sum_term"))
        .select(col("k"), col("tn"),
          (col("sum_term") - col("ts_") * col("ts_") / col("tn"))
            .as("ssb"))
      ssb.crossJoin(broadcast(ssw))
        .select(col("k"), col("tn").as("n"),
          floor(col("ssb") * 100).cast("long").as("ssb_centi"),
          floor(col("ssw") * 100).cast("long").as("ssw_centi"),
          floor(lit(1000.0) * (col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("tn") - col("k")))).cast("long")
            .as("f_milli"),
          floor(lit(1000000.0) * col("ssb") / (col("ssb") + col("ssw")))
            .cast("long").as("eta2_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q472_subsequence_count" ->
      """WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id,
                            event_type FROM events),
         counted AS (
           SELECT user_id,
                  coalesce(sum(CASE WHEN event_type = 'signup'
                    THEN 1 ELSE 0 END) OVER wb, 0) AS s_before,
                  coalesce(sum(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) OVER wa, 0) AS p_after,
                  event_type
           FROM ev
           WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           wa AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT (user_id % 10)::BIGINT AS cohort,
                sum(s_before * p_after)::BIGINT AS funnel_instances,
                count(*)::BIGINT AS n_clicks,
                count(DISTINCT user_id)::BIGINT AS n_users
         FROM counted WHERE event_type = 'click'
         GROUP BY cohort ORDER BY cohort""",

    "q473_brand_cooccurrence" ->
      """WITH edges AS (
           SELECT DISTINCT o_custkey AS cust, p_brand AS brand
           FROM orders
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN part ON l_partkey = p_partkey),
         deg AS (
           SELECT brand, count(*)::BIGINT AS deg
           FROM edges GROUP BY brand),
         co AS (
           SELECT a.brand AS ba, b.brand AS bb, count(*)::BIGINT AS co
           FROM edges a JOIN edges b
             ON a.cust = b.cust AND a.brand < b.brand
           GROUP BY a.brand, b.brand)
         SELECT co.ba, co.bb, co.co,
                da.deg AS dega, db.deg AS degb,
                floor(1000.0 * co.co
                  / sqrt(CAST(da.deg AS DOUBLE) * db.deg))::BIGINT
                  AS cosine_milli
         FROM co JOIN deg da ON co.ba = da.brand
                 JOIN deg db ON co.bb = db.brand
         ORDER BY cosine_milli DESC, co.ba, co.bb
         LIMIT 15""",

    "q474_anova_f" ->
      """WITH ev AS (
           SELECT dayofweek(ts::TIMESTAMP) + 1 AS dow, value
           FROM events),
         grp AS (
           SELECT dow, sum(value) AS gs,
                  sum(value * value) AS gss, count(*)::BIGINT AS gn
           FROM ev GROUP BY dow),
         tot AS (
           SELECT sum(gs) AS ts_, sum(gn)::BIGINT AS tn,
                  count(*)::BIGINT AS k
           FROM grp),
         parts AS (
           SELECT sum(gss - gs * gs / gn) AS ssw,
                  sum(gs * gs / gn) AS sum_term
           FROM grp)
         SELECT k, tn AS n,
                floor((sum_term - ts_ * ts_ / tn) * 100)::BIGINT
                  AS ssb_centi,
                floor(ssw * 100)::BIGINT AS ssw_centi,
                floor(1000.0 * ((sum_term - ts_ * ts_ / tn) / (k - 1))
                  / (ssw / (tn - k)))::BIGINT AS f_milli,
                floor(1000000.0 * (sum_term - ts_ * ts_ / tn)
                  / ((sum_term - ts_ * ts_ / tn) + ssw))::BIGINT
                  AS eta2_ppm
         FROM parts CROSS JOIN tot"""
  )
}
