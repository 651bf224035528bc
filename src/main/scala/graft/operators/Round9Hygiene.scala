package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AB (q478-q480) — reporting + data-hygiene staples:
  *
  *  - q478: calendar densification — materialize the FULL (type x
  *    day) grid (calendar sequence() cross type dim, both
  *    dimension-sized), left-join the sparse daily aggregate, fill
  *    zeros, then day-over-day deltas on the dense series. The
  *    missing-row deltas are exactly what sparse MoM reports get
  *    wrong; windows run on the dense (bounded) grid.
  *  - q479: frequency capping — keep at most 3 events per
  *    (user, type, day), audit kept/dropped counts per type
  *    (training-data dedup/capping stage; one per-key row_number).
  *  - q480: two-way ledger reconciliation — recompute each order's
  *    total from its lineitems (extended * (1-disc) * (1+tax), cent
  *    arithmetic) and classify vs o_totalprice within a 1-dollar
  *    tolerance. The synthetic fixture deliberately does NOT satisfy
  *    the TPC-H identity, so the report's value is the drift
  *    quantification (counts + max drift per priority class) — the
  *    audit a real ledger migration runs. One join, one keyed
  *    aggregate.
  */
object Round9Hygiene {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q478_densify_calendar" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val daily = ev.groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("rev"), count(lit(1)).as("n"))
      val bounds = ev.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"))
      val types = ev.select(col("event_type")).distinct()
      val grid = types.crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val dense = grid.join(daily, Seq("event_type", "day"), "left")
        .na.fill(0L, Seq("rev", "n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dense
        .withColumn("delta", col("rev") - lag(col("rev"), 1).over(w))
        .filter(col("delta").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("n") === 0, 1L).otherwise(0L))
            .as("zero_filled_days"),
          max(abs(col("delta"))).as("max_abs_delta"),
          sum(when(col("delta") > 0, 1L).otherwise(0L)).as("up_days"))
        .orderBy(col("event_type"))
    }),

    "q479_frequency_cap" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
      val w = Window.partitionBy(col("user_id"), col("event_type"),
        col("day")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("seq", row_number().over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("seq") <= 3, 1L).otherwise(0L)).as("kept"),
          sum(when(col("seq") > 3, 1L).otherwise(0L)).as("dropped"),
          max(col("seq")).cast("long").as("worst_burst"))
        .withColumn("drop_ppm",
          expr("dropped * 1000000 DIV n_events"))
        .orderBy(col("event_type"))
    }),

    "q480_order_reconciliation" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
            * 100).cast("long")).as("computed_cents"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long")
            .as("stated_cents"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("drift",
          abs(coalesce(col("computed_cents"), lit(0L)) -
            col("stated_cents")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("computed_cents").isNull, 1L).otherwise(0L))
            .as("no_lines"),
          sum(when(col("drift") <= 100 &&
            col("computed_cents").isNotNull, 1L).otherwise(0L))
            .as("matched"),
          sum(when(col("drift") > 100 &&
            col("computed_cents").isNotNull, 1L).otherwise(0L))
            .as("mismatched"),
          max(when(col("computed_cents").isNotNull, col("drift")))
            .as("max_drift_cents"))
        .orderBy(col("o_orderpriority"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q478_densify_calendar" ->
      """WITH ev AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  floor(value * 100)::BIGINT AS cents
           FROM events),
         daily AS (
           SELECT event_type, day, sum(cents)::BIGINT AS rev,
                  count(*)::BIGINT AS n
           FROM ev GROUP BY event_type, day),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         grid AS (
           SELECT t.event_type, g.day::BIGINT AS day
           FROM (SELECT DISTINCT event_type FROM ev) t
           CROSS JOIN (SELECT unnest(generate_series(
             (SELECT d0 FROM bounds), (SELECT d1 FROM bounds))) AS day)
             g),
         dense AS (
           SELECT grid.event_type, grid.day,
                  coalesce(daily.rev, 0)::BIGINT AS rev,
                  coalesce(daily.n, 0)::BIGINT AS n
           FROM grid LEFT JOIN daily
             ON grid.event_type = daily.event_type
            AND grid.day = daily.day),
         lagged AS (
           SELECT event_type, day, rev, n,
                  rev - lag(rev, 1) OVER (PARTITION BY event_type
                    ORDER BY day) AS delta
           FROM dense)
         SELECT event_type, count(*)::BIGINT AS n_days,
                sum(CASE WHEN n = 0 THEN 1 ELSE 0 END)::BIGINT
                  AS zero_filled_days,
                max(abs(delta))::BIGINT AS max_abs_delta,
                sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END)::BIGINT
                  AS up_days
         FROM lagged WHERE delta IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "q479_frequency_cap" ->
      """WITH ev AS (
           SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day
           FROM events),
         seqd AS (
           SELECT event_type,
                  row_number() OVER (PARTITION BY user_id, event_type,
                    day ORDER BY ts, event_id) AS seq
           FROM ev)
         SELECT event_type, count(*)::BIGINT AS n_events,
                sum(CASE WHEN seq <= 3 THEN 1 ELSE 0 END)::BIGINT
                  AS kept,
                sum(CASE WHEN seq > 3 THEN 1 ELSE 0 END)::BIGINT
                  AS dropped,
                max(seq)::BIGINT AS worst_burst,
                ((sum(CASE WHEN seq > 3 THEN 1 ELSE 0 END) * 1000000)
                  // count(*))::BIGINT AS drop_ppm
         FROM seqd GROUP BY event_type ORDER BY event_type""",

    "q480_order_reconciliation" ->
      """WITH li AS (
           SELECT l_orderkey,
                  sum(floor(l_extendedprice * (1.0 - l_discount)
                    * (1.0 + l_tax) * 100)::BIGINT)::BIGINT
                    AS computed_cents
           FROM lineitem GROUP BY l_orderkey),
         o AS (
           SELECT o_orderkey, o_orderpriority,
                  floor(o_totalprice * 100)::BIGINT AS stated_cents
           FROM orders),
         j AS (
           SELECT o.o_orderpriority, o.stated_cents,
                  li.computed_cents,
                  abs(coalesce(li.computed_cents, 0) - o.stated_cents)
                    AS drift
           FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
         SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
                sum(CASE WHEN computed_cents IS NULL THEN 1 ELSE 0
                    END)::BIGINT AS no_lines,
                sum(CASE WHEN drift <= 100
                         AND computed_cents IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS matched,
                sum(CASE WHEN drift > 100
                         AND computed_cents IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS mismatched,
                max(CASE WHEN computed_cents IS NOT NULL
                    THEN drift END)::BIGINT AS max_drift_cents
         FROM j GROUP BY o_orderpriority
         ORDER BY o_orderpriority"""
  )
}
