package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** AS-OF join — for each left row, the latest right row with
  * `r.ts <= l.ts` on the same key. A first-class operator of
  * time-series/feature-store pipelines that Spark lacks natively
  * (capability-add beyond the reference, whose join enum is
  * INNER/LEFT/SEMI/ANTI — `Shared/sqldefs.h:252-260`).
  *
  * Implementation is the scale-correct union/window pattern, NOT a range
  * join: tag both sides, union, one window over (key, ts, side) with
  * `last(right_payload, ignoreNulls)` carrying the most recent right row
  * forward, keep left rows. ONE shuffle on the key, no replication, no
  * per-key memory beyond the window frame — at 100 TB this is a single
  * sort-shuffle regardless of time skew, where a banded range join would
  * replicate rows per time bucket.
  */
object AsofJoin {

  type Q = (SparkSession, String) => DataFrame

  /** As-of join `left` to `right` on `key`, matching the latest right
    * row whose `rightTs` <= the left row's `leftTs`. Right rows must be
    * unique per (key, ts) for a deterministic result (pre-aggregate if
    * not). Output: all left columns + struct `asof` (null when no prior
    * right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rPay = struct(right.columns.map(col): _*)
    val lPay = struct(left.columns.map(col): _*)
    val r2 = right.select(col(key).as("__k"),
      col(rightTs).as("__ts"), lit(0).as("__side"), rPay.as("__rpay"),
      lit(null).cast(left.select(lPay).schema.head.dataType).as("__lpay"))
    val l2 = left.select(col(key).as("__k"),
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(right.select(rPay).schema.head.dataType).as("__rpay"),
      lPay.as("__lpay"))
    // side 0 sorts before side 1 at equal ts → a right row at exactly
    // the left timestamp is visible (<= semantics)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r2.unionAll(l2)
      .withColumn("asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lpay.*") +: Seq(col("asof")): _*)
  }

  private def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("ts_us", unix_micros(col("ts")))

  val queries: Seq[(String, Q)] = Seq(
    // Each purchase joined to the user's most recent prior (or
    // simultaneous) click; clicks pre-aggregated to one per (user, ts)
    // for determinism. DuckDB's native ASOF JOIN is the oracle.
    "q149_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      asofJoin(purchases, clicks, "user_id", "ts_us", "ts_us")
        .select(col("event_id"), col("user_id"),
          col("asof.ts_us").as("click_ts"),
          col("asof.value").as("click_val"))
    }),

    // FORWARD as-of with tolerance — the other direction of
    // pandas/polars merge_asof: each click joined to the user's NEXT
    // purchase, but only within a 1 h horizon (beyond it the match
    // nulls out). Same single-shuffle union/window machinery as q149,
    // pointed backwards by negating the time axis — no second
    // implementation, no range join. The
    // click→conversion-latency shape of funnel analytics.
    "q326_asof_forward_tolerance" -> ((s, d) => {
      val TolUs = 3600L * 1000000L
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("value"))
        .withColumn("nts", -col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
        .withColumn("nts", -col("ts_us"))
      asofJoin(clicks, purchases, "user_id", "nts", "nts")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("asof").isNotNull &&
            col("asof.ts_us") - col("ts_us") <= TolUs,
            col("asof.ts_us")).as("purchase_ts"),
          when(col("asof").isNotNull &&
            col("asof.ts_us") - col("ts_us") <= TolUs,
            expr("(asof.ts_us - ts_us) DIV 1000000")).as("wait_s"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q149_asof_join" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, value,
                  epoch_us(ts::TIMESTAMP) AS ts_us
           FROM events),
         c AS (
           SELECT user_id, ts_us, max(value) AS value
           FROM e WHERE event_type = 'click'
           GROUP BY user_id, ts_us),
         p AS (
           SELECT event_id, user_id, ts_us
           FROM e WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id,
                c.ts_us AS click_ts, c.value AS click_val
         FROM p ASOF LEFT JOIN c
           ON p.user_id = c.user_id AND c.ts_us <= p.ts_us""",
    "q326_asof_forward_tolerance" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, value,
                  epoch_us(ts::TIMESTAMP) AS ts_us
           FROM events),
         p AS (
           SELECT user_id, ts_us, max(value) AS value
           FROM e WHERE event_type = 'purchase'
           GROUP BY user_id, ts_us),
         c AS (
           SELECT event_id, user_id, ts_us
           FROM e WHERE event_type = 'click'),
         nxt AS (
           SELECT c.event_id, min(p.ts_us) AS pts
           FROM c JOIN p ON p.user_id = c.user_id
             AND p.ts_us >= c.ts_us
           GROUP BY c.event_id)
         SELECT c.event_id, c.user_id, c.ts_us,
                CASE WHEN n.pts - c.ts_us <= 3600000000
                     THEN n.pts END AS purchase_ts,
                CASE WHEN n.pts - c.ts_us <= 3600000000
                     THEN (n.pts - c.ts_us) // 1000000 END AS wait_s
         FROM c LEFT JOIN nxt n ON n.event_id = c.event_id"""
  )
}
