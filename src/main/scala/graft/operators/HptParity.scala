package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** High-precision-timestamp parity family (q242-q245) — the reference's
  * flights_hpt benchmark shapes over sub-second timestamps.
  *
  * The reference benchmarks TIMESTAMP(3)/(6)/(9) columns explicitly
  * (`Benchmarks/queries/flights_hpt/Q018-Q033.sql` in /root/reference:
  * date_trunc over ts(3)/(6)/(9), EXTRACT year/month, and range filters
  * with microsecond-precision literals like
  * `TIMESTAMP(6) '1996-07-26 16:30:06.000000'`; type model in
  * `Shared/sqltypes.h:77`). Spark's TimestampType is fixed
  * microsecond-precision, so ts(3) and ts(6) are native; ts(9) exceeds
  * the type and is carried as an int64 nanosecond column — exactly how
  * parquet stores TIMESTAMP(NANOS) and how `Tables.t` already ingests
  * `events.ts` — with trunc/extract done in integer arithmetic (q245
  * pins that policy).
  *
  * The sub-second columns are deterministic integer derivations from
  * `events` (micros + event_id-keyed offsets), computed identically by
  * the DuckDB oracle (`make_timestamp(epoch_us(ts) ...)`) so the hash
  * gate checks the µs-exact trunc/extract/compare semantics, not just
  * shapes.
  *
  * Scale (100 TB): every query is one scan + one hash-partition
  * aggregate exchange on a low-cardinality group key; the range filter
  * in q244 is a plain µs comparison that pushes to the parquet reader.
  */
object HptParity {

  type Q = (SparkSession, String) => DataFrame

  /** events + ts_3 (millisecond-grain) and ts_6 (microsecond-grain)
    * columns. All arithmetic is integer (`%` on longs), never double —
    * epoch-µs values exceed 2^53.
    *
    * The derivation is CTAS'd into a staged parquet table (round-8): a
    * physical timestamp column instead of a per-query projection, so
    * q244's µs-precision range predicate reaches the parquet reader as
    * `PushedFilters` (row-group min/max skipping — the reference stores
    * ts(3)/(6) physically and prunes fragments the same way,
    * `Shared/sqltypes.h:77`), instead of post-scan codegen over every
    * row. One write, shared by q242-q244 via the Stage cache.
    */
  private def hpt(s: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts"))
    graft.Stage(
      t(s, d, "events")
        .withColumn("ts_3",
          timestamp_micros(us - pmod(us, lit(1000L)) +
            pmod(col("event_id"), lit(997L)) * 1000L))
        .withColumn("ts_6",
          timestamp_micros(us + pmod(col("event_id"), lit(999983L)))),
      "hpt_physical")
  }

  val queries: Seq[(String, Q)] = Seq(
    // Q019 shape: date_trunc bucket over the ms-grain column + avg
    // metric (day grain — the fixture spans one month).
    "q242_hpt_trunc_ms" -> ((s, d) =>
      hpt(s, d)
        .groupBy(date_trunc("day", col("ts_3")).as("d"))
        .agg(avg(col("value")).as("del"), count(lit(1)).as("n"))),

    // Q022/Q025 shape: EXTRACT fields from the µs-grain column as group
    // keys next to a name column (dest_name → event_type).
    "q243_hpt_extract_us" -> ((s, d) =>
      hpt(s, d)
        .groupBy(col("event_type"),
          dayofmonth(col("ts_6")).as("dy"),
          hour(col("ts_6")).as("hr"))
        .agg(avg(col("value")).as("del"))),

    // Q028 shape: half-open range filter with µs-precision literals,
    // then the dashboard triple avg/avg/count per key.
    "q244_hpt_range_us" -> ((s, d) => {
      val lo = lit("2024-01-10 12:34:56.123456").cast("timestamp")
      val hi = lit("2024-01-25 01:02:03.987654").cast("timestamp")
      hpt(s, d)
        .where(col("ts_6") >= lo && col("ts_6") < hi)
        .groupBy(col("event_type").as("key0"))
        .agg(avg(col("value")).as("x"),
          avg(col("user_id")).as("y"),
          count(lit(1)).as("size"))
    }),

    // TIMESTAMP(9) policy pin: nanos-as-int64 (the parquet NANOS
    // physical form; Spark's µs TimestampType cannot hold it — SURVEY
    // §7.4). Hour-trunc and extent in pure int64 arithmetic.
    "q245_hpt_ns_policy" -> ((s, d) => {
      val ns: Column = unix_micros(col("ts")) * 1000L +
        pmod(col("event_id"), lit(1000L))
      t(s, d, "events")
        .select(ns.as("ns"))
        .groupBy((col("ns") - pmod(col("ns"), lit(3600000000000L)))
          .as("h_ns"))
        .agg(count(lit(1)).as("n"),
          min(col("ns")).as("ns_min"), max(col("ns")).as("ns_max"))
    })
  )

  private val ts3Sql =
    "make_timestamp(epoch_us(ts) - epoch_us(ts) % 1000 + (event_id % 997) * 1000)"
  private val ts6Sql = "make_timestamp(epoch_us(ts) + (event_id % 999983))"

  val oracles: Seq[(String, String)] = Seq(
    "q242_hpt_trunc_ms" ->
      s"""SELECT date_trunc('day', $ts3Sql)::TIMESTAMP AS d,
                 avg(value) AS del, count(*) AS n
          FROM events GROUP BY 1""",
    "q243_hpt_extract_us" ->
      s"""SELECT event_type,
                 extract(day FROM $ts6Sql)::INT AS dy,
                 extract(hour FROM $ts6Sql)::INT AS hr,
                 avg(value) AS del
          FROM events GROUP BY 1, 2, 3""",
    "q244_hpt_range_us" ->
      s"""SELECT event_type AS key0, avg(value) AS x,
                 avg(user_id) AS y, count(*) AS size
          FROM events
          WHERE $ts6Sql >= TIMESTAMP '2024-01-10 12:34:56.123456'
            AND $ts6Sql <  TIMESTAMP '2024-01-25 01:02:03.987654'
          GROUP BY 1""",
    "q245_hpt_ns_policy" ->
      """WITH n AS (
           SELECT epoch_us(ts) * 1000 + (event_id % 1000) AS ns
           FROM events)
         SELECT ns - ns % 3600000000000 AS h_ns, count(*) AS n,
                min(ns) AS ns_min, max(ns) AS ns_max
         FROM n GROUP BY 1"""
  )
}
