package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The reference's flights benchmark query shapes
  * (`Benchmarks/queries/flights/Q001-Q017.sql` in /root/reference;
  * BASELINE.md): bare counts, filtered counts, extract/date_trunc
  * group-bys, and the flagship avg-metric-by-month (Q005:
  * `avg(arrdelay) GROUP BY date_trunc(month, dep_timestamp)`), mapped
  * onto the events fixture (value ↔ arrdelay, ts ↔ dep_timestamp,
  * event_type ↔ carrier). Each is scan + single partial/final aggregate.
  */
object FlightsParity {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(
    // Q001-style: bare count.
    "q114_fl_count" -> ((s, d) =>
      t(s, d, "events").agg(count(lit(1)).as("n"))),

    // Q002-style: filtered count (predicate must push to the scan).
    "q115_fl_filtered_count" -> ((s, d) =>
      t(s, d, "events").filter(col("value") > 50.0)
        .agg(count(lit(1)).as("n"))),

    // Q005-style flagship: avg(metric) by month bucket.
    "q116_fl_avg_by_month" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("month", col("ts")).as("mon"))
        .agg(avg(col("value")).as("avg_value"))),

    // Q-style: count by (carrier, dayofweek extract).
    "q117_fl_carrier_dow" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n")))
  )

  val oracles: Seq[(String, String)] = Seq(
    "q114_fl_count" ->
      """SELECT count(*) AS n FROM events""",
    "q115_fl_filtered_count" ->
      """SELECT count(*) AS n FROM events WHERE value > 50.0""",
    "q116_fl_avg_by_month" ->
      """SELECT date_trunc('month', ts::TIMESTAMP)::TIMESTAMP AS mon,
                avg(value) AS avg_value
         FROM events GROUP BY 1""",
    // DuckDB dayofweek: 0=Sunday..6=Saturday; Spark: 1..7.
    "q117_fl_carrier_dow" ->
      """SELECT event_type,
                (dayofweek(ts::TIMESTAMP) + 1)::INT AS dow,
                count(*) AS n
         FROM events GROUP BY 1, 2"""
  )
}
