package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The reference's headline benchmark query set, shape-for-shape —
  * Litwintschik taxi MQ01-MQ04 (`Benchmarks/queries/taxis/MQ01-MQ04.sql`
  * in /root/reference; BASELINE.md), mapped onto the events fixture:
  * event_type ↔ cab_type, user_id%10 ↔ passenger_count, value ↔
  * total_amount/trip_distance. These are the plans the reference's GPU
  * kernels race on; in Spark each is a single-pass partial/final
  * HashAggregate over the scan — the optimal shape at any scale.
  */
object TaxiParity {

  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(
      col("event_type"),
      (col("user_id") % 10).as("pc"),
      year(col("ts")).as("yr"),
      col("value"))

  val queries: Seq[(String, Q)] = Seq(
    // MQ01: count by type.
    "q110_taxi_mq01" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))),

    // MQ02: avg(amount) by passenger_count.
    "q111_taxi_mq02" -> ((s, d) =>
      ev(s, d).groupBy(col("pc"))
        .agg(avg(col("value")).as("avg_value"))),

    // MQ03: count by (passenger_count, year).
    "q112_taxi_mq03" -> ((s, d) =>
      ev(s, d).groupBy(col("pc"), col("yr"))
        .agg(count(lit(1)).as("n"))),

    // MQ04: count by (passenger_count, year, integer distance), ordered.
    "q113_taxi_mq04" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("pc"), col("yr"),
          floor(col("value")).cast("long").as("dist"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pc"), col("yr"), col("dist")))
  )

  val oracles: Seq[(String, String)] = Seq(
    "q110_taxi_mq01" ->
      """SELECT event_type, count(*) AS n FROM events GROUP BY 1""",
    "q111_taxi_mq02" ->
      """SELECT user_id % 10 AS pc, avg(value) AS avg_value
         FROM events GROUP BY 1""",
    "q112_taxi_mq03" ->
      """SELECT user_id % 10 AS pc, year(ts::TIMESTAMP)::INT AS yr,
                count(*) AS n
         FROM events GROUP BY 1, 2""",
    "q113_taxi_mq04" ->
      """SELECT user_id % 10 AS pc, year(ts::TIMESTAMP)::INT AS yr,
                floor(value)::BIGINT AS dist, count(*) AS n
         FROM events GROUP BY 1, 2, 3"""
  )
}
