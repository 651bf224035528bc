package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch Y (q469-q471) — temporal modeling + data prep:
  *
  *  - q469: rolling 7-day OLS slope per event_type over the daily
  *    count series — the windowed-trend telemetry operator (the
  *    window-local sibling of q399's global Theil-Sen). Closed-form
  *    slope from window sums of (x, y, xy, x²) where x is the epoch
  *    day; all windows are day-grain bounded per series.
  *  - q470: deterministic missing-value imputation — values are
  *    knocked out on a fixed rule (event_id % 13 == 0), imputed from
  *    the (event_type, hour) group mean of the SURVIVING values, and
  *    audited per type (n_missing, imputed mass vs original mass).
  *    Two keyed aggregates, one broadcast join back.
  *  - q471: SCD2 interval construction — fold each user's event
  *    stream into (state, valid_from, valid_to) validity intervals
  *    (state = event_type; close each interval at the next event,
  *    NULL horizon for the open one), then the as-of probe "state
  *    census at the corpus midpoint". lead() over per-user windows;
  *    the probe is a filter, not a join.
  */
object Round9Temporal {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q469_rolling_regression" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
        .agg(count(lit(1)).as("y"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w7))
        .withColumn("sx", sum(col("day")).over(w7))
        .withColumn("sy", sum(col("y")).over(w7))
        .withColumn("sxy", sum(col("day") * col("y")).over(w7))
        .withColumn("sxx", sum(col("day") * col("day")).over(w7))
        .filter(col("n") >= 3)
        // slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²): exact longs in,
        // one double division out
        .withColumn("slope_milli", floor(lit(1000.0) *
          (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
          .cast("long"))
        .select(col("event_type"), col("day"), col("y"), col("n"),
          col("slope_milli"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q470_null_imputation" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          hour(col("ts")).as("hr"),
          when(col("event_id") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"),
          col("value").as("v_orig"))
      val means = ev.filter(col("v").isNotNull)
        .groupBy(col("event_type"), col("hr"))
        .agg((sum(col("v")) / count(col("v"))).as("grp_mean"))
      ev.join(broadcast(means), Seq("event_type", "hr"))
        .withColumn("v_imp", coalesce(col("v"), col("grp_mean")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").isNull.cast("long")).as("n_missing"),
          floor(sum(col("v_imp")) * 100).cast("long")
            .as("imputed_cents"),
          floor(sum(col("v_orig")) * 100).cast("long")
            .as("original_cents"))
        .withColumn("drift_ppm", expr(
          "(imputed_cents - original_cents) * 1000000 DIV original_cents"))
        .orderBy(col("event_type"))
    }),

    "q471_scd2_build" -> ((s, d) => {
      val ev = t(s, d, "events")
      val mid = ev.agg(
        to_timestamp(from_unixtime(
          floor((unix_timestamp(min(col("ts"))) +
            unix_timestamp(max(col("ts")))) / 2))).as("probe"))
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      val intervals = ev
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("event_id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wU))
      // as-of census: which state was each user in at the midpoint?
      intervals.crossJoin(broadcast(mid))
        .filter(col("valid_from") <= col("probe") &&
          (col("valid_to").isNull || col("valid_to") > col("probe")))
        .groupBy(col("state"))
        .agg(count(lit(1)).as("n_users_in_state"))
        .orderBy(col("state"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q469_rolling_regression" ->
      """WITH daily AS (
           SELECT event_type,
                  -- NB: DuckDB's // on DOUBLE is plain division, so
                  -- an explicit floor(x / 86400) is required here
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  count(*)::BIGINT AS y
           FROM events GROUP BY 1, 2),
         rolled AS (
           SELECT event_type, day, y,
                  count(*) OVER w AS n,
                  sum(day) OVER w AS sx, sum(y) OVER w AS sy,
                  sum(day * y) OVER w AS sxy,
                  sum(day * day) OVER w AS sxx
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT event_type, day, y, n::BIGINT AS n,
                floor(1000.0 * (n * sxy - sx * sy)
                  / (n * sxx - sx * sx))::BIGINT AS slope_milli
         FROM rolled WHERE n >= 3
         ORDER BY event_type, day""",

    "q470_null_imputation" ->
      """WITH ev AS (
           SELECT event_id, event_type,
                  extract(hour FROM ts::TIMESTAMP)::BIGINT AS hr,
                  CASE WHEN event_id % 13 = 0 THEN NULL
                       ELSE value END AS v,
                  value AS v_orig
           FROM events),
         means AS (
           SELECT event_type, hr, sum(v) / count(v) AS grp_mean
           FROM ev WHERE v IS NOT NULL GROUP BY event_type, hr),
         joined AS (
           SELECT ev.event_type, ev.v, ev.v_orig,
                  coalesce(ev.v, means.grp_mean) AS v_imp
           FROM ev JOIN means ON ev.event_type = means.event_type
                             AND ev.hr = means.hr),
         agg AS (
           SELECT event_type, count(*)::BIGINT AS n,
                  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT
                    AS n_missing,
                  floor(sum(v_imp) * 100)::BIGINT AS imputed_cents,
                  floor(sum(v_orig) * 100)::BIGINT AS original_cents
           FROM joined GROUP BY event_type)
         SELECT event_type, n, n_missing, imputed_cents,
                original_cents,
                ((imputed_cents - original_cents) * 1000000
                  // original_cents)::BIGINT AS drift_ppm
         FROM agg ORDER BY event_type""",

    "q471_scd2_build" ->
      """WITH ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts,
                            event_id FROM events),
         mid AS (
           SELECT to_timestamp(floor((floor(epoch(min(ts)))
             + floor(epoch(max(ts)))) / 2)::BIGINT) AS probe FROM ev),
         intervals AS (
           SELECT user_id, event_type AS state, ts AS valid_from,
                  lead(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS valid_to
           FROM ev)
         SELECT state, count(*)::BIGINT AS n_users_in_state
         FROM intervals CROSS JOIN mid
         WHERE valid_from <= probe
           AND (valid_to IS NULL OR valid_to > probe)
         GROUP BY state ORDER BY state"""
  )
}
