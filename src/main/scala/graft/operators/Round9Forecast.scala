package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch J (q409-q410): Holt-Winters additive seasonal
  * smoothing as a bounded integer struct-state fold (extending q363's
  * Holt linear with 7 day-of-week seasonal slots), and a
  * forecast-backtest scorecard (naive / seasonal-naive / drift MAE
  * over a 7-day holdout). Hash-gated vs DuckDB.
  */
object Round9Forecast {

  type Q = (SparkSession, String) => DataFrame

  /** Shared recursion pieces for the Holt-Winters fold. The seasonal
    * slot for the step being consumed is selected by CASE over
    * `a.t % 7` (no array-index lambdas — DuckDB's list_reduce pins the
    * accumulator type to the element type, so the state is a flat
    * struct of l, b, s0..s6, t), and l'/b'/s' repeat the defining
    * expressions exactly as q363 does (alpha = beta = gamma = 1/2,
    * integer floor halving).
    */
  private def sj(dialect: String): String = {
    val cases = (0 to 6).map(j => s"WHEN $j THEN a.s$j").mkString(" ")
    dialect match {
      case "spark" => s"(CASE pmod(a.t, 7) $cases END)"
      case _ => s"(CASE a.t % 7 $cases END)"
    }
  }
  private def lNew(d: String): String =
    s"cast(floor((x.v - ${sj(d)} + a.l + a.b) / 2.0) as bigint)"
  private def bNew(d: String): String =
    s"cast(floor((${lNew(d)} - a.l + a.b) / 2.0) as bigint)"
  private def sNew(d: String): String =
    s"cast(floor((x.v - ${lNew(d)} + ${sj(d)}) / 2.0) as bigint)"
  private def sFields(d: String): String = (0 to 6).map { j =>
    val cond = if (d == "spark") s"pmod(a.t, 7) = $j" else s"a.t % 7 = $j"
    s"'s$j', CASE WHEN $cond THEN ${sNew(d)} ELSE a.s$j END"
  }.mkString(", ")
  private def sfCase(d: String, pre: String): String = {
    val cases = (0 to 6).map(j => s"WHEN $j THEN ${pre}s$j").mkString(" ")
    if (d == "spark") s"(CASE pmod(n_days, 7) $cases END)"
    else s"(CASE n_days % 7 $cases END)"
  }

  val queries: Seq[(String, Q)] = Seq(

    // Holt-Winters additive seasonal smoothing — q363's level+trend
    // recursion extended with the 7-slot day-of-week seasonal state
    // the weekday cycle (q382/q408) demands. The recursion is a
    // codegen'd higher-order fold over the bounded day-grain series;
    // all-integer halving smoothing, replayed verbatim by the oracle's
    // list_reduce (whose acc-type = element-type constraint shapes the
    // flat struct state). Forecast for day n+1 = l + b + s[(n) % 7].
    "q409_holt_winters" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      val zeroS = (0 to 6).map(j => s"'s$j', 0L").mkString(", ")
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"))
        .select(col("event_type"),
          transform(col("series"), x => x.getField("m")).as("arr"))
        .withColumn("n_days", size(col("arr")).cast("long"))
        .withColumn("state", expr(
          s"""aggregate(
                transform(slice(arr, 2, int(n_days) - 1),
                  v -> named_struct('v', v)),
                named_struct('l', element_at(arr, 1), 'b', 0L,
                  $zeroS, 't', 1L),
                (a, x) -> named_struct(
                  'l', ${lNew("spark")},
                  'b', ${bNew("spark")},
                  ${sFields("spark")},
                  't', a.t + 1L))"""))
        .select(col("event_type"), col("n_days"),
          col("state.l").as("level_milli"),
          col("state.b").as("trend_milli"),
          expr(sfCase("spark", "state.")).as("seasonal_next_milli"),
          (col("state.l") + col("state.b")
            + expr(sfCase("spark", "state."))).as("forecast_milli"))
        .orderBy(col("event_type"))
    }),

    // Forecast-backtest scorecard — which baseline earns the right to
    // be beaten: over the last 7 observed days of each series, mean
    // absolute error (in exact milli-units) of naive (yesterday),
    // seasonal-naive (same weekday last week), and drift (yesterday +
    // mean historical step). Lag features from bounded per-series
    // windows; one day-grain aggregate per series.
    "q410_forecast_backtest" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m")), "q410_daily")
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val maxDay = daily.groupBy(col("event_type"))
        .agg(max(col("day")).as("mx"), count(lit(1)).as("n_days"))
      val feat = daily
        .withColumn("lag1", lag(col("m"), 1).over(w))
        .withColumn("lag7", lag(col("m"), 7).over(w))
        .withColumn("rn", row_number().over(w))
        .withColumn("first_m", first(col("m")).over(w))
        .join(maxDay, "event_type")
        .filter(col("day") > expr("mx - interval 7 days"))
        .filter(col("lag7").isNotNull)
      feat.select(col("event_type"), col("n_days"), col("m"),
          col("lag1"), col("lag7"),
          (col("lag1") + expr("(lag1 - first_m) DIV greatest(rn - 2, 1L)"))
            .as("drift_pred"))
        .groupBy(col("event_type"))
        .agg(first(col("n_days")).as("n_days"),
          count(lit(1)).as("n_eval"),
          expr("sum(abs(m - lag1)) DIV count(*)").as("mae_naive"),
          expr("sum(abs(m - lag7)) DIV count(*)").as("mae_seasonal"),
          expr("sum(abs(m - drift_pred)) DIV count(*)").as("mae_drift"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q409_holt_winters" -> {
      // NOT list_reduce: DuckDB's list_reduce mis-evaluates repeated
      // nested struct-field subexpressions against a partially-updated
      // accumulator (verified empirically: the same lambda body gives
      // the correct value standalone and a different one inside the
      // fold). A recursive CTE carries the state as plain columns —
      // every reference unambiguous.
      val sjv = "(CASE t % 7 WHEN 0 THEN s0 WHEN 1 THEN s1 " +
        "WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4 " +
        "WHEN 5 THEN s5 WHEN 6 THEN s6 END)"
      val sSel = (0 to 6).map(j =>
        s"CASE WHEN t % 7 = $j THEN cast(floor((xv - ln + sjv) / 2.0)" +
          s" as bigint) ELSE s$j END AS s$j").mkString(",\n             ")
      s"""WITH RECURSIVE daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, list(m ORDER BY day) AS arr,
                  count(*)::BIGINT AS n_days
           FROM daily GROUP BY event_type),
         fold AS (
           SELECT event_type, arr, n_days, 1::BIGINT AS t,
                  arr[1]::BIGINT AS l, 0::BIGINT AS b,
                  0::BIGINT AS s0, 0::BIGINT AS s1, 0::BIGINT AS s2,
                  0::BIGINT AS s3, 0::BIGINT AS s4, 0::BIGINT AS s5,
                  0::BIGINT AS s6
           FROM ser
           UNION ALL
           SELECT event_type, arr, n_days, t + 1,
                  ln AS l,
                  cast(floor((ln - l + b) / 2.0) as bigint) AS b,
                  $sSel
           FROM (
             SELECT *, cast(floor((xv - sjv + l + b) / 2.0) as bigint)
                    AS ln
             FROM (
               SELECT *, arr[(t + 1)::INT]::BIGINT AS xv,
                      $sjv AS sjv
               FROM fold WHERE t < n_days))),
         done AS (SELECT * FROM fold WHERE t = n_days)
         SELECT event_type, n_days, l AS level_milli, b AS trend_milli,
                (CASE n_days % 7 WHEN 0 THEN s0 WHEN 1 THEN s1
                   WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4
                   WHEN 5 THEN s5 WHEN 6 THEN s6 END)::BIGINT
                  AS seasonal_next_milli,
                (l + b + (CASE n_days % 7 WHEN 0 THEN s0
                   WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
                   WHEN 4 THEN s4 WHEN 5 THEN s5 WHEN 6 THEN s6 END))
                  ::BIGINT AS forecast_milli
         FROM done ORDER BY event_type"""
    },
    "q410_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         md AS (
           SELECT event_type, max(day) AS mx, count(*)::BIGINT AS n_days
           FROM daily GROUP BY 1),
         feat AS (
           SELECT d.event_type, md.n_days, d.day, d.m,
                  lag(d.m, 1) OVER (PARTITION BY d.event_type
                    ORDER BY d.day) AS lag1,
                  lag(d.m, 7) OVER (PARTITION BY d.event_type
                    ORDER BY d.day) AS lag7,
                  row_number() OVER (PARTITION BY d.event_type
                    ORDER BY d.day) AS rn,
                  first_value(d.m) OVER (PARTITION BY d.event_type
                    ORDER BY d.day) AS first_m,
                  md.mx
           FROM daily d JOIN md ON md.event_type = d.event_type)
         SELECT event_type, any_value(n_days) AS n_days,
                count(*)::BIGINT AS n_eval,
                (sum(abs(m - lag1)) // count(*))::BIGINT AS mae_naive,
                (sum(abs(m - lag7)) // count(*))::BIGINT
                  AS mae_seasonal,
                (sum(abs(m - (lag1 + (lag1 - first_m)
                   // greatest(rn - 2, 1)))) // count(*))::BIGINT
                  AS mae_drift
         FROM feat
         WHERE day > mx - INTERVAL 7 DAY AND lag7 IS NOT NULL
         GROUP BY event_type ORDER BY event_type"""
  )
}
