package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AX (q544-q546) — recursive-state estimation and
  * sketch-based cardinality estimation (public algorithms: the scalar
  * Kalman filter [Kalman 1960], Croston's intermittent-demand method
  * [Croston 1972], and the AMS F2 sketch [Alon-Matias-Szegedy 1996];
  * reference surface: the time-series UDTF family and the query
  * optimizer's cardinality estimation in QueryEngine/).
  *
  * All three follow the repo's established recursive-state discipline
  * (q363/q409): state is INTEGER-quantized (milli units / ppm gains) so
  * Spark's `aggregate()` fold and DuckDB's recursive CTE cannot drift
  * in float representation, and the fold runs over DAY-GRAIN arrays
  * that are bounded by the calendar, never the corpus — the 100 TB
  * shape is a pre-aggregation shuffle to (series, day), then per-series
  * arrays of ≤ a-few-thousand elements.
  *
  *  - q544: scalar Kalman local-level filter per event_type daily
  *    revenue (Q=50, R=20000 in milli² units): gain in exact integer
  *    ppm, level/variance in milli; emits the converged posterior
  *    variance and next-step gain. The variance recursion converges to
  *    p* ≈ √(QR) regardless of data, which the spec pins.
  *  - q545: Croston's method over intermittent category demand —
  *    nonzero-demand days only, halving EWMA (α=0.5) of demand size
  *    and inter-arrival gap, forecast = size/interval in milli-units
  *    per day. Same fold, state (size, interval, last_day).
  *  - q546: AMS/tug-of-war F2 sketch — the self-join-size estimator
  *    every optimizer needs: 16 independent ±1 sign sketches of
  *    lineitem's partkey frequency vector via a two-step Lehmer hash
  *    ((k·48271 + m·16807) mod p, then ·48271 mod p, p = 2³¹−1 —
  *    magnitudes stay < 2⁶³ so DuckDB's checked BIGINT and Spark's
  *    wrapping BIGINT agree), estimate = mean of squared sketch sums,
  *    reported next to the exact Σf² with error in ppm. Map-side
  *    partial aggregation reduces each sketch to one row per copy —
  *    the shuffle is 16 rows regardless of corpus size.
  */
object Round9Filters {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q544_kalman_level" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"))
        .select(col("event_type"),
          transform(col("series"), x => x.getField("m")).as("arr"))
        .withColumn("n_days", size(col("arr")).cast("long"))
        // state (l = level milli, p = posterior variance milli²);
        // k = (p+Q)·1e6 DIV (p+Q+R) is exact integer ppm; the gain
        // appears twice per step so it is written out twice (Spark
        // HOF lambdas have no local bindings)
        .withColumn("state", expr(
          """aggregate(slice(arr, 2, int(n_days) - 1),
               named_struct('l', element_at(arr, 1), 'p', 20000L),
               (a, x) -> named_struct(
                 'l', a.l + cast(floor(
                        ((a.p + 50L) * 1000000L DIV (a.p + 50L + 20000L))
                        * (x - a.l) / 1000000.0) as bigint),
                 'p', cast(floor(
                        (1000000L - ((a.p + 50L) * 1000000L
                           DIV (a.p + 50L + 20000L)))
                        * (a.p + 50L) / 1000000.0) as bigint)))"""))
        .select(col("event_type"), col("n_days"),
          col("state.l").as("level_milli"),
          col("state.p").as("p_var_milli2"),
          expr("""(state.p + 50L) * 1000000L
                  DIV (state.p + 50L + 20000L)""").as("next_gain_ppm"))
    }),

    "q545_croston_demand" -> ((s, d) => {
      val daily = t(s, d, "lineitem")
        .select((col("l_partkey") % 500).cast("long").as("cat"),
          floor(unix_timestamp(col("l_shipdate")) / 86400L)
            .cast("long").as("day"),
          col("l_quantity").cast("long").as("q"))
        .groupBy(col("cat"), col("day"))
        .agg(sum(col("q")).as("q"))
      daily.groupBy(col("cat"))
        .agg(sort_array(collect_list(struct(col("day"), col("q"))))
          .as("arr"))
        .withColumn("n_demands", size(col("arr")).cast("long"))
        // state (z = EWMA demand size, v = EWMA inter-arrival days,
        // last = previous demand day); α = 0.5 halving, interval
        // prior 7 days
        .withColumn("state", expr(
          """aggregate(slice(arr, 2, int(n_demands) - 1),
               named_struct(
                 'z', element_at(arr, 1).q, 'v', 7L,
                 'last', element_at(arr, 1).day),
               (a, x) -> named_struct(
                 'z', cast(floor((a.z + x.q) / 2.0) as bigint),
                 'v', cast(floor((a.v + (x.day - a.last)) / 2.0)
                        as bigint),
                 'last', x.day))"""))
        .select(col("cat"), col("n_demands"),
          col("state.z").as("size_est"),
          col("state.v").as("interval_est_days"),
          expr("""cast(floor(state.z * 1000.0
                  / greatest(state.v, 1L)) as bigint)""")
            .as("rate_milli_per_day"))
        .orderBy(col("cat"))
    }),

    "q546_ams_f2_sketch" -> ((s, d) => {
      val base = t(s, d, "lineitem")
        .select(col("l_partkey").cast("long").as("k"))
      val ms = broadcast(s.range(16).select(col("id").as("m")))
      // splitmix-style avalanche: a LINEAR hash's parity alternates
      // with consecutive keys and the sketch sums cancel to ~0 (seen
      // empirically: est 12× under exact); two xor-shift-multiply
      // rounds break the linearity. All magnitudes < 2⁶³.
      val sketches = base.crossJoin(ms)
        .withColumn("h0",
          expr("""((k % 2147483648L) * 2654435761L
            + m * 2246822519L) & 4294967295L"""))
        .withColumn("h1", expr(
          "((h0 ^ shiftright(h0, 16)) * 73244475L) & 4294967295L"))
        .withColumn("h2", expr(
          "((h1 ^ shiftright(h1, 16)) * 73244475L) & 4294967295L"))
        .select(col("m"), (lit(1L) - lit(2L) *
          expr("(h2 ^ shiftright(h2, 16)) % 2L")).as("sg"))
        .groupBy(col("m"))
        .agg(sum(col("sg")).as("sm"))
        .select(col("m"), (col("sm") * col("sm")).as("est"))
      val exact = base.groupBy(col("k"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("exact_f2"),
          sum(col("c")).as("n_rows"))
      sketches.agg(expr("sum(est) DIV 16").as("est_mean"))
        .crossJoin(broadcast(exact))
        .select(col("n_rows"), col("exact_f2"), col("est_mean"),
          expr("""abs(est_mean - exact_f2) * 1000000
                  DIV exact_f2""").as("err_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q544_kalman_level" ->
      // recursive CTE, not list_reduce (q363's DuckDB adjudication)
      """WITH RECURSIVE daily AS (
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
                  arr[1]::BIGINT AS l, 20000::BIGINT AS p
           FROM ser
           UNION ALL
           SELECT event_type, arr, n_days, t + 1,
                  l + cast(floor(k * (arr[(t + 1)::INT]::BIGINT - l)
                    / 1000000.0) as bigint),
                  cast(floor((1000000 - k) * pp / 1000000.0) as bigint)
           FROM (
             SELECT *, p + 50 AS pp,
                    (p + 50) * 1000000 // (p + 50 + 20000) AS k
             FROM fold WHERE t < n_days)),
         done AS (SELECT * FROM fold WHERE t = n_days)
         SELECT event_type, n_days, l AS level_milli,
                p AS p_var_milli2,
                ((p + 50) * 1000000 // (p + 50 + 20000))::BIGINT
                  AS next_gain_ppm
         FROM done""",

    "q545_croston_demand" ->
      """WITH RECURSIVE daily AS (
           SELECT (l_partkey % 500)::BIGINT AS cat,
                  floor(epoch(l_shipdate::TIMESTAMP) / 86400)::BIGINT
                    AS day,
                  sum(l_quantity::BIGINT)::BIGINT AS q
           FROM lineitem GROUP BY 1, 2),
         ser AS (
           SELECT cat, list(day ORDER BY day) AS days,
                  list(q ORDER BY day) AS qs,
                  count(*)::BIGINT AS n_demands
           FROM daily GROUP BY cat),
         fold AS (
           SELECT cat, days, qs, n_demands, 1::BIGINT AS t,
                  qs[1]::BIGINT AS z, 7::BIGINT AS v,
                  days[1]::BIGINT AS lastd
           FROM ser
           UNION ALL
           SELECT cat, days, qs, n_demands, t + 1,
                  cast(floor((z + qs[(t + 1)::INT]::BIGINT) / 2.0)
                    as bigint),
                  cast(floor((v + (days[(t + 1)::INT]::BIGINT - lastd))
                    / 2.0) as bigint),
                  days[(t + 1)::INT]::BIGINT
           FROM fold WHERE t < n_demands),
         done AS (SELECT * FROM fold WHERE t = n_demands)
         SELECT cat, n_demands, z AS size_est,
                v AS interval_est_days,
                cast(floor(z * 1000.0 / greatest(v, 1)) as bigint)
                  AS rate_milli_per_day
         FROM done ORDER BY cat""",

    "q546_ams_f2_sketch" ->
      """WITH base AS (
           SELECT l_partkey::BIGINT AS k FROM lineitem),
         ms AS (SELECT range::BIGINT AS m FROM range(16)),
         sketches AS (
           SELECT m, sum(1 - 2 * (xor(h2, h2 >> 16) % 2))::BIGINT AS sm
           FROM (
             SELECT m,
                    (xor(h1, h1 >> 16) * 73244475) & 4294967295 AS h2
             FROM (
               SELECT m,
                      (xor(h0, h0 >> 16) * 73244475) & 4294967295 AS h1
               FROM (
                 SELECT m, ((k % 2147483648) * 2654435761
                        + m * 2246822519) & 4294967295 AS h0
                 FROM base, ms)))
           GROUP BY m),
         exact AS (
           SELECT sum(c * c)::BIGINT AS exact_f2,
                  sum(c)::BIGINT AS n_rows
           FROM (SELECT k, count(*)::BIGINT AS c FROM base
                 GROUP BY k)),
         est AS (
           SELECT (sum(sm::BIGINT * sm) // 16)::BIGINT AS est_mean
           FROM sketches)
         SELECT n_rows, exact_f2, est_mean,
                (abs(est_mean - exact_f2) * 1000000 // exact_f2)
                  ::BIGINT AS err_ppm
         FROM est, exact"""
  )
}
