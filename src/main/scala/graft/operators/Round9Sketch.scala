package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AG (q493-q495) — mergeable histogram sketch, series
  * risk, and experimentation ratio metrics:
  *
  *  - q493: HdrHistogram-style integer log-bucket quantiles — each
  *    price-in-cents maps to bucket (msb, top-2-sub-bits) via pure
  *    integer bit math (`length(bin(x))`, shifts, masks) so the
  *    sketch is exactly reproducible on any engine (no float log
  *    whose last ulp could flip a bucket). ~12.5% relative-error
  *    p50/p90/p99 upper bounds per return flag from a ≤64-bucket
  *    mergeable histogram: the 100 TB quantile path (map-side
  *    combine, constant state) vs ExactSelection's exact path.
  *    Mirrors the reference's APPROX_PERCENTILE surface
  *    (QueryEngine/ApproxQuantileDescriptor.cpp) with an
  *    integer-deterministic sketch.
  *  - q494: maximum drawdown + longest below-peak streak of the
  *    per-type daily revenue series (classic peak-to-trough risk
  *    stat): running max over day-grain windows (calendar-bounded
  *    partitions), drawdown in exact ppm integer division,
  *    below-peak run lengths via gaps-and-islands.
  *  - q495: delta-method ratio-metric A/B readout — revenue per
  *    active day is a ratio of per-user sums, so its variance needs
  *    the delta method: Var(r̄/s̄) ≈ (σr² − 2Rσrs + R²σs²)/(n·μs²).
  *    All moments from exact integer/decimal sums (second moments
  *    lifted to DECIMAL(38,0) before squaring — BIGINT² overflows at
  *    sf1), double math only on the final bounded scalars so the
  *    result is bit-reproducible.
  */
object Round9Sketch {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q493_hdr_histogram" -> ((s, d) => {
      val buckets = t(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .filter(col("cents") >= 4) // msb>=3 so the 2 sub-bits exist
        .withColumn("msb", length(bin(col("cents"))).cast("int"))
        .withColumn("sub",
          expr("shiftright(cents, msb - 3) & 3").cast("long"))
        .withColumn("bucket", col("msb") * 4 + col("sub"))
        // inclusive upper bound of bucket (msb, sub):
        // ((sub+5) << (msb-3)) - 1, pure integer
        .withColumn("ub",
          expr("shiftleft(sub + 5, msb - 3) - 1").cast("long"))
        .groupBy(col("flag"), col("bucket"))
        .agg(max(col("ub")).as("ub"), count(lit(1)).as("cnt"))
      val totals = buckets.groupBy(col("flag"))
        .agg(sum(col("cnt")).as("n"),
          count(lit(1)).as("n_buckets"))
      val wCum = Window.partitionBy(col("flag")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // <=64 buckets per flag: the cumulative window is sketch-sized
      buckets
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .join(broadcast(totals), Seq("flag"))
        .groupBy(col("flag"), col("n"), col("n_buckets"))
        .agg(
          min(when(col("cum") * 100 >= col("n") * 50, col("ub")))
            .as("p50_ub_cents"),
          min(when(col("cum") * 100 >= col("n") * 90, col("ub")))
            .as("p90_ub_cents"),
          min(when(col("cum") * 100 >= col("n") * 99, col("ub")))
            .as("p99_ub_cents"))
        .select(col("flag"), col("n"), col("n_buckets"),
          col("p50_ub_cents"), col("p90_ub_cents"), col("p99_ub_cents"))
        .orderBy(col("flag"))
    }),

    "q494_max_drawdown" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("rev"))
      val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wRun = wDay.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val dd = daily
        .withColumn("runmax", max(col("rev")).over(wRun))
        .withColumn("dd_ppm",
          expr("(runmax - rev) * 1000000 DIV runmax"))
        // gaps-and-islands: cumulative count of at-peak days groups
        // the below-peak runs
        .withColumn("grp",
          sum(when(col("dd_ppm") === 0L, 1L).otherwise(0L)).over(wRun))
      val streaks = dd.filter(col("dd_ppm") > 0L)
        .groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("event_type"))
        .agg(max(col("run_len")).as("longest_below_peak_days"))
      val worst = dd.groupBy(col("event_type"))
        .agg(max(col("dd_ppm")).as("max_drawdown_ppm"),
          max(col("runmax")).as("peak_cents"))
      val worstDay = dd.join(worst, Seq("event_type"))
        .filter(col("dd_ppm") === col("max_drawdown_ppm"))
        .groupBy(col("event_type"))
        .agg(min(col("day")).as("worst_day"))
      worst.join(worstDay, Seq("event_type"))
        .join(streaks, Seq("event_type"), "left")
        .na.fill(0L, Seq("longest_below_peak_days"))
        .select(col("event_type"), col("peak_cents"),
          col("max_drawdown_ppm"), col("worst_day"),
          col("longest_below_peak_days"))
        .orderBy(col("event_type"))
    }),

    "q495_delta_method_ratio" -> ((s, d) => {
      val perUser = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("r"),
          countDistinct(floor(unix_timestamp(col("ts")) / 86400L)
            .cast("long")).as("sdays"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      // second moments exceed BIGINT at sf1: lift the operand to
      // DECIMAL(38,0) before the product (q491 lesson)
      val moments = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("r")).as("sr"), sum(col("sdays")).as("ss"),
          sum(col("r").cast("decimal(38,0)") * col("r")).as("srr"),
          sum(col("sdays").cast("decimal(38,0)") * col("sdays"))
            .as("sss"),
          sum(col("r").cast("decimal(38,0)") * col("sdays")).as("srs"))
        .withColumn("mu_r", col("sr").cast("double") / col("n"))
        .withColumn("mu_s", col("ss").cast("double") / col("n"))
        .withColumn("ratio", col("mu_r") / col("mu_s"))
        .withColumn("var_r", col("srr").cast("double") / col("n") -
          col("mu_r") * col("mu_r"))
        .withColumn("var_s", col("sss").cast("double") / col("n") -
          col("mu_s") * col("mu_s"))
        .withColumn("cov_rs", col("srs").cast("double") / col("n") -
          col("mu_r") * col("mu_s"))
        .withColumn("var_ratio",
          (col("var_r") - lit(2.0) * col("ratio") * col("cov_rs") +
            col("ratio") * col("ratio") * col("var_s")) /
            (col("n") * col("mu_s") * col("mu_s")))
      val a = moments.filter(col("arm") === 0L)
        .select(col("n").as("n0"), col("ratio").as("r0"),
          col("var_ratio").as("v0"))
      val b = moments.filter(col("arm") === 1L)
        .select(col("n").as("n1"), col("ratio").as("r1"),
          col("var_ratio").as("v1"))
      a.crossJoin(b) // 1 x 1
        .select(col("n0"), col("n1"),
          floor(col("r0") * 1e6).cast("long").as("ratio0_ppm"),
          floor(col("r1") * 1e6).cast("long").as("ratio1_ppm"),
          floor((col("r0") - col("r1")) * 1e6).cast("long")
            .as("diff_ppm"),
          floor((col("r0") - col("r1")) /
            sqrt(col("v0") + col("v1")) * 1000).cast("long")
            .as("z_milli"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q493_hdr_histogram" ->
      """WITH b AS (
           SELECT l_returnflag AS flag,
                  floor(l_extendedprice * 100)::BIGINT AS cents
           FROM lineitem
           WHERE floor(l_extendedprice * 100)::BIGINT >= 4),
         m AS (
           SELECT flag, cents,
                  length(bin(cents))::INTEGER AS msb,
                  ((cents >> (length(bin(cents)) - 3)) & 3)::BIGINT
                    AS sub
           FROM b),
         bk AS (
           SELECT flag, msb * 4 + sub AS bucket,
                  max(((sub + 5) << (msb - 3)) - 1)::BIGINT AS ub,
                  count(*)::BIGINT AS cnt
           FROM m GROUP BY flag, msb * 4 + sub),
         tot AS (
           SELECT flag, sum(cnt)::BIGINT AS n,
                  count(*)::BIGINT AS n_buckets
           FROM bk GROUP BY flag),
         c AS (
           SELECT flag, bucket, ub, cnt,
                  sum(cnt) OVER (PARTITION BY flag ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM bk)
         SELECT c.flag, t.n, t.n_buckets,
                min(CASE WHEN cum * 100 >= t.n * 50 THEN ub END)
                  ::BIGINT AS p50_ub_cents,
                min(CASE WHEN cum * 100 >= t.n * 90 THEN ub END)
                  ::BIGINT AS p90_ub_cents,
                min(CASE WHEN cum * 100 >= t.n * 99 THEN ub END)
                  ::BIGINT AS p99_ub_cents
         FROM c JOIN tot t ON c.flag = t.flag
         GROUP BY c.flag, t.n, t.n_buckets
         ORDER BY c.flag""",

    "q494_max_drawdown" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1, 2),
         dd AS (
           SELECT event_type, day, rev,
                  max(rev) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS runmax,
                  (max(rev) OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - rev) * 1000000
                  // max(rev) OVER (PARTITION BY event_type
                     ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS dd_ppm
           FROM daily),
         dd2 AS (
           SELECT *, sum(CASE WHEN dd_ppm = 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS grp
           FROM dd),
         streaks AS (
           SELECT event_type, max(run_len)::BIGINT
                    AS longest_below_peak_days
           FROM (SELECT event_type, grp, count(*)::BIGINT AS run_len
                 FROM dd2 WHERE dd_ppm > 0
                 GROUP BY event_type, grp) q
           GROUP BY event_type),
         worst AS (
           SELECT event_type, max(dd_ppm)::BIGINT AS max_drawdown_ppm,
                  max(runmax)::BIGINT AS peak_cents
           FROM dd2 GROUP BY event_type),
         wd AS (
           SELECT d.event_type, min(d.day)::BIGINT AS worst_day
           FROM dd2 d JOIN worst w ON d.event_type = w.event_type
                     AND d.dd_ppm = w.max_drawdown_ppm
           GROUP BY d.event_type)
         SELECT w.event_type, w.peak_cents, w.max_drawdown_ppm,
                wd.worst_day,
                coalesce(s.longest_below_peak_days, 0)::BIGINT
                  AS longest_below_peak_days
         FROM worst w
         JOIN wd ON w.event_type = wd.event_type
         LEFT JOIN streaks s ON w.event_type = s.event_type
         ORDER BY w.event_type""",

    "q495_delta_method_ratio" ->
      """WITH per_user AS (
           SELECT user_id,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS r,
                  count(DISTINCT floor(epoch(ts::TIMESTAMP) / 86400)
                    ::BIGINT)::BIGINT AS sdays
           FROM events GROUP BY user_id),
         m AS (
           SELECT user_id % 2 AS arm, count(*)::BIGINT AS n,
                  sum(r)::BIGINT AS sr, sum(sdays)::BIGINT AS ss,
                  sum(r::HUGEINT * r) AS srr,
                  sum(sdays::HUGEINT * sdays) AS sss,
                  sum(r::HUGEINT * sdays) AS srs
           FROM per_user GROUP BY user_id % 2),
         v AS (
           SELECT arm, n,
                  CAST(sr AS DOUBLE) / n AS mu_r,
                  CAST(ss AS DOUBLE) / n AS mu_s,
                  (CAST(sr AS DOUBLE) / n) / (CAST(ss AS DOUBLE) / n)
                    AS ratio,
                  CAST(srr AS DOUBLE) / n
                    - (CAST(sr AS DOUBLE) / n)
                      * (CAST(sr AS DOUBLE) / n) AS var_r,
                  CAST(sss AS DOUBLE) / n
                    - (CAST(ss AS DOUBLE) / n)
                      * (CAST(ss AS DOUBLE) / n) AS var_s,
                  CAST(srs AS DOUBLE) / n
                    - (CAST(sr AS DOUBLE) / n)
                      * (CAST(ss AS DOUBLE) / n) AS cov_rs
           FROM m),
         vr AS (
           SELECT arm, n, ratio,
                  (var_r - 2.0 * ratio * cov_rs
                     + ratio * ratio * var_s)
                  / (n * mu_s * mu_s) AS var_ratio
           FROM v)
         SELECT a.n AS n0, b.n AS n1,
                floor(a.ratio * 1e6)::BIGINT AS ratio0_ppm,
                floor(b.ratio * 1e6)::BIGINT AS ratio1_ppm,
                floor((a.ratio - b.ratio) * 1e6)::BIGINT AS diff_ppm,
                floor((a.ratio - b.ratio)
                      / sqrt(a.var_ratio + b.var_ratio)
                      * 1000)::BIGINT AS z_milli
         FROM (SELECT * FROM vr WHERE arm = 0) a
         CROSS JOIN (SELECT * FROM vr WHERE arm = 1) b"""
  )
}
