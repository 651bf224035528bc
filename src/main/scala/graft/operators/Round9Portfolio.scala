package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AF (q490-q492) — portfolio + growth analytics:
  *
  *  - q490: variance decomposition — how much each event_type
  *    contributes to the variance of TOTAL daily revenue:
  *    MCV_i = Σ_j cov(i,j) / var(total), which sums to exactly 1
  *    (the portfolio risk-decomposition identity, pinned in the
  *    spec). Covariances from exact day-grain cent sums (the q385
  *    correlation-matrix recipe repurposed).
  *  - q491: ABC-XYZ inventory classification — brands classified by
  *    revenue share (A: top cum 80%, B: next 15%, C: rest) x demand
  *    variability (X: weekly CV < 0.5, Y: < 1.0, Z: rest). The
  *    Pareto rank runs on the bounded brand dimension; weekly CVs
  *    from exact sums.
  *  - q492: growth accounting — per week classify users as
  *    new / retained / resurrected, count churned from the prior
  *    week, and report the quick ratio (new + resurrected) /
  *    churned in ppm. One (user, week) dedup, one lag per user.
  */
object Round9Portfolio {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q490_variance_decomposition" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"), col("event_type"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("rev"))
      // dense (type x day) grid so covariances see the zero days
      val days = daily.select(col("day")).distinct()
      val types = daily.select(col("event_type")).distinct()
      val dense = types.crossJoin(days)
        .join(daily, Seq("event_type", "day"), "left")
        .na.fill(0L, Seq("rev"))
      val a = dense.select(col("day"), col("event_type").as("ti"),
        col("rev").as("ri"))
      val b = dense.select(col("day").as("day_b"),
        col("event_type").as("tj"), col("rev").as("rj"))
      val nDays = days.agg(count(lit(1)).as("nd"))
      // pairwise day-aligned products: 25 pairs x day-grain rows
      val cov = a.join(b, col("day") === col("day_b"))
        .groupBy(col("ti"), col("tj"))
        .agg(sum(col("ri") * col("rj")).as("sij"),
          sum(col("ri")).as("si"), sum(col("rj")).as("sj"))
        .crossJoin(broadcast(nDays))
        .withColumn("cov_ij", col("sij") / col("nd") -
          (col("si") / col("nd").cast("double")) *
            (col("sj") / col("nd").cast("double")))
      val perType = cov.groupBy(col("ti"))
        .agg(sum(col("cov_ij")).as("mcv_num"))
      val total = cov.agg(sum(col("cov_ij")).as("var_total"))
      perType.crossJoin(broadcast(total))
        .select(col("ti").as("event_type"),
          floor(col("mcv_num") / col("var_total") * lit(1000000.0))
            .cast("long").as("variance_share_ppm"))
        .orderBy(col("event_type"))
    }),

    "q491_abc_xyz" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          floor(unix_timestamp(col("l_shipdate").cast("timestamp")) /
            lit(604800L)).cast("long").as("week"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val weekly = li.groupBy(col("brand"), col("week"))
        .agg(sum(col("cents")).as("wrev"))
      // squared weekly revenue exceeds 2^63 at sf1 — lift the
      // OPERAND to DECIMAL so the per-row product never sits in long
      val perBrand = weekly.groupBy(col("brand"))
        .agg(sum(col("wrev")).as("rev"), count(lit(1)).as("nw"),
          sum(col("wrev").cast("decimal(19,0)") * col("wrev"))
            .as("srr"))
      val tot = perBrand.agg(sum(col("rev")).as("total"))
      val wCum = Window.orderBy(col("rev").desc, col("brand"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perBrand.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("rev")).over(wCum)) // 25-row window
        // cum*1e6 exceeds 2^63 at sf1 -> lift to DECIMAL first
        .withColumn("cum_ppm", expr(
          "CAST((CAST(cum AS DECIMAL(38,0)) * 1000000) DIV total" +
            " AS BIGINT)"))
        .withColumn("abc", when(col("cum_ppm") <= 800000, "A")
          .when(col("cum_ppm") <= 950000, "B").otherwise("C"))
        .withColumn("mean_w", col("rev") / col("nw").cast("double"))
        .withColumn("cv_milli", floor(lit(1000.0) *
          sqrt(col("srr").cast("double") / col("nw") -
            (col("rev") / col("nw")) * (col("rev") / col("nw"))) /
          (col("rev") / col("nw"))).cast("long"))
        .withColumn("xyz", when(col("cv_milli") < 500, "X")
          .when(col("cv_milli") < 1000, "Y").otherwise("Z"))
        .select(col("brand"), col("rev"), col("cum_ppm"), col("abc"),
          col("cv_milli"), col("xyz"))
        .orderBy(col("brand"))
    }),

    "q492_growth_accounting" -> ((s, d) => {
      val uw = t(s, d, "events")
        .select(col("user_id"),
          floor(unix_timestamp(col("ts")) / 604800L).cast("long")
            .as("week"))
        .distinct()
      val wU = Window.partitionBy(col("user_id")).orderBy(col("week"))
      val marked = uw
        .withColumn("prev_w", lag(col("week"), 1).over(wU))
        .withColumn("status",
          when(col("prev_w").isNull, "new")
            .when(col("prev_w") === col("week") - 1, "retained")
            .otherwise("resurrected"))
      val active = marked.groupBy(col("week"))
        .agg(sum(when(col("status") === "new", 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("status") === "retained", 1L).otherwise(0L))
            .as("retained"),
          sum(when(col("status") === "resurrected", 1L).otherwise(0L))
            .as("resurrected"),
          count(lit(1)).as("active"))
      // churned(w) = active(w-1) - retained(w)
      val prev = active.select((col("week") + 1).as("week"),
        col("active").as("prev_active"))
      active.join(prev, Seq("week"), "left")
        .filter(col("prev_active").isNotNull)
        .withColumn("churned", col("prev_active") - col("retained"))
        .withColumn("quick_ratio_milli", expr(
          """CASE WHEN churned > 0
             THEN (new_users + resurrected) * 1000 DIV churned
             ELSE -1 END"""))
        .select(col("week"), col("new_users"), col("retained"),
          col("resurrected"), col("churned"),
          col("quick_ratio_milli"))
        .orderBy(col("week"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q490_variance_decomposition" ->
      """WITH daily AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  event_type,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1, 2),
         days AS (SELECT DISTINCT day FROM daily),
         types AS (SELECT DISTINCT event_type FROM daily),
         dense AS (
           SELECT t.event_type, dy.day,
                  coalesce(d.rev, 0)::BIGINT AS rev
           FROM types t CROSS JOIN days dy
           LEFT JOIN daily d ON d.event_type = t.event_type
                            AND d.day = dy.day),
         nd AS (SELECT count(*)::BIGINT AS nd FROM days),
         cov AS (
           SELECT a.event_type AS ti, b.event_type AS tj,
                  sum(a.rev * b.rev) / (SELECT nd FROM nd)
                    - (sum(a.rev) / CAST((SELECT nd FROM nd) AS DOUBLE))
                      * (sum(b.rev)
                         / CAST((SELECT nd FROM nd) AS DOUBLE))
                    AS cov_ij
           FROM dense a JOIN dense b ON a.day = b.day
           GROUP BY a.event_type, b.event_type),
         per_type AS (
           SELECT ti, sum(cov_ij) AS mcv_num FROM cov GROUP BY ti),
         total AS (SELECT sum(cov_ij) AS var_total FROM cov)
         SELECT ti AS event_type,
                floor(mcv_num / var_total * 1000000.0)::BIGINT
                  AS variance_share_ppm
         FROM per_type CROSS JOIN total
         ORDER BY event_type""",

    "q491_abc_xyz" ->
      """WITH li AS (
           SELECT p_brand AS brand,
                  floor(epoch(l_shipdate::TIMESTAMP)
                    / 604800)::BIGINT AS week,
                  floor(l_extendedprice * 100)::BIGINT AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         weekly AS (
           SELECT brand, week, sum(cents)::BIGINT AS wrev
           FROM li GROUP BY brand, week),
         per_brand AS (
           -- wrev::HUGEINT before the square: BIGINT*BIGINT aborts
           -- on overflow at large SF
           SELECT brand, sum(wrev)::BIGINT AS rev,
                  count(*)::BIGINT AS nw,
                  sum(wrev::HUGEINT * wrev) AS srr
           FROM weekly GROUP BY brand),
         tot AS (SELECT sum(rev) AS total FROM per_brand),
         ranked AS (
           SELECT brand, rev, nw, srr,
                  sum(rev) OVER (ORDER BY rev DESC, brand
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM per_brand),
         scored AS (
           SELECT brand, rev,
                  (cum * 1000000 // (SELECT total FROM tot))::BIGINT
                    AS cum_ppm,
                  floor(1000.0
                    * sqrt(srr / nw - (CAST(rev AS DOUBLE) / nw)
                           * (CAST(rev AS DOUBLE) / nw))
                    / (CAST(rev AS DOUBLE) / nw))::BIGINT AS cv_milli
           FROM ranked)
         SELECT brand, rev, cum_ppm,
                (CASE WHEN cum_ppm <= 800000 THEN 'A'
                      WHEN cum_ppm <= 950000 THEN 'B'
                      ELSE 'C' END) AS abc,
                cv_milli,
                (CASE WHEN cv_milli < 500 THEN 'X'
                      WHEN cv_milli < 1000 THEN 'Y'
                      ELSE 'Z' END) AS xyz
         FROM scored ORDER BY brand""",

    "q492_growth_accounting" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
                  floor(epoch(ts::TIMESTAMP) / 604800)::BIGINT AS week
           FROM events),
         marked AS (
           SELECT week,
                  CASE WHEN prev_w IS NULL THEN 'new'
                       WHEN prev_w = week - 1 THEN 'retained'
                       ELSE 'resurrected' END AS status
           FROM (SELECT user_id, week,
                        lag(week) OVER (PARTITION BY user_id
                          ORDER BY week) AS prev_w
                 FROM uw) q),
         active AS (
           SELECT week,
                  sum(CASE WHEN status = 'new' THEN 1 ELSE 0
                      END)::BIGINT AS new_users,
                  sum(CASE WHEN status = 'retained' THEN 1 ELSE 0
                      END)::BIGINT AS retained,
                  sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0
                      END)::BIGINT AS resurrected,
                  count(*)::BIGINT AS active
           FROM marked GROUP BY week),
         j AS (
           SELECT a.week, a.new_users, a.retained, a.resurrected,
                  p.active AS prev_active
           FROM active a JOIN active p ON p.week = a.week - 1)
         SELECT week, new_users, retained, resurrected,
                (prev_active - retained)::BIGINT AS churned,
                (CASE WHEN prev_active - retained > 0
                 THEN (new_users + resurrected) * 1000
                      // (prev_active - retained)
                 ELSE -1 END)::BIGINT AS quick_ratio_milli
         FROM j ORDER BY week"""
  )
}
