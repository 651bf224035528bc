package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AD (q484-q486) — experiment design + monitoring:
  *
  *  - q484: power analysis / sample-size table — n per arm =
  *    2 (z_{α/2} + z_β)² σ² / δ² for a grid of minimum detectable
  *    effects, with σ² estimated from the live metric (exact cent
  *    sums). The pre-experiment sibling of q440's z-test; one
  *    1-row aggregate joined to a literal MDE grid.
  *  - q485: missingness-pattern audit — three deterministic
  *    knockout rules produce a null-pattern bitmask per row; the
  *    audit reports pattern counts vs the independence expectation
  *    (observed/expected ppm), the MCAR smoke test run before any
  *    imputation (q470's upstream check).
  *  - q486: top-k stability — weekly top-8 brands by revenue,
  *    consecutive-week overlap (Jaccard) + the new-entrant count.
  *    Rank windows are per-week (bounded by the brand catalog);
  *    the week-over-week join touches only the top-k rows.
  */
object Round9Monitor {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q484_power_mde" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val sig = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .agg(sum(floor(col("value") * 100).cast("long")).as("sc"),
          sum((floor(col("value") * 100) *
            floor(col("value") * 100)).cast("decimal(38,0)"))
            .as("scc"),
          count(lit(1)).as("n"))
        .select((col("scc").cast("double") / col("n") -
          (col("sc") / col("n").cast("double")) *
            (col("sc") / col("n").cast("double"))).as("var_cents2"))
      val mdes = Seq(100L, 200L, 500L, 1000L, 2000L)
        .toDF("mde_cents")
      // alpha = 0.05 two-sided, power = 0.80:
      // z_{alpha/2} = 1.959964, z_beta = 0.841621
      mdes.crossJoin(broadcast(sig))
        .withColumn("n_per_arm", ceil(lit(2.0) *
          pow(lit(1.959964) + lit(0.841621), 2) * col("var_cents2") /
          (col("mde_cents") * col("mde_cents"))).cast("long"))
        .select(col("mde_cents"),
          floor(col("var_cents2")).cast("long").as("var_cents2_fl"),
          col("n_per_arm"))
        .orderBy(col("mde_cents"))
    }),

    "q485_missingness_patterns" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(
          when(col("event_id") % 13 === 0, 1L).otherwise(0L).as("m1"),
          when(col("user_id") % 7 === 0, 1L).otherwise(0L).as("m2"),
          when(col("event_id") % 5 === 0, 1L).otherwise(0L).as("m3"))
      val tot = ev.agg(count(lit(1)).as("n"),
        sum(col("m1")).as("r1"), sum(col("m2")).as("r2"),
        sum(col("m3")).as("r3"))
      ev.groupBy((col("m1") + col("m2") * 2 + col("m3") * 4)
          .as("pattern"))
        .agg(count(lit(1)).as("observed"))
        .crossJoin(broadcast(tot))
        // independence expectation: n * prod(p_i or 1-p_i), exact
        // rational -> one double product
        .withColumn("expected_milli", floor(lit(1000.0) * col("n") *
          (when(col("pattern").bitwiseAND(lit(1L)) === 1L,
            col("r1") / col("n").cast("double"))
            .otherwise(lit(1.0) - col("r1") / col("n").cast("double"))) *
          (when(col("pattern").bitwiseAND(lit(2L)) === 2L,
            col("r2") / col("n").cast("double"))
            .otherwise(lit(1.0) - col("r2") / col("n").cast("double"))) *
          (when(col("pattern").bitwiseAND(lit(4L)) === 4L,
            col("r3") / col("n").cast("double"))
            .otherwise(lit(1.0) - col("r3") / col("n").cast("double"))))
          .cast("long"))
        .withColumn("oe_ppm", expr(
          "observed * 1000000000 DIV greatest(expected_milli, 1)"))
        .select(col("pattern").cast("long").as("pattern"),
          col("observed"), col("expected_milli"), col("oe_ppm"))
        .orderBy(col("pattern"))
    }),

    "q486_topk_stability" -> ((s, d) => {
      val weekly = t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(
          floor(unix_timestamp(col("l_shipdate").cast("timestamp")) /
            lit(604800L)).cast("long").as("week"),
          col("p_brand").as("brand"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val wWk = Window.partitionBy(col("week"))
        .orderBy(col("cents").desc, col("brand"))
      val topk = weekly.withColumn("rk", row_number().over(wWk))
        .filter(col("rk") <= 8)
        .select(col("week"), col("brand"))
      val nxt = topk.select((col("week") - 1).as("week"),
        col("brand").as("brand_next"))
      val bounds = topk.agg(max(col("week")).as("wmax"))
      // overlap o of consecutive top-8 sets; Jaccard = o / (16 - o)
      topk.join(nxt, Seq("week"), "left")
        .groupBy(col("week"))
        .agg(sum(when(col("brand") === col("brand_next"), 1L)
          .otherwise(0L)).as("overlap"))
        .crossJoin(broadcast(bounds))
        .filter(col("week") < col("wmax")) // last week has no successor
        .select(col("week"), col("overlap").as("kept"),
          (lit(8L) - col("overlap")).as("churned"),
          expr("overlap * 1000 DIV (16 - overlap)").as("jaccard_milli"))
        .orderBy(col("week"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q484_power_mde" ->
      """WITH sig AS (
           SELECT (CAST(sum(floor(value * 100)::BIGINT
                    * floor(value * 100)::BIGINT) AS DOUBLE) / count(*)
                   - (sum(floor(value * 100)::BIGINT)
                      / CAST(count(*) AS DOUBLE))
                     * (sum(floor(value * 100)::BIGINT)
                        / CAST(count(*) AS DOUBLE))) AS var_cents2
           FROM events WHERE event_type = 'purchase'),
         mdes AS (SELECT unnest([100, 200, 500, 1000, 2000])::BIGINT
                    AS mde_cents)
         SELECT mde_cents,
                floor(var_cents2)::BIGINT AS var_cents2_fl,
                ceil(2.0 * pow(1.959964 + 0.841621, 2) * var_cents2
                  / (mde_cents * mde_cents))::BIGINT AS n_per_arm
         FROM mdes CROSS JOIN sig
         ORDER BY mde_cents""",

    "q485_missingness_patterns" ->
      """WITH ev AS (
           SELECT (CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0
                   END)::BIGINT AS m1,
                  (CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0
                   END)::BIGINT AS m2,
                  (CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0
                   END)::BIGINT AS m3
           FROM events),
         tot AS (
           SELECT count(*)::BIGINT AS n, sum(m1)::BIGINT AS r1,
                  sum(m2)::BIGINT AS r2, sum(m3)::BIGINT AS r3
           FROM ev),
         pat AS (
           SELECT (m1 + m2 * 2 + m3 * 4)::BIGINT AS pattern,
                  count(*)::BIGINT AS observed
           FROM ev GROUP BY 1),
         scored AS (
           SELECT pattern, observed,
                  floor(1000.0 * n
                    * (CASE WHEN (pattern & 1) = 1
                       THEN r1 / CAST(n AS DOUBLE)
                       ELSE 1.0 - r1 / CAST(n AS DOUBLE) END)
                    * (CASE WHEN (pattern & 2) = 2
                       THEN r2 / CAST(n AS DOUBLE)
                       ELSE 1.0 - r2 / CAST(n AS DOUBLE) END)
                    * (CASE WHEN (pattern & 4) = 4
                       THEN r3 / CAST(n AS DOUBLE)
                       ELSE 1.0 - r3 / CAST(n AS DOUBLE) END))::BIGINT
                    AS expected_milli
           FROM pat CROSS JOIN tot)
         SELECT pattern, observed, expected_milli,
                (observed * 1000000000
                  // greatest(expected_milli, 1))::BIGINT AS oe_ppm
         FROM scored ORDER BY pattern""",

    "q486_topk_stability" ->
      """WITH weekly AS (
           SELECT floor(epoch(l_shipdate::TIMESTAMP)
                    / 604800)::BIGINT AS week,
                  p_brand AS brand,
                  sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT
                    AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         topk AS (
           SELECT week, brand FROM (
             SELECT week, brand,
                    row_number() OVER (PARTITION BY week
                      ORDER BY cents DESC, brand) AS rk
             FROM weekly) q
           WHERE rk <= 8),
         nxt AS (
           SELECT week - 1 AS week, brand AS brand_next FROM topk),
         hits AS (
           SELECT t.week,
                  sum(CASE WHEN t.brand = n.brand_next THEN 1 ELSE 0
                      END)::BIGINT AS overlap
           FROM topk t LEFT JOIN nxt n ON t.week = n.week
           GROUP BY t.week)
         SELECT week, overlap AS kept,
                (8 - overlap)::BIGINT AS churned,
                (overlap * 1000 // (16 - overlap))::BIGINT
                  AS jaccard_milli
         FROM hits
         WHERE week < (SELECT max(week) FROM topk)
         ORDER BY week"""
  )
}
