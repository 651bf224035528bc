package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch U (q457-q459):
  *
  *  - q457: row-pattern matching with NEGATION — "signup then
  *    purchase with NO intervening error" per user (the
  *    MATCH_RECOGNIZE exclusion shape). The negative condition is a
  *    per-user window ("timestamp of the next error after me"), so
  *    no self-join and no pattern automaton: a match is valid iff the
  *    candidate B lands before A's next-error timestamp.
  *  - q458: Top-N + Other — the reporting rollup everyone writes:
  *    revenue by the top-8 customers plus one correctly-totalled
  *    'OTHER' bucket (rank on a keyed aggregate, conditional regroup;
  *    the detail aggregate is the only corpus stage).
  *  - q459: spatial hotspot detection (Getis-Ord Gi*-lite) — event
  *    density on a grid, each cell scored by its 3x3 neighborhood sum
  *    against the global mean in a closed-form z (ppm-quantized), hot
  *    cells flagged. The spatial sibling of q414's temporal scan
  *    statistic.
  */
object Round9Patterns {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q457_pattern_negation" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val marked = ev
        .withColumn("next_err_ts", min(when(col("event_type") === "error",
          col("ts"))).over(wU))
        .withColumn("next_purch_ts",
          min(when(col("event_type") === "purchase", col("ts"))).over(wU))
      // per signup: a clean conversion exists iff the next purchase
      // strictly precedes the next error (or no error follows at all)
      val signups = marked.filter(col("event_type") === "signup")
        .withColumn("clean", (col("next_purch_ts").isNotNull &&
          (col("next_err_ts").isNull ||
            col("next_purch_ts") < col("next_err_ts"))).cast("long"))
        .withColumn("blocked", (col("next_purch_ts").isNotNull &&
          col("next_err_ts").isNotNull &&
          col("next_purch_ts") >= col("next_err_ts")).cast("long"))
      signups.groupBy((col("user_id") % 10).as("cohort"))
        .agg(count(lit(1)).as("n_signups"),
          sum(col("clean")).as("clean_conversions"),
          sum(col("blocked")).as("error_blocked"),
          sum(when(col("next_purch_ts").isNull, 1L).otherwise(0L))
            .as("never_converted"))
        .withColumn("clean_ppm",
          expr("1000000 * clean_conversions DIV n_signups"))
        .orderBy(col("cohort"))
    }),

    "q458_topn_other" -> ((s, d) => {
      val rev = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("cents"), count(lit(1)).as("n_orders"))
      val wRank = Window.orderBy(col("cents").desc, col("o_custkey"))
      val ranked = rev.withColumn("rk", row_number().over(wRank))
      // dimension-sized window (one row per customer)
      ranked
        .withColumn("bucket", when(col("rk") <= 8,
          concat(lit("#"), lpad(col("rk").cast("string"), 2, "0"),
            lit(" cust_"), col("o_custkey")))
          .otherwise(lit("OTHER")))
        .groupBy(col("bucket"))
        .agg(sum(col("cents")).as("revenue_cents"),
          sum(col("n_orders")).as("n_orders"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("revenue_cents").desc, col("bucket"))
    }),

    // grid cell = (floor(px/5), floor(py/5)) over the q437 point
    // derivation; Gi*-lite z for cell c: nbr = 3x3 sum around c,
    // z_milli = floor(1000 * (nbr - 9*mean) / (3*sd)) from the global
    // cell-count moments (exact integers -> fixed double tree).
    "q459_spatial_hotspots" -> ((s, d) => {
      // uniform background + a planted dense cluster near (51, 51)
      // (every 37th event): the detector must find the plant, and at
      // uniform density must flag (almost) nothing else. Background
      // scatter uses Knuth multiplicative mixing — a small multiplier
      // (the original *17/*31) degenerates to a diagonal LINE at small
      // fixtures (no wraparound below id≈600), whose ridge cells
      // out-score the plant
      val pts = t(s, d, "events").select(
        when(col("event_id") % 37 === 0,
          lit(50.0) + (col("event_id") % 100) / 25.0)
          .otherwise((col("event_id") * 2654435761L % 10000) / 100.0).as("px"),
        when(col("event_id") % 37 === 0,
          lit(50.0) + (col("event_id") % 97) / 25.0)
          .otherwise((col("event_id") * 2246822519L % 10000) / 100.0).as("py"))
      val cells = pts.groupBy(
          floor(col("px") / 5).cast("long").as("cx"),
          floor(col("py") / 5).cast("long").as("cy"))
        .agg(count(lit(1)).as("c"))
      // stats over the FULL 20x20 grid (empty cells count as zero)
      val m = cells.agg(sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("sq"),
        count(lit(1)).as("nonempty"))
      val nbrs = cells.select(explode(sequence(lit(-1), lit(1))).as("ox"),
          col("cx"), col("cy"), col("c"))
        .select(explode(sequence(lit(-1), lit(1))).as("oy"),
          (col("cx") + col("ox")).as("cx"), col("cy"), col("c"))
        .select(col("cx"), (col("cy") + col("oy")).as("cy"), col("c"))
        .filter(col("cx").between(0, 19) && col("cy").between(0, 19))
        .groupBy(col("cx"), col("cy"))
        .agg(sum(col("c")).as("nbr"), count(lit(1)).as("n_nbr_cells"))
      nbrs.crossJoin(broadcast(m))
        // mean/var over all 400 grid cells (zeros included); the
        // neighborhood size k is GEOMETRIC (border cells have k < 9),
        // so borders are z-normalized, not artifact-flagged
        .withColumn("k", expr(
          """(least(cx + 1, 19) - greatest(cx - 1, 0) + 1)
             * (least(cy + 1, 19) - greatest(cy - 1, 0) + 1)"""))
        .withColumn("mean", expr("CAST(tot AS DOUBLE) / 400"))
        .withColumn("variance",
          expr("CAST(sq AS DOUBLE) / 400 - mean * mean"))
        .withColumn("z_milli", expr(
          """CAST(floor(1000 * (nbr - k * mean)
             / (sqrt(CAST(k AS DOUBLE)) * sqrt(variance))) AS BIGINT)"""))
        .withColumn("hot", (col("z_milli") >= 2576L).cast("long"))
        .filter(col("hot") === 1 || col("z_milli") <= -2576L)
        .select(col("cx"), col("cy"), col("nbr"), col("z_milli"),
          col("hot"))
        .orderBy(col("cx"), col("cy"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q457_pattern_negation" ->
      """WITH ev AS (
           SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type
           FROM events),
         marked AS (
           SELECT user_id, ts, event_id, event_type,
                  min(CASE WHEN event_type = 'error' THEN ts END)
                    OVER w AS next_err_ts,
                  min(CASE WHEN event_type = 'purchase' THEN ts END)
                    OVER w AS next_purch_ts
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         signups AS (
           SELECT (user_id % 10)::BIGINT AS cohort,
                  (CASE WHEN next_purch_ts IS NOT NULL
                        AND (next_err_ts IS NULL
                             OR next_purch_ts < next_err_ts)
                        THEN 1 ELSE 0 END)::BIGINT AS clean,
                  (CASE WHEN next_purch_ts IS NOT NULL
                        AND next_err_ts IS NOT NULL
                        AND next_purch_ts >= next_err_ts
                        THEN 1 ELSE 0 END)::BIGINT AS blocked,
                  (CASE WHEN next_purch_ts IS NULL THEN 1 ELSE 0
                   END)::BIGINT AS never
           FROM marked WHERE event_type = 'signup')
         SELECT cohort, count(*)::BIGINT AS n_signups,
                sum(clean)::BIGINT AS clean_conversions,
                sum(blocked)::BIGINT AS error_blocked,
                sum(never)::BIGINT AS never_converted,
                ((1000000 * sum(clean)) // count(*))::BIGINT
                  AS clean_ppm
         FROM signups GROUP BY cohort ORDER BY cohort""",

    "q458_topn_other" ->
      """WITH rev AS (
           SELECT o_custkey,
                  sum(floor(o_totalprice * 100)::BIGINT)::BIGINT
                    AS cents,
                  count(*)::BIGINT AS n_orders
           FROM orders GROUP BY o_custkey),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY cents DESC, o_custkey)
                    AS rk
           FROM rev),
         bucketed AS (
           SELECT CASE WHEN rk <= 8
                       THEN '#' || lpad(CAST(rk AS VARCHAR), 2, '0')
                            || ' cust_' || o_custkey
                       ELSE 'OTHER' END AS bucket,
                  cents, n_orders
           FROM ranked)
         SELECT bucket, sum(cents)::BIGINT AS revenue_cents,
                sum(n_orders)::BIGINT AS n_orders,
                count(*)::BIGINT AS n_customers
         FROM bucketed GROUP BY bucket
         ORDER BY revenue_cents DESC, bucket""",

    "q459_spatial_hotspots" ->
      """WITH pts AS (
           SELECT (CASE WHEN event_id % 37 = 0
                        THEN 50.0 + (event_id % 100) / 25.0
                        ELSE (event_id * 2654435761 % 10000) / 100.0
                   END)::DOUBLE AS px,
                  (CASE WHEN event_id % 37 = 0
                        THEN 50.0 + (event_id % 97) / 25.0
                        ELSE (event_id * 2246822519 % 10000) / 100.0
                   END)::DOUBLE AS py
           FROM events),
         cells AS (
           SELECT floor(px / 5)::BIGINT AS cx,
                  floor(py / 5)::BIGINT AS cy, count(*)::BIGINT AS c
           FROM pts GROUP BY 1, 2),
         m AS (
           SELECT sum(c)::BIGINT AS tot, sum(c * c)::BIGINT AS sq
           FROM cells),
         nbrs AS (
           SELECT cells.cx + ox.o AS cx, cells.cy + oy.o AS cy,
                  sum(c)::BIGINT AS nbr
           FROM cells,
                (SELECT unnest([-1, 0, 1]) AS o) ox,
                (SELECT unnest([-1, 0, 1]) AS o) oy
           WHERE cells.cx + ox.o BETWEEN 0 AND 19
             AND cells.cy + oy.o BETWEEN 0 AND 19
           GROUP BY 1, 2),
         scored AS (
           SELECT n.cx, n.cy, n.nbr,
                  CAST(floor(1000 * (n.nbr
                      - ((least(n.cx + 1, 19) - greatest(n.cx - 1, 0) + 1)
                         * (least(n.cy + 1, 19) - greatest(n.cy - 1, 0)
                            + 1))
                        * (CAST(m.tot AS DOUBLE) / 400))
                    / (sqrt(CAST((least(n.cx + 1, 19)
                          - greatest(n.cx - 1, 0) + 1)
                        * (least(n.cy + 1, 19) - greatest(n.cy - 1, 0)
                           + 1) AS DOUBLE))
                       * sqrt(CAST(m.sq AS DOUBLE) / 400
                         - (CAST(m.tot AS DOUBLE) / 400)
                           * (CAST(m.tot AS DOUBLE) / 400)))) AS BIGINT)
                    AS z_milli
           FROM nbrs n CROSS JOIN m)
         SELECT cx, cy, nbr, z_milli,
                (CASE WHEN z_milli >= 2576 THEN 1 ELSE 0 END)::BIGINT
                  AS hot
         FROM scored
         WHERE z_milli >= 2576 OR z_milli <= -2576
         ORDER BY cx, cy"""
  )
}
