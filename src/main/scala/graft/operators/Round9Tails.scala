package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AS (q529-q531) — tail-heaviness estimation, funnel
  * design tuning, and exact rank concordance:
  *
  *  - q529: Hill tail-index estimator on the order-value
  *    distribution — the standard "how heavy is the tail really"
  *    readout behind q507's Gumbel levels: mean of ln(x_i/x_(k+1))
  *    over the top k = 100 order statistics (TakeOrdered top-k, no
  *    global sort; the k+1-th value contributes ln 1 = 0 so the
  *    bounded 101-row frame sums directly), each ln term floored to
  *    nano units before the sum so engine float order cannot drift.
  *  - q530: funnel window-sensitivity — signup→purchase conversion
  *    under attribution windows of {1, 6, 24, 72} hours from one
  *    per-user delta computation (next-purchase window, the q457
  *    shape) and four bounded aggregates: the curve that tells a
  *    product team whether their funnel metric is a real effect or
  *    an artifact of the chosen window.
  *  - q531: exact Kendall τ-b between part size and popularity —
  *    concordant/discordant pair counts from the (x, y) VALUE-GRID
  *    contingency table (domain-bounded: |size|×|count| cells, never
  *    the O(n²) row-pair space): a broadcast grid self-join scores
  *    strict dominance, tie terms come from the marginals, and
  *    τ-b = (C−D)/√((n₀−Tx)(n₀−Ty)) in exact DECIMAL until the
  *    final scalar. The concordance companion to q503's Spearman.
  */
object Round9Tails {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q529_hill_tail_index" -> ((s, d) => {
      val top = graft.Stage(t(s, d, "orders")
        .select(floor(col("o_totalprice") * 100).cast("long")
          .as("cents"))
        .orderBy(col("cents").desc).limit(101), "q529_top")
      val xmin = top.agg(min(col("cents")).as("xk1"))
      top.crossJoin(broadcast(xmin))
        .withColumn("t_nano",
          floor(log(col("cents").cast("double")
            / col("xk1").cast("double")) * 1e9).cast("long"))
        .agg(first(col("xk1")).as("xk1_cents"),
          sum(col("t_nano")).as("sn"))
        .select(lit(100L).as("k"), col("xk1_cents"),
          floor(col("sn").cast("double") / 100 / 1e9 * 1e6)
            .cast("long").as("hill_micro"),
          floor(lit(100.0) * 1e9 / col("sn").cast("double") * 1000)
            .cast("long").as("alpha_milli"))
    }),

    "q530_funnel_window_sensitivity" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val marked = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_purch_ts",
          min(when(col("event_type") === "purchase", col("ts")))
            .over(wU))
      val signups = graft.Stage(marked
        .filter(col("event_type") === "signup")
        .select(col("user_id"),
          (unix_timestamp(col("next_purch_ts"))
            - unix_timestamp(col("ts"))).as("delta_s")), "q530_sg")
      val frames = Seq(1, 6, 24, 72).map { wh =>
        signups.agg(count(lit(1)).as("n_signups"),
          sum(when(col("delta_s").isNotNull
            && col("delta_s") <= wh * 3600L, 1L).otherwise(0L))
            .as("n_converted"))
          .withColumn("window_hours", lit(wh.toLong))
      }
      frames.reduce(_ unionByName _)
        .select(col("window_hours"), col("n_signups"),
          col("n_converted"),
          expr("n_converted * 1000000 DIV n_signups").as("cvr_ppm"))
        .orderBy(col("window_hours"))
    }),

    "q531_kendall_tau" -> ((s, d) => {
      val pop = t(s, d, "lineitem")
        .groupBy(col("l_partkey").as("partkey"))
        .agg(count(lit(1)).as("y"))
      val cells = graft.Stage(t(s, d, "part")
        .select(col("p_partkey").as("partkey"),
          col("p_size").cast("long").as("x"))
        .join(pop, Seq("partkey"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c")),
        "q531_cells") // value-grid: |size dom| x |count dom| cells
      val a = cells.select(col("x").as("ax"), col("y").as("ay"),
        col("c").as("ac"))
      val b = cells.select(col("x").as("bx"), col("y").as("by"),
        col("c").as("bc"))
      val conc = a.join(broadcast(b),
          col("bx") < col("ax") && col("by") < col("ay"))
        .agg(sum(col("ac").cast("decimal(38,0)") * col("bc"))
          .as("cc"))
      val disc = a.join(broadcast(b),
          col("bx") < col("ax") && col("by") > col("ay"))
        .agg(sum(col("ac").cast("decimal(38,0)") * col("bc"))
          .as("dd"))
      val ties = cells.agg(count(lit(1)).as("n_cells"),
        sum(col("c")).as("n"))
      val tx = cells.groupBy(col("x")).agg(sum(col("c")).as("m"))
        .agg(sum(col("m").cast("decimal(38,0)") * (col("m") - 1) / 2)
          .as("tx"))
      val ty = cells.groupBy(col("y")).agg(sum(col("c")).as("m"))
        .agg(sum(col("m").cast("decimal(38,0)") * (col("m") - 1) / 2)
          .as("ty"))
      ties.crossJoin(conc).crossJoin(disc).crossJoin(tx).crossJoin(ty)
        .withColumn("n0",
          col("n").cast("decimal(38,0)") * (col("n") - 1) / 2)
        .select(col("n").as("n_parts"),
          col("cc").cast("long").as("concordant"),
          col("dd").cast("long").as("discordant"),
          col("tx").cast("long").as("ties_x"),
          col("ty").cast("long").as("ties_y"),
          floor((col("cc") - col("dd")).cast("double") * 1e6
            / (sqrt((col("n0") - col("tx")).cast("double"))
              * sqrt((col("n0") - col("ty")).cast("double"))))
            .cast("long").as("tau_b_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q529_hill_tail_index" ->
      """WITH top AS (
           SELECT floor(o_totalprice * 100)::BIGINT AS cents
           FROM orders ORDER BY cents DESC LIMIT 101),
         xmin AS (SELECT min(cents)::BIGINT AS xk1 FROM top),
         terms AS (
           SELECT floor(ln(CAST(t.cents AS DOUBLE)
               / CAST(x.xk1 AS DOUBLE)) * 1e9)::BIGINT AS t_nano,
             x.xk1
           FROM top t, xmin x),
         agg AS (
           SELECT any_value(xk1)::BIGINT AS xk1_cents,
                  sum(t_nano)::BIGINT AS sn
           FROM terms)
         SELECT 100::BIGINT AS k, xk1_cents,
                floor(CAST(sn AS DOUBLE) / 100 / 1e9 * 1e6)::BIGINT
                  AS hill_micro,
                floor(100.0 * 1e9 / CAST(sn AS DOUBLE) * 1000)::BIGINT
                  AS alpha_milli
         FROM agg""",

    "q530_funnel_window_sensitivity" -> {
      val frames = Seq(1, 6, 24, 72).map { wh =>
        s"""SELECT $wh::BIGINT AS window_hours,
              count(*)::BIGINT AS n_signups,
              sum(CASE WHEN delta_s IS NOT NULL
                  AND delta_s <= $wh * 3600 THEN 1 ELSE 0 END)::BIGINT
                AS n_converted
            FROM sg"""
      }.mkString("(", ")\nUNION ALL\n(", ")")
      s"""WITH ev AS (
           SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
             min(CASE WHEN event_type = 'purchase'
                 THEN ts::TIMESTAMP END) OVER (
               PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purch_ts
           FROM events),
         sg AS (
           SELECT user_id,
                  epoch(next_purch_ts)::BIGINT - epoch(ts)::BIGINT
                    AS delta_s
           FROM ev WHERE event_type = 'signup'),
         frames AS (
           $frames)
         SELECT window_hours, n_signups, n_converted,
                (n_converted * 1000000 // n_signups)::BIGINT
                  AS cvr_ppm
         FROM frames ORDER BY window_hours"""
    },

    "q531_kendall_tau" ->
      """WITH pop AS (
           SELECT l_partkey AS partkey, count(*)::BIGINT AS y
           FROM lineitem GROUP BY l_partkey),
         cells AS (
           SELECT CAST(p.p_size AS BIGINT) AS x, o.y,
                  count(*)::BIGINT AS c
           FROM part p JOIN pop o ON p.p_partkey = o.partkey
           GROUP BY 1, 2),
         conc AS (
           SELECT sum(a.c::HUGEINT * b.c) AS cc
           FROM cells a JOIN cells b ON b.x < a.x AND b.y < a.y),
         disc AS (
           SELECT sum(a.c::HUGEINT * b.c) AS dd
           FROM cells a JOIN cells b ON b.x < a.x AND b.y > a.y),
         nn AS (SELECT sum(c)::BIGINT AS n FROM cells),
         tx AS (
           SELECT sum(m::HUGEINT * (m - 1) / 2) AS tx
           FROM (SELECT sum(c)::BIGINT AS m FROM cells GROUP BY x)),
         ty AS (
           SELECT sum(m::HUGEINT * (m - 1) / 2) AS ty
           FROM (SELECT sum(c)::BIGINT AS m FROM cells GROUP BY y))
         SELECT nn.n AS n_parts,
                cc::BIGINT AS concordant, dd::BIGINT AS discordant,
                tx::BIGINT AS ties_x, ty::BIGINT AS ties_y,
                floor(CAST(cc - dd AS DOUBLE) * 1e6
                  / (sqrt(CAST(nn.n::HUGEINT * (nn.n - 1) / 2 - tx
                      AS DOUBLE))
                    * sqrt(CAST(nn.n::HUGEINT * (nn.n - 1) / 2 - ty
                        AS DOUBLE))))::BIGINT AS tau_b_ppm
         FROM nn, conc, disc, tx, ty"""
  )
}
