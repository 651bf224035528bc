package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch R (q448-q450):
  *
  *  - q448: bill-of-materials cost rollup — a parts tree (parent =
  *    key DIV 4, so depth is log4 n) rolled up bottom-to-top with
  *    per-edge quantities by LEVEL-SYNCHRONOUS aggregation: each round
  *    folds one tree level into its parents (O(depth) = O(log n)
  *    keyed aggregates — the recursive-CTE workload restated as a
  *    bounded iterative plan),
  *  - q449: LTTB-style time-series downsampling (largest triangle,
  *    bucket-mean anchors — the parallelizable variant of
  *    Steinarsson's LTTB: each bucket's pick maximizes the triangle
  *    against NEIGHBOR BUCKET MEANS instead of the previously picked
  *    point, which removes the sequential dependency and keeps the
  *    argmax per-bucket),
  *  - q450: business-day latency — closed-form weekday counting
  *    between order and ship dates (no calendar explode: whole weeks
  *    x 5 plus a remainder lookup, exact integers).
  *
  * Tree levels / buckets / day spans are all bounded; each corpus
  * stage is one keyed aggregate or join per level.
  */
object Round9Bom {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Nodes = part ranks 0..n-1; parent(u) = (u - 1) DIV 4 (u = 0 is
    // the root), edge quantity = u % 3 + 1, own cost = retailprice
    // cents. rolled(u) = own(u) + sum_children qty(c) * rolled(c).
    // Level-synchronous fold from the deepest level upward.
    "q448_bom_rollup" -> ((s, d) => {
      val wR = Window.orderBy(col("p_partkey")) // dimension-sized
      val nodes = graft.Stage(t(s, d, "part")
        .withColumn("u", row_number().over(wR).cast("long") - 1)
        .select(col("u"),
          floor(col("p_retailprice") * 100).cast("long").as("own")),
        "q448_nodes")
      val n = nodes.count() // dimension-sized driver scalar
      val depth = (math.log(n.toDouble) / math.log(4)).toInt + 2
      // level(u) = floor(log4(3u+1)) for the DIV-4 tree; computed via
      // length of base-4 representation — but only the LOOP BOUND
      // needs it, so iterate `depth` times folding leaves upward:
      // rolled_k holds the partial rollup after k folds (leaf levels
      // fully absorbed).
      val rolled = (1 to depth).foldLeft(
        nodes.withColumn("rolled", col("own"))) { (acc, _) =>
        // children contributions to each parent this round: every
        // non-root node passes qty * rolled to its parent, then
        // re-anchors at the parent's own cost plus absorbed children.
        // Rolling the SAME fold `depth` times is idempotent only with
        // level gating, so gate: a node is absorbed exactly when its
        // whole subtree has been; iterate with full recompute from
        // scratch each round (seminaïve would carry deltas; the
        // tree is log-deep so full rounds stay O(log) passes).
        val contrib = acc.filter(col("u") > 0)
          .select(expr("(u - 1) DIV 4").as("u"),
            ((col("u") % 3 + 1) * col("rolled")).as("c"))
          .groupBy(col("u")).agg(sum(col("c")).as("childsum"))
        graft.Stage(nodes.join(contrib, Seq("u"), "left")
          .select(col("u"), col("own"),
            (col("own") + coalesce(col("childsum"), lit(0L)))
              .as("rolled")), "q448_fold")
      }
      // after `depth` rounds rolled(u) = own + sum qty*rolled(children)
      // where children carry their own fully-rolled subtrees
      rolled.filter(col("u") < 4)
        .select(col("u").as("node"), col("own").as("own_cents"),
          col("rolled").as("rolled_cents"))
        .orderBy(col("node"))
    }),

    // Downsample each event_type's hourly mean series to 24 buckets:
    // within bucket b, pick the point maximizing |area| of the
    // triangle with the mean of bucket b-1 and the mean of bucket b+1
    // (edge buckets keep their earliest point). Integer milli areas.
    "q449_lttb_downsample" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          (floor(unix_timestamp(col("ts")) / 3600)).as("h"))
        .agg(sum(floor(col("value") * 1000).cast("long")).as("v"))
      val wT = Window.partitionBy(col("event_type"))
      val bucketed = hourly
        .withColumn("hmin", min(col("h")).over(wT))
        .withColumn("hmax", max(col("h")).over(wT))
        .withColumn("b", expr(
          "least(23, (24 * (h - hmin)) DIV greatest(hmax - hmin + 1, 1))"))
      val means = bucketed.groupBy(col("event_type"), col("b"))
        .agg(expr("sum(h) DIV count(*)").as("mh"),
          expr("sum(v) DIV count(*)").as("mv"))
      val prev = means.select(col("event_type"), (col("b") + 1).as("b"),
        col("mh").as("ph"), col("mv").as("pv"))
      val next = means.select(col("event_type"), (col("b") - 1).as("b"),
        col("mh").as("nh"), col("mv").as("nv"))
      val withNbr = bucketed.join(prev, Seq("event_type", "b"), "left")
        .join(next, Seq("event_type", "b"), "left")
        // |cross product| of (prev->point, prev->next), micro units;
        // edge buckets (no neighbor) use rank-by-position fallback
        .withColumn("area", when(col("ph").isNotNull &&
          col("nh").isNotNull,
          abs((col("h") - col("ph")) * (col("nv") - col("pv")) -
            (col("nh") - col("ph")) * (col("v") - col("pv"))))
          .otherwise(lit(0L)))
      val wPick = Window.partitionBy(col("event_type"), col("b"))
        .orderBy(col("area").desc, col("h"))
      withNbr.withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("v")).as("picked_value_milli_sum"),
          sum(col("area")).as("area_sum"),
          min(col("h")).as("first_h"), max(col("h")).as("last_h"))
        .orderBy(col("event_type"))
    }),

    // Business days (Mon-Fri) strictly between orderdate and a
    // synthetic shipdate (order date + o_orderkey % 21 days): whole
    // weeks contribute 5 each; the remainder is counted from the
    // start weekday by closed form. No calendar table, no explode.
    "q450_business_days" -> ((s, d) => {
      val o = t(s, d, "orders").select(
        col("o_orderpriority").as("prio"),
        dayofweek(col("o_orderdate")).as("dw"), // 1=Sun..7=Sat
        (col("o_orderkey") % 21).as("span"))
      // Monday-indexed start weekday m in 0..6 (0=Mon)
      val busy = o.withColumn("m", (col("dw") + 5) % 7)
        .withColumn("whole", expr("span DIV 7"))
        .withColumn("rem", col("span") % 7)
        // business days among the `rem` days after start weekday m:
        // count of i in 1..rem with (m + i) % 7 < 5. The sequence is
        // the FIXED 1..6 with an i <= rem guard — Spark's
        // sequence(1, 0) descends ([1, 0]) rather than being empty,
        // so a data-dependent upper bound would break rem = 0.
        .withColumn("extra", expr(
          """aggregate(sequence(1, 6), 0L,
             (acc, i) -> acc + IF(i <= rem AND (m + i) % 7 < 5,
               1L, 0L))"""))
        .withColumn("bdays", col("whole") * 5 + col("extra"))
      busy.groupBy(col("prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("bdays")).as("sum_bdays"),
          expr("sum(bdays) DIV count(*)").as("avg_bdays"),
          max(col("bdays")).as("max_bdays"))
        .orderBy(col("prio"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q448_bom_rollup" ->
      """WITH RECURSIVE nodes AS (
           SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS u,
                  floor(p_retailprice * 100)::BIGINT AS own
           FROM part),
         -- weight of node w toward ancestor a = product of edge
         -- quantities on the path; roll every node to its ancestors
         walk AS (
           SELECT u AS a, u AS w, 1::BIGINT AS mult, own FROM nodes
           UNION ALL
           SELECT (walk.a - 1) // 4 AS a, walk.w,
                  (walk.a % 3 + 1) * walk.mult, walk.own
           FROM walk WHERE walk.a > 0)
         SELECT a AS node,
                max(CASE WHEN a = w THEN own END)::BIGINT AS own_cents,
                sum(mult * own)::BIGINT AS rolled_cents
         FROM walk WHERE a < 4
         GROUP BY a ORDER BY a""",

    "q449_lttb_downsample" ->
      """WITH hourly AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT AS h,
                  sum(floor(value * 1000)::BIGINT)::BIGINT AS v
           FROM events GROUP BY 1, 2),
         bucketed AS (
           SELECT event_type, h, v,
                  least(23, (24 * (h - min(h) OVER w))
                    // greatest(max(h) OVER w - min(h) OVER w + 1, 1))
                    ::BIGINT AS b
           FROM hourly
           WINDOW w AS (PARTITION BY event_type)),
         means AS (
           SELECT event_type, b, (sum(h) // count(*))::BIGINT AS mh,
                  (sum(v) // count(*))::BIGINT AS mv
           FROM bucketed GROUP BY 1, 2),
         nbr AS (
           SELECT bk.event_type, bk.b, bk.h, bk.v,
                  CASE WHEN p.mh IS NOT NULL AND nx.mh IS NOT NULL
                       THEN abs((bk.h - p.mh) * (nx.mv - p.mv)
                            - (nx.mh - p.mh) * (bk.v - p.mv))
                       ELSE 0 END AS area
           FROM bucketed bk
           LEFT JOIN means p ON bk.event_type = p.event_type
             AND p.b = bk.b - 1
           LEFT JOIN means nx ON bk.event_type = nx.event_type
             AND nx.b = bk.b + 1),
         picked AS (
           SELECT event_type, b, h, v, area,
                  row_number() OVER (PARTITION BY event_type, b
                    ORDER BY area DESC, h) AS rk
           FROM nbr)
         SELECT event_type, count(*)::BIGINT AS n_points,
                sum(v)::BIGINT AS picked_value_milli_sum,
                sum(area)::BIGINT AS area_sum,
                min(h)::BIGINT AS first_h, max(h)::BIGINT AS last_h
         FROM picked WHERE rk = 1
         GROUP BY event_type ORDER BY event_type""",

    "q450_business_days" ->
      """WITH o AS (
           SELECT o_orderpriority AS prio,
                  dayofweek(o_orderdate::DATE)::BIGINT AS dw0,
                  (o_orderkey % 21)::BIGINT AS span
           FROM orders),
         busy AS (
           -- DuckDB dayofweek: 0=Sun..6=Sat; Spark: 1=Sun..7=Sat
           SELECT prio, span, ((dw0 + 1) + 5) % 7 AS m,
                  span // 7 AS whole, span % 7 AS rem
           FROM o),
         ext AS (
           SELECT prio, whole * 5 +
                  len(list_filter(range(1, 7),
                    i -> i <= rem AND (m + i) % 7 < 5))::BIGINT AS bdays
           FROM busy)
         SELECT prio, count(*)::BIGINT AS n_orders,
                sum(bdays)::BIGINT AS sum_bdays,
                (sum(bdays) // count(*))::BIGINT AS avg_bdays,
                max(bdays)::BIGINT AS max_bdays
         FROM ext GROUP BY prio ORDER BY prio"""
  )
}
