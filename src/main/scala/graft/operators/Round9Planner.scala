package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AZ (q550-q552) — snapshot drift, sketch set algebra,
  * and physical-layout planning (reference surface: the catalog's
  * table statistics + fragment metadata in Catalog/ and the
  * approx-count machinery in QueryEngine/; the sketch algebra is the
  * public theta-sketch framework [Dasgupta et al. 2016]).
  *
  *  - q550: snapshot statistics drift — the orders table split into
  *    two calendar snapshots (year 1 vs the rest), per-column profile
  *    (row count, distinct count, milli-mean, min/max cents) in LONG
  *    format with drift in ppm of the base snapshot. The shape every
  *    ingestion monitor needs; one pass per snapshot, metric rows are
  *    schema-bounded.
  *  - q551: KMV/theta sketch set operations — purchase vs click
  *    (user, day) sets sketched as the 32 smallest splitmix hashes
  *    (TakeOrdered top-k: distributed, no global sort); union =
  *    re-min over the merged sketches, intersection = common retained
  *    hashes below θ = min(θ_A, θ_B) — ALL post-sketch algebra runs
  *    on ≤ 2k rows regardless of corpus size. Estimates reported next
  *    to exact cardinalities with error in ppm; the gate hashes both
  *    (the sketch is deterministic, so this is hash-exact).
  *  - q552: partition planner — per table: exact byte accounting
  *    (fixed schema widths; documents uses its true n_chars sum),
  *    128 MiB file-count recommendation, join-key skew ratio in ppm
  *    (max key frequency × distinct keys / rows — 1e6 = perfectly
  *    uniform), and the salt factor AQE-style skew mitigation would
  *    choose. The quantitative version of the reference's fragment
  *    size defaults.
  */
object Round9Planner {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q550_snapshot_drift" -> ((s, d) => {
      val base = t(s, d, "orders")
        .crossJoin(broadcast(t(s, d, "orders")
          .agg(min(col("o_orderdate")).as("d0"))))
        .withColumn("snap",
          when(datediff(col("o_orderdate"), col("d0")) < 365, "a")
            .otherwise("b"))
      val prof = base.groupBy(col("snap")).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custkeys"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        expr("sum(CAST(floor(o_totalprice * 1000) AS BIGINT)) DIV count(*)")
          .as("mean_price_milli"),
        min(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("min_price_cents"),
        max(expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .as("max_price_cents"))
      val metrics = Seq("n_rows", "n_custkeys", "n_priorities",
        "mean_price_milli", "min_price_cents", "max_price_cents")
      val long = metrics.map { m =>
        prof.select(lit(m).as("metric"), col("snap"), col(m).as("v"))
      }.reduce(_ unionByName _)
      val a = long.filter(col("snap") === "a")
        .select(col("metric"), col("v").as("val_a"))
      val b = long.filter(col("snap") === "b")
        .select(col("metric"), col("v").as("val_b"))
      a.join(b, Seq("metric"))
        .select(col("metric"), col("val_a"), col("val_b"),
          expr("abs(val_b - val_a) * 1000000 DIV greatest(abs(val_a), 1)")
            .as("drift_ppm"))
        .orderBy(col("metric"))
    }),

    "q551_theta_sketch_setops" -> ((s, d) => {
      val k = 32
      def sketch(evt: String): DataFrame = {
        val elems = t(s, d, "events")
          .filter(col("event_type") === evt)
          .select((col("user_id") * 1000000L +
            floor(unix_timestamp(col("ts")) / 86400L).cast("long"))
            .as("e"))
          .distinct()
          .withColumn("xh0",
            expr("((e % 2147483648L) * 2654435761L) & 4294967295L"))
          .withColumn("xh1",
            expr("((xh0 ^ shiftright(xh0, 16)) * 73244475L) & 4294967295L"))
          .select(expr("(xh1 ^ shiftright(xh1, 16)) & 4294967295L")
            .as("h"))
          .distinct()
        // distributed top-k (TakeOrdered), never a global sort
        elems.orderBy(col("h")).limit(k)
      }
      def exact(evt: String): DataFrame =
        t(s, d, "events").filter(col("event_type") === evt)
          .select((col("user_id") * 1000000L +
            floor(unix_timestamp(col("ts")) / 86400L).cast("long"))
            .as("e")).distinct()
      val sa = graft.Stage(sketch("purchase"), "q551_sa")
      val sb = graft.Stage(sketch("click"), "q551_sb")
      val thA = sa.agg(max(col("h")).as("tha"))
      val thB = sb.agg(max(col("h")).as("thb"))
      val estA = thA.select(lit("a").as("op"),
        expr(s"${k - 1} * 4294967296 DIV tha").as("estimate"))
      val estB = thB.select(lit("b").as("op"),
        expr(s"${k - 1} * 4294967296 DIV thb").as("estimate"))
      val merged = sa.unionByName(sb).distinct()
        .orderBy(col("h")).limit(k)
      val estU = merged.agg(
        expr(s"${k - 1} * 4294967296 DIV max(h)").as("v"))
        .select(lit("union").as("op"), col("v").as("estimate"))
      // count first (a global agg always yields its zero row), THEN
      // attach the thetas — an empty sketch intersection would
      // otherwise null the estimate
      val commonCnt = sa.join(sb, Seq("h"))
        .crossJoin(broadcast(thA)).crossJoin(broadcast(thB))
        .filter(col("h") < least(col("tha"), col("thb")))
        .agg(count(lit(1)).as("nc"))
      val estI = commonCnt
        .crossJoin(broadcast(thA)).crossJoin(broadcast(thB))
        .select(lit("intersection").as("op"),
          expr("nc * 4294967296 DIV least(tha, thb)").as("estimate"))
      val ests = estA.unionByName(estB).unionByName(estU)
        .unionByName(estI)
      val exA = exact("purchase")
      val exB = exact("click")
      val exacts = exA.agg(count(lit(1)).as("exact"))
        .select(lit("a").as("op"), col("exact"))
        .unionByName(exB.agg(count(lit(1)).as("exact"))
          .select(lit("b").as("op"), col("exact")))
        .unionByName(exA.unionByName(exB).distinct()
          .agg(count(lit(1)).as("exact"))
          .select(lit("union").as("op"), col("exact")))
        .unionByName(exA.join(exB, Seq("e"))
          .agg(count(lit(1)).as("exact"))
          .select(lit("intersection").as("op"), col("exact")))
      ests.join(exacts, Seq("op"))
        .select(col("op"), col("estimate"), col("exact"),
          expr("abs(estimate - exact) * 1000000 DIV greatest(exact, 1)")
            .as("err_ppm"))
        .orderBy(col("op"))
    }),

    "q552_partition_planner" -> ((s, d) => {
      def plan(table: String, width: Column, key: Column,
          name: String): DataFrame = {
        val keyed = t(s, d, table).select(key.as("k"), width.as("w"))
        val byKey = keyed.groupBy(col("k"))
          .agg(count(lit(1)).as("c"), sum(col("w")).as("wb"))
        byKey.agg(sum(col("c")).as("n_rows"),
          sum(col("wb")).as("est_bytes"),
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_key_rows"))
          .select(lit(name).as("tbl"), col("n_rows"), col("est_bytes"),
            greatest(lit(1L),
              expr("CAST(ceil(est_bytes / 134217728.0) AS BIGINT)"))
              .as("files_128mb"),
            expr("max_key_rows * n_keys * 1000000 DIV n_rows")
              .as("key_skew_ppm"),
            greatest(lit(1L),
              expr("CAST(ceil(max_key_rows * n_keys / CAST(n_rows AS DOUBLE) / 4.0) AS BIGINT)"))
              .as("salt_factor"))
      }
      plan("orders", lit(46L), col("o_custkey"), "orders")
        .unionByName(plan("lineitem", lit(62L), col("l_orderkey"),
          "lineitem"))
        .unionByName(plan("events", lit(58L), col("user_id"),
          "events"))
        .unionByName(plan("documents", col("n_chars") + 28L,
          col("lang"), "documents"))
        .orderBy(col("tbl"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q550_snapshot_drift" ->
      """WITH d0 AS (
           SELECT min(o_orderdate::TIMESTAMP) AS d0 FROM orders),
         base AS (
           SELECT o.*, CASE WHEN date_diff('day', d.d0,
               o.o_orderdate::TIMESTAMP) < 365 THEN 'a' ELSE 'b' END
               AS snap
           FROM orders o, d0 d),
         prof AS (
           SELECT snap, count(*)::BIGINT AS n_rows,
                  count(DISTINCT o_custkey)::BIGINT AS n_custkeys,
                  count(DISTINCT o_orderpriority)::BIGINT
                    AS n_priorities,
                  (sum(floor(o_totalprice * 1000)::BIGINT)
                    // count(*))::BIGINT AS mean_price_milli,
                  min(floor(o_totalprice * 100)::BIGINT)
                    AS min_price_cents,
                  max(floor(o_totalprice * 100)::BIGINT)
                    AS max_price_cents
           FROM base GROUP BY snap),
         long AS (
           SELECT 'n_rows' AS metric, snap, n_rows AS v FROM prof
           UNION ALL SELECT 'n_custkeys', snap, n_custkeys FROM prof
           UNION ALL SELECT 'n_priorities', snap, n_priorities
             FROM prof
           UNION ALL SELECT 'mean_price_milli', snap,
             mean_price_milli FROM prof
           UNION ALL SELECT 'min_price_cents', snap, min_price_cents
             FROM prof
           UNION ALL SELECT 'max_price_cents', snap, max_price_cents
             FROM prof)
         SELECT a.metric, a.v AS val_a, b.v AS val_b,
                (abs(b.v - a.v) * 1000000
                  // greatest(abs(a.v), 1))::BIGINT AS drift_ppm
         FROM long a JOIN long b
           ON a.metric = b.metric AND a.snap = 'a' AND b.snap = 'b'
         ORDER BY a.metric""",

    "q551_theta_sketch_setops" ->
      """WITH ea AS (
           SELECT DISTINCT user_id * 1000000
             + floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS e
           FROM events WHERE event_type = 'purchase'),
         eb AS (
           SELECT DISTINCT user_id * 1000000
             + floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS e
           FROM events WHERE event_type = 'click'),
         ha AS (
           SELECT DISTINCT xor(h1, h1 >> 16) & 4294967295 AS h FROM (
             SELECT (xor(h0, h0 >> 16) * 73244475) & 4294967295 AS h1
             FROM (SELECT ((e % 2147483648) * 2654435761)
                          & 4294967295 AS h0
                   FROM ea))),
         hb AS (
           SELECT DISTINCT xor(h1, h1 >> 16) & 4294967295 AS h FROM (
             SELECT (xor(h0, h0 >> 16) * 73244475) & 4294967295 AS h1
             FROM (SELECT ((e % 2147483648) * 2654435761)
                          & 4294967295 AS h0
                   FROM eb))),
         sa AS (SELECT h FROM ha ORDER BY h LIMIT 32),
         sb AS (SELECT h FROM hb ORDER BY h LIMIT 32),
         tha AS (SELECT max(h) AS tha FROM sa),
         thb AS (SELECT max(h) AS thb FROM sb),
         su AS (
           SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
           ORDER BY h LIMIT 32),
         ests AS (
           SELECT 'a' AS op, (31 * 4294967296 // tha)::BIGINT
             AS estimate FROM tha
           UNION ALL
           SELECT 'b', (31 * 4294967296 // thb)::BIGINT FROM thb
           UNION ALL
           SELECT 'union', (31 * 4294967296 // max(h))::BIGINT FROM su
           UNION ALL
           SELECT 'intersection',
             (count(*) * 4294967296
               // least((SELECT tha FROM tha),
                        (SELECT thb FROM thb)))::BIGINT
           FROM sa JOIN sb USING (h)
           WHERE h < least((SELECT tha FROM tha),
                           (SELECT thb FROM thb))),
         exacts AS (
           SELECT 'a' AS op, count(*)::BIGINT AS exact FROM ea
           UNION ALL SELECT 'b', count(*)::BIGINT FROM eb
           UNION ALL SELECT 'union', count(*)::BIGINT
             FROM (SELECT e FROM ea UNION SELECT e FROM eb)
           UNION ALL SELECT 'intersection', count(*)::BIGINT
             FROM ea JOIN eb USING (e))
         SELECT e.op, s.estimate, e.exact,
                (abs(s.estimate - e.exact) * 1000000
                  // greatest(e.exact, 1))::BIGINT AS err_ppm
         FROM ests s JOIN exacts e ON s.op = e.op
         ORDER BY e.op""",

    "q552_partition_planner" ->
      """WITH pl2 AS (
           SELECT 'lineitem' AS tbl, sum(c)::BIGINT AS n_rows,
                  (sum(c) * 62)::BIGINT AS est_bytes,
                  count(*)::BIGINT AS n_keys,
                  max(c)::BIGINT AS max_key_rows
           FROM (SELECT l_orderkey, count(*)::BIGINT AS c
                 FROM lineitem GROUP BY l_orderkey)),
         pl3 AS (
           SELECT 'events' AS tbl, sum(c)::BIGINT AS n_rows,
                  (sum(c) * 58)::BIGINT AS est_bytes,
                  count(*)::BIGINT AS n_keys,
                  max(c)::BIGINT AS max_key_rows
           FROM (SELECT user_id, count(*)::BIGINT AS c FROM events
                 GROUP BY user_id)),
         pl4 AS (
           SELECT 'documents' AS tbl, sum(c)::BIGINT AS n_rows,
                  sum(wb)::BIGINT AS est_bytes,
                  count(*)::BIGINT AS n_keys,
                  max(c)::BIGINT AS max_key_rows
           FROM (SELECT lang, count(*)::BIGINT AS c,
                        sum(n_chars + 28)::BIGINT AS wb
                 FROM documents GROUP BY lang)),
         pl1 AS (
           SELECT 'orders' AS tbl, sum(c)::BIGINT AS n_rows,
                  (sum(c) * 46)::BIGINT AS est_bytes,
                  count(*)::BIGINT AS n_keys,
                  max(c)::BIGINT AS max_key_rows
           FROM (SELECT o_custkey, count(*)::BIGINT AS c FROM orders
                 GROUP BY o_custkey)),
         allp AS (
           SELECT * FROM pl1 UNION ALL SELECT * FROM pl2
           UNION ALL SELECT * FROM pl3 UNION ALL SELECT * FROM pl4)
         SELECT tbl, n_rows, est_bytes,
                greatest(1, ceil(est_bytes / 134217728.0)::BIGINT)
                  AS files_128mb,
                (max_key_rows * n_keys * 1000000 // n_rows)::BIGINT
                  AS key_skew_ppm,
                greatest(1, ceil(max_key_rows * n_keys
                  / CAST(n_rows AS DOUBLE) / 4.0)::BIGINT)
                  AS salt_factor
         FROM allp ORDER BY tbl"""
  )
}
