package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch P (q441-q444): optimizer/steward audits that look AT
  * the data the way the engine's planner does:
  *
  *  - q441: join-cardinality estimation audit — the textbook
  *    |A||B| / max(ndv_A, ndv_B) estimate vs the true join size for
  *    every FK edge (what a cost-based optimizer gets wrong and by
  *    how much; complements q328's single-column selectivity audit),
  *  - q442: point-in-time feature backfill — per order, the
  *    customer's STRICTLY-PRIOR revenue via a range window (the
  *    leakage-free as-of aggregate a feature store needs; q295 covers
  *    the as-of attribute lookup, this covers the as-of aggregate),
  *  - q443: snapshot diff — added/removed/changed/unchanged between
  *    two table versions keyed on the primary key (the audit view of
  *    what q302's CDC apply produced),
  *  - q444: shuffle-skew advisor — per candidate join key, heavy-key
  *    share and the salt factor that would level the worst partition
  *    (the planning input to q154/q237's salted executions).
  *
  * All estimates/errors are integer ppm (abs error + sign kept apart:
  * Spark's DIV truncates toward zero while DuckDB's // floors, so
  * signed integer division never crosses the engines). Corpus-scale
  * stages are keyed aggregates; key-profile windows run over
  * dimension-sized (not corpus-sized) row sets.
  */
object Round9Audit {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q441_join_card_estimate" -> ((s, d) => {
      def edge(name: String, a: DataFrame, ak: String,
          b: DataFrame, bk: String): DataFrame = {
        val sa = a.agg(count(lit(1)).as("na"),
          countDistinct(col(ak)).as("da"))
        val sb = b.agg(count(lit(1)).as("nb"),
          countDistinct(col(bk)).as("db"))
        // true join size as sum(ca * cb) over per-key counts — the
        // join is never materialized (the skewed edge would produce
        // ~1e9 rows at sf0.1; the audit must not pay what it audits)
        val actual = a.groupBy(col(ak).as("k"))
          .agg(count(lit(1)).as("ca"))
          .join(b.groupBy(col(bk).as("k")).agg(count(lit(1)).as("cb")),
            "k")
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
            .as("actual"))
        sa.crossJoin(sb).crossJoin(actual)
          .select(lit(name).as("edge"), col("na"), col("nb"),
            col("da"), col("db"),
            expr("na * nb DIV greatest(da, db)").as("est"),
            col("actual"))
          .withColumn("abs_err_ppm",
            expr("1000000 * abs(est - actual) DIV greatest(actual, 1)"))
          .withColumn("overestimates",
            (col("est") >= col("actual")).cast("long"))
      }
      // the three FK edges are the planner's easy cases (uniform keys
      // make the formula near-exact); the fourth edge joins on a
      // SKEWED derived key, where independence fails and the audit
      // shows a real underestimate
      edge("lineitem-orders", t(s, d, "lineitem"), "l_orderkey",
          t(s, d, "orders"), "o_orderkey")
        .unionByName(edge("lineitem-part", t(s, d, "lineitem"),
          "l_partkey", t(s, d, "part"), "p_partkey"))
        .unionByName(edge("orders-customer", t(s, d, "orders"),
          "o_custkey", t(s, d, "customer"), "c_custkey"))
        .unionByName(edge("skewed-derived",
          t(s, d, "lineitem").withColumn("sk",
            least(col("l_suppkey") % 100, lit(10))), "sk",
          t(s, d, "orders").withColumn("sk",
            least(col("o_custkey") % 100, lit(10))), "sk"))
        .orderBy(col("edge"))
    }),

    // Strictly-prior (leakage-free) cumulative revenue per customer at
    // each order date: RANGE window on the day index excludes the
    // whole current day, so same-day orders never see each other.
    // Rolled up by order month for a bounded gate.
    "q442_pit_feature_backfill" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("dayi"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("dayi"))
        .rangeBetween(Window.unboundedPreceding, -1)
      o.withColumn("prior_cents",
          coalesce(sum(col("cents")).over(w), lit(0L)))
        .withColumn("has_history",
          (sum(lit(1L)).over(w) > 0).cast("long"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(coalesce(col("has_history"), lit(0L)))
            .as("orders_with_history"),
          sum(col("prior_cents")).as("sum_prior_cents"))
        .orderBy(col("month"))
    }),

    // v1 = base minus "late inserts" (key % 13 = 0); v2 = base minus
    // "deletes" (key % 11 = 0), with key % 7 = 0 rows repriced +1
    // cent. Full-outer on the key, compare the one mutable field.
    "q443_snapshot_diff" -> ((s, d) => {
      val base = t(s, d, "orders").select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = base.filter(col("k") % 13 =!= 0)
        .select(col("k"), col("cents").as("c1"))
      val v2 = base.filter(col("k") % 11 =!= 0)
        .select(col("k"), (col("cents") +
          when(col("k") % 7 === 0, 1L).otherwise(0L)).as("c2"))
      v1.join(v2, Seq("k"), "full_outer")
        .agg(
          sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("c1").isNotNull && col("c2").isNotNull &&
            col("c1") =!= col("c2"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("c1") === col("c2"), 1L).otherwise(0L))
            .as("n_unchanged"),
          sum(when(col("c1").isNotNull && col("c2").isNotNull,
            col("c2") - col("c1")).otherwise(0L)).as("changed_cents_delta"))
    }),

    // Key-skew profile for two candidate shuffle keys: top-key share,
    // p99 key weight, and the salt factor that levels the heaviest key
    // to the average-partition target (32 partitions).
    "q444_skew_salt_advisor" -> ((s, d) => {
      def profile(keyName: String, keyed: DataFrame): DataFrame = {
        val counts = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
        val wRank = Window.orderBy(col("c").desc, col("k"))
        // dimension-sized window (distinct join keys), not corpus rows
        val ranked = counts.withColumn("rk", row_number().over(wRank))
        val nk = ranked.agg(max(col("rk")).as("n_keys"),
          sum(col("c")).as("n_rows"), max(col("c")).as("top_cnt"))
        val p99 = ranked.crossJoin(broadcast(nk))
          .filter(col("rk") === expr("greatest(1, 99 * n_keys DIV 100)"))
          .select(col("c").as("p99_cnt"))
        nk.crossJoin(p99)
          .select(lit(keyName).as("join_key"), col("n_rows"),
            col("n_keys"), col("top_cnt"), col("p99_cnt"),
            expr("1000000 * top_cnt DIV n_rows").as("top_share_ppm"),
            expr("""greatest(1, (top_cnt + (n_rows DIV 32) - 1)
                DIV greatest(n_rows DIV 32, 1))""").as("salt_factor"))
      }
      // natural keys (near-uniform -> salt 1) plus a heavily skewed
      // derived key, where ~95% of rows share one value and the
      // advisor recommends a real salt factor
      profile("l_suppkey", t(s, d, "lineitem")
          .select(col("l_suppkey").as("k")))
        .unionByName(profile("o_custkey", t(s, d, "orders")
          .select(col("o_custkey").as("k"))))
        .unionByName(profile("skewed_demo", t(s, d, "lineitem")
          .select(least(col("l_partkey") % 1000, lit(50)).as("k"))))
        .orderBy(col("join_key"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q441_join_card_estimate" ->
      """WITH e1 AS (
           SELECT 'lineitem-orders' AS edge,
                  (SELECT count(*) FROM lineitem)::BIGINT AS na,
                  (SELECT count(*) FROM orders)::BIGINT AS nb,
                  (SELECT count(DISTINCT l_orderkey) FROM lineitem)
                    ::BIGINT AS da,
                  (SELECT count(DISTINCT o_orderkey) FROM orders)
                    ::BIGINT AS db,
                  (SELECT coalesce(sum(ca * cb), 0) FROM
                     (SELECT l_orderkey k, count(*)::BIGINT ca
                      FROM lineitem GROUP BY 1) l
                   JOIN (SELECT o_orderkey k, count(*)::BIGINT cb
                         FROM orders GROUP BY 1) o ON l.k = o.k)
                    ::BIGINT AS actual),
         e2 AS (
           SELECT 'lineitem-part',
                  (SELECT count(*) FROM lineitem)::BIGINT,
                  (SELECT count(*) FROM part)::BIGINT,
                  (SELECT count(DISTINCT l_partkey) FROM lineitem)
                    ::BIGINT,
                  (SELECT count(DISTINCT p_partkey) FROM part)::BIGINT,
                  (SELECT coalesce(sum(ca * cb), 0) FROM
                     (SELECT l_partkey k, count(*)::BIGINT ca
                      FROM lineitem GROUP BY 1) l
                   JOIN (SELECT p_partkey k, count(*)::BIGINT cb
                         FROM part GROUP BY 1) p ON l.k = p.k)::BIGINT),
         e3 AS (
           SELECT 'orders-customer',
                  (SELECT count(*) FROM orders)::BIGINT,
                  (SELECT count(*) FROM customer)::BIGINT,
                  (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT,
                  (SELECT count(DISTINCT c_custkey) FROM customer)
                    ::BIGINT,
                  (SELECT coalesce(sum(ca * cb), 0) FROM
                     (SELECT o_custkey k, count(*)::BIGINT ca
                      FROM orders GROUP BY 1) o
                   JOIN (SELECT c_custkey k, count(*)::BIGINT cb
                         FROM customer GROUP BY 1) c ON o.k = c.k)
                    ::BIGINT),
         e4 AS (
           SELECT 'skewed-derived',
                  (SELECT count(*) FROM lineitem)::BIGINT,
                  (SELECT count(*) FROM orders)::BIGINT,
                  (SELECT count(DISTINCT least(l_suppkey % 100, 10))
                   FROM lineitem)::BIGINT,
                  (SELECT count(DISTINCT least(o_custkey % 100, 10))
                   FROM orders)::BIGINT,
                  (SELECT coalesce(sum(ca * cb), 0) FROM
                     (SELECT least(l_suppkey % 100, 10) AS sk,
                             count(*)::BIGINT ca
                      FROM lineitem GROUP BY 1) l
                   JOIN (SELECT least(o_custkey % 100, 10) AS sk,
                              count(*)::BIGINT cb
                         FROM orders GROUP BY 1) o ON l.sk = o.sk)
                    ::BIGINT),
         u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
               UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
         SELECT edge, na, nb, da, db,
                ((na * nb) // greatest(da, db))::BIGINT AS est,
                actual,
                ((1000000 * abs((na * nb) // greatest(da, db) - actual))
                  // greatest(actual, 1))::BIGINT AS abs_err_ppm,
                (CASE WHEN (na * nb) // greatest(da, db) >= actual
                      THEN 1 ELSE 0 END)::BIGINT AS overestimates
         FROM u ORDER BY edge""",

    "q442_pit_feature_backfill" ->
      """WITH o AS (
           SELECT o_custkey,
                  datediff('day', DATE '1995-01-01', o_orderdate::DATE)
                    AS dayi,
                  strftime(o_orderdate, '%Y-%m') AS month,
                  floor(o_totalprice * 100)::BIGINT AS cents
           FROM orders),
         feat AS (
           SELECT month,
                  coalesce(sum(cents) OVER w, 0)::BIGINT AS prior_cents,
                  (CASE WHEN coalesce(sum(1) OVER w, 0) > 0
                        THEN 1 ELSE 0 END)::BIGINT AS has_history
           FROM o
           WINDOW w AS (PARTITION BY o_custkey ORDER BY dayi
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT month, count(*)::BIGINT AS n_orders,
                sum(has_history)::BIGINT AS orders_with_history,
                sum(prior_cents)::BIGINT AS sum_prior_cents
         FROM feat GROUP BY month ORDER BY month""",

    "q443_snapshot_diff" ->
      """WITH base AS (
           SELECT o_orderkey AS k,
                  floor(o_totalprice * 100)::BIGINT AS cents
           FROM orders),
         v1 AS (SELECT k, cents AS c1 FROM base WHERE k % 13 <> 0),
         v2 AS (SELECT k, (cents + CASE WHEN k % 7 = 0 THEN 1 ELSE 0
                  END)::BIGINT AS c2
                FROM base WHERE k % 11 <> 0),
         j AS (SELECT v1.k AS k1, v2.k AS k2, c1, c2
               FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
         SELECT sum(CASE WHEN c1 IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_added,
                sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END)::BIGINT
                  AS n_removed,
                sum(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
                      AND c1 <> c2 THEN 1 ELSE 0 END)::BIGINT
                  AS n_changed,
                sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END)::BIGINT
                  AS n_unchanged,
                sum(CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL
                      THEN c2 - c1 ELSE 0 END)::BIGINT
                  AS changed_cents_delta
         FROM j""",

    "q444_skew_salt_advisor" ->
      """WITH keys AS (
           SELECT 'l_suppkey' AS join_key, l_suppkey::BIGINT AS k
           FROM lineitem
           UNION ALL
           SELECT 'o_custkey', o_custkey FROM orders
           UNION ALL
           SELECT 'skewed_demo', least(l_partkey % 1000, 50)
           FROM lineitem),
         counts AS (
           SELECT join_key, k, count(*)::BIGINT AS c
           FROM keys GROUP BY 1, 2),
         ranked AS (
           SELECT join_key, k, c,
                  row_number() OVER (PARTITION BY join_key
                    ORDER BY c DESC, k) AS rk
           FROM counts),
         nk AS (
           SELECT join_key, max(rk)::BIGINT AS n_keys,
                  sum(c)::BIGINT AS n_rows, max(c)::BIGINT AS top_cnt
           FROM ranked GROUP BY 1),
         p99 AS (
           SELECT r.join_key, r.c AS p99_cnt
           FROM ranked r JOIN nk ON r.join_key = nk.join_key
           WHERE r.rk = greatest(1, (99 * nk.n_keys) // 100))
         SELECT nk.join_key, nk.n_rows, nk.n_keys, nk.top_cnt,
                p99.p99_cnt,
                ((1000000 * nk.top_cnt) // nk.n_rows)::BIGINT
                  AS top_share_ppm,
                greatest(1, (nk.top_cnt + (nk.n_rows // 32) - 1)
                  // greatest(nk.n_rows // 32, 1))::BIGINT AS salt_factor
         FROM nk JOIN p99 ON nk.join_key = p99.join_key
         ORDER BY nk.join_key"""
  )
}
