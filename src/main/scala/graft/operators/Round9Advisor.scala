package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BH (q574-q576) — complexity measures and optimizer
  * advisories (public algorithms: permutation entropy [Bandt-Pompe
  * 2002], textbook System-R cardinality estimation
  * [Selinger et al. 1979], and bitmap-index size accounting
  * [O'Neil-Quass 1997]):
  *
  *  - q574: permutation entropy of daily revenue — ordinal 3-patterns
  *    (ties broken earlier-index-smaller, the standard convention)
  *    counted exactly over the calendar-bounded day arrays; entropy
  *    normalized by ln 6 in ppm via one fixed 6-term expression over
  *    the integer counts. The model-free "how predictable is this
  *    series" readout.
  *  - q575: join-order advisor for customer ⋈ σ(orders) ⋈ lineitem —
  *    both orders costed with the uniform-key estimate
  *    |A⋈B| ≈ |A|·|B|/max(d_A, d_B) from EXACT collected statistics,
  *    then each estimate audited against the exact intermediate
  *    cardinality (one aggregation each); the recommendation plus
  *    estimate error in ppm. The reference pins join order the same
  *    way in its cost model.
  *  - q576: bitmap index advisor — per candidate column: exact
  *    cardinality, plain-bitmap bits (card·rows), and an RLE bound
  *    from value-change runs counted INSIDE 1024-order blocks
  *    (block-local windows — bounded rows per block, block sums
  *    exact; a global insertion-order window would be a corpus
  *    sort). Recommends bitmap when the RLE estimate beats the
  *    8-byte-per-row btree baseline.
  */
object Round9Advisor {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q574_permutation_entropy" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      val codes = daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"))
        .select(col("event_type"),
          expr("transform(series, s -> s.m)").as("arr"))
        .withColumn("nn", size(col("arr")).cast("long"))
        .filter(col("nn") >= 5)
        // ordinal code of (a,b,c) with earlier-index-smaller ties:
        // lexicographic rank over the 3 pairwise strict comparisons
        // b<a ("ba"), c<a ("ca"), c<b ("cb") — 6 reachable codes
        .select(col("event_type"), explode(expr(
          """transform(sequence(1, int(nn) - 2), i ->
               (CASE WHEN element_at(arr, i + 1) < element_at(arr, i)
                 THEN 4 ELSE 0 END)
             + (CASE WHEN element_at(arr, i + 2) < element_at(arr, i)
                 THEN 2 ELSE 0 END)
             + (CASE WHEN element_at(arr, i + 2)
                      < element_at(arr, i + 1)
                 THEN 1 ELSE 0 END))""")).as("code"))
      val counts = codes.groupBy(col("event_type"), col("code"))
        .agg(count(lit(1)).as("c"))
      val tot = counts.groupBy(col("event_type"))
        .agg(sum(col("c")).as("nw"),
          countDistinct(col("code")).as("n_patterns"))
      counts.join(broadcast(tot), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(first(col("nw")).as("n_windows"),
          first(col("n_patterns")).as("n_patterns"),
          // −Σ p ln p / ln 6 in ppm; each term a fixed expression of
          // integer counts
          expr("""CAST(floor(1000000.0 * sum(
              -(CAST(c AS DOUBLE) / nw)
              * ln(CAST(c AS DOUBLE) / nw)) / ln(6.0)) AS BIGINT)""")
            .as("perm_entropy_ppm"))
        .orderBy(col("event_type"))
    }),

    "q575_join_order_advisor" -> ((s, d) => {
      val so = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val stats = so.agg(count(lit(1)).as("n_so"),
        countDistinct(col("o_custkey")).as("d_so_ck"),
        countDistinct(col("o_orderkey")).as("d_so_ok"))
        .crossJoin(t(s, d, "customer")
          .agg(count(lit(1)).as("n_c"),
            countDistinct(col("c_custkey")).as("d_c")))
        .crossJoin(t(s, d, "lineitem")
          .agg(count(lit(1)).as("n_l"),
            countDistinct(col("l_orderkey")).as("d_l_ok")))
      val exactCO = so
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("exact_rows"))
      val exactOL = so
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact_rows"))
      val planA = stats.crossJoin(broadcast(exactCO))
        .select(lit("customer_first").as("plan"),
          expr("n_so * n_c DIV greatest(d_so_ck, d_c)")
            .as("est_rows"), col("exact_rows"))
      val planB = stats.crossJoin(broadcast(exactOL))
        .select(lit("lineitem_first").as("plan"),
          expr("n_so * n_l DIV greatest(d_so_ok, d_l_ok)")
            .as("est_rows"), col("exact_rows"))
      val both = planA.unionByName(planB)
      val best = both.agg(min(col("est_rows")).as("best"))
      both.crossJoin(broadcast(best))
        .select(col("plan"), col("est_rows"), col("exact_rows"),
          expr("""abs(est_rows - exact_rows) * 1000000
                  DIV greatest(exact_rows, 1)""").as("est_err_ppm"),
          when(col("est_rows") === col("best"), 1L).otherwise(0L)
            .as("recommended"))
        .orderBy(col("plan"))
    }),

    "q576_bitmap_index_advisor" -> ((s, d) => {
      def advise(colName: String, c: org.apache.spark.sql.Column)
          : DataFrame = {
        val base = t(s, d, "lineitem")
          .select(expr("l_orderkey DIV 1024").as("blk"),
            col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            c.cast("string").as("v"))
        // (ok, ln) is NOT unique in the synthetic fixture (11.8k
        // duplicate pairs at sf0.01) — order by the value too so the
        // sequence, and therefore the run count, is total
        val wB = Window.partitionBy(col("blk"))
          .orderBy(col("ok"), col("ln"), col("v"))
        val runs = base
          .withColumn("chg",
            when(lag(col("v"), 1).over(wB).isNull
              || lag(col("v"), 1).over(wB) =!= col("v"), 1L)
              .otherwise(0L))
          .agg(sum(col("chg")).as("runs"), count(lit(1)).as("n_rows"),
            countDistinct(col("v")).as("card"))
        runs.select(lit(colName).as("column_name"), col("n_rows"),
          col("card"), col("runs"),
          expr("card * n_rows DIV 8").as("plain_bitmap_bytes"),
          (col("runs") * 8L).as("rle_bitmap_bytes"),
          (col("n_rows") * 8L).as("btree_bytes"))
          .withColumn("recommend",
            when(col("runs") * 8L < col("n_rows") * 8L
              && col("card") <= 64L, lit("bitmap_rle"))
              .otherwise(lit("btree")))
      }
      advise("l_returnflag", col("l_returnflag"))
        .unionByName(advise("l_linestatus", col("l_linestatus")))
        .unionByName(advise("l_quantity", col("l_quantity")))
        .unionByName(advise("l_partkey_cat",
          (col("l_partkey") % 100).cast("long")))
        .orderBy(col("column_name"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q574_permutation_entropy" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, list(m ORDER BY day) AS ms,
                  count(*)::BIGINT AS nn
           FROM daily GROUP BY event_type),
         codes AS (
           SELECT event_type,
                  unnest(list_transform(range(1, (nn - 1)::INT),
                    i -> (CASE WHEN ms[(i + 1)::INT] < ms[i::INT]
                           THEN 4 ELSE 0 END)
                       + (CASE WHEN ms[(i + 2)::INT] < ms[i::INT]
                           THEN 2 ELSE 0 END)
                       + (CASE WHEN ms[(i + 2)::INT]
                                < ms[(i + 1)::INT]
                           THEN 1 ELSE 0 END))) AS code
           FROM ser WHERE nn >= 5),
         counts AS (
           SELECT event_type, code, count(*)::BIGINT AS c
           FROM codes GROUP BY event_type, code),
         tot AS (
           SELECT event_type, sum(c)::BIGINT AS nw,
                  count(DISTINCT code)::BIGINT AS n_patterns
           FROM counts GROUP BY event_type)
         SELECT c.event_type, any_value(t.nw)::BIGINT AS n_windows,
                any_value(t.n_patterns)::BIGINT AS n_patterns,
                CAST(floor(1000000.0 * sum(
                  -(CAST(c.c AS DOUBLE) / t.nw)
                  * ln(CAST(c.c AS DOUBLE) / t.nw)) / ln(6.0))
                  AS BIGINT) AS perm_entropy_ppm
         FROM counts c JOIN tot t ON c.event_type = t.event_type
         GROUP BY c.event_type ORDER BY c.event_type""",

    "q575_join_order_advisor" ->
      """WITH so AS (
           SELECT * FROM orders
           WHERE o_orderpriority = '1-URGENT'),
         stats AS (
           SELECT (SELECT count(*) FROM so)::BIGINT AS n_so,
                  (SELECT count(DISTINCT o_custkey) FROM so)::BIGINT
                    AS d_so_ck,
                  (SELECT count(DISTINCT o_orderkey) FROM so)::BIGINT
                    AS d_so_ok,
                  (SELECT count(*) FROM customer)::BIGINT AS n_c,
                  (SELECT count(DISTINCT c_custkey) FROM customer)
                    ::BIGINT AS d_c,
                  (SELECT count(*) FROM lineitem)::BIGINT AS n_l,
                  (SELECT count(DISTINCT l_orderkey) FROM lineitem)
                    ::BIGINT AS d_l_ok),
         exco AS (
           SELECT count(*)::BIGINT AS exact_rows
           FROM so JOIN customer ON o_custkey = c_custkey),
         exol AS (
           SELECT count(*)::BIGINT AS exact_rows
           FROM so JOIN lineitem ON o_orderkey = l_orderkey),
         plans AS (
           SELECT 'customer_first' AS plan,
                  (n_so * n_c // greatest(d_so_ck, d_c))::BIGINT
                    AS est_rows,
                  (SELECT exact_rows FROM exco) AS exact_rows
           FROM stats
           UNION ALL
           SELECT 'lineitem_first',
                  (n_so * n_l // greatest(d_so_ok, d_l_ok))::BIGINT,
                  (SELECT exact_rows FROM exol)
           FROM stats),
         best AS (SELECT min(est_rows) AS best FROM plans)
         SELECT plan, est_rows, exact_rows,
                (abs(est_rows - exact_rows) * 1000000
                  // greatest(exact_rows, 1))::BIGINT AS est_err_ppm,
                (CASE WHEN est_rows = best THEN 1 ELSE 0 END)::BIGINT
                  AS recommended
         FROM plans, best ORDER BY plan""",

    "q576_bitmap_index_advisor" -> {
      val arms = Seq(
        ("l_returnflag", "l_returnflag"),
        ("l_linestatus", "l_linestatus"),
        ("l_quantity", "l_quantity"),
        ("l_partkey_cat", "(l_partkey % 100)")).map {
        case (name, exprS) =>
          s"""SELECT '$name' AS column_name,
               count(*)::BIGINT AS n_rows,
               count(DISTINCT v)::BIGINT AS card,
               sum(chg)::BIGINT AS runs
             FROM (
               SELECT v, (CASE WHEN lag(v, 1) OVER w IS NULL
                          OR lag(v, 1) OVER w <> v
                     THEN 1 ELSE 0 END)::BIGINT AS chg
               FROM (SELECT l_orderkey // 1024 AS blk, l_orderkey,
                            l_linenumber,
                            CAST($exprS AS VARCHAR) AS v
                     FROM lineitem)
               WINDOW w AS (PARTITION BY blk
                 ORDER BY l_orderkey, l_linenumber, v))"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH arms AS (
           $arms)
         SELECT column_name, n_rows, card, runs,
                (card * n_rows // 8)::BIGINT AS plain_bitmap_bytes,
                (runs * 8)::BIGINT AS rle_bitmap_bytes,
                (n_rows * 8)::BIGINT AS btree_bytes,
                (CASE WHEN runs * 8 < n_rows * 8 AND card <= 64
                 THEN 'bitmap_rle' ELSE 'btree' END) AS recommend
         FROM arms ORDER BY column_name"""
    }
  )
}
