package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AI (q499-q501) — runtime-filter audit, community
  * detection, and distribution-free prediction intervals:
  *
  *  - q499: Bloom-filter join-pruning audit — the urgent-order key
  *    set is hashed into a 65 536-bit filter (double hashing,
  *    k = 3 probes, pure modular integer math so both engines set
  *    identical bits), every lineitem order key is probed, and the
  *    measured false-positive rate is reported next to the
  *    (bits_set/m)^k theoretical rate. This is the audit a runtime
  *    filter (Spark's own bloom pushdown, or the reference's
  *    semi-join reduction in QueryEngine/JoinFilters) needs before
  *    trusting the filter at 100 TB: the bit set is ≤64k rows and
  *    broadcast; the probe side is one scan + one keyed aggregate.
  *  - q500: label-propagation communities over the parts-bought-
  *    together graph (edges = part pairs co-occurring in an order,
  *    bounded per order). Synchronous rounds with the classic
  *    deterministic tie-break (max vote count, then smallest label)
  *    so the fixpoint is engine-independent; 4 rounds ≈ diameter of
  *    the dense co-purchase core. Each round is one edge-grain join
  *    + one node-grain aggregate — no corpus-sized windows.
  *  - q501: split-conformal prediction intervals — a per-flag OLS
  *    price-from-quantity model is fit on the train split from
  *    exact integer sums (products of sums lifted to DECIMAL(38)),
  *    the 90% nonconformity quantile q̂ is taken on the calibration
  *    split at whole-dollar grain (value-domain-bounded cumulative
  *    histogram, the q493 pattern — no corpus-sized sort), and
  *    empirical coverage is measured on the held-out test split.
  *    Deterministic splits via modular key arithmetic.
  */
object Round9Bloom {

  type Q = (SparkSession, String) => DataFrame

  private val M = 65536L // bloom bits
  private val P1 = 65521L // largest prime < M
  private val P2 = 65519L

  val queries: Seq[(String, Q)] = Seq(

    "q499_bloom_join_prune" -> ((s, d) => {
      // probe positions i=0..2: (h1 + i*h2) % M with h1/h2 from two
      // Knuth multiplicative mixes — raw k%p1 / k%p2 are nearly equal
      // for k below the primes, which correlates the probes and
      // inflates the measured FPR ~1000x over theory. Products stay
      // under 2^63 for keys < 4*10^9 (orderkey domain).
      def positions(df: DataFrame): DataFrame = df
        .withColumn("i", explode(array(lit(0L), lit(1L), lit(2L))))
        .withColumn("pos",
          ((col("k") * 2654435761L) % P1
            + col("i") * ((col("k") * 2246822519L) % P2 + 1L)) % M)
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")).distinct()
      val bits = positions(dim).select(col("pos")).distinct()
      val bstats = bits.agg(count(lit(1)).as("bits_set"))
        .crossJoin(dim.agg(count(lit(1)).as("n_dim")))
      val probe = t(s, d, "lineitem")
        .select(col("l_orderkey").as("k")).distinct()
      val truth = probe.join(
        t(s, d, "orders").select(col("o_orderkey").as("k"),
          when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L).as("is_true")), Seq("k"))
      val hits = positions(truth)
        .join(broadcast(bits.withColumn("hit", lit(1L))),
          Seq("pos"), "left")
        .groupBy(col("k"), col("is_true"))
        .agg(min(coalesce(col("hit"), lit(0L))).as("pass"))
      val pstats = hits.agg(
        count(lit(1)).as("n_probe"),
        sum(col("is_true")).as("n_true"),
        sum(col("pass")).as("n_pass"),
        sum(when(col("pass") === 1L && col("is_true") === 0L, 1L)
          .otherwise(0L)).as("n_fp"))
      bstats.crossJoin(pstats)
        .select(col("n_dim"), col("bits_set"), col("n_probe"),
          col("n_true"), col("n_pass"), col("n_fp"),
          expr("n_fp * 1000000 DIV (n_probe - n_true)").as("fpr_ppm"),
          floor(pow(col("bits_set").cast("double") / M.toDouble, 3)
            * 1e6).cast("long").as("fpr_theory_ppm"))
    }),

    "q500_label_propagation" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val pairs = graft.Stage(li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct(),
        "q500_pairs")
      val edges = graft.Stage(pairs.unionByName(
        pairs.select(col("v").as("u"), col("u").as("v"))),
        "q500_edges")
      var labels = edges.select(col("u").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 4) {
        val votes = edges
          .join(labels, edges("v") === labels("node"))
          .groupBy(col("u"), col("lbl"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("u"))
          .orderBy(col("cnt").desc, col("lbl").asc)
        labels = votes.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("u").as("node"), col("lbl"))
      }
      labels.groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("lbl").asc)
        .limit(10)
        .select(col("lbl").as("community"), col("n_members"))
    }),

    "q501_conformal_calibration" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        ((col("l_orderkey") * 7 + col("l_linenumber")) % 5).as("split"))
      val train = base.filter(col("split") < 3)
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_train"),
          sum(col("x")).as("sx"), sum(col("cents")).as("sy"),
          sum(col("x") * col("cents")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("b",
          (col("n_train").cast("decimal(38,0)") * col("sxy")
            - col("sx").cast("decimal(38,0)") * col("sy"))
            .cast("double")
            / (col("n_train").cast("decimal(38,0)") * col("sxx")
              - col("sx").cast("decimal(38,0)") * col("sx"))
              .cast("double"))
        .withColumn("a",
          (col("sy").cast("double") - col("b") * col("sx").cast("double"))
            / col("n_train").cast("double"))
      // |residual| at whole-dollar grain on both remaining splits
      val scored = graft.Stage(base.filter(col("split") >= 3)
        .join(broadcast(train.select(col("flag"), col("a"), col("b"),
          col("n_train"))), Seq("flag"))
        .withColumn("rd",
          floor(abs(col("cents").cast("double")
            - (col("a") + col("b") * col("x").cast("double"))) / 100.0)
            .cast("long")), "q501_scored")
      val calib = scored.filter(col("split") === 3)
      val ncal = calib.groupBy(col("flag"))
        .agg(count(lit(1)).as("n_calib"))
        .withColumn("khat", expr("(9 * (n_calib + 1) + 9) DIV 10"))
      val wc = Window.partitionBy(col("flag")).orderBy(col("rd"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qhat = calib.groupBy(col("flag"), col("rd"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wc))
        .join(broadcast(ncal), Seq("flag"))
        .filter(col("cum") >= col("khat"))
        .groupBy(col("flag"), col("n_calib"))
        .agg(min(col("rd")).as("qhat_dollars"))
      scored.filter(col("split") === 4)
        .join(broadcast(qhat), Seq("flag"))
        .groupBy(col("flag"), col("n_calib"), col("qhat_dollars"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("rd") <= col("qhat_dollars"), 1L).otherwise(0L))
            .as("n_cov"), first(col("n_train")).as("n_train"))
        .select(col("flag"), col("n_train"), col("n_calib"),
          col("n_test"), col("qhat_dollars"),
          expr("n_cov * 1000000 DIV n_test").as("coverage_ppm"))
        .orderBy(col("flag"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q499_bloom_join_prune" ->
      s"""WITH dim AS (
           SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderpriority = '1-URGENT'),
         bits AS (
           SELECT DISTINCT
             (((k * 2654435761) % $P1)
              + i.i * (((k * 2246822519) % $P2) + 1)) % $M AS pos
           FROM dim, (VALUES (0), (1), (2)) i(i)),
         bstats AS (
           SELECT (SELECT count(*) FROM dim)::BIGINT AS n_dim,
                  count(*)::BIGINT AS bits_set
           FROM bits),
         probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
         truth AS (
           SELECT p.k,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1
             ELSE 0 END AS is_true
           FROM probe p JOIN orders o ON o.o_orderkey = p.k),
         hits AS (
           SELECT t.k, t.is_true,
             min(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
               AS pass
           FROM truth t
           CROSS JOIN (VALUES (0), (1), (2)) i(i)
           LEFT JOIN bits b ON b.pos =
             (((t.k * 2654435761) % $P1)
              + i.i * (((t.k * 2246822519) % $P2) + 1)) % $M
           GROUP BY t.k, t.is_true),
         pstats AS (
           SELECT count(*)::BIGINT AS n_probe,
                  sum(is_true)::BIGINT AS n_true,
                  sum(pass)::BIGINT AS n_pass,
                  sum(CASE WHEN pass = 1 AND is_true = 0 THEN 1
                      ELSE 0 END)::BIGINT AS n_fp
           FROM hits)
         SELECT b.n_dim, b.bits_set, p.n_probe, p.n_true, p.n_pass,
                p.n_fp,
                (p.n_fp * 1000000 // (p.n_probe - p.n_true))::BIGINT
                  AS fpr_ppm,
                floor(pow(CAST(b.bits_set AS DOUBLE) / $M.0, 3)
                  * 1e6)::BIGINT AS fpr_theory_ppm
         FROM bstats b, pstats p""",

    "q500_label_propagation" -> {
      val rounds = (1 to 4).map { k =>
        s"""v$k AS (
           SELECT e.u, l.lbl, count(*)::BIGINT AS cnt
           FROM edges e JOIN l${k - 1} l ON l.node = e.v
           GROUP BY e.u, l.lbl),
         l$k AS (
           SELECT u AS node, lbl FROM (
             SELECT u, lbl, row_number() OVER (
               PARTITION BY u ORDER BY cnt DESC, lbl) AS rk
             FROM v$k) WHERE rk = 1)"""
      }.mkString(",\n         ")
      s"""WITH li AS (
           SELECT l_orderkey AS o, l_partkey AS p FROM lineitem),
         pairs AS (
           SELECT DISTINCT a.p AS u, b.p AS v
           FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         edges AS (
           SELECT u, v FROM pairs
           UNION ALL SELECT v, u FROM pairs),
         l0 AS (
           SELECT DISTINCT u AS node, u AS lbl FROM edges),
         $rounds
         SELECT lbl AS community, count(*)::BIGINT AS n_members
         FROM l4 GROUP BY lbl
         ORDER BY n_members DESC, community LIMIT 10"""
    },

    "q501_conformal_calibration" ->
      """WITH base AS (
           SELECT l_returnflag AS flag,
                  CAST(l_quantity AS BIGINT) AS x,
                  floor(l_extendedprice * 100)::BIGINT AS cents,
                  (l_orderkey * 7 + l_linenumber) % 5 AS split
           FROM lineitem),
         train AS (
           SELECT flag, count(*)::BIGINT AS n_train,
                  sum(x)::BIGINT AS sx, sum(cents)::BIGINT AS sy,
                  sum(x * cents)::BIGINT AS sxy,
                  sum(x * x)::BIGINT AS sxx
           FROM base WHERE split < 3 GROUP BY flag),
         fit AS (
           SELECT flag, n_train,
             CAST(n_train::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
               / CAST(n_train::HUGEINT * sxx - sx::HUGEINT * sx
                 AS DOUBLE) AS b,
             sx, sy
           FROM train),
         fit2 AS (
           SELECT flag, n_train, b,
             (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
               / CAST(n_train AS DOUBLE) AS a
           FROM fit),
         scored AS (
           SELECT s.flag, s.split, f.n_train,
             floor(abs(CAST(s.cents AS DOUBLE)
               - (f.a + f.b * CAST(s.x AS DOUBLE))) / 100.0)::BIGINT
               AS rd
           FROM base s JOIN fit2 f ON s.flag = f.flag
           WHERE s.split >= 3),
         ncal AS (
           SELECT flag, count(*)::BIGINT AS n_calib,
                  ((9 * (count(*) + 1) + 9) // 10)::BIGINT AS khat
           FROM scored WHERE split = 3 GROUP BY flag),
         cum AS (
           SELECT flag, rd, sum(count(*)) OVER (
             PARTITION BY flag ORDER BY rd
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum
           FROM scored WHERE split = 3 GROUP BY flag, rd),
         qhat AS (
           SELECT c.flag, n.n_calib,
                  min(c.rd)::BIGINT AS qhat_dollars
           FROM cum c JOIN ncal n ON c.flag = n.flag
           WHERE c.cum >= n.khat
           GROUP BY c.flag, n.n_calib)
         SELECT s.flag, min(s.n_train)::BIGINT AS n_train,
                q.n_calib, count(*)::BIGINT AS n_test,
                q.qhat_dollars,
                (sum(CASE WHEN s.rd <= q.qhat_dollars THEN 1
                     ELSE 0 END) * 1000000 // count(*))::BIGINT
                  AS coverage_ppm
         FROM scored s JOIN qhat q ON s.flag = q.flag
         WHERE s.split = 4
         GROUP BY s.flag, q.n_calib, q.qhat_dollars
         ORDER BY s.flag"""
  )
}
