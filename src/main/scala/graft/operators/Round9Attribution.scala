package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AW (q541-q543) — attribution and market-basket
  * analytics (reference surface: the funnel/attribution query family in
  * Benchmarks/queries plus the recommendation-shaped UDTF examples;
  * the algorithms are the public standards — first-order Markov
  * removal effect [Anderl et al. 2014], item-item cosine CF
  * [Sarwar et al. 2001], and support/confidence/lift association
  * rules [Agrawal-Srikant 1994]):
  *
  *  - q541: Markov removal-effect attribution. q497's absorbing-chain
  *    machinery, extended two ways: (a) the chain is entered through
  *    the empirical FIRST-event distribution so the readout is a true
  *    path-level conversion probability, and (b) every channel's
  *    counterfactual ("delete this channel: transitions into it go to
  *    exit") is solved SIMULTANEOUSLY by keying the Jacobi vector by
  *    (removed_channel, state) — one bounded iteration instead of a
  *    per-channel loop, the same trick at 100 TB since the vector is
  *    |channels|·|states| rows regardless of corpus size. Removal
  *    effect = 1 − P_removed/P_base, normalized to shares.
  *  - q542: item-item collaborative filtering at category grain —
  *    per-order distinct baskets, a basket-bounded self-join (TPC-H
  *    baskets are ≤7 lines; the pair explosion is O(Σ basket²), one
  *    orderkey shuffle), then EXACT integer cosine² ranking:
  *    cos²·1e9 = c²·1e9 DIV (n_i·n_j) avoids any float sqrt in the
  *    gate. Top-3 neighbors per item by (cos², id) — windows run on
  *    the ≤|items|² pair table, never the corpus.
  *  - q543: association rules over the same staged pair table
  *    (support/confidence/lift in exact integer ppm), min-support
  *    filtered, deterministically ranked. Directed rules i→j and j→i
  *    both emitted since confidence is asymmetric.
  */
object Round9Attribution {

  type Q = (SparkSession, String) => DataFrame

  /** Per-order distinct category baskets → directed co-occurrence pair
    * counts with item frequencies attached; staged once for q542/q543.
    */
  private def pairTable(s: SparkSession, d: String): DataFrame = {
    val basket = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"),
        (col("l_partkey") % 100).cast("long").as("item"))
      .distinct()
    val freq = basket.groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
    val a = basket.as("a")
    val b = basket.as("b")
    val pairs = a.join(b, col("a.ok") === col("b.ok")
        && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).as("c"))
    val sym = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j"), col("c")))
    val withFreq = sym
      .join(broadcast(freq.select(col("item").as("i"),
        col("n").as("ni"))), Seq("i"))
      .join(broadcast(freq.select(col("item").as("j"),
        col("n").as("nj"))), Seq("j"))
      .select(col("i"), col("j"), col("c"), col("ni"), col("nj"))
    graft.Stage(withFreq, "q542_pairs")
  }

  val queries: Seq[(String, Q)] = Seq(

    "q541_markov_attribution" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // ONE window pass reduced straight to the (src, dst, is_first)
      // grain — ≤2·|states|² rows, staged; the old shape staged the
      // full per-event sequence table as parquet and re-read it for
      // each aggregate (round-10 tail diet)
      val grain = graft.Stage(t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("src"),
          row_number().over(wU).as("rn"))
        .withColumn("dst",
          coalesce(lead(col("src"), 1).over(wU), lit("exit")))
        .groupBy(col("src"), col("dst"),
          (col("rn") === 1).as("first"))
        .agg(count(lit(1)).as("cnt")), "q541_grain")
      val cnts = grain.filter(col("src") =!= "purchase")
        .groupBy(col("src"), col("dst"))
        .agg(sum(col("cnt")).as("cnt"))
      val totals = cnts.groupBy(col("src"))
        .agg(sum(col("cnt")).as("tot"))
      val p = graft.Stage(cnts.join(broadcast(totals), Seq("src"))
        .select(col("src"), col("dst"),
          (col("cnt").cast("double") / col("tot")).as("prob")),
        "q541_p")
      // empirical entry distribution: users' first events
      val starts = grain.filter(col("first"))
        .groupBy(col("src").as("state"))
        .agg(sum(col("cnt")).as("ns"))
      // The chain itself is event-type-enum-bounded METADATA: collect
      // the ≤|states|² transition matrix and ≤|states| entry counts
      // (bounds stated — the repo's driver-side-metadata idiom) and
      // solve every counterfactual Jacobi system locally, mirroring
      // the engine arithmetic exactly (same product/sum association;
      // round(·,12) per round absorbs sum-order ulps just as it did
      // between Spark and DuckDB). The corpus-scale work ended at the
      // staged (src,dst,first) grain — 8 distributed supersteps over a
      // ≤49-row vector were pure scheduler latency (measured ~3.3 s of
      // the query's 4.4 s close wall, zero data).
      def r12(x: Double): Double =
        new java.math.BigDecimal(java.lang.Double.toString(x))
          .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
      val trans = p.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      val entry = starts.collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val srcs = trans.map(_._1).distinct.sorted.toSeq
      val chs = srcs :+ "none"
      val bySrc = trans.groupBy(_._1)
      // pv keyed by (removed channel, state); a removed channel's pv
      // is pinned to 0 (transitions into it exit)
      var pv: Map[(String, String), Double] =
        (for { ch <- chs; st <- srcs ++ Seq("purchase", "exit") }
          yield (ch, st) -> (if (st == "purchase") 1.0 else 0.0)).toMap
      for (_ <- 1 to 8) {
        val stepped = (for { ch <- chs; src <- srcs } yield {
          val sm = bySrc(src).map { case (_, dst, prob) =>
            prob * (if (dst == ch) 0.0 else pv((ch, dst)))
          }.sum
          (ch, src) -> r12(sm)
        }).toMap
        pv = stepped ++
          chs.flatMap(ch => Seq((ch, "purchase") -> 1.0,
            (ch, "exit") -> 0.0)).toMap
      }
      // P(ch) = Σ_s π(s)·pv(ch,s), a removed channel's entries lost
      val nu = entry.map(_._2).sum.toDouble
      def pConv(ch: String): Double = r12(entry.map { case (st, ns) =>
        (if (st == ch) 0.0 else pv((ch, st))) * ns / nu
      }.sum)
      val pb = pConv("none")
      val re = srcs.map(ch => ch -> r12(1.0 - pConv(ch) / pb))
      val tre = re.map(_._2).sum
      val rows = re.map { case (ch, r) =>
        (ch, math.floor(r * 1e6).toLong,
          math.floor(r12(r / tre) * 1e6).toLong)
      }
      s.createDataFrame(rows)
        .toDF("channel", "removal_ppm", "share_ppm")
    }),

    "q542_item_item_cf" -> ((s, d) => {
      val pairs = pairTable(s, d)
        .withColumn("cos2_ppb",
          // c²·1e9 in DECIMAL(38,0): a pair co-occurrence past ~3M
          // rows would overflow the int64 product (the q555/q559
          // widening discipline); DIV lands back in BIGINT
          expr("""CAST(c AS DECIMAL(38,0)) * c * 1000000000
                  DIV (CAST(ni AS DECIMAL(38,0)) * nj)"""))
      val wI = Window.partitionBy(col("i"))
        .orderBy(col("cos2_ppb").desc, col("j"))
      pairs.withColumn("rank", row_number().over(wI))
        .filter(col("rank") <= 3)
        .select(col("i").as("item"), col("j").as("neighbor"),
          col("c").as("cooc"), col("cos2_ppb"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("item"), col("rank"))
    }),

    "q543_association_rules" -> ((s, d) => {
      val nOrders = t(s, d, "lineitem")
        .select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val rules = pairTable(s, d)
        .crossJoin(broadcast(nOrders))
        .select(col("i").as("antecedent"),
          col("j").as("consequent"), col("c").as("cooc"),
          expr("c * 1000000 DIV n_orders").as("support_ppm"),
          expr("c * 1000000 DIV ni").as("confidence_ppm"),
          expr("""CAST(c AS DECIMAL(38,0)) * n_orders * 1000000
                  DIV (CAST(ni AS DECIMAL(38,0)) * nj)""")
            .as("lift_ppm"))
        .filter(col("support_ppm") >= 2000)
      val wAll = Window.orderBy(col("lift_ppm").desc,
        col("antecedent"), col("consequent"))
      // rules clearing min-support are a bounded set (≤|items|²);
      // the global window runs on that bounded table, not the corpus
      rules.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 20)
        .select(col("antecedent"), col("consequent"), col("cooc"),
          col("support_ppm"), col("confidence_ppm"), col("lift_ppm"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q541_markov_attribution" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS (
           SELECT s.ch, s.state,
             CASE WHEN s.state = 'purchase' THEN 1.0
                  WHEN s.state = 'exit' THEN 0.0
                  ELSE coalesce(st.pv, 0.0) END AS pv
           FROM sgrid s LEFT JOIN (
             SELECT p.ch, t.src AS state,
                    round(sum(t.prob *
                      CASE WHEN p.state = p.ch THEN 0.0
                           ELSE p.pv END), 12) AS pv
             FROM tr t JOIN p${k - 1} p ON t.dst = p.state
             GROUP BY p.ch, t.src) st
             ON s.ch = st.ch AND s.state = st.state)"""
      }.mkString(",\n         ")
      s"""WITH seq AS (
           SELECT event_type AS src,
                  coalesce(lead(event_type, 1) OVER w, 'exit') AS dst,
                  row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id
             ORDER BY ts::TIMESTAMP, event_id)),
         cnts AS (
           SELECT src, dst, count(*)::BIGINT AS cnt
           FROM seq WHERE src <> 'purchase'
           GROUP BY src, dst),
         tot AS (
           SELECT src, sum(cnt)::BIGINT AS tot FROM cnts
           GROUP BY src),
         tr AS (
           SELECT c.src, c.dst, CAST(c.cnt AS DOUBLE) / t.tot AS prob
           FROM cnts c JOIN tot t ON c.src = t.src),
         starts AS (
           SELECT src AS state, count(*)::BIGINT AS ns
           FROM seq WHERE rn = 1 GROUP BY src),
         chs AS (
           SELECT DISTINCT src AS ch FROM tr
           UNION ALL SELECT 'none'),
         sts AS (
           SELECT DISTINCT src AS state FROM tr
           UNION ALL SELECT 'purchase' UNION ALL SELECT 'exit'),
         sgrid AS (
           SELECT c.ch, s.state FROM chs c, sts s),
         p0 AS (
           SELECT ch, state,
                  CASE WHEN state = 'purchase' THEN 1.0
                       ELSE 0.0 END AS pv
           FROM sgrid),
         $rounds,
         nu AS (SELECT sum(ns)::BIGINT AS nu FROM starts),
         pconv AS (
           SELECT p.ch,
                  round(sum(CASE WHEN p.state = p.ch THEN 0.0
                            ELSE p.pv END * s.ns / u.nu), 12) AS p
           FROM p8 p JOIN starts s ON p.state = s.state, nu u
           GROUP BY p.ch),
         base AS (SELECT p AS pb FROM pconv WHERE ch = 'none'),
         rem AS (
           SELECT ch, round(1.0 - p / pb, 12) AS re
           FROM pconv, base WHERE ch <> 'none'),
         tre AS (SELECT sum(re) AS tre FROM rem)
         SELECT ch AS channel,
                floor(re * 1e6)::BIGINT AS removal_ppm,
                floor(round(re / tre, 12) * 1e6)::BIGINT AS share_ppm
         FROM rem, tre ORDER BY channel"""
    },

    "q542_item_item_cf" ->
      """WITH basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 100)::BIGINT AS item
           FROM lineitem),
         freq AS (
           SELECT item, count(*)::BIGINT AS n FROM basket
           GROUP BY item),
         up AS (
           SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS c
           FROM basket a JOIN basket b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY a.item, b.item),
         sym AS (
           SELECT i, j, c FROM up
           UNION ALL SELECT j, i, c FROM up),
         pairs AS (
           SELECT s.i, s.j, s.c, fi.n AS ni, fj.n AS nj,
                  s.c::HUGEINT * s.c * 1000000000
                    // (fi.n::HUGEINT * fj.n) AS cos2_ppb
           FROM sym s
           JOIN freq fi ON s.i = fi.item
           JOIN freq fj ON s.j = fj.item),
         ranked AS (
           SELECT i, j, c, cos2_ppb,
                  row_number() OVER (PARTITION BY i
                    ORDER BY cos2_ppb DESC, j) AS rank
           FROM pairs)
         SELECT i AS item, j AS neighbor, c AS cooc,
                cos2_ppb::BIGINT AS cos2_ppb, rank::BIGINT AS rank
         FROM ranked WHERE rank <= 3
         ORDER BY item, rank""",

    "q543_association_rules" ->
      """WITH basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 100)::BIGINT AS item
           FROM lineitem),
         freq AS (
           SELECT item, count(*)::BIGINT AS n FROM basket
           GROUP BY item),
         up AS (
           SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS c
           FROM basket a JOIN basket b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY a.item, b.item),
         sym AS (
           SELECT i, j, c FROM up
           UNION ALL SELECT j, i, c FROM up),
         no AS (
           SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders
           FROM lineitem),
         rules AS (
           SELECT s.i AS antecedent, s.j AS consequent, s.c AS cooc,
                  s.c * 1000000 // o.n_orders AS support_ppm,
                  s.c * 1000000 // fi.n AS confidence_ppm,
                  s.c::HUGEINT * o.n_orders * 1000000
                    // (fi.n::HUGEINT * fj.n) AS lift_ppm
           FROM sym s
           JOIN freq fi ON s.i = fi.item
           JOIN freq fj ON s.j = fj.item, no o
           WHERE s.c * 1000000 // o.n_orders >= 2000),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY lift_ppm DESC,
                    antecedent, consequent) AS rk
           FROM rules)
         SELECT antecedent, consequent, cooc,
                support_ppm::BIGINT AS support_ppm,
                confidence_ppm::BIGINT AS confidence_ppm,
                lift_ppm::BIGINT AS lift_ppm, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 20 ORDER BY rk"""
  )
}
