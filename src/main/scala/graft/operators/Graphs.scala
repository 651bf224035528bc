package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Round-9 batch Q (q445-q447):
  *
  *  - q445: functional-graph cycle core via binary lifting — f^1024 by
  *    10 compose-with-self joins (log-step, each a dimension-sized
  *    hash join), where the image of f^1024 is exactly the cyclic-node
  *    set once every tail is shorter than 1024. The iterative-peel
  *    alternative is O(longest tail) rounds; lifting is O(log) — the
  *    scale-correct shape for dependency/workflow cycle audits.
  *  - q446: water-filling (capped proportional) budget allocation —
  *    the closed-form level: sort demands ascending, find the break
  *    point where level*(remaining) exhausts the budget; everything
  *    below keeps its demand, everything above is capped at the level.
  *  - q447: tokenizer fertility by language — tokens/1k-chars and
  *    bytes/token in ppm from the repo's BPE-ish regex split (the
  *    per-language cost metric a multilingual-corpus owner tracks).
  *
  * Graph nodes / demand rows are dimension-sized; the only corpus
  * stage (q447) is one scan + one keyed aggregate.
  */
object Graphs {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Successor function over part keys: the Pollard-rho map
    // f(u) = (u^2 + 1) % n over rank space 0..n-1 — non-invertible, so
    // the functional graph has real tails (expected O(sqrt n), far
    // under 1024 at every fixture scale); cyclic nodes = image of
    // f^1024 provided tails are < 1024 (asserted in the spec via image
    // stability: image(f^1024) == image(f^2048)). An affine map would
    // be a permutation (gcd trick) and everything would be "cyclic".
    "q445_cycle_core" -> ((s, d) => {
      val keys = t(s, d, "part").select(col("p_partkey"))
      val n = keys.count() // dimension-sized driver scalar
      // normalize keys into rank space first so f is total
      val wR = Window.orderBy(col("p_partkey")) // dimension-sized
      val ranked = graft.Stage(keys
        .withColumn("u", row_number().over(wR).cast("long") - 1)
        .select(col("u")), "q445_nodes")
      val f = ranked.select(col("u"), ((col("u") * col("u") + 1) % n)
        .as("v"))
      // binary lifting: g_{k+1} = g_k ∘ g_k  (10 steps -> f^1024)
      val g1024 = (1 to 10).foldLeft(f) { (g, _) =>
        val hop = g.select(col("u").as("m"), col("v").as("w"))
        graft.Stage(g.join(hop, g("v") === hop("m"))
          .select(col("u"), col("w").as("v")), "q445_lift")
      }
      val cyc = g1024.select(col("v")).distinct()
      cyc.agg(count(lit(1)).as("n_cyclic"),
          sum(col("v")).as("cyclic_id_sum"))
        .crossJoin(broadcast(
          ranked.agg(count(lit(1)).as("n_nodes"))))
        .select(col("n_nodes"), col("n_cyclic"),
          (col("n_nodes") - col("n_cyclic")).as("n_acyclic"),
          col("cyclic_id_sum"))
    }),

    // Demands = positive supplier balances (cents); budget = half of
    // total demand. Ascending-demand prefix sums give the unique break
    // index j where level = (B - prefix_j) DIV (n - j) fits between
    // d_j and d_{j+1}; allocation = min(d_i, level).
    "q446_waterfill_allocation" -> ((s, d) => {
      val dem = t(s, d, "supplier")
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"),
          floor(col("s_acctbal") * 100).cast("long").as("dd"))
        // dd >= 1: a zero demand would hit the one numerator where
        // Spark's truncating DIV and DuckDB's flooring // disagree
        .filter(col("dd") > 0)
      val wOrd = Window.orderBy(col("dd"), col("s_suppkey"))
      val ranked = graft.Stage(dem // dimension-sized window
        .withColumn("rk", row_number().over(wOrd).cast("long"))
        .withColumn("prefix", sum(col("dd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))),
        "q446_ranked")
      val tot = ranked.agg(max(col("prefix")).as("td"),
        max(col("rk")).as("n"))
      // level candidate after position j (0..n-1 uncapped below):
      // lvl_j = (B - prefix_j) DIV (n - j); valid iff d_j <= lvl_j
      // (and d_{j+1} > lvl_j for the break, enforced by taking the
      // LAST valid j). j = 0 row (nothing uncapped) handled by the
      // union'd sentinel.
      // j = 0 sentinel (nothing below the level) so a budget under the
      // smallest demand still resolves: dd = -1 passes the dd <= lvl
      // validity check for any non-negative level
      val withSentinel = ranked
        .select(col("dd"), col("rk"), col("prefix"))
        .unionByName(ranked.sparkSession.range(1).toDF("z")
          .select(lit(-1L).as("dd"), lit(0L).as("rk"),
            lit(0L).as("prefix")))
      val cand = withSentinel.crossJoin(broadcast(tot))
        .withColumn("b", expr("td DIV 2"))
        .filter(col("rk") < col("n"))
        .withColumn("lvl", expr("(b - prefix) DIV (n - rk)"))
        .filter(col("dd") <= col("lvl"))
        .orderBy(col("rk").desc).limit(1)
        .select(col("rk").as("j"), col("lvl"), col("b"), col("n"))
      ranked.crossJoin(broadcast(cand))
        .select(col("dd"), col("rk"), col("lvl"), col("b"), col("n"),
          least(col("dd"), col("lvl")).as("alloc"))
        .agg(max(col("n")).as("n_demands"),
          max(col("b")).as("budget_cents"),
          max(col("lvl")).as("level_cents"),
          sum(when(col("dd") <= col("lvl"), 1L).otherwise(0L))
            .as("n_uncapped"),
          sum(when(col("dd") > col("lvl"), 1L).otherwise(0L))
            .as("n_capped"),
          sum(col("alloc")).as("allocated_cents"))
    }),

    // Fertility per language over the documents corpus: whitespace+
    // punctuation regex token split; tokens per 1000 chars and bytes
    // per token (ppm) — one scan, one keyed aggregate.
    "q447_token_fertility" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("lang"),
        length(col("text")).as("chars"),
        octet_length(col("text")).as("bytes"),
        size(filter(split(col("text"), "[\\s\\p{Punct}]+"),
          x => length(x) > 0)).cast("long").as("tokens"))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).as("n_chars"),
          sum(col("bytes")).as("n_bytes"),
          sum(col("tokens")).as("n_tokens"))
        .withColumn("tokens_per_kchar_ppm",
          expr("1000000000 * n_tokens DIV n_chars DIV 1000"))
        .withColumn("bytes_per_token_ppm",
          expr("1000000 * n_bytes DIV n_tokens"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q445_cycle_core" -> {
      // same binary lifting, unrolled: g1 = f∘f, ..., g10 = f^1024
      val lifts = (1 to 10).map { k =>
        val prev = if (k == 1) "f" else s"g${k - 1}"
        s"g$k AS (SELECT a.u, b.v FROM $prev a JOIN $prev b ON a.v = b.u)"
      }.mkString(",\n         ")
      s"""WITH nodes AS (
           SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS u
           FROM part),
         n AS (SELECT count(*)::BIGINT AS n FROM nodes),
         f AS (SELECT u, (u * u + 1) % (SELECT n FROM n) AS v
               FROM nodes),
         $lifts,
         cyc AS (SELECT DISTINCT v FROM g10)
         SELECT (SELECT n FROM n) AS n_nodes,
                count(*)::BIGINT AS n_cyclic,
                ((SELECT n FROM n) - count(*))::BIGINT AS n_acyclic,
                sum(v)::BIGINT AS cyclic_id_sum
         FROM cyc"""
    },

    "q446_waterfill_allocation" ->
      """WITH dem AS (
           SELECT s_suppkey, floor(s_acctbal * 100)::BIGINT AS dd
           FROM supplier WHERE s_acctbal > 0
             AND floor(s_acctbal * 100) > 0),
         ranked AS (
           SELECT dd,
                  row_number() OVER (ORDER BY dd, s_suppkey)::BIGINT
                    AS rk,
                  sum(dd) OVER (ORDER BY dd, s_suppkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    ::BIGINT AS prefix
           FROM dem),
         tot AS (SELECT max(prefix)::BIGINT AS td,
                        max(rk)::BIGINT AS n FROM ranked),
         with_sentinel AS (
           SELECT dd, rk, prefix FROM ranked
           UNION ALL SELECT -1, 0, 0),
         cand AS (
           SELECT rk AS j, (td // 2 - prefix) // (n - rk) AS lvl,
                  td // 2 AS b, n
           FROM with_sentinel CROSS JOIN tot
           WHERE rk < n AND dd <= (td // 2 - prefix) // (n - rk)
           ORDER BY rk DESC LIMIT 1)
         SELECT (SELECT n FROM cand) AS n_demands,
                (SELECT b FROM cand) AS budget_cents,
                (SELECT lvl FROM cand) AS level_cents,
                sum(CASE WHEN dd <= (SELECT lvl FROM cand) THEN 1
                    ELSE 0 END)::BIGINT AS n_uncapped,
                sum(CASE WHEN dd > (SELECT lvl FROM cand) THEN 1
                    ELSE 0 END)::BIGINT AS n_capped,
                sum(least(dd, (SELECT lvl FROM cand)))::BIGINT
                  AS allocated_cents
         FROM ranked""",

    "q447_token_fertility" ->
      """WITH docs AS (
           SELECT lang, length(text)::BIGINT AS chars,
                  octet_length(encode(text))::BIGINT AS bytes,
                  len(list_filter(
                    string_split_regex(text, '[\s[:punct:]]+'),
                    x -> length(x) > 0))::BIGINT AS tokens
           FROM documents)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(chars)::BIGINT AS n_chars,
                sum(bytes)::BIGINT AS n_bytes,
                sum(tokens)::BIGINT AS n_tokens,
                (((1000000000 * sum(tokens)) // sum(chars)) // 1000)
                  ::BIGINT AS tokens_per_kchar_ppm,
                ((1000000 * sum(bytes)) // sum(tokens))::BIGINT
                  AS bytes_per_token_ppm
         FROM docs GROUP BY lang ORDER BY lang"""
  )
}

/** Round-9 batch AH (q496-q498) — symbolic series, absorbing chains,
  * and space-filling-curve layout:
  *
  *  - q496: SAX (Symbolic Aggregate approXimation) motif discovery —
  *    per-type daily revenue is z-normalized from exact integer
  *    moments, PAA-averaged into 7-day segments, mapped to a 4-letter
  *    alphabet at the Gaussian quartile breakpoints (±0.6745, 0), and
  *    the most frequent 3-segment word is reported per type. Windows
  *    run on the calendar-bounded day/segment grain only.
  *  - q497: absorbing-Markov conversion probability — from each
  *    transient event state, the probability of reaching 'purchase'
  *    before the sequence ends ('exit'), via 8 synchronous Jacobi
  *    value-iteration rounds over the |event-vocab|-bounded
  *    transition matrix (each round rounded to 1e-12 so the two
  *    engines' sum orders cannot drift a ppm boundary). The state
  *    vector is type-vocab-sized: every join is a broadcast of a
  *    handful of rows, never a corpus shuffle.
  *  - q498: space-filling-curve layout advisor — Z-order vs Hilbert
  *    vs row-major for a 2D (partkey, suppkey) key: rows land in
  *    64-wide curve-index "files", and a 2D box probe is costed by
  *    zone-map pruning (files hit, rows scanned vs matched). The
  *    Hilbert index comes from a precomputed 64k-cell curve
  *    dimension broadcast to the scan. Complements q431 (1D-vs-Z) with the
  *    curve-vs-curve decision and mirrors the reference's fragment
  *    skipping (Fragmenter/InsertOrderFragmenter.cpp zone maps).
  */
object Motifs {

  type Q = (SparkSession, String) => DataFrame

  private val BP = 0.6745 // N(0,1) quartile breakpoint

  /** Hilbert curve xy→d (textbook rotate/reflect recursion) as plain
    * Scala integer ops. An unrolled Column version of the same fold
    * grows ~5× per level (x/y re-substituted into each rotation) —
    * ~400k expression nodes at 8 bits, which stalls Catalyst
    * canonicalization for minutes. The scale-correct Spark form is a
    * precomputed curve-index DIMENSION over the fixed 2^bits × 2^bits
    * grid (65 536 rows at 8 bits — bounded by the grid, not the
    * corpus) broadcast-joined to the fact rows. */
  private def hilbertXy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate quadrant: reflect if rx==1, then swap
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The (x, y) → hilbert-d lookup dimension for a `bits`-deep curve:
    * 2^(2*bits) rows, generated driver-side (fixed grid, never
    * corpus-sized) and broadcast to the scan. */
  private def hilbertDim(s: SparkSession, bits: Int): DataFrame = {
    val n = 1 << bits
    val rows = for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong, hilbertXy2d(bits, x.toLong, y.toLong))
    s.createDataFrame(rows).toDF("x", "y", "hil")
  }

  /** Same unroll as DuckDB SQL: chained CTEs carrying hx/hy/d. */
  private def hilbertSql(bits: Int): String = {
    val steps = (0 until bits).reverse.zipWithIndex.map {
      case (i, k) =>
        val s = 1L << i
        val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
        val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
        s"""h${k + 1} AS (
           SELECT x, y, z, lin,
             d + $s * $s * (3 * $rx + $ry - 2 * $rx * $ry) AS d,
             (CASE WHEN (hy & $s) = 0 THEN
                (CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy
                 ELSE hy END)
              ELSE hx END) AS hx,
             (CASE WHEN (hy & $s) = 0 THEN
                (CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx
                 ELSE hx END)
              ELSE hy END) AS hy
           FROM h$k)"""
    }
    steps.mkString(",\n         ")
  }

  val queries: Seq[(String, Q)] = Seq(

    "q496_sax_motifs" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("rev"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("rev")).as("srev"),
          sum(col("rev").cast("decimal(38,0)") * col("rev")).as("srr"))
        .withColumn("mu", col("srev").cast("double") / col("n_days"))
        .withColumn("sd", sqrt(col("srr").cast("double") /
          col("n_days") - col("mu") * col("mu")))
      val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val segs = daily
        .withColumn("seg",
          ((row_number().over(wDay) - 1) / 7).cast("long"))
        .groupBy(col("event_type"), col("seg"))
        .agg(sum(col("rev")).as("segsum"), count(lit(1)).as("segcnt"))
        .join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("segsum").cast("double") / col("segcnt")
          - col("mu")) / col("sd"))
        .withColumn("sym",
          when(col("z") < -BP, "a").when(col("z") < 0, "b")
            .when(col("z") < BP, "c").otherwise("d"))
      val wSeg = Window.partitionBy(col("event_type")).orderBy(col("seg"))
      val words = segs
        .withColumn("w", concat(col("sym"),
          lead(col("sym"), 1).over(wSeg),
          lead(col("sym"), 2).over(wSeg)))
        .filter(col("w").isNotNull && length(col("w")) === 3)
        .groupBy(col("event_type"), col("w"))
        .agg(count(lit(1)).as("cnt"))
      val wTop = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("w")) // alphabet^3-bounded
      words.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") === 1)
        .join(broadcast(stats.select(col("event_type"), col("n_days"))),
          Seq("event_type"))
        .select(col("event_type"), col("n_days"),
          col("w").as("top_word"), col("cnt").as("top_count"))
        .orderBy(col("event_type"))
    }),

    "q497_absorbing_markov" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("src"))
        .withColumn("dst",
          coalesce(lead(col("src"), 1).over(wU), lit("exit")))
        .filter(col("src") =!= "purchase") // purchase absorbs
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      // 8 Jacobi rounds over the vocab-bounded vector, each rounded to
      // 1e-12 so sum order can't drift a boundary. METADATA-scale after
      // the (src,dst,cnt) aggregate (≤|types|² rows): collect the matrix
      // and solve locally (the q577/q528 driver-side Jacobi idiom). The
      // previous 8 chained DataFrame rounds re-embedded the events
      // window+aggregate subtree once per round — ~9 corpus passes in
      // one plan; this is one.
      val rows = graft.Bounded.collectCapped(trans, 4096,
          "q497 event-type transition matrix (≤|types|² rows)")
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      def r12(x: Double): Double =
        new java.math.BigDecimal(java.lang.Double.toString(x))
          .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
      val totals: Map[String, Long] =
        rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p = rows.map { case (src, dst, cnt) =>
        (src, dst, cnt.toDouble / totals(src)) }
      val absorbing = Map("purchase" -> 1.0, "exit" -> 0.0)
      // `vec = stepped ++ absorbing` overwrites any computed entry for
      // the absorbing states, where the old unionByName (and the
      // oracle's UNION ALL) kept duplicate rows. Equivalent ONLY while
      // no real event_type is literally 'exit' (it is synthetic — the
      // lead() default). Assert it so a domain change fails loudly
      // instead of silently diverging from the oracle (round-13
      // ADVICE).
      require(!totals.contains("exit"),
        "q497: event_type domain contains literal 'exit', which " +
          "collides with the synthetic absorbing state")
      var vec: Map[String, Double] =
        totals.keys.map(_ -> 0.0).toMap ++ absorbing
      for (_ <- 1 to 8) {
        // mirror the join+groupBy exactly: rows whose dst is absent
        // from the current vector contribute no group at all
        val stepped = p.filter { case (_, dst, _) => vec.contains(dst) }
          .groupBy(_._1).view.mapValues { g =>
            r12(g.map { case (_, dst, prob) => prob * vec(dst) }.sum)
          }.toMap
        vec = stepped ++ absorbing
      }
      val out = vec.toSeq.collect {
        case (state, pv)
            if state != "purchase" && state != "exit" &&
              totals.contains(state) =>
          (state, totals(state), math.floor(pv * 1e6).toLong)
      }.sortBy(_._1)
      s.createDataFrame(out)
        .toDF("start_state", "n_transitions", "p_convert_ppm")
        .orderBy(col("start_state"))
    }),

    "q498_curve_layout_advisor" -> ((s, d) => {
      val dims = t(s, d, "lineitem").select(
        (col("l_partkey") % 256).cast("long").as("x"),
        (col("l_suppkey") % 256).cast("long").as("y"))
      val laid = dims
        .join(broadcast(hilbertDim(s, 8)), Seq("x", "y"))
        .withColumn("z", expr((0 until 8).map { i =>
          s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})"
        }.mkString(" + ")).cast("long"))
        .withColumn("lin", col("x") * 256 + col("y"))
      // probe: x in [40,80] AND y in [100,140]
      def layout(name: String, fileOf: Column): DataFrame =
        laid.groupBy(fileOf.as("file"))
          .agg(count(lit(1)).as("nrows"),
            min(col("x")).as("lox"), max(col("x")).as("hix"),
            min(col("y")).as("loy"), max(col("y")).as("hiy"),
            sum(when(col("x").between(40, 80) &&
              col("y").between(100, 140), 1L).otherwise(0L)).as("m"))
          .withColumn("layout", lit(name))
      val files = layout("hilbert", expr("hil DIV 64"))
        .unionByName(layout("zorder", expr("z DIV 64")))
        .unionByName(layout("rowmajor", expr("lin DIV 64")))
      files.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("nrows")).as("rows_total"),
          sum(when(col("hix") >= 40 && col("lox") <= 80 &&
            col("hiy") >= 100 && col("loy") <= 140, 1L).otherwise(0L))
            .as("files_hit"),
          sum(when(col("hix") >= 40 && col("lox") <= 80 &&
            col("hiy") >= 100 && col("loy") <= 140, col("nrows"))
            .otherwise(0L)).as("rows_scanned"),
          sum(col("m")).as("rows_matched"))
        .orderBy(col("layout"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q496_sax_motifs" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS rev
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, count(*)::BIGINT AS n_days,
                  sum(rev)::BIGINT AS srev,
                  sum(rev::HUGEINT * rev) AS srr
           FROM daily GROUP BY event_type),
         st2 AS (
           SELECT event_type, n_days,
                  CAST(srev AS DOUBLE) / n_days AS mu,
                  sqrt(CAST(srr AS DOUBLE) / n_days
                    - (CAST(srev AS DOUBLE) / n_days)
                      * (CAST(srev AS DOUBLE) / n_days)) AS sd
           FROM stats),
         segs AS (
           SELECT event_type,
                  ((row_number() OVER (PARTITION BY event_type
                     ORDER BY day) - 1) // 7)::BIGINT AS seg,
                  rev
           FROM daily),
         paa AS (
           SELECT s.event_type, s.seg,
                  sum(s.rev)::BIGINT AS segsum,
                  count(*)::BIGINT AS segcnt
           FROM segs s GROUP BY s.event_type, s.seg),
         zs AS (
           SELECT p.event_type, p.seg,
                  (CAST(p.segsum AS DOUBLE) / p.segcnt - t.mu) / t.sd
                    AS z
           FROM paa p JOIN st2 t ON p.event_type = t.event_type),
         sym AS (
           SELECT event_type, seg,
                  CASE WHEN z < -0.6745 THEN 'a'
                       WHEN z < 0 THEN 'b'
                       WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
           FROM zs),
         words AS (
           SELECT event_type,
                  sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w
                    AS w
           FROM sym
           WINDOW w AS (PARTITION BY event_type ORDER BY seg)),
         wc AS (
           SELECT event_type, w, count(*)::BIGINT AS cnt
           FROM words WHERE w IS NOT NULL AND length(w) = 3
           GROUP BY event_type, w),
         top AS (
           SELECT event_type, w, cnt,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY cnt DESC, w) AS rk
           FROM wc)
         SELECT t.event_type, s.n_days, t.w AS top_word,
                t.cnt AS top_count
         FROM top t JOIN st2 s ON t.event_type = s.event_type
         WHERE t.rk = 1
         ORDER BY t.event_type""",

    "q497_absorbing_markov" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS (
           SELECT t.src AS state,
                  round(sum(t.prob * p.pv), 12) AS pv
           FROM tr t JOIN p${k - 1} p ON t.dst = p.state
           GROUP BY t.src
           UNION ALL SELECT 'purchase', 1.0
           UNION ALL SELECT 'exit', 0.0)"""
      }.mkString(",\n         ")
      s"""WITH seq AS (
           SELECT event_type AS src,
                  coalesce(lead(event_type, 1) OVER (
                    PARTITION BY user_id
                    ORDER BY ts::TIMESTAMP, event_id), 'exit') AS dst
           FROM events),
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
         p0 AS (
           SELECT DISTINCT src AS state, 0.0 AS pv FROM tr
           UNION ALL SELECT 'purchase', 1.0
           UNION ALL SELECT 'exit', 0.0),
         $rounds
         SELECT p.state AS start_state, t.tot AS n_transitions,
                floor(p.pv * 1e6)::BIGINT AS p_convert_ppm
         FROM p8 p JOIN tot t ON p.state = t.src
         WHERE p.state NOT IN ('purchase', 'exit')
         ORDER BY start_state"""
    },

    "q498_curve_layout_advisor" -> {
      val mortonSql = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})"
      }.mkString(" + ")
      s"""WITH dims AS (
           SELECT (l_partkey % 256)::BIGINT AS x,
                  (l_suppkey % 256)::BIGINT AS y
           FROM lineitem),
         h0 AS (
           SELECT x, y, x AS hx, y AS hy, 0::BIGINT AS d,
                  ($mortonSql)::BIGINT AS z,
                  (x * 256 + y)::BIGINT AS lin
           FROM dims),
         ${hilbertSql(8)},
         laid AS (
           SELECT x, y, d AS hil, z, lin FROM h8),
         f AS (
           SELECT 'hilbert' AS layout, hil // 64 AS file, x, y
           FROM laid
           UNION ALL
           SELECT 'zorder', z // 64, x, y FROM laid
           UNION ALL
           SELECT 'rowmajor', lin // 64, x, y FROM laid),
         files AS (
           SELECT layout, file, count(*)::BIGINT AS nrows,
                  min(x) AS lox, max(x) AS hix,
                  min(y) AS loy, max(y) AS hiy,
                  sum(CASE WHEN x BETWEEN 40 AND 80
                            AND y BETWEEN 100 AND 140 THEN 1
                      ELSE 0 END)::BIGINT AS m
           FROM f GROUP BY layout, file)
         SELECT layout, count(*)::BIGINT AS n_files,
                sum(nrows)::BIGINT AS rows_total,
                sum(CASE WHEN hix >= 40 AND lox <= 80
                          AND hiy >= 100 AND loy <= 140 THEN 1
                    ELSE 0 END)::BIGINT AS files_hit,
                sum(CASE WHEN hix >= 40 AND lox <= 80
                          AND hiy >= 100 AND loy <= 140 THEN nrows
                    ELSE 0 END)::BIGINT AS rows_scanned,
                sum(m)::BIGINT AS rows_matched
         FROM files GROUP BY layout ORDER BY layout"""
    }
  )
}


/** Round-9 batch BC (q559-q561) — community quality, survival
  * hazards, and cluster prototypes (public algorithms: Newman-Girvan
  * modularity [Newman 2006], the Nelson-Aalen cumulative-hazard
  * estimator [Nelson 1972, Aalen 1978], and the k-medoids prototype
  * step [Kaufman-Rousseeuw 1987]; reference surface: graph and
  * survival UDTF families).
  *
  *  - q559: modularity of a 4-round min-label partition over the
  *    weighted category co-occurrence graph. Label propagation is 4
  *    bounded min-joins (the q558 truncation discipline); per-
  *    community Q_c = (Σ_in·2m − Σ_tot²)/(2m)² lands in integer ppm
  *    via DECIMAL/HUGEINT cross-multiplication, and the global Q is
  *    the exact integer sum of the per-community floors.
  *  - q560: Nelson-Aalen cumulative hazard for signup→purchase
  *    conversion, right-censored at the observation horizon. The risk
  *    set is derived from a DAY-GRAIN duration histogram (n_risk(t) =
  *    total − cum(durations < t)) so no per-user window ever forms —
  *    the 100 TB shape; the hazard steps and their running sum are
  *    exact integer ppm on a calendar-bounded grain.
  *  - q561: per-cluster medoid over the embeddings table — the
  *    member maximizing the integer sum of pairwise cosine-micros
  *    (each cosine floor(·1e6 + 0.5) in the repo's bit-reproducible
  *    dot/sqrt shape from q202). Round-10: the all-pairs join (and
  *    its round-9 1024-member truncation cap) is replaced by the
  *    EXACT linear identity Σ_j cos(i,j) = u_i·S − 1 with
  *    S = Σ_j x_j/‖x_j‖ — each unit vector is quantized to integer
  *    micros so the per-cluster dimension sums (and hence the
  *    candidate ranking) are exact integers, identical in any
  *    engine/order; the top-8 candidates per cluster then get the
  *    integer pair statistic against ALL members (8·n pairs, linear),
  *    so membership never truncates. The only gap vs brute force is
  *    pair-level rounding (≤0.5 µ per pair) flipping a near-tie
  *    between candidates ranked by the exact double identity.
  */
object Communities {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q559_partition_modularity" -> ((s, d) => {
      val basket = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % 100).cast("long").as("item"))
        .distinct()
      val up = basket.as("a").join(basket.as("b"),
          col("a.ok") === col("b.ok")
            && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).as("c"))
      // top-300 heaviest pairs — same scale-independent edge rule as
      // q558 (a relative threshold degenerates at sf0.1)
      val wP = Window.orderBy(col("c").desc, col("i"), col("j"))
      val strongUp = up.withColumn("pr", row_number().over(wP))
        .filter(col("pr") <= 300)
        .select(col("i"), col("j"), col("c"))
      // Round-14 (VERDICT r13 #5): the edge list is capped at 300
      // pairs BY CONSTRUCTION (the top-300 window above), and every
      // step after it — 4 min-label rounds, the modularity sums, the
      // ppm cross-multiplication — is exact integer arithmetic over
      // that bounded frame. The 4 distributed propagation rounds with
      // their localCheckpoints were pure scheduler latency (the
      // q528/q497 driver-side idiom, with zero float ambiguity here).
      // One corpus pass (basket self-join + window) stays distributed;
      // the guarded collect keeps a distributed fallback for an
      // over-cap edge rule change.
      graft.Bounded.collectBounded(strongUp, 4096) match {
        case Some(upRows) =>
          val up = upRows
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          val em = up ++ up.map(t => (t._2, t._1, t._3)) // symmetric
          val deg = em.groupBy(_._1).view
            .mapValues(_.map(_._3).sum).toMap
          var lab: Map[Long, Long] = deg.keys.map(v => v -> v).toMap
          for (_ <- 1 to 4) {
            // mirror the join+groupBy: min neighbor label per i, then
            // least(own, coalesce(neighbor-min, own))
            val nb = em.groupBy(_._1).view
              .mapValues(_.map(e => lab(e._2)).min).toMap
            lab = lab.map { case (v, lb) =>
              v -> math.min(lb, nb.getOrElse(v, lb)) }
          }
          val m2 = em.map(_._3).sum // = 2m (symmetric)
          val sinM = em.filter(e => lab(e._1) == lab(e._2))
            .groupBy(e => lab(e._1)).view
            .mapValues(_.map(_._3).sum).toMap
          val stotM = deg.toSeq.groupBy { case (v, _) => lab(v) }.view
            .mapValues(ds => (ds.map(_._2).sum, ds.size.toLong)).toMap
          // DECIMAL(38,0) cross-multiplication with truncating DIV —
          // BigInt./ truncates toward zero exactly like Spark's
          // IntegralDivide on decimals
          val per = stotM.toSeq.map { case (comm, (stot, nNodes)) =>
            val sin = sinM.getOrElse(comm, 0L)
            val qPpm = ((BigInt(sin) * m2 - BigInt(stot) * stot)
              * 1000000 / (BigInt(m2) * m2)).toLong
            (comm, nNodes, sin, stot, qPpm)
          }.sortBy(_._1)
          val total = (-1L, per.map(_._2).sum, per.map(_._3).sum,
            per.map(_._4).sum, per.map(_._5).sum)
          s.createDataFrame(per :+ total)
            .toDF("comm", "n_nodes", "sin", "stot", "q_ppm")
            .orderBy(col("comm"))
        case None =>
          val edges = graft.Stage(strongUp.unionByName(
            strongUp.select(col("j").as("i"), col("i").as("j"),
              col("c"))), "q559_edges")
          val deg = edges.groupBy(col("i").as("v"))
            .agg(sum(col("c")).as("dg"))
          var lab = deg.select(col("v"), col("v").as("lb"))
            .localCheckpoint(true)
          for (_ <- 1 to 4) {
            // lab/nb are node-bounded (≤|items| rows) — broadcast both
            // sides of the propagation so each round is map-side
            val nb = edges.join(broadcast(lab), edges("j") === lab("v"))
              .groupBy(edges("i").as("u"))
              .agg(min(col("lb")).as("nlb"))
            lab = lab.join(broadcast(nb), lab("v") === nb("u"), "left")
              .select(col("v"),
                least(col("lb"), coalesce(col("nlb"), col("lb")))
                  .as("lb"))
              .localCheckpoint(true) // node-bounded rows, cut lineage
          }
          val m2 = edges.agg(sum(col("c")).as("m2")) // = 2m (symmetric)
          val sin = edges
            .join(lab.select(col("v").as("i"), col("lb").as("li")),
              Seq("i"))
            .join(lab.select(col("v").as("j"), col("lb").as("lj")),
              Seq("j"))
            .filter(col("li") === col("lj"))
            .groupBy(col("li").as("comm"))
            .agg(sum(col("c")).as("sin"))
          val stot = deg.join(lab, Seq("v"))
            .groupBy(col("lb").as("comm"))
            .agg(sum(col("dg")).as("stot"), count(lit(1)).as("n_nodes"))
          val per = stot.join(sin, Seq("comm"), "left")
            .na.fill(0L, Seq("sin"))
            .crossJoin(broadcast(m2))
            .select(col("comm"), col("n_nodes"), col("sin"), col("stot"),
              expr("""CAST((CAST(sin AS DECIMAL(38,0)) * m2
                      - CAST(stot AS DECIMAL(38,0)) * stot) * 1000000
                      DIV (CAST(m2 AS DECIMAL(38,0)) * m2) AS BIGINT)""")
                .as("q_ppm"))
          val total = per.agg(sum(col("q_ppm")).as("q_ppm"),
            sum(col("n_nodes")).as("n_nodes"),
            sum(col("sin")).as("sin"), sum(col("stot")).as("stot"))
            .select(lit(-1L).as("comm"), col("n_nodes"), col("sin"),
              col("stot"), col("q_ppm"))
          per.unionByName(total)
            .orderBy(col("comm"))
      }
    }),

    "q560_nelson_aalen" -> ((s, d) => {
      val days = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
      val horizon = days.agg(max(col("day")).as("hz"))
      val su = days.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("sd"))
      val pu = days.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("day") >= col("sd"))
        .groupBy(col("user_id")).agg(min(col("day")).as("pd"))
      val durs = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("pd").isNotNull, col("pd") - col("sd"))
            .otherwise(col("hz") - col("sd")).as("dur"),
          when(col("pd").isNotNull, 1L).otherwise(0L).as("ev"))
      // day-grain histogram: risk sets via cumulative counts, never a
      // per-user window
      val hist = graft.Stage(durs.groupBy(col("dur"))
        .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d_at")),
        "q560_hist")
      val tot = hist.agg(sum(col("n_at")).as("n_total"))
      val wv = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wc = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - coalesce(sum(col("n_at")).over(wv),
            lit(0L)))
        .filter(col("d_at") > 0)
        .withColumn("h_step_ppm",
          expr("d_at * 1000000 DIV n_risk"))
        .withColumn("cum_hazard_ppm", sum(col("h_step_ppm")).over(wc))
        .select(col("dur").as("t_days"), col("n_risk"),
          col("d_at").as("d_events"), col("h_step_ppm"),
          col("cum_hazard_ppm"))
        .orderBy(col("t_days"))
    }),

    "q561_cluster_medoid" -> ((s, d) => {
      def dotp(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), _ + _)
      // Phase 1 — candidate generation via the exact linear identity
      // Σ_j cos(i,j) = u_i·S − 1 (u = x/‖x‖, S = Σ u_j): quantize u
      // to integer micros element-wise (one double div/sqrt per
      // element — deterministic IEEE, no cross-row float sums), so S
      // and every candidate score are exact integers in both engines.
      val vecs = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("x"))
        .withColumn("n2",
          aggregate(transform(col("x"), a => a * a), lit(0.0), _ + _))
      val vstage = graft.Stage(vecs.withColumn("q", expr(
        """transform(x, v ->
           CAST(floor(v / sqrt(n2) * 1000000 + 0.5) AS BIGINT))""")),
        "q561_vecs")
      // per-label per-dimension integer sums — order-independent
      val sq = vstage
        .select(col("label"), posexplode(col("q")).as(Seq("pos", "qd")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("qd")).as("sv"))
        .groupBy(col("label"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, sv))), t -> t.sv)")
          .as("sq"))
      // candidate score dot(q_i, S) in DECIMAL(38,0): q ≤ 1e6/dim but
      // S grows with cluster size — int64 dies past ~1e11 members
      val wC = Window.partitionBy(col("label"))
        .orderBy(col("cscore").desc, col("vec_id"))
      val cands = vstage.join(broadcast(sq), Seq("label"))
        .withColumn("cscore", expr(
          """aggregate(zip_with(q, sq,
             (a, b) -> CAST(a AS DECIMAL(38,0)) * b),
             CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v)"""))
        .withColumn("cr", row_number().over(wC))
        .filter(col("cr") <= 8)
        .select(col("label"), col("vec_id").as("ia"),
          col("x").as("xa"), col("n2").as("na"))
      // Phase 2 — exact integer pair statistic, candidates × ALL
      // members: 8·n pairs per cluster (linear), no truncation
      val b = vstage.select(col("label"), col("vec_id").as("ib"),
        col("x").as("xb"), col("n2").as("nb"))
      val sums = cands.join(b, Seq("label"))
        .filter(col("ia") =!= col("ib"))
        .select(col("label"), col("ia"),
          floor(dotp(col("xa"), col("xb"))
            / sqrt(col("na") * col("nb")) * 1e6 + 0.5)
            .cast("long").as("cm"))
        .groupBy(col("label"), col("ia"))
        .agg(sum(col("cm")).as("sum_cos_micro"),
          count(lit(1)).as("n_others"))
      val wL = Window.partitionBy(col("label"))
        .orderBy(col("sum_cos_micro").desc, col("ia"))
      sums.withColumn("rn", row_number().over(wL))
        .filter(col("rn") === 1)
        .select(col("label").cast("long").as("label"),
          col("ia").as("medoid_vec_id"), col("sum_cos_micro"),
          (col("n_others") + 1L).as("n_members"))
        .orderBy(col("label"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q559_partition_modularity" -> {
      val rounds = (1 to 4).map { k =>
        s"""l$k AS (
           SELECT l.v,
                  least(l.lb, coalesce(nb.nlb, l.lb)) AS lb
           FROM l${k - 1} l LEFT JOIN (
             SELECT e.i AS u, min(p.lb) AS nlb
             FROM edges e JOIN l${k - 1} p ON e.j = p.v
             GROUP BY e.i) nb ON l.v = nb.u)"""
      }.mkString(",\n         ")
      s"""WITH basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 100)::BIGINT AS item
           FROM lineitem),
         up AS (
           SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS c
           FROM basket a JOIN basket b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY 1, 2),
         sup AS (
           SELECT i, j, c FROM (
             SELECT i, j, c,
                    row_number() OVER (ORDER BY c DESC, i, j) AS pr
             FROM up)
           WHERE pr <= 300),
         edges AS (
           SELECT i, j, c FROM sup
           UNION ALL SELECT j, i, c FROM sup),
         deg AS (
           SELECT i AS v, sum(c)::BIGINT AS dg FROM edges
           GROUP BY i),
         l0 AS (SELECT v, v AS lb FROM deg),
         $rounds,
         m2 AS (SELECT sum(c)::BIGINT AS m2 FROM edges),
         sin AS (
           SELECT li.lb AS comm, sum(e.c)::BIGINT AS sin
           FROM edges e
           JOIN l4 li ON e.i = li.v
           JOIN l4 lj ON e.j = lj.v
           WHERE li.lb = lj.lb GROUP BY li.lb),
         stot AS (
           SELECT l.lb AS comm, sum(d.dg)::BIGINT AS stot,
                  count(*)::BIGINT AS n_nodes
           FROM deg d JOIN l4 l ON d.v = l.v GROUP BY l.lb),
         per AS (
           SELECT st.comm, st.n_nodes,
                  coalesce(si.sin, 0)::BIGINT AS sin, st.stot,
                  ((coalesce(si.sin, 0)::HUGEINT * m.m2
                    - st.stot::HUGEINT * st.stot) * 1000000
                    // (m.m2::HUGEINT * m.m2))::BIGINT AS q_ppm
           FROM stot st LEFT JOIN sin si ON st.comm = si.comm, m2 m),
         tot AS (
           SELECT -1::BIGINT AS comm, sum(n_nodes)::BIGINT AS n_nodes,
                  sum(sin)::BIGINT AS sin, sum(stot)::BIGINT AS stot,
                  sum(q_ppm)::BIGINT AS q_ppm
           FROM per)
         SELECT comm, n_nodes, sin, stot, q_ppm FROM per
         UNION ALL SELECT comm, n_nodes, sin, stot, q_ppm FROM tot
         ORDER BY comm"""
    },

    "q560_nelson_aalen" ->
      """WITH days AS (
           SELECT user_id, event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day
           FROM events),
         hz AS (SELECT max(day) AS hz FROM days),
         su AS (
           SELECT user_id, min(day) AS sd FROM days
           WHERE event_type = 'signup' GROUP BY user_id),
         pu AS (
           SELECT d.user_id, min(d.day) AS pd
           FROM days d JOIN su s ON d.user_id = s.user_id
           WHERE d.event_type = 'purchase' AND d.day >= s.sd
           GROUP BY d.user_id),
         durs AS (
           SELECT s.user_id,
                  CASE WHEN p.pd IS NOT NULL THEN p.pd - s.sd
                       ELSE h.hz - s.sd END AS dur,
                  CASE WHEN p.pd IS NOT NULL THEN 1
                       ELSE 0 END::BIGINT AS ev
           FROM su s LEFT JOIN pu p ON s.user_id = p.user_id, hz h),
         hist AS (
           SELECT dur, count(*)::BIGINT AS n_at,
                  sum(ev)::BIGINT AS d_at
           FROM durs GROUP BY dur),
         tot AS (SELECT sum(n_at)::BIGINT AS n_total FROM hist),
         risk AS (
           SELECT h.dur, h.n_at, h.d_at,
                  t.n_total - coalesce(sum(h.n_at) OVER (
                    ORDER BY h.dur
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS n_risk
           FROM hist h, tot t),
         steps AS (
           SELECT dur AS t_days, n_risk::BIGINT AS n_risk,
                  d_at AS d_events,
                  (d_at * 1000000 // n_risk)::BIGINT AS h_step_ppm
           FROM risk WHERE d_at > 0)
         SELECT t_days, n_risk, d_events, h_step_ppm,
                (sum(h_step_ppm) OVER (ORDER BY t_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  ::BIGINT AS cum_hazard_ppm
         FROM steps ORDER BY t_days""",

    "q561_cluster_medoid" ->
      """WITH normed AS (
           SELECT vec_id, label,
                  list_transform(embedding, e -> CAST(e AS DOUBLE))
                    AS x,
                  list_aggregate(list_transform(
                    list_transform(embedding, e -> CAST(e AS DOUBLE)),
                    a -> a * a), 'sum') AS n2
           FROM embeddings),
         qv AS (
           SELECT vec_id, label, x, n2,
                  list_transform(x, v ->
                    floor(v / sqrt(n2) * 1000000 + 0.5)::BIGINT) AS q
           FROM normed),
         dims AS (
           SELECT label, r.range AS i,
                  sum(q[r.range::INT])::BIGINT AS sv
           FROM qv, range(1, 65) r
           GROUP BY label, r.range),
         sq AS (
           SELECT label, list(sv ORDER BY i) AS sq FROM dims
           GROUP BY label),
         cand0 AS (
           SELECT v.vec_id, v.label, v.x, v.n2,
                  list_sum(list_transform(list_zip(v.q, s.sq),
                    z -> z[1]::HUGEINT * z[2])) AS cscore
           FROM qv v JOIN sq s ON v.label = s.label),
         cands AS (
           SELECT label, vec_id AS ia, x AS xa, n2 AS na FROM (
             SELECT *, row_number() OVER (PARTITION BY label
                      ORDER BY cscore DESC, vec_id) AS cr
             FROM cand0)
           WHERE cr <= 8),
         sums AS (
           SELECT c.label, c.ia,
                  sum(floor(
                    list_aggregate(list_transform(list_zip(c.xa, b.x),
                      z -> z[1] * z[2]), 'sum')
                    / sqrt(c.na * b.n2) * 1e6 + 0.5)::BIGINT)
                    ::BIGINT AS sum_cos_micro,
                  count(*)::BIGINT AS n_others
           FROM cands c JOIN normed b
             ON c.label = b.label AND c.ia <> b.vec_id
           GROUP BY c.label, c.ia),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY label
                    ORDER BY sum_cos_micro DESC, ia) AS rn
           FROM sums)
         SELECT label::BIGINT AS label, ia AS medoid_vec_id,
                sum_cos_micro, (n_others + 1)::BIGINT AS n_members
         FROM ranked WHERE rn = 1 ORDER BY label"""
  )
}


/** Round-9 batch W (q463-q465) — retrieval + ops surfaces:
  *
  *  - q463: positional phrase search — the exact-phrase sibling of
  *    q364's boolean retrieval. A positional posting list
  *    (doc_id, pos, tok) is filtered to the TWO query terms before
  *    any join (postings for other terms never shuffle), then
  *    adjacency is a self-join on (doc_id, pos+1). At 100 TB the
  *    join input is |postings(term1)| + |postings(term2)|, not the
  *    corpus.
  *  - q464: exponentially-decayed heavy hitters — per-user activity
  *    mass with a 7-day half-life anchored at the corpus horizon
  *    (weight = 2^(-age_days/7)), top-20. One keyed aggregate; the
  *    rank window is over the 20-row candidate set after a
  *    micro-quantized TakeOrdered-style cut.
  *  - q465: CIDR longest-prefix-match join — synthetic ip per user
  *    (Knuth multiplicative hash), a 10-block literal CIDR dim
  *    (8 covering /4s + 2 narrower overlapping blocks), broadcast
  *    range-join ip BETWEEN [start, end], longest prefix wins per
  *    ip via a max-struct aggregate (no window over the fact side).
  */
object NetworkFlows {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q463_phrase_search" -> ((s, d) => {
      // cheap containment pre-filter BEFORE tokenizing: a doc without
      // both literal terms cannot contain the phrase, so the explode
      // only runs on candidate docs (4.3x sf1 wall without this)
      val toks = t(s, d, "documents")
        .filter(lower(col("text")).contains("table") &&
          lower(col("text")).contains("hash"))
        .select(col("doc_id"), posexplode(split(regexp_replace(
          trim(lower(col("text"))), "[^a-z0-9 ]", ""), " +")))
        .toDF("doc_id", "pos", "tok")
        .filter(col("tok").isin("table", "hash"))
      val a = toks.filter(col("tok") === "table")
        .select(col("doc_id"), col("pos"))
      val b = toks.filter(col("tok") === "hash")
        .select(col("doc_id").as("doc_id_b"), col("pos").as("pos_b"))
      a.join(b, col("doc_id") === col("doc_id_b") &&
          col("pos_b") === col("pos") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("pos")).cast("long").as("first_pos"))
        .orderBy(col("n_occurrences").desc, col("doc_id"))
        .limit(20)
    }),

    "q464_decayed_heavy_hitters" -> ((s, d) => {
      val ev = t(s, d, "events")
      val hz = ev.agg(max(col("ts")).as("hmax"))
      val mass = ev.crossJoin(broadcast(hz))
        .withColumn("age_days",
          (unix_timestamp(col("hmax")) - unix_timestamp(col("ts"))) /
            lit(86400.0))
        .withColumn("w", pow(lit(0.5), col("age_days") / lit(7.0)))
        .groupBy(col("user_id"))
        .agg(floor(sum(col("w")) * 1000000).cast("long")
            .as("decayed_micro"),
          count(lit(1)).as("n_events"))
      // 20-row candidate set -> the rank window is bounded
      val top = mass.orderBy(col("decayed_micro").desc, col("user_id"))
        .limit(20)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("decayed_micro").desc, col("user_id"))))
        .select(col("rk"), col("user_id"), col("decayed_micro"),
          col("n_events"))
        .orderBy(col("rk"))
    }),

    "q465_cidr_lpm_join" -> ((s, d) => {
      import s.implicits._
      // 8 covering /4 blocks + 2 narrower overlapping blocks: LPM
      // must route the overlap to the more specific prefix
      val covering = (0L until 8L).map { k =>
        (f"blk_${k}%02d", k * 536870912L, (k + 1) * 536870912L - 1, 4)
      }
      val specific = Seq(
        ("blk_fine_a", 536870912L, 536870912L + 16777215L, 8),
        ("blk_fine_b", 3221225472L, 3221225472L + 1048575L, 12))
      val cidr = (covering ++ specific)
        .toDF("block", "ip_start", "ip_end", "prefix_len")
      // pre-aggregate the fact side per user BEFORE the range join:
      // the join input is |users|, not |events|
      val ips = t(s, d, "events")
        .groupBy(col("user_id"))
        // exact integer cents per event before the sum: double
        // summation order is engine-dependent at the ulp
        .agg(sum(floor(col("value") * 100).cast("long")).as("traffic"),
          count(lit(1)).as("n_events"))
        .withColumn("ip",
          pmod(col("user_id") * lit(2654435761L), lit(4294967296L)))
      // broadcast range join, then longest-prefix via max-struct
      ips.join(broadcast(cidr),
          col("ip") >= col("ip_start") && col("ip") <= col("ip_end"))
        .groupBy(col("user_id"), col("ip"), col("traffic"),
          col("n_events"))
        .agg(max(struct(col("prefix_len"), col("block"))).as("m"))
        .select(col("ip"), col("m.block").as("block"), col("traffic"),
          col("n_events"))
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n_ips"),
          sum(col("n_events")).as("n_events"),
          sum(col("traffic")).as("traffic_cents"))
        .orderBy(col("block"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q463_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(regexp_replace(
                    trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +'))
                    AS tok,
                  generate_subscripts(string_split_regex(regexp_replace(
                    trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +'), 1)
                    - 1 AS pos
           FROM documents),
         a AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
         b AS (SELECT doc_id, pos FROM toks WHERE tok = 'hash')
         SELECT a.doc_id, count(*)::BIGINT AS n_occurrences,
                min(a.pos)::BIGINT AS first_pos
         FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         GROUP BY a.doc_id
         ORDER BY n_occurrences DESC, a.doc_id
         LIMIT 20""",

    "q464_decayed_heavy_hitters" ->
      """WITH hz AS (SELECT max(ts::TIMESTAMP) AS hmax FROM events),
         mass AS (
           -- floor(epoch) on BOTH operands: Spark's unix_timestamp
           -- truncates sub-second parts, DuckDB's epoch keeps them
           SELECT user_id,
                  floor(sum(pow(0.5,
                      (floor(epoch((SELECT hmax FROM hz)))
                       - floor(epoch(ts::TIMESTAMP))) / 86400.0 / 7.0))
                    * 1000000)::BIGINT AS decayed_micro,
                  count(*)::BIGINT AS n_events
           FROM events GROUP BY user_id),
         top AS (
           SELECT * FROM mass
           ORDER BY decayed_micro DESC, user_id LIMIT 20)
         SELECT row_number() OVER (ORDER BY decayed_micro DESC, user_id)
                  AS rk,
                user_id, decayed_micro, n_events
         FROM top ORDER BY rk""",

    "q465_cidr_lpm_join" ->
      """WITH cidr AS (
           SELECT * FROM (VALUES
             ('blk_00', 0::BIGINT, 536870911::BIGINT, 4),
             ('blk_01', 536870912::BIGINT, 1073741823::BIGINT, 4),
             ('blk_02', 1073741824::BIGINT, 1610612735::BIGINT, 4),
             ('blk_03', 1610612736::BIGINT, 2147483647::BIGINT, 4),
             ('blk_04', 2147483648::BIGINT, 2684354559::BIGINT, 4),
             ('blk_05', 2684354560::BIGINT, 3221225471::BIGINT, 4),
             ('blk_06', 3221225472::BIGINT, 3758096383::BIGINT, 4),
             ('blk_07', 3758096384::BIGINT, 4294967295::BIGINT, 4),
             ('blk_fine_a', 536870912::BIGINT, 553648127::BIGINT, 8),
             ('blk_fine_b', 3221225472::BIGINT, 3222274047::BIGINT, 12))
             t(block, ip_start, ip_end, prefix_len)),
         ips AS (
           SELECT user_id,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS traffic,
                  count(*)::BIGINT AS n_events,
                  ((user_id * 2654435761) % 4294967296
                   + 4294967296) % 4294967296 AS ip
           FROM events GROUP BY user_id),
         routed AS (
           SELECT user_id, ip, traffic, n_events,
                  max(struct_pack(prefix_len := prefix_len,
                                  block := block)) AS m
           FROM ips JOIN cidr
             ON ip >= ip_start AND ip <= ip_end
           GROUP BY user_id, ip, traffic, n_events)
         SELECT m.block AS block, count(*)::BIGINT AS n_ips,
                sum(n_events)::BIGINT AS n_events,
                sum(traffic)::BIGINT AS traffic_cents
         FROM routed
         GROUP BY m.block
         ORDER BY block"""
  )
}
