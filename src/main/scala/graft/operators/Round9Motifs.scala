package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

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
object Round9Motifs {

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
      val totals = trans.groupBy(col("src"))
        .agg(sum(col("cnt")).as("tot"))
      val p = trans.join(broadcast(totals), Seq("src"))
        .withColumn("prob", col("cnt").cast("double") / col("tot"))
        .select(col("src"), col("dst"), col("prob"))
      // 8 Jacobi rounds over the vocab-bounded vector; each round
      // rounded to 1e-12 so engine sum order can't drift a boundary
      val absorbing = p.sparkSession.createDataFrame(Seq(
        ("purchase", 1.0), ("exit", 0.0))).toDF("state", "pv")
      var vec = p.select(col("src").as("state")).distinct()
        .select(col("state"), lit(0.0).as("pv"))
        .unionByName(absorbing)
      for (_ <- 1 to 8) {
        val stepped = p.join(broadcast(vec),
            p("dst") === vec("state"))
          .groupBy(col("src"))
          .agg(round(sum(col("prob") * col("pv")), 12).as("pv"))
          .select(col("src").as("state"), col("pv"))
        vec = stepped.unionByName(absorbing)
      }
      vec.filter(!col("state").isin("purchase", "exit"))
        .join(broadcast(totals.withColumnRenamed("src", "state")),
          Seq("state"))
        .select(col("state").as("start_state"),
          col("tot").as("n_transitions"),
          floor(col("pv") * 1e6).cast("long").as("p_convert_ppm"))
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
