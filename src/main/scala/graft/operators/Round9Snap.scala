package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch O (q437-q440): map matching, tail attribution,
  * storage-encoding advice, and the A/B outcome test:
  *
  *  - q437: snap-to-nearest-segment (map-matching lite — the
  *    point-to-road assignment under a tolerance that the reference's
  *    geo joins feed into; cell-bucketed candidate join on the Spark
  *    side, brute-force oracle),
  *  - q438: tail-latency attribution — which segments own the rows
  *    above the global p99 (threshold via the ExactSelection iterative
  *    refinement, so no corpus sort anywhere),
  *  - q439: per-column encoding advisor (dictionary vs RLE vs plain
  *    bits under the table's physical order — the storage sibling of
  *    q388's partition-key advisor),
  *  - q440: two-proportion z-test on conversion by assignment bucket
  *    (the outcome-level complement of q419's SRM check).
  *
  * Geometry and distances are fixed IEEE expression trees over
  * integer-derived coordinates, so doubles reproduce bit-for-bit;
  * ranks/shares ride on floor-quantized integers.
  */
object Round9Snap {

  type Q = (SparkSession, String) => DataFrame

  private val TOL = 5.0 // snap tolerance
  private val CELL = 8.0 // grid cell: >= TOL so 3x3 covers the disc

  // deterministic synthetic road network over supplier ids: short
  // segments with integer-derived endpoints; the CASE nudge keeps
  // every segment non-degenerate
  private def segments(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier").select(
      col("s_suppkey").as("seg_id"),
      (col("s_suppkey") * 37 % 100).cast("double").as("ax"),
      (col("s_suppkey") * 53 % 100).cast("double").as("ay"),
      (col("s_suppkey") % 7 - 3 +
        when(col("s_suppkey") % 7 === 3 && col("s_suppkey") % 5 === 2, 1)
          .otherwise(0)).cast("double").as("dx"),
      (col("s_suppkey") % 5 - 2).cast("double").as("dy"))

  private def points(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("event_id") % 4 === 0).select(
      col("event_id").as("pt_id"),
      ((col("event_id") * 17 % 10000) / 100.0).as("px"),
      ((col("event_id") * 31 % 10000) / 100.0).as("py"))

  val queries: Seq[(String, Q)] = Seq(

    // Point-to-segment distance by projection clamp; candidates from a
    // CELL-grid join (segment bbox expanded by TOL, points in their
    // own cell) — every true match is a candidate, and the argmin
    // rides on floor-quantized micro-d2 with seg_id tie-break.
    "q437_snap_to_segment" -> ((s, d) => {
      val segs = segments(s, d)
        .withColumn("bx", col("ax") + col("dx"))
        .withColumn("by", col("ay") + col("dy"))
        .withColumn("gx", explode(sequence(
          floor((least(col("ax"), col("bx")) - TOL) / CELL).cast("long"),
          floor((greatest(col("ax"), col("bx")) + TOL) / CELL)
            .cast("long"))))
        .withColumn("gy", explode(sequence(
          floor((least(col("ay"), col("by")) - TOL) / CELL).cast("long"),
          floor((greatest(col("ay"), col("by")) + TOL) / CELL)
            .cast("long"))))
      val pts = points(s, d)
        .withColumn("gx", floor(col("px") / CELL).cast("long"))
        .withColumn("gy", floor(col("py") / CELL).cast("long"))
      val cand = pts.join(segs, Seq("gx", "gy"))
        .withColumn("len2", col("dx") * col("dx") + col("dy") * col("dy"))
        .withColumn("tt", least(lit(1.0), greatest(lit(0.0),
          ((col("px") - col("ax")) * col("dx") +
            (col("py") - col("ay")) * col("dy")) / col("len2"))))
        .withColumn("qx", col("ax") + col("tt") * col("dx"))
        .withColumn("qy", col("ay") + col("tt") * col("dy"))
        .withColumn("d2", (col("px") - col("qx")) * (col("px") - col("qx"))
          + (col("py") - col("qy")) * (col("py") - col("qy")))
        .withColumn("md2", floor(col("d2") * 1000000).cast("long"))
        // tolerance gate on the QUANTIZED value so the boundary is the
        // same integer on both engines
        .filter(col("md2") <= (TOL * TOL * 1000000).toLong)
      val wSnap = Window.partitionBy(col("pt_id"))
        .orderBy(col("md2"), col("seg_id"))
      cand.withColumn("rk", row_number().over(wSnap))
        .filter(col("rk") === 1)
        .groupBy(col("seg_id"))
        .agg(count(lit(1)).as("n_snapped"),
          expr("sum(md2) DIV count(*)").as("avg_micro_d2"),
          max(col("md2")).as("max_micro_d2"))
        .orderBy(col("seg_id"))
    }),

    // Rows above the global p99 of events.value, attributed by
    // event_type. Threshold = k-th smallest with k = 99n DIV 100 + 1
    // (ExactSelection: bounded histogram refinement, no corpus sort);
    // shares in ppm of the tail.
    "q438_tail_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val n = ev.count() // bounded driver-side scalar (row count)
      val k = 99L * n / 100L + 1L
      val thr = ExactSelection.kth(ev.toDF(), "value", k).value
      val tail = ev.filter(col("value") >= thr)
      val tot = tail.count() // bounded driver-side scalar
      tail.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_tail"),
          // floor per ROW then sum: a cross-engine double sum would
          // bit-diverge; integer micros sum exactly in any order
          sum(floor(col("value") * 1000000).cast("long"))
            .as("tail_value_micro"))
        .select(col("event_type"), col("n_tail"),
          expr(s"1000000 * n_tail DIV ${tot}L").as("share_ppm"),
          col("tail_value_micro"),
          lit(math.floor(thr * 1000000).toLong).as("thr_micro"))
        .orderBy(col("event_type"))
    }),

    // Encoding advisor under the (l_orderkey, l_linenumber) physical
    // order: per column, distincts / value runs / delta width inside
    // 8192-key row groups, and the modeled dictionary vs RLE vs plain
    // bit cost. Per-row-group windows keep every sort bounded.
    "q439_encoding_advisor" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        expr("l_orderkey DIV 8192").as("rg"),
        col("l_orderkey"), col("l_linenumber"),
        expr("""stack(3,
          'returnflag', l_returnflag,
          'shipday', cast(datediff(l_shipdate, DATE '1992-01-01')
            AS STRING),
          'suppkey', cast(l_suppkey AS STRING))""")
          .as(Seq("column_name", "v")))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (dup
      // keys up to x6): 'v' as the final key makes the run order total
      // wherever it matters (equal-v ties cannot change run counts)
      val wOrd = Window.partitionBy(col("rg"), col("column_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("v"))
      val runs = base
        .withColumn("prev", lag(col("v"), 1).over(wOrd))
        .withColumn("is_run_start",
          when(col("prev").isNull || col("prev") =!= col("v"), 1L)
            .otherwise(0L))
      val perRg = runs.groupBy(col("rg"), col("column_name"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("v")).as("nd"),
          sum(col("is_run_start")).as("nruns"))
      perRg.groupBy(col("column_name"))
        .agg(sum(col("n")).as("n_values"),
          sum(col("nd")).as("sum_rg_distinct"),
          max(col("nd")).as("max_rg_distinct"),
          sum(col("nruns")).as("n_runs"))
        .withColumn("dict_bits", expr(
          "CASE WHEN max_rg_distinct <= 1 THEN 1 " +
            "ELSE length(bin(max_rg_distinct - 1)) END"))
        .withColumn("est_dict_bits", col("dict_bits") * col("n_values"))
        .withColumn("est_rle_bits",
          col("n_runs") * (col("dict_bits") + 32L))
        .withColumn("est_plain_bits", col("n_values") * 64L)
        .withColumn("recommended", expr(
          """CASE WHEN est_rle_bits <= est_dict_bits
                   AND est_rle_bits <= est_plain_bits THEN 'rle'
                  WHEN est_dict_bits <= est_plain_bits THEN 'dict'
                  ELSE 'plain' END"""))
        .orderBy(col("column_name"))
    }),

    // Conversion (>=1 purchase) by assignment bucket (user_id % 2):
    // pooled two-proportion z in milli-units from exact integer
    // counts; |z| >= 1.96 flags a real outcome difference.
    "q440_ab_conversion_ztest" -> ((s, d) => {
      val users = t(s, d, "events")
        .groupBy((col("user_id") % 2).as("variant"), col("user_id"))
        .agg(when(sum(when(col("event_type") === "purchase", 5L)
            .otherwise(0L)) >= count(lit(1)), 1L).otherwise(0L)
          .as("conv"))
      val v = users.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      val wide = v.filter(col("variant") === 0)
        .select(col("n").as("n0"), col("c").as("c0"))
        .crossJoin(v.filter(col("variant") === 1)
          .select(col("n").as("n1"), col("c").as("c1")))
      wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
          expr("1000000 * c0 DIV n0").as("p0_ppm"),
          expr("1000000 * c1 DIV n1").as("p1_ppm"),
          expr("""floor(1000 * ((CAST(c0 AS DOUBLE) / n0
              - CAST(c1 AS DOUBLE) / n1)
            / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
              * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1))))""")
            .cast("long").as("z_milli"))
        .withColumn("significant",
          (abs(col("z_milli")) >= 1960L).cast("long"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q437_snap_to_segment" ->
      """WITH segs AS (
           SELECT s_suppkey AS seg_id,
                  (s_suppkey * 37 % 100)::DOUBLE AS ax,
                  (s_suppkey * 53 % 100)::DOUBLE AS ay,
                  (s_suppkey % 7 - 3 + CASE WHEN s_suppkey % 7 = 3
                     AND s_suppkey % 5 = 2 THEN 1 ELSE 0 END)::DOUBLE
                    AS dx,
                  (s_suppkey % 5 - 2)::DOUBLE AS dy
           FROM supplier),
         pts AS (
           SELECT event_id AS pt_id,
                  ((event_id * 17 % 10000) / 100.0)::DOUBLE AS px,
                  ((event_id * 31 % 10000) / 100.0)::DOUBLE AS py
           FROM events WHERE event_id % 4 = 0),
         cand AS (
           SELECT p.pt_id, s.seg_id,
                  floor(((p.px - (s.ax + least(1.0, greatest(0.0,
                    ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                      / (s.dx * s.dx + s.dy * s.dy))) * s.dx))
                   * (p.px - (s.ax + least(1.0, greatest(0.0,
                    ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                      / (s.dx * s.dx + s.dy * s.dy))) * s.dx))
                   + (p.py - (s.ay + least(1.0, greatest(0.0,
                    ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                      / (s.dx * s.dx + s.dy * s.dy))) * s.dy))
                   * (p.py - (s.ay + least(1.0, greatest(0.0,
                    ((p.px - s.ax) * s.dx + (p.py - s.ay) * s.dy)
                      / (s.dx * s.dx + s.dy * s.dy))) * s.dy)))
                   * 1000000)::BIGINT AS md2
           FROM pts p CROSS JOIN segs s),
         best AS (
           SELECT pt_id, seg_id, md2,
                  row_number() OVER (PARTITION BY pt_id
                    ORDER BY md2, seg_id) AS rk
           FROM cand WHERE md2 <= 25000000)
         SELECT seg_id, count(*)::BIGINT AS n_snapped,
                (sum(md2) // count(*))::BIGINT AS avg_micro_d2,
                max(md2)::BIGINT AS max_micro_d2
         FROM best WHERE rk = 1
         GROUP BY seg_id ORDER BY seg_id""",

    "q438_tail_attribution" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n FROM events),
         thr AS (
           SELECT value AS thr FROM events, n
           ORDER BY value
           LIMIT 1 OFFSET (SELECT (99 * n) // 100 FROM n)),
         tail AS (
           SELECT event_type, value FROM events, thr
           WHERE value >= thr),
         tot AS (SELECT count(*)::BIGINT AS tot FROM tail)
         SELECT event_type, count(*)::BIGINT AS n_tail,
                ((1000000 * count(*)) // (SELECT tot FROM tot))::BIGINT
                  AS share_ppm,
                sum(floor(value * 1000000)::BIGINT)::BIGINT
                  AS tail_value_micro,
                (SELECT floor(thr * 1000000)::BIGINT FROM thr)
                  AS thr_micro
         FROM tail GROUP BY event_type ORDER BY event_type""",

    "q439_encoding_advisor" ->
      """WITH base AS (
           SELECT l_orderkey // 8192 AS rg, l_orderkey, l_linenumber,
                  'returnflag' AS column_name, l_returnflag AS v
           FROM lineitem
           UNION ALL
           SELECT l_orderkey // 8192, l_orderkey, l_linenumber,
                  'shipday',
                  CAST(datediff('day', DATE '1992-01-01',
                    l_shipdate::DATE) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT l_orderkey // 8192, l_orderkey, l_linenumber,
                  'suppkey', CAST(l_suppkey AS VARCHAR)
           FROM lineitem),
         runs AS (
           SELECT rg, column_name, v,
                  CASE WHEN lag(v) OVER (PARTITION BY rg, column_name
                      ORDER BY l_orderkey, l_linenumber, v) IS DISTINCT
                      FROM v THEN 1 ELSE 0 END AS is_run_start
           FROM base),
         per_rg AS (
           SELECT rg, column_name, count(*)::BIGINT AS n,
                  count(DISTINCT v)::BIGINT AS nd,
                  sum(is_run_start)::BIGINT AS nruns
           FROM runs GROUP BY 1, 2),
         agg AS (
           SELECT column_name, sum(n)::BIGINT AS n_values,
                  sum(nd)::BIGINT AS sum_rg_distinct,
                  max(nd)::BIGINT AS max_rg_distinct,
                  sum(nruns)::BIGINT AS n_runs
           FROM per_rg GROUP BY 1),
         cost AS (
           SELECT *,
                  (CASE WHEN max_rg_distinct <= 1 THEN 1
                        ELSE length(bin(max_rg_distinct - 1)) END)
                    ::BIGINT AS dict_bits
           FROM agg)
         SELECT column_name, n_values, sum_rg_distinct, max_rg_distinct,
                n_runs, dict_bits,
                (dict_bits * n_values)::BIGINT AS est_dict_bits,
                (n_runs * (dict_bits + 32))::BIGINT AS est_rle_bits,
                (n_values * 64)::BIGINT AS est_plain_bits,
                CASE WHEN n_runs * (dict_bits + 32)
                       <= dict_bits * n_values
                      AND n_runs * (dict_bits + 32) <= n_values * 64
                     THEN 'rle'
                     WHEN dict_bits * n_values <= n_values * 64
                     THEN 'dict'
                     ELSE 'plain' END AS recommended
         FROM cost ORDER BY column_name""",

    "q440_ab_conversion_ztest" ->
      """WITH users AS (
           SELECT (user_id % 2)::BIGINT AS variant, user_id,
                  (CASE WHEN sum(CASE WHEN event_type = 'purchase'
                         THEN 5 ELSE 0 END) >= count(*)
                        THEN 1 ELSE 0 END)::BIGINT AS conv
           FROM events GROUP BY 1, 2),
         v AS (
           SELECT variant, count(*)::BIGINT AS n, sum(conv)::BIGINT AS c
           FROM users GROUP BY 1),
         wide AS (
           SELECT v0.n AS n0, v0.c AS c0, v1.n AS n1, v1.c AS c1
           FROM (SELECT n, c FROM v WHERE variant = 0) v0
           CROSS JOIN (SELECT n, c FROM v WHERE variant = 1) v1)
         SELECT n0, c0, n1, c1,
                ((1000000 * c0) // n0)::BIGINT AS p0_ppm,
                ((1000000 * c1) // n1)::BIGINT AS p1_ppm,
                floor(1000 * ((CAST(c0 AS DOUBLE) / n0
                    - CAST(c1 AS DOUBLE) / n1)
                  / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (CAST(1 AS DOUBLE) / n0
                       + CAST(1 AS DOUBLE) / n1))))::BIGINT AS z_milli,
                (CASE WHEN abs(floor(1000 * ((CAST(c0 AS DOUBLE) / n0
                    - CAST(c1 AS DOUBLE) / n1)
                  / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (CAST(1 AS DOUBLE) / n0
                       + CAST(1 AS DOUBLE) / n1))))) >= 1960
                      THEN 1 ELSE 0 END)::BIGINT AS significant
         FROM wide"""
  )
}
