package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BA (q553-q555) — resampling uncertainty, control
  * charts, and exact split search (public algorithms: the Poisson
  * bootstrap for massive data [Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams"], the EWMA control chart
  * [Roberts 1959], and CART-style gini split search
  * [Breiman et al. 1984]):
  *
  *  - q553: Poisson bootstrap — B = 32 replicas in ONE corpus pass:
  *    each row gets a deterministic Poisson(1) weight per replica via
  *    the splitmix hash of (orderkey, replica) against the exact
  *    2³²-scaled inverse CDF (no resampling shuffle — THE bootstrap
  *    at 100 TB, where classic resampling is impossible). Replica
  *    means in integer milli; the SE and normal CI computed from
  *    exact integer moments of the 32 replica means.
  *  - q554: EWMA control chart (α = ½ halving, integer state) over
  *    daily event revenue: the per-day EWMA series is a prefix fold
  *    (transform × aggregate — O(days²) per series but CALENDAR-
  *    bounded, corpus-independent), and the ±3σ out-of-control test
  *    is an exact cross-multiplied integer comparison
  *    (n·e − Σx)² > 3·(n·Σx² − (Σx)²) — no float boundary at all.
  *  - q555: decision stump by exact gini — the corpus is first
  *    reduced to a bounded feature grid (quantity × discount-cents ×
  *    month × linestatus × label counts), then 11 candidate splits
  *    are scored ON THE GRID: per-child scaled gini in integer
  *    nano-units (floor(1e9·(n²−p²−g²)/n) per child, exact integer
  *    sum across children), ranked ascending. One corpus aggregation
  *    regardless of candidate count.
  */
object Round9Bootstrap {

  type Q = (SparkSession, String) => DataFrame

  /** Poisson(1) inverse CDF, cumulative thresholds in 2³² units. */
  private val poisCdf =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L)

  private def poissonW(h: String): String =
    poisCdf.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")

  /** Candidate stump splits evaluated on the feature grid; identical
    * predicate text in both dialects (grid columns qty, dc, mon, ls).
    */
  private val stumpCands: Seq[(String, String)] = Seq(
    "qty<=10" -> "qty <= 10", "qty<=20" -> "qty <= 20",
    "qty<=30" -> "qty <= 30", "qty<=40" -> "qty <= 40",
    "disc<=2" -> "dc <= 2", "disc<=5" -> "dc <= 5",
    "disc<=8" -> "dc <= 8", "month<=3" -> "mon <= 3",
    "month<=6" -> "mon <= 6", "month<=9" -> "mon <= 9",
    "status=F" -> "ls = 'F'")

  val queries: Seq[(String, Q)] = Seq(

    "q553_poisson_bootstrap" -> ((s, d) => {
      val reps = broadcast(s.range(32).select(col("id").as("b")))
      val base = t(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          expr("CAST(floor(o_totalprice * 1000) AS BIGINT)").as("xm"))
      val weighted = base.crossJoin(reps)
        .withColumn("h0",
          expr("""(((k * 100 + b) % 2147483648L) * 2654435761L)
                  & 4294967295L"""))
        .withColumn("h1",
          expr("((h0 ^ shiftright(h0, 16)) * 73244475L) & 4294967295L"))
        .withColumn("h",
          expr("(h1 ^ shiftright(h1, 16)) & 4294967295L"))
        .select(col("b"), col("xm"),
          expr(poissonW("h")).cast("long").as("w"))
      val repMeans = weighted.groupBy(col("b"))
        .agg(expr("sum(w * xm) DIV greatest(sum(w), 1)").as("m"))
      val point = base.agg(expr("sum(xm) DIV count(*)").as("pt"))
      // center replica means on the point estimate before taking
      // moments: deviations are SE-scale, so the second moment cannot
      // overflow at any price magnitude (raw m² did)
      repMeans.crossJoin(broadcast(point))
        .select(col("pt"), (col("m") - col("pt")).as("dm"))
        .groupBy(col("pt"))
        .agg(count(lit(1)).as("nb"),
          sum(col("dm")).as("sd"),
          sum(col("dm") * col("dm")).as("sd2"))
        .select(col("pt").as("point_milli"),
          col("nb").as("n_replicas"),
          expr("""CAST(floor(sqrt((nb * sd2 - sd * sd)
                  / CAST(nb * (nb - 1) AS DOUBLE))) AS BIGINT)""")
            .as("se_milli"))
        .select(col("point_milli"), col("n_replicas"),
          col("se_milli"),
          (col("point_milli") - expr("se_milli * 196 DIV 100"))
            .as("ci_lo_milli"),
          (col("point_milli") + expr("se_milli * 196 DIV 100"))
            .as("ci_hi_milli"))
    }),

    "q554_ewma_control_chart" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("m"))))
          .as("series"),
          count(lit(1)).as("n"),
          sum(col("m")).as("sx"),
          sum(col("m") * col("m")).as("sx2"))
        // per-day EWMA via prefix folds: O(days²) per series, bounded
        // by the calendar (30 here, ~3k at a decade), never the corpus
        .withColumn("ew", expr(
          """transform(sequence(1, int(size(series))), i ->
               named_struct(
                 'day', element_at(series, i).day,
                 'e', aggregate(
                    slice(transform(series, s -> s.m), 2, i - 1),
                    element_at(series, 1).m,
                    (a, x) -> cast(floor((a + x) / 2.0) as bigint))))"""))
        .select(col("event_type"), col("n"), col("sx"), col("sx2"),
          explode(col("ew")).as("z"))
        .select(col("event_type"), col("z.day").as("day"),
          col("z.e").as("ewma_milli"),
          // exact integer ±3σ·sqrt(α/(2−α)) test, α=1/2 → var/3:
          // (n·e − Σx)² > 3·(n·Σx² − (Σx)²) · (1/3) · 9 = 3·(…)
          when((col("n") * col("z.e") - col("sx"))
            * (col("n") * col("z.e") - col("sx"))
            > lit(3L) * (col("n") * col("sx2") - col("sx") * col("sx")),
            1L).otherwise(0L).as("out_of_control"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q555_gini_stump" -> ((s, d) => {
      val grid = graft.Stage(t(s, d, "lineitem")
        .select(col("l_quantity").cast("long").as("qty"),
          expr("CAST(floor(l_discount * 100) AS BIGINT)").as("dc"),
          month(col("l_shipdate")).cast("long").as("mon"),
          col("l_linestatus").as("ls"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("label"))
        .groupBy(col("qty"), col("dc"), col("mon"), col("ls"),
          col("label"))
        .agg(count(lit(1)).as("c")), "q555_grid")
      val scored = stumpCands.map { case (name, pred) =>
        grid.agg(
          sum(when(expr(pred), col("c")).otherwise(0L)).as("n1"),
          sum(when(expr(pred) && col("label") === 1L, col("c"))
            .otherwise(0L)).as("p1"),
          sum(col("c")).as("n"),
          sum(when(col("label") === 1L, col("c")).otherwise(0L))
            .as("p"))
          .select(lit(name).as("split"),
            col("n1"), col("p1"),
            (col("n") - col("n1")).as("n0"),
            (col("p") - col("p1")).as("p0"), col("n"))
      }.reduce(_ unionByName _)
      // per-child scaled gini floor'd to integer micro-units, exact
      // integer sum over the two children, DIV n. With n = p + g the
      // impurity numerator n² − p² − g² = 2pg; the product is taken
      // in DECIMAL(38,0)/HUGEINT so a 10⁹-row child cannot overflow
      scored.select(col("split"), col("n1"), col("n0"),
        expr("""(CASE WHEN n1 > 0 THEN
                  (CAST(2 AS DECIMAL(38,0)) * p1 * (n1 - p1)
                    * 1000000) DIV n1 ELSE 0L END
                + CASE WHEN n0 > 0 THEN
                  (CAST(2 AS DECIMAL(38,0)) * p0 * (n0 - p0)
                    * 1000000) DIV n0 ELSE 0L END) DIV n""")
          .as("gini_micro"))
        .orderBy(col("gini_micro"), col("split"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q553_poisson_bootstrap" ->
      s"""WITH reps AS (SELECT range::BIGINT AS b FROM range(32)),
         base AS (
           SELECT o_orderkey::BIGINT AS k,
                  floor(o_totalprice * 1000)::BIGINT AS xm
           FROM orders),
         weighted AS (
           SELECT b, xm,
                  (${poissonW("(xor(h1, h1 >> 16) & 4294967295)")})
                    ::BIGINT AS w
           FROM (
             SELECT b, xm,
                    (xor(h0, h0 >> 16) * 73244475) & 4294967295 AS h1
             FROM (
               SELECT b, xm, (((k * 100 + b) % 2147483648)
                      * 2654435761) & 4294967295 AS h0
               FROM base, reps))),
         repmeans AS (
           SELECT b, sum(w * xm) // greatest(sum(w), 1) AS m
           FROM weighted GROUP BY b),
         pt AS (
           SELECT (sum(xm) // count(*))::BIGINT AS pt FROM base),
         agg AS (
           SELECT count(*)::BIGINT AS nb,
                  sum(m - pt)::BIGINT AS sd,
                  sum((m - pt) * (m - pt))::BIGINT AS sd2
           FROM repmeans, pt),
         se AS (
           SELECT pt AS point_milli, nb AS n_replicas,
                  CAST(floor(sqrt((nb * sd2 - sd * sd)
                    / CAST(nb * (nb - 1) AS DOUBLE))) AS BIGINT)
                    AS se_milli
           FROM agg, pt)
         SELECT point_milli, n_replicas, se_milli,
                (point_milli - se_milli * 196 // 100)::BIGINT
                  AS ci_lo_milli,
                (point_milli + se_milli * 196 // 100)::BIGINT
                  AS ci_hi_milli
         FROM se""",

    "q554_ewma_control_chart" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, list(day ORDER BY day) AS days,
                  list(m ORDER BY day) AS ms,
                  count(*)::BIGINT AS n, sum(m)::BIGINT AS sx,
                  sum(m * m)::BIGINT AS sx2
           FROM daily GROUP BY event_type),
         fold AS (
           SELECT event_type, days, ms, n, sx, sx2, 1::BIGINT AS t,
                  ms[1]::BIGINT AS e
           FROM ser
           UNION ALL
           SELECT event_type, days, ms, n, sx, sx2, t + 1,
                  cast(floor((e + ms[(t + 1)::INT]::BIGINT) / 2.0)
                    as bigint)
           FROM fold WHERE t < n)
         SELECT event_type, days[t::INT]::BIGINT AS day,
                e AS ewma_milli,
                (CASE WHEN (n * e - sx) * (n * e - sx)
                      > 3 * (n * sx2 - sx * sx)
                 THEN 1 ELSE 0 END)::BIGINT AS out_of_control
         FROM fold
         ORDER BY event_type, day""",

    "q555_gini_stump" -> {
      val branches = stumpCands.map { case (name, pred) =>
        s"""SELECT '$name' AS split,
             sum(CASE WHEN $pred THEN c ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN ($pred) AND label = 1 THEN c
                 ELSE 0 END)::BIGINT AS p1,
             sum(c)::BIGINT AS n,
             sum(CASE WHEN label = 1 THEN c ELSE 0 END)::BIGINT AS p
           FROM grid"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH grid AS (
           SELECT l_quantity::BIGINT AS qty,
                  floor(l_discount * 100)::BIGINT AS dc,
                  month(l_shipdate::TIMESTAMP)::BIGINT AS mon,
                  l_linestatus AS ls,
                  (CASE WHEN l_returnflag = 'R' THEN 1
                   ELSE 0 END)::BIGINT AS label,
                  count(*)::BIGINT AS c
           FROM lineitem GROUP BY 1, 2, 3, 4, 5),
         cands AS (
           $branches),
         expanded AS (
           SELECT split, n1, (n - n1)::BIGINT AS n0, p1,
                  (p - p1)::BIGINT AS p0, n
           FROM cands)
         SELECT split, n1, n0,
                ((CASE WHEN n1 > 0 THEN
                    (2::HUGEINT * p1 * (n1 - p1) * 1000000) // n1
                  ELSE 0 END
                  + CASE WHEN n0 > 0 THEN
                    (2::HUGEINT * p0 * (n0 - p0) * 1000000) // n0
                  ELSE 0 END) // n)::BIGINT AS gini_micro
         FROM expanded ORDER BY gini_micro, split"""
    }
  )
}
