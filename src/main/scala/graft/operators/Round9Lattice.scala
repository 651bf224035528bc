package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AP (q520-q522) — physical-design advisory and
  * aggregate-vs-group diagnostics:
  *
  *  - q520: greedy materialized-view selection over the CUBE lattice
  *    (Harinarayan-Rajaraman-Ullman): all 16 view sizes of the
  *    (returnflag, linestatus, ship-month, quantity-bucket) lattice
  *    come from ONE cube() pass (view size = group count per
  *    grouping id); the 2-step greedy benefit maximization runs on
  *    the collected 16-row lattice (bounded by 2^dims, never the
  *    corpus). Mirrors the reference's aggregate-navigation /
  *    rollup-advisor surface on the classic published algorithm.
  *  - q521: Simpson's-paradox detector — the sign of the
  *    quantity↔discount association computed overall vs within each
  *    supplier nation (exact integer OLS slope numerators; the
  *    denominator is positive so sign(num) = sign(slope)).
  *    Flags when the pooled sign contradicts the group majority —
  *    the classic aggregation trap every metrics platform should
  *    test before reporting a pooled trend.
  *  - q522: like-for-like (same-store) growth decomposition —
  *    period-over-period revenue growth split into comparable parts
  *    (present in both halves of the shipdate span), new entrants,
  *    and discontinued parts; LFL growth vs total growth in ppm.
  *    Two keyed aggregates and one part-grain join.
  */
object Round9Lattice {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q520_view_selection_greedy" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("f"), col("l_linestatus").as("st"),
        month(col("l_shipdate")).as("m"),
        expr("CAST(l_quantity AS BIGINT) DIV 10").as("qb"))
      // one cube pass: rows per grouping_id = that view's group count.
      // gid bit order: first cube column = most-significant bit; a SET
      // bit means the column is aggregated away (not in the view).
      val lattice = base
        .cube(col("f"), col("st"), col("m"), col("qb"))
        .agg(grouping_id().as("gid"))
        .groupBy(col("gid")).agg(count(lit(1)).as("size_rows"))
        .collect() // bounded: 2^4 lattice views
      val dims = Seq('f' -> 8L, 's' -> 4L, 'm' -> 2L, 'q' -> 1L)
      val views = lattice.map { r =>
        val gid = r.getLong(0)
        val lbl = dims.collect { case (c, b) if (gid & b) == 0L => c }
          .mkString
        (if (lbl.isEmpty) "-" else lbl, lbl.toSet, r.getLong(1))
      }
      val top = views.find(_._1 == "fsmq").get
      // HRU greedy: benefit(v | S) = Σ_{w ⊆ v} max(cost_w(S) − |v|, 0)
      def cost(w: Set[Char], sel: Seq[(String, Set[Char], Long)]) =
        (top +: sel).filter(c => w.subsetOf(c._2)).map(_._3).min
      var selected = Vector.empty[(String, Set[Char], Long)]
      var picks = Vector.empty[(String, Long, Long, Long)]
      for (step <- 1 to 2) {
        val cands = views.filter(v => v._1 != "fsmq"
          && !selected.exists(_._1 == v._1))
        val scored = cands.map { v =>
          val b = views.filter(w => w._2.subsetOf(v._2))
            .map(w => math.max(cost(w._2, selected) - v._3, 0L)).sum
          (v, b)
        }
        val (best, benefit) = scored.sortBy { case (v, b) => (-b, v._1) }
          .head
        selected :+= best
        picks :+= ((best._1, step.toLong, best._3, benefit))
      }
      val sel = picks.map(p => p._1 -> p).toMap
      views.toSeq.map { case (lbl, st, size) =>
        val p = sel.get(lbl)
        (lbl, st.size.toLong, size,
          p.map(_._2).getOrElse(0L), p.map(_._4).getOrElse(0L))
      }.toDF("view_label", "n_dims", "size_rows", "selected_step",
        "benefit").orderBy(col("view_label"))
    }),

    "q521_simpson_detector" -> ((s, d) => {
      val base = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"),
            col("s_nationkey").cast("long").as("nation"))),
          Seq("l_suppkey"))
        .select(col("nation"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_discount") * 10000).cast("long").as("y"))
      def slopeNum(df: DataFrame, keys: Seq[String]): DataFrame = {
        val g = if (keys.isEmpty) df.groupBy() else df.groupBy(
          keys.map(col): _*)
        g.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
          .withColumn("num",
            col("n") * col("sxy") - col("sx").cast("decimal(38,0)")
              * col("sy"))
          .withColumn("sign", signum(col("num").cast("double"))
            .cast("long"))
      }
      val overall = slopeNum(base, Nil)
        .select(col("sign").as("pooled_sign"), col("n").as("n_rows"))
      val grp = slopeNum(base, Seq("nation"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("sign") === 1L, 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("sign") === -1L, 1L).otherwise(0L)).as("n_neg"))
      overall.crossJoin(grp)
        .withColumn("majority_sign",
          when(col("n_pos") > col("n_neg"), 1L)
            .when(col("n_neg") > col("n_pos"), -1L).otherwise(0L))
        .select(col("n_rows"), col("pooled_sign"), col("n_groups"),
          col("n_pos"), col("n_neg"), col("majority_sign"),
          when(col("pooled_sign") =!= col("majority_sign")
            && col("majority_sign") =!= 0L, 1L).otherwise(0L)
            .as("paradox_flag"))
    }),

    "q522_like_for_like" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_partkey").as("partkey"),
        floor(unix_timestamp(col("l_shipdate")) / 86400L)
          .cast("long").as("day"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val span = base.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"))
        .withColumn("mid", expr("d0 + (d1 - d0 + 1) DIV 2"))
      val per = graft.Stage(base.crossJoin(broadcast(span))
        .groupBy(col("partkey"))
        .agg(sum(when(col("day") < col("mid"), col("cents"))
          .otherwise(0L)).as("r1"),
          sum(when(col("day") >= col("mid"), col("cents"))
            .otherwise(0L)).as("r2")), "q522_per")
      per.agg(count(lit(1)).as("n_parts_total"),
        sum(when(col("r1") > 0 && col("r2") > 0, 1L).otherwise(0L))
          .as("n_lfl"),
        sum(col("r1")).as("rev_p1"), sum(col("r2")).as("rev_p2"),
        sum(when(col("r1") > 0 && col("r2") > 0, col("r1"))
          .otherwise(0L)).as("lfl_p1"),
        sum(when(col("r1") > 0 && col("r2") > 0, col("r2"))
          .otherwise(0L)).as("lfl_p2"),
        sum(when(col("r1") === 0, col("r2")).otherwise(0L))
          .as("new_rev"),
        sum(when(col("r2") === 0, col("r1")).otherwise(0L))
          .as("lost_rev"))
        .select(col("n_parts_total"), col("n_lfl"),
          col("rev_p1"), col("rev_p2"),
          expr("(rev_p2 - rev_p1) * 1000000 DIV rev_p1")
            .as("growth_total_ppm"),
          expr("(lfl_p2 - lfl_p1) * 1000000 DIV lfl_p1")
            .as("growth_lfl_ppm"),
          col("new_rev"), col("lost_rev"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q520_view_selection_greedy" ->
      """WITH base AS (
           SELECT l_returnflag AS f, l_linestatus AS st,
                  month(l_shipdate) AS m,
                  CAST(l_quantity AS BIGINT) // 10 AS qb
           FROM lineitem),
         cube_rows AS (
           SELECT (CASE WHEN GROUPING(f) = 0 THEN 'f' ELSE '' END)
                || (CASE WHEN GROUPING(st) = 0 THEN 's' ELSE '' END)
                || (CASE WHEN GROUPING(m) = 0 THEN 'm' ELSE '' END)
                || (CASE WHEN GROUPING(qb) = 0 THEN 'q' ELSE '' END)
                  AS lbl
           FROM base GROUP BY CUBE (f, st, m, qb)),
         sizes AS (
           SELECT (CASE WHEN lbl = '' THEN '-' ELSE lbl END)
                    AS view_label,
                  length(lbl)::BIGINT AS n_dims,
                  count(*)::BIGINT AS size_rows
           FROM cube_rows GROUP BY 1, 2),
         top AS (
           SELECT size_rows AS tsz FROM sizes
           WHERE view_label = 'fsmq'),
         -- w subset-of v via letter containment ('-' = no letters)
         r1 AS (
           SELECT v.view_label, v.size_rows,
             (SELECT sum(greatest(t.tsz - v.size_rows, 0))
              FROM sizes w, top t
              WHERE (w.view_label = '-' OR (
                (position('f' IN w.view_label) = 0
                  OR position('f' IN v.view_label) > 0)
                AND (position('s' IN w.view_label) = 0
                  OR position('s' IN v.view_label) > 0)
                AND (position('m' IN w.view_label) = 0
                  OR position('m' IN v.view_label) > 0)
                AND (position('q' IN w.view_label) = 0
                  OR position('q' IN v.view_label) > 0))))::BIGINT
               AS benefit
           FROM sizes v WHERE v.view_label <> 'fsmq'),
         w1 AS (
           SELECT * FROM r1 ORDER BY benefit DESC, view_label
           LIMIT 1),
         r2 AS (
           SELECT v.view_label, v.size_rows,
             (SELECT sum(greatest(
                least(t.tsz,
                  CASE WHEN (w.view_label = '-' OR (
                    (position('f' IN w.view_label) = 0
                      OR position('f' IN s1.view_label) > 0)
                    AND (position('s' IN w.view_label) = 0
                      OR position('s' IN s1.view_label) > 0)
                    AND (position('m' IN w.view_label) = 0
                      OR position('m' IN s1.view_label) > 0)
                    AND (position('q' IN w.view_label) = 0
                      OR position('q' IN s1.view_label) > 0)))
                   THEN s1.size_rows ELSE t.tsz END)
                - v.size_rows, 0))
              FROM sizes w, top t, w1 s1
              WHERE (w.view_label = '-' OR (
                (position('f' IN w.view_label) = 0
                  OR position('f' IN v.view_label) > 0)
                AND (position('s' IN w.view_label) = 0
                  OR position('s' IN v.view_label) > 0)
                AND (position('m' IN w.view_label) = 0
                  OR position('m' IN v.view_label) > 0)
                AND (position('q' IN w.view_label) = 0
                  OR position('q' IN v.view_label) > 0))))::BIGINT
               AS benefit
           FROM sizes v, w1 s1x
           WHERE v.view_label <> 'fsmq'
             AND v.view_label <> s1x.view_label),
         w2 AS (
           SELECT * FROM r2 ORDER BY benefit DESC, view_label
           LIMIT 1)
         SELECT s.view_label, s.n_dims, s.size_rows,
                (CASE WHEN s.view_label = (SELECT view_label FROM w1)
                      THEN 1
                      WHEN s.view_label = (SELECT view_label FROM w2)
                      THEN 2 ELSE 0 END)::BIGINT AS selected_step,
                (CASE WHEN s.view_label = (SELECT view_label FROM w1)
                      THEN (SELECT benefit FROM w1)
                      WHEN s.view_label = (SELECT view_label FROM w2)
                      THEN (SELECT benefit FROM w2)
                      ELSE 0 END)::BIGINT AS benefit
         FROM sizes s ORDER BY s.view_label""",

    "q521_simpson_detector" ->
      """WITH base AS (
           SELECT s.s_nationkey::BIGINT AS nation,
                  CAST(l.l_quantity AS BIGINT) AS x,
                  floor(l.l_discount * 10000)::BIGINT AS y
           FROM lineitem l JOIN supplier s
             ON l.l_suppkey = s.s_suppkey),
         overall AS (
           SELECT count(*)::BIGINT AS n_rows,
             sign(CAST(count(*)::HUGEINT * sum(x::HUGEINT * y)
               - sum(x)::HUGEINT * sum(y) AS DOUBLE))::BIGINT
               AS pooled_sign
           FROM base),
         grp AS (
           SELECT nation,
             sign(CAST(count(*)::HUGEINT * sum(x::HUGEINT * y)
               - sum(x)::HUGEINT * sum(y) AS DOUBLE))::BIGINT AS sg
           FROM base GROUP BY nation),
         gsum AS (
           SELECT count(*)::BIGINT AS n_groups,
                  sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_pos,
                  sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_neg
           FROM grp)
         SELECT o.n_rows, o.pooled_sign, g.n_groups, g.n_pos, g.n_neg,
                (CASE WHEN g.n_pos > g.n_neg THEN 1
                      WHEN g.n_neg > g.n_pos THEN -1
                      ELSE 0 END)::BIGINT AS majority_sign,
                (CASE WHEN o.pooled_sign <>
                   (CASE WHEN g.n_pos > g.n_neg THEN 1
                         WHEN g.n_neg > g.n_pos THEN -1 ELSE 0 END)
                  AND (CASE WHEN g.n_pos > g.n_neg THEN 1
                            WHEN g.n_neg > g.n_pos THEN -1
                            ELSE 0 END) <> 0
                 THEN 1 ELSE 0 END)::BIGINT AS paradox_flag
         FROM overall o, gsum g""",

    "q522_like_for_like" ->
      """WITH base AS (
           SELECT l_partkey AS partkey,
                  floor(epoch(l_shipdate::TIMESTAMP) / 86400)::BIGINT
                    AS day,
                  floor(l_extendedprice * 100)::BIGINT AS cents
           FROM lineitem),
         span AS (
           SELECT min(day) AS d0, max(day) AS d1,
                  min(day) + (max(day) - min(day) + 1) // 2 AS mid
           FROM base),
         per AS (
           SELECT b.partkey,
                  sum(CASE WHEN b.day < s.mid THEN b.cents
                      ELSE 0 END)::BIGINT AS r1,
                  sum(CASE WHEN b.day >= s.mid THEN b.cents
                      ELSE 0 END)::BIGINT AS r2
           FROM base b, span s GROUP BY b.partkey),
         agg AS (
           SELECT count(*)::BIGINT AS n_parts_total,
                  sum(CASE WHEN r1 > 0 AND r2 > 0 THEN 1
                      ELSE 0 END)::BIGINT AS n_lfl,
                  sum(r1)::BIGINT AS rev_p1, sum(r2)::BIGINT AS rev_p2,
                  sum(CASE WHEN r1 > 0 AND r2 > 0 THEN r1
                      ELSE 0 END)::BIGINT AS lfl_p1,
                  sum(CASE WHEN r1 > 0 AND r2 > 0 THEN r2
                      ELSE 0 END)::BIGINT AS lfl_p2,
                  sum(CASE WHEN r1 = 0 THEN r2 ELSE 0 END)::BIGINT
                    AS new_rev,
                  sum(CASE WHEN r2 = 0 THEN r1 ELSE 0 END)::BIGINT
                    AS lost_rev
           FROM per)
         SELECT n_parts_total, n_lfl, rev_p1, rev_p2,
                ((rev_p2 - rev_p1) * 1000000 // rev_p1)::BIGINT
                  AS growth_total_ppm,
                ((lfl_p2 - lfl_p1) * 1000000 // lfl_p1)::BIGINT
                  AS growth_lfl_ppm,
                new_rev, lost_rev
         FROM agg"""
  )
}
