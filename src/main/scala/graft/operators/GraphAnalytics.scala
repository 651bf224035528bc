package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Whole-graph analytics beyond the per-source traversals in
  * TableFunctions (q53/q137 BFS, `Graph/GraphTableFunctions.hpp:280-519`
  * in /root/reference) and the fixed-point PageRank (q291): structure
  * statistics over a REAL co-occurrence graph built from the fixtures.
  *
  * - q306 triangle counting, degree-ordered (Schank & Wagner 2005; the
  *   MapReduce formulation is Suri & Vassilvitskii WWW'11): orient every
  *   undirected edge from the endpoint that is smaller under the total
  *   order (degree, id) to the larger one. Then every triangle has
  *   exactly one node with two out-edges in it, so counting = (wedges
  *   from a shared source) semi-joined against the directed edge list.
  *   The orientation is the whole algorithm: out-degrees are bounded by
  *   O(sqrt(m)), so the wedge join is sum(outdeg^2) — sub-quadratic —
  *   where the naive shared-endpoint join is sum(deg^2) and explodes on
  *   hubs. The graph is the part co-purchase graph (two parts linked iff
  *   some order contains both), nodes ~ part count, edges ~ 1.2M at
  *   sf0.1.
  *
  * Scale (100 TB): pair generation is a per-order self-join keyed on
  * l_orderkey (order item lists are bounded, ~4 avg / 13 max items);
  * degrees are one exploded aggregate; the orientation is two equi-joins
  * keyed on node id; the wedge join is keyed on the shared source and
  * bounded by the orientation theorem. No broadcast of anything
  * node-scale, no driver-side state — every stage is a keyed shuffle.
  */
object GraphAnalytics {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(
    "q306_triangle_count" -> ((s, d) => {
      val items = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // Undirected edge list, canonical u < v. Per-order item sets are
      // bounded, so the self-join on ok is a small intra-group expand.
      val und = graft.Stage(items.as("a").join(items.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
        .distinct(), "q306_edges")
      val deg = graft.Stage(und.select(col("u").as("n"))
        .unionAll(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg")), "q306_deg")
      // Degree-ordered orientation: s -> t iff (deg_s, s) < (deg_t, t).
      // Staged: consumed three times (both wedge sides + closing probe).
      val dir = graft.Stage(und
        .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("s"), col("v").as("tt"),
                   col("dv").as("dt")))
            .otherwise(struct(col("v").as("s"), col("u").as("tt"),
                   col("du").as("dt"))).as("e"))
        .select(col("e.s").as("s"), col("e.tt").as("tt"),
                col("e.dt").as("dt")), "q306_dir")
      // Wedges from a shared source, endpoints ordered by the SAME total
      // order — so the closing edge, if present, is directed exactly
      // (t1 -> t2) and the semi-join below finds it in one probe.
      val wedges = dir.as("x").join(dir.as("y"),
          col("x.s") === col("y.s") &&
          (col("x.dt") < col("y.dt") ||
            (col("x.dt") === col("y.dt") && col("x.tt") < col("y.tt"))))
        .select(col("x.tt").as("s"), col("y.tt").as("tt"))
      val nTri = wedges.join(dir.select("s", "tt"), Seq("s", "tt"),
        "left_semi").count()
      val stats = deg.agg(
        count(lit(1)).as("n_nodes"),
        expr("sum(deg) DIV 2").as("n_edges"),
        expr("sum(deg * (deg - 1) DIV 2)").cast("long").as("n_wedges"))
      // Global clustering coefficient in exact ppm: 3*closed / wedges.
      stats.withColumn("n_triangles", lit(nTri))
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          col("n_wedges"),
          expr("CAST(n_triangles * 3000000 DIV n_wedges AS BIGINT)")
            .as("gcc_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q306_triangle_count" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         e AS (
           SELECT DISTINCT a.pk AS u, b.pk AS v
           FROM items a JOIN items b
             ON a.ok = b.ok AND a.pk < b.pk),
         deg AS (
           SELECT n, count(*) AS d FROM (
             SELECT u AS n FROM e UNION ALL SELECT v FROM e)
           GROUP BY 1),
         tri AS (
           SELECT count(*) AS c
           FROM e e1 JOIN e e2 ON e1.v = e2.u
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         agg AS (
           SELECT count(*) AS n_nodes,
                  (sum(d) // 2)::BIGINT AS n_edges,
                  sum(d * (d - 1) // 2)::BIGINT AS n_wedges
           FROM deg)
         SELECT n_nodes::BIGINT AS n_nodes, n_edges,
                (SELECT c FROM tri)::BIGINT AS n_triangles, n_wedges,
                ((SELECT c FROM tri) * 3000000 // n_wedges)::BIGINT
                  AS gcc_ppm
         FROM agg"""
  )
}
