package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the whole-graph analytics family (q306 degree-ordered
  * triangle counting): the count must equal an independent brute-force
  * adjacency-set recount of the same co-purchase graph, and the derived
  * stats must be internally consistent.
  */
class GraphAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("triangle count equals a brute-force adjacency recount; " +
      "stats are consistent") {
    val r = SparkEntry.queries("q306_triangle_count")(spark, sf)
      .collect().head
    // independent reconstruction of the undirected co-purchase graph
    val items = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val edges = items.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).size
    }.sum / 3 // each triangle counted once per edge
    assert(r.getAs[Long]("n_triangles") == tri.toLong)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_nodes") == adj.size.toLong)
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("gcc_ppm") == 3L * tri * 1000000L / wedges)
  }

  test("k-core peel matches an in-memory peel of the same graph") {
    val rows = SparkEntry.queries("q312_kcore_peel")(spark, sf)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rows.length == 3)
    // independent peel
    val items = Tables.t(spark, sf, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    var edges = items.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val n0 = edges.flatMap(e => Seq(e._1, e._2)).size
    val k = 2L * edges.size / n0
    assert(rows.head.getAs[Long]("k") == k)
    for (r <- 0 until 3) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (kk, vs) => kk -> vs.size }
      val removed = deg.count(_._2 < k)
      edges = edges.filter(e => deg(e._1) >= k && deg(e._2) >= k)
      val row = rows(r)
      assert(row.getAs[Long]("n_removed") == removed)
      assert(row.getAs[Long]("n_edges_remaining") == edges.size)
      assert(row.getAs[Long]("n_nodes_remaining") ==
        edges.flatMap(e => Seq(e._1, e._2)).size)
    }
  }
}
