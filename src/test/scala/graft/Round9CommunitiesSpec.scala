package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BC (q559-q561). */
class Round9CommunitiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q559: total row equals the sum of community rows; stot " +
      "covers the whole graph degree; Q in [-1e6, 1e6]") {
    val rows = q("q559_partition_modularity").collect()
    val (tot, per) = rows.partition(_.getAs[Long]("comm") == -1L)
    assert(tot.length == 1 && per.nonEmpty)
    assert(tot.head.getAs[Long]("q_ppm") ==
      per.map(_.getAs[Long]("q_ppm")).sum)
    assert(tot.head.getAs[Long]("n_nodes") ==
      per.map(_.getAs[Long]("n_nodes")).sum)
    // Σ_tot over communities double-counts every edge once per side
    assert(tot.head.getAs[Long]("stot") >=
      tot.head.getAs[Long]("sin"))
    rows.foreach { r =>
      val qv = r.getAs[Long]("q_ppm")
      assert(qv >= -1000000L && qv <= 1000000L)
    }
  }

  test("q560: risk sets strictly decrease, hazard steps = d/n in " +
      "ppm, cumulative hazard is the running sum") {
    val rows = q("q560_nelson_aalen").collect()
      .sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => a > b })
    var cum = 0L
    rows.foreach { r =>
      val step = r.getAs[Long]("h_step_ppm")
      assert(step ==
        r.getAs[Long]("d_events") * 1000000L / r.getAs[Long]("n_risk"))
      cum += step
      assert(r.getAs[Long]("cum_hazard_ppm") == cum)
    }
  }

  test("q561: one medoid per label; members count matches the " +
      "cluster; medoid similarity sum is positive for coherent " +
      "clusters") {
    val rows = q("q561_cluster_medoid").collect()
    val byLabel = graft.Tables.t(spark, sf, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label").toLong ->
        r.getAs[Long]("count")).toMap
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") ==
        byLabel(r.getAs[Long]("label")))
    }
  }
}
