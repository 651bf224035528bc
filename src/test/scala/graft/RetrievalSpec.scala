package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the hybrid-retrieval family (q251 RRF fusion, q252
  * hard-negative mining).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("rrf fusion: scores recompute from the rank columns and the " +
      "query doc tops the vector list") {
    val rows = SparkEntry.queries("q251_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val rBm = Option(r.getAs[Any]("r_bm")).map(_.asInstanceOf[Int])
      val rVec = Option(r.getAs[Any]("r_vec")).map(_.asInstanceOf[Int])
      val expect = rBm.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rVec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-12)
      assert(rBm.nonEmpty || rVec.nonEmpty)
    }
    // fused order is non-increasing (driver-side replay of the sort).
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // vec_id 0 IS the query vector, so its cosine rank must be 1.
    val q0 = rows.find(_.getAs[Long]("doc_id") == 0L)
    assert(q0.exists(_.getAs[Int]("r_vec") == 1))
  }

  test("rrf fusion plan: bounded top-k, no window anywhere") {
    val plan = SparkEntry.queries("q251_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    // Each modality reduces via TakeOrderedAndProject (streaming top-k);
    // ranks come from sort_array+posexplode over the bounded list, so no
    // WindowExec — partitioned or not — may appear in the plan.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("hard negatives: labels differ from the anchor's, ranks are " +
      "dense 1..5, sims non-increasing") {
    val rows = SparkEntry.queries("q252_hard_negatives")(spark, sf).collect()
    val emb = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == 8 * 5)
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (aId, g) =>
      assert(g.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to 5))
      g.foreach { r =>
        assert(r.getAs[Int]("n_label") != emb(aId),
          s"anchor $aId got a same-label negative")
      }
      val bySim = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("sim"))
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b })
    }
  }
}
