package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AZ (q550-q552). */
class Round9PlannerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q550: six metrics, both snapshots non-degenerate, drift " +
      "formula holds") {
    val rows = q("q550_snapshot_drift").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (a, b, dr) = (r.getAs[Long]("val_a"), r.getAs[Long]("val_b"),
        r.getAs[Long]("drift_ppm"))
      assert(dr == math.abs(b - a) * 1000000L / math.max(math.abs(a), 1L))
    }
    val nRows = rows.find(_.getAs[String]("metric") == "n_rows").get
    assert(nRows.getAs[Long]("val_a") > 0 &&
      nRows.getAs[Long]("val_b") > 0)
  }

  test("q551: four set ops; sketch estimates within 60% of exact " +
      "(k=32: std ~18%); union >= max(a,b) exact-side") {
    val rows = q("q551_theta_sketch_setops").collect()
    assert(rows.length == 4)
    val byOp = rows.map(r => r.getAs[String]("op") -> r).toMap
    val exU = byOp("union").getAs[Long]("exact")
    val exA = byOp("a").getAs[Long]("exact")
    val exB = byOp("b").getAs[Long]("exact")
    val exI = byOp("intersection").getAs[Long]("exact")
    assert(exU >= math.max(exA, exB))
    assert(exU == exA + exB - exI) // inclusion-exclusion on exacts
    rows.foreach { r =>
      assert(r.getAs[Long]("estimate") >= 0)
      if (r.getAs[String]("op") != "intersection")
        assert(r.getAs[Long]("err_ppm") < 600000L,
          s"sketch too far off: $r")
    }
  }

  test("q552: planner covers 4 tables; skew ratio >= 1e6 (uniform " +
      "floor); byte accounting positive") {
    val rows = q("q552_partition_planner").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_bytes") > 0)
      assert(r.getAs[Long]("files_128mb") >= 1)
      // max_key_rows*n_keys >= n_rows (pigeonhole) => ratio >= 1e6
      assert(r.getAs[Long]("key_skew_ppm") >= 1000000L)
      assert(r.getAs[Long]("salt_factor") >= 1)
    }
  }
}
