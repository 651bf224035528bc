package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the physical-layout batch (q431-q433): the advisor
  * claims that make Z-ordering worth recommending, conservation across
  * the compaction plan, and full coverage of the URL clusters.
  */
class Round9LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q431: zone maps are sound and Z-order trades a mild date-probe " +
      "penalty for a large customer-probe win") {
    val rows = q("q431_zorder_advisor").collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("zorder", "datesort"))
    rows.values.foreach { r =>
      // zone-map soundness: every matching row is inside a scanned file
      assert(r.getAs[Long]("p1_rows_scanned") >=
        r.getAs[Long]("p1_rows_matched"))
      assert(r.getAs[Long]("p2_rows_scanned") >=
        r.getAs[Long]("p2_rows_matched"))
    }
    // both layouts see the same data
    assert(rows("zorder").getAs[Long]("rows_total") ==
      rows("datesort").getAs[Long]("rows_total"))
    assert(rows("zorder").getAs[Long]("p1_rows_matched") ==
      rows("datesort").getAs[Long]("p1_rows_matched"))
    // the point of Z-order: the non-leading dim becomes skippable —
    // the date-sorted layout scans (almost) everything for the
    // customer probe, the Z-ordered one under half of it
    val zScan = rows("zorder").getAs[Long]("p2_rows_scanned")
    val dScan = rows("datesort").getAs[Long]("p2_rows_scanned")
    assert(zScan * 2 < dScan,
      s"zorder customer probe not selective: z=$zScan date=$dScan")
  }

  test("q432: bins never exceed file count and the plan conserves rows") {
    val rows = q("q432_compaction_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bins") <= r.getAs[Long]("n_files"))
      assert(r.getAs[Long]("max_bin_rows") >= r.getAs[Long]("min_bin_rows"))
      assert(r.getAs[Long]("compaction_ratio_ppm") <= 1000000L)
      assert(r.getAs[Long]("rows_total") > 0)
    }
  }

  test("q433: clusters cover every document and never exceed the four " +
      "planted variants") {
    val rows = q("q433_url_canonicalize").collect()
    assert(rows.nonEmpty)
    val covered = rows.map(r => r.getAs[Long]("cluster_size") *
      r.getAs[Long]("n_clusters")).sum
    val total = graft.Tables.t(spark, sf, "documents").count()
    assert(covered == total, s"covered=$covered docs=$total")
    assert(rows.forall(_.getAs[Long]("cluster_size") <= 4))
    // canonicalization actually merged things: raw variants == docs
    assert(rows.map(_.getAs[Long]("raw_variants")).sum == total)
  }
}
