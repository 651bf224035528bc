package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch K invariants (q422-q427) — the semantic properties the
  * DuckDB hash gate cannot see because both engines run the same
  * algorithm: Haar transform/reconstruction identities, EWMA fold
  * consistency, allocation feasibility, quantile normalization's
  * variance-contraction purpose, the isotonic fit's defining
  * monotone + mean-preserving properties, and attribution mass bounds.
  */
class Round9SynopsisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q422: synopsis keeps exactly 24 coefficients, errors are " +
      "ordered 0 <= max <= l1 < total, and the transform conserved " +
      "the total cent mass") {
    import org.apache.spark.sql.functions._
    val r = q("q422_haar_synopsis").collect().head
    assert(r.getAs[Long]("n_kept") == 24L)
    val total = r.getAs[Long]("total_cents")
    val l1 = r.getAs[Long]("l1_err_cents")
    val mx = r.getAs[Long]("max_err_cents")
    assert(mx >= 0L && l1 >= mx, s"error ordering broken: max=$mx l1=$l1")
    assert(l1 < total, "synopsis reconstruction worse than zero model")
    // a8 (reported as total_cents) must equal the true cent sum —
    // every transform level is a pure pair-sum, so mass is conserved.
    val direct = Tables.t(spark, sf, "lineitem")
      .select(sum(floor(col("l_extendedprice") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(total == direct, s"transform lost mass: $total vs $direct")
  }

  test("q423: flag count fits the fold length and first_flag_t = 0 " +
      "exactly when no flags fired") {
    val rows = q("q423_ewma_control").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val nf = r.getAs[Long]("n_flags")
      val ft = r.getAs[Long]("first_flag_t")
      assert(nf >= 0L && nf <= math.max(n - 1, 0),
        s"${r.getString(0)}: $nf flags in ${n - 1} fold steps")
      assert((nf == 0L) == (ft == 0L),
        s"${r.getString(0)}: nf=$nf but first_flag_t=$ft")
      assert(ft <= n, s"${r.getString(0)}: first flag past series end")
    }
  }

  test("q424: Neyman allocation is feasible (n_alloc <= n_rows, " +
      "budget respected) and the deterministic sample realizes it " +
      "exactly") {
    val rows = q("q424_neyman_sampling").collect()
    assert(rows.nonEmpty)
    val totAlloc = rows.map(_.getAs[Long]("n_alloc")).sum
    val totProp = rows.map(_.getAs[Long]("n_prop")).sum
    assert(totAlloc <= 1000L, s"Neyman allocation overspent: $totAlloc")
    assert(totProp <= 1000L, s"proportional allocation overspent: $totProp")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alloc") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_sampled") == r.getAs[Long]("n_alloc"),
        s"stratum ${r.getString(0)}/${r.getString(1)}: sample did not " +
          "realize the allocation")
    }
  }

  test("q425: quantile normalization contracts the cross-source " +
      "spread of means and conserves doc counts") {
    import org.apache.spark.sql.functions._
    val rows = q("q425_quantile_normalize").collect()
    assert(rows.length > 1)
    val before = rows.map(_.getAs[Long]("mean_before"))
    val after = rows.map(_.getAs[Long]("mean_after"))
    assert(after.max - after.min <= before.max - before.min,
      "normalization widened the cross-source mean spread")
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val direct = Tables.t(spark, sf, "documents").count()
    assert(nDocs == direct, "doc counts not conserved")
  }

  test("q426: isotonic fit is non-decreasing, bracketed by the raw " +
      "rate range, and preserves the weighted mean (L2 projection " +
      "property)") {
    val rows = q("q426_isotonic_fit").collect()
    assert(rows.length > 2)
    val iso = rows.map(_.getAs[Double]("rate_iso"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-12 },
      "isotonic fit decreased")
    val raw = rows.map(_.getAs[Double]("rate_raw"))
    assert(iso.min >= raw.min - 1e-12 && iso.max <= raw.max + 1e-12,
      "fit escaped the raw rate range")
    val n = rows.map(_.getAs[Long]("n"))
    val pos = rows.map(_.getAs[Long]("pos")).sum
    val fitMass = iso.zip(n).map { case (f, w) => f * w }.sum
    assert(math.abs(fitMass - pos) < 1e-6 * math.max(pos, 1L),
      s"weighted mean not preserved: $fitMass vs $pos")
  }

  test("q427: attribution ppm mass is floor-complete, removal effects " +
      "are probabilities, and first-touch counts cover every journey") {
    val rows = q("q427_removal_attribution").collect()
    assert(rows.nonEmpty)
    val attrib = rows.map(_.getAs[Long]("attrib_ppm")).sum
    assert(attrib <= 1000000L && attrib > 1000000L - rows.length,
      s"attribution mass $attrib out of floor-rounding band")
    rows.foreach { r =>
      assert(r.getAs[Long]("re_ppm") <= 1000000L)
      assert(r.getAs[Long]("touched_convs") <= r.getAs[Long]("touched_users"))
    }
    val firsts = rows.map(_.getAs[Long]("n_first_touch")).sum
    val lastsC = rows.map(_.getAs[Long]("n_last_touch_conv")).sum
    assert(firsts >= lastsC,
      "more converted last-touches than journeys with a first touch")
  }
}
