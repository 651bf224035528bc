package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batches AG-AL (q493-q510). */
class Round9ClosingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q493: HDR quantile upper bounds are monotone p50<=p90<=p99") {
    val rows = q("q493_hdr_histogram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Long]("p50_ub_cents"),
        r.getAs[Long]("p90_ub_cents"), r.getAs[Long]("p99_ub_cents"))
      assert(p50 <= p90 && p90 <= p99, s"non-monotone quantiles: $r")
    }
  }

  test("q494: drawdown is a fraction of peak in [0, 1e6] ppm") {
    q("q494_max_drawdown").collect().foreach { r =>
      val dd = r.getAs[Long]("max_drawdown_ppm")
      assert(dd >= 0 && dd <= 1000000L, s"drawdown out of range: $r")
    }
  }

  test("q495: delta-method arms are populated") {
    q("q495_delta_method_ratio").collect().foreach { r =>
      assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n1") > 0)
    }
  }

  test("q496: SAX top word is 3 symbols over the {a,b,c,d} alphabet") {
    val rows = q("q496_sax_motifs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[String]("top_word")
      assert(w.length == 3 && w.forall("abcd".contains(_)),
        s"bad SAX word: $w")
      assert(r.getAs[Long]("top_count") >= 1)
    }
  }

  test("q497: absorption probabilities are ppm-bounded and exclude " +
      "the absorbing states") {
    val rows = q("q497_absorbing_markov").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val st = r.getAs[String]("start_state")
      assert(st != "purchase" && st != "exit")
      val p = r.getAs[Long]("p_convert_ppm")
      assert(p >= 0 && p <= 1000000L, s"ppm out of range: $r")
    }
  }

  test("q498: every layout scans the same corpus, pruning never " +
      "loses matches") {
    val rows = q("q498_curve_layout_advisor").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("rows_total")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("rows_matched")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("rows_scanned") <= r.getAs[Long]("rows_total"))
      assert(r.getAs[Long]("files_hit") <= r.getAs[Long]("n_files"))
    }
  }

  test("q499: the Bloom filter never false-negatives") {
    val r = q("q499_bloom_join_prune").collect().head
    assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_true"),
      "a member key failed the filter")
    assert(r.getAs[Long]("n_fp") ==
      r.getAs[Long]("n_pass") - r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("bits_set") <= 3 * r.getAs[Long]("n_dim"))
  }

  test("q500: communities are size-ordered and cover no more than " +
      "the node set") {
    val rows = q("q500_label_propagation").collect()
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getAs[Long]("n_members"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("q501: split-conformal empirical coverage is near the 90% target") {
    val rows = q("q501_conformal_calibration").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val cov = r.getAs[Long]("coverage_ppm")
      // finite-sample noise at sf0.001 (~400 test rows/flag): ±5%
      assert(cov >= 850000L && cov <= 1000000L,
        s"coverage far from target: $r")
      assert(r.getAs[Long]("qhat_dollars") >= 0)
    }
  }

  test("q502: shrinkage never inflates the gap ordering and stays " +
      "in ppm range") {
    val rows = q("q502_eb_shrinkage").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val sp = r.getAs[Long]("shrunk_ppm")
      assert(sp >= 0 && sp <= 1000000L)
      assert(r.getAs[Long]("gap_ppm") >= 0)
    }
  }

  test("q503: Spearman rho is a valid correlation in ppm") {
    val r = q("q503_spearman_rank_corr").collect().head
    val rho = r.getAs[Long]("rho_ppm")
    assert(rho >= -1000000L && rho <= 1000000L)
  }

  test("q504: 11 lags with exactly one best") {
    val rows = q("q504_xcorr_lag").collect()
    assert(rows.length == 11)
    assert(rows.map(_.getAs[Long]("is_best")).sum == 1L)
    rows.foreach { r =>
      val c = r.getAs[Long]("xcorr_ppm")
      assert(c >= -1000000L && c <= 1000000L)
    }
  }

  test("q505: R/S grows with block size and H is in a sane band") {
    val r = q("q505_hurst_rs").collect().head
    assert(r.getAs[Long]("rs8_ppm") < r.getAs[Long]("rs64_ppm"),
      "rescaled range must grow with block size")
    val h = r.getAs[Long]("hurst_ppm")
    assert(h > 0 && h < 1200000L, s"H out of band: $h")
  }

  test("q506: greedy gains are non-increasing and the cumulative " +
      "column is their prefix sum") {
    val rows = q("q506_greedy_set_cover").collect()
    assert(rows.nonEmpty)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      "greedy marginal gains must be non-increasing")
    assert(rows.map(_.getAs[Long]("gain")).sum ==
      rows.last.getAs[Long]("covered_total"))
  }

  test("q507: Gumbel return levels are monotone in the return period") {
    val r = q("q507_gumbel_return_levels").collect().head
    val (r10, r52, r365) = (r.getAs[Long]("rl_10_cents"),
      r.getAs[Long]("rl_52_cents"), r.getAs[Long]("rl_365_cents"))
    assert(r10 <= r52 && r52 <= r365)
    assert(r.getAs[Long]("beta_cents") > 0)
  }

  test("q508: reorder point covers at least lead-time mean demand") {
    val rows = q("q508_safety_stock").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rop = r.getAs[Long]("rop_units")
      val meanMilli = r.getAs[Long]("mean_qty_milli")
      assert(rop * 1000L >= 7L * meanMilli, s"ROP below lead demand: $r")
      assert(r.getAs[Long]("active_days") <= r.getAs[Long]("n_days"))
    }
  }

  test("q509: Theil decomposition identity holds and parts are " +
      "non-negative") {
    val r = q("q509_theil_decomposition").collect().head
    val (tt, tb, tw) = (r.getAs[Long]("theil_total_micro"),
      r.getAs[Long]("theil_between_micro"),
      r.getAs[Long]("theil_within_micro"))
    assert(tt == tb + tw)
    assert(tb >= 0, s"between-group Theil negative: $tb")
    assert(tw >= -1, s"within-group Theil negative: $tw")
  }

  test("q510: the stationarity verdict matches the statistic") {
    val r = q("q510_adf_unit_root").collect().head
    val df = r.getAs[Long]("df_stat_milli")
    val flag = r.getAs[Long]("stationary_5pct")
    assert((df < -2860 && flag == 1L) || (df >= -2860 && flag == 0L))
  }
}
