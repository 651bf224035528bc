package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batches AM-AS (q511-q531). */
class Round9Closing2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q511: four candidate periods, exactly one peak, amplitudes " +
      "non-negative") {
    val rows = q("q511_spectral_periodogram").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("is_peak")).sum == 1L)
    rows.foreach(r => assert(r.getAs[Long]("amp_cents") >= 0))
  }

  test("q512: nine QQ points and a finite positive slope") {
    val r = q("q512_qq_drift").collect().head
    assert(r.getAs[Long]("n_points") == 9)
    val sl = r.getAs[Long]("slope_ppm")
    assert(sl > 0 && sl < 5000000L, s"QQ slope implausible: $sl")
    assert(r.getAs[Long]("max_gap_chars") >= 0)
  }

  test("q513: Wilson bound sits strictly below the raw rate and the " +
      "rankings are permutations") {
    val rows = q("q513_wilson_ranking").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("wilson_ppm") < r.getAs[Long]("raw_ppm"))
    }
    assert(rows.map(_.getAs[Long]("raw_rank")).sorted.toSeq ==
      (1L to 25L))
    assert(rows.map(_.getAs[Long]("wilson_rank")).sorted.toSeq ==
      (1L to 25L))
  }

  test("q514: retention rates are ppm-bounded; halflife positive or " +
      "sentinel") {
    q("q514_retention_halflife").collect().foreach { r =>
      Seq("r1_ppm", "r2_ppm", "r3_ppm").foreach { c =>
        val v = r.getAs[java.lang.Long](c)
        if (v != null) assert(v >= 0 && v <= 1000000L)
      }
      val h = r.getAs[Long]("halflife_milli_weeks")
      assert(h == -1L || h > 0)
    }
  }

  test("q515: every probe position lands inside its selected " +
      "invoice's cent interval") {
    val rows = q("q515_monetary_unit_sampling").collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val (pos, cents, cum) = (r.getAs[Long]("pos"),
        r.getAs[Long]("cents"), r.getAs[Long]("cum"))
      assert(pos >= cum - cents && pos < cum, s"probe outside: $r")
    }
    val ps = rows.map(_.getAs[Long]("pos"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a < b })
  }

  test("q516: the star schema has zero orphans (fixture FK contract)") {
    val rows = q("q516_fk_orphan_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L, s"orphans: $r")
      assert(r.getAs[Long]("orphan_ppm") == 0L)
    }
  }

  test("q517: energy distance is a non-negative metric") {
    val r = q("q517_energy_distance").collect().head
    assert(r.getAs[Long]("e_xy_milli") >= 0)
    assert(r.getAs[Long]("energy_milli") >= -1,
      s"negative energy beyond floor slack: $r")
  }

  test("q518: top-10 docs in descending LM score; smoothing keeps " +
      "every score finite-negative") {
    val rows = q("q518_dirichlet_lm").collect()
    assert(rows.length == 10)
    val sc = rows.map(_.getAs[Long]("score_micro"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    sc.foreach(v => assert(v < 0)) // log-probs
  }

  test("q519: cost = fp + 5*fn and exactly one optimum") {
    val rows = q("q519_cost_curve_threshold").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("cost") ==
        r.getAs[Long]("fp") + 5 * r.getAs[Long]("fn"))
    }
    assert(rows.map(_.getAs[Long]("is_optimal")).sum == 1L)
  }

  test("q520: full 16-view lattice, two selections, apex size 1, " +
      "finest view never selected") {
    val rows = q("q520_view_selection_greedy").collect()
    assert(rows.length == 16)
    assert(rows.count(_.getAs[Long]("selected_step") == 1L) == 1)
    assert(rows.count(_.getAs[Long]("selected_step") == 2L) == 1)
    val apex = rows.find(_.getAs[String]("view_label") == "-").get
    assert(apex.getAs[Long]("size_rows") == 1L)
    rows.filter(_.getAs[Long]("selected_step") > 0).foreach { r =>
      assert(r.getAs[String]("view_label") != "fsmq")
      assert(r.getAs[Long]("benefit") >= 0)
    }
  }

  test("q521: sign fields are in {-1,0,1} and group counts add up") {
    val r = q("q521_simpson_detector").collect().head
    assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("pooled_sign")))
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") <=
      r.getAs[Long]("n_groups"))
    assert(Set(0L, 1L).contains(r.getAs[Long]("paradox_flag")))
  }

  test("q522: like-for-like growth is consistent with the " +
      "new/lost revenue split") {
    val r = q("q522_like_for_like").collect().head
    val lflP1 = r.getAs[Long]("rev_p1") - r.getAs[Long]("lost_rev")
    val lflP2 = r.getAs[Long]("rev_p2") - r.getAs[Long]("new_rev")
    assert(r.getAs[Long]("growth_lfl_ppm") ==
      (lflP2 - lflP1) * 1000000L / lflP1)
  }

  test("q523: payback weeks live in {-1, 0..3}") {
    q("q523_cohort_payback").collect().foreach { r =>
      val p = r.getAs[Long]("payback_week")
      assert(p == -1L || (p >= 0 && p <= 3))
      assert(r.getAs[Long]("cohort_size") > 0)
    }
  }

  test("q524: Huber down-weights a strict subset of rows (the " +
      "fixture's price is quantity-independent, so slopes are just " +
      "near-zero noise — no sign assumption)") {
    val r = q("q524_huber_regression").collect().head
    assert(r.getAs[Long]("n_downweighted") > 0)
    assert(r.getAs[Long]("n_downweighted") < r.getAs[Long]("n"))
    // both fits exist and stay in the same noise band
    val (b1, b2) = (r.getAs[Long]("slope_ols_micro"),
      r.getAs[Long]("slope_huber_micro"))
    assert(math.abs(b1) < 1000000L * 1000000L)
    assert(math.abs(b2) < 1000000L * 1000000L)
  }

  test("q525: seven weekday indices normalizing to 7e6 within floor " +
      "slack") {
    val rows = q("q525_seasonal_index").collect()
    assert(rows.length == 7)
    val tot = rows.map(_.getAs[Long]("norm_index_ppm")).sum
    assert(math.abs(tot - 7000000L) <= 7, s"norm sum $tot")
  }

  test("q526: OBF boundaries shrink across looks and samples only " +
      "grow") {
    val rows = q("q526_obrien_fleming").collect().sortBy(
      _.getAs[Long]("look"))
    assert(rows.length == 4)
    val bs = rows.map(_.getAs[Long]("boundary_milli"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a > b })
    val ns = rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
  }

  test("q527: the DiD estimate equals the recomputed double " +
      "difference within floor slack") {
    val r = q("q527_did_estimator").collect().head
    val did = (r.getAs[Long]("t_post_cents") - r.getAs[Long]("t_pre_cents")) -
      (r.getAs[Long]("c_post_cents") - r.getAs[Long]("c_pre_cents"))
    assert(math.abs(did - r.getAs[Long]("did_cents")) <= 3,
      s"inconsistent DiD: $r")
  }

  test("q528: the stationary distribution sums to ~1 over all 5 " +
      "states") {
    val rows = q("q528_markov_stationary").collect()
    assert(rows.length == 5)
    val tot = rows.map(_.getAs[Long]("pi_ppm")).sum
    assert(math.abs(tot - 1000000L) <= 10, s"pi sums to $tot ppm")
  }

  test("q529: a positive tail index from a positive top-k frame") {
    val r = q("q529_hill_tail_index").collect().head
    assert(r.getAs[Long]("xk1_cents") > 0)
    assert(r.getAs[Long]("hill_micro") > 0)
    assert(r.getAs[Long]("alpha_milli") > 0)
  }

  test("q530: conversion is monotone in the attribution window") {
    val rows = q("q530_funnel_window_sensitivity").collect()
      .sortBy(_.getAs[Long]("window_hours"))
    assert(rows.length == 4)
    val cv = rows.map(_.getAs[Long]("cvr_ppm"))
    assert(cv.zip(cv.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getAs[Long]("n_signups")).distinct.length == 1)
  }

  test("q531: tau-b is a valid correlation and pair counts are " +
      "consistent") {
    val r = q("q531_kendall_tau").collect().head
    val tau = r.getAs[Long]("tau_b_ppm")
    assert(tau >= -1000000L && tau <= 1000000L)
    val n = r.getAs[Long]("n_parts")
    val n0 = n * (n - 1) / 2
    assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
      <= n0)
  }
}
