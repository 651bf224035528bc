package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator invariants — properties the DuckDB hash gate cannot
  * express (monotonicity, bounds, plan shapes, cross-variant
  * relations), pinned at sf0.001.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q375: Kaplan-Meier survival is non-increasing, risk sets " +
      "shrink, and survival stays in [0, 1]") {
    val rows = q("q375_kaplan_meier").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
      "survival increased between steps")
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
      "risk set grew between steps")
  }

  test("q376: rendezvous movement is near the 1/9 optimum and far " +
      "below the ~8/9 a mod-N rehash would cost") {
    import org.apache.spark.sql.functions._
    val rows = q("q376_rendezvous_sharding").collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val moved = rows.map(_.getAs[Long]("n_moved")).sum
    val frac = moved.toDouble / n
    assert(frac > 0.0 && frac < 0.25,
      s"HRW moved fraction $frac not near 1/9")
    // mod-N comparator: docs whose doc_id % 8 != doc_id % 9.
    val modMoved = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 8 =!= col("doc_id") % 9).count()
    assert(modMoved.toDouble / n > 0.7, "mod-N comparator unexpectedly cheap")
    assert(frac < modMoved.toDouble / n / 3,
      "HRW not materially cheaper than mod-N rehash")
  }

  test("q372: all five folds present with positive holdout RMSE, and " +
      "the plan stays within the one-scan + broadcast budget") {
    val df = q("q372_kfold_cv")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("fold")).toSeq.sorted == (0L to 4L))
    assert(rows.forall(_.getAs[Double]("rmse") > 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert("SortMergeJoin".r.findAllIn(plan).isEmpty,
      "fold-coefficient join must broadcast, not sort-merge")
  }

  test("q383: PSI is non-negative for every series (Csiszar " +
      "f-divergence property)") {
    val rows = q("q383_psi_drift").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("psi") >= 0.0))
  }

  test("q377: ranking metrics live in [0, 1] and NDCG@10 = 1 implies " +
      "recall consistency") {
    val rows = q("q377_ranking_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall10")
      val mrr = r.getAs[Double]("mrr")
      val ndcg = r.getAs[Double]("ndcg10")
      assert(rec >= 0 && rec <= 1 && mrr > 0 && mrr <= 1 &&
        ndcg >= 0 && ndcg <= 1)
    }
  }

  test("q387: the released value decomposes as true count + signed " +
      "noise of the reported magnitude") {
    val rows = q("q387_dp_release").collect()
    rows.foreach { r =>
      val t = r.getAs[Long]("n_true").toDouble
      val rel = r.getAs[Double]("released")
      val mag = r.getAs[Double]("noise_magnitude")
      assert(math.abs(math.abs(rel - t) - mag) < 1e-6)
      assert(mag < 40.0, "Laplace(b=2) tail beyond credible range")
    }
  }

  test("q389: the stats-merge identity holds on both columns") {
    val rows = q("q389_stats_merge").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Boolean]("merge_exact_ok")))
    assert(rows.forall(_.getAs[Boolean]("ndv_merge_ok")))
  }

  test("q391: mergeSchema unifies both batch schemas and null-fills " +
      "the missing columns") {
    val row = q("q391_schema_merge_scan").collect().head
    val nRows = row.getAs[Long]("n_rows")
    assert(nRows == row.getAs[Long]("n_docs"), "doc_id collision across batches")
    assert(row.getAs[Long]("n_lang") + row.getAs[Long]("n_source") == nRows,
      "each row must carry exactly one of the evolved columns")
  }

  test("q371: HLL DAU/WAU stays within the 5% gate against exact on " +
      "every row") {
    val rows = q("q371_rolling_active_users_hll").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("dau_ok")))
    assert(rows.forall(_.getAs[Boolean]("wau_ok")))
  }
}

/** Positive control for the q403 watermark audit: a replay INSIDE the
  * watermark must be APPLIED (days double), proving the late file is
  * really read and the green q403 result comes from watermark DROPS,
  * not from the source never seeing the replay.
  */
class WatermarkControlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("in-watermark replay doubles its days; out-of-watermark does not") {
    import org.apache.spark.sql.functions._
    val base = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // In-watermark replay: days 19-20 sit above wm (~day 17).
    val doubled = streaming.StreamingIngest
      .streamedWatermarkAudit(spark, sf, "2024-01-19", "2024-01-21")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val jan19 = java.sql.Timestamp.valueOf("2024-01-19 00:00:00")
    val jan20 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    assert(doubled(jan19) == 2 * base(jan19) &&
      doubled(jan20) == 2 * base(jan20),
      "in-watermark replay was not applied - the audit harness is blind")
    // Out-of-watermark replay (the q403 default): nothing doubles.
    val dropped = streaming.StreamingIngest
      .streamedWatermarkAudit(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(dropped == base, "late replay leaked into the aggregate")
  }
}

/** Invariants for the later round-9 batches (q413-q420). */
class Round9LateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q420: AM >= GM >= HM on every group (Pythagorean inequality)") {
    q("q420_pythagorean_means").collect().foreach { r =>
      val am = r.getAs[Double]("arith_mean")
      val gm = r.getAs[Double]("geo_mean")
      val hm = r.getAs[Double]("harm_mean")
      assert(am >= gm - 1e-9 && gm >= hm - 1e-9, s"AM/GM/HM violated: $r")
    }
  }

  test("q413: containment dominates Jaccard on every pair") {
    q("q413_containment_pairs").collect().foreach { r =>
      assert(r.getAs[Long]("containment_ppm") >=
        r.getAs[Long]("jaccard_ppm"))
    }
  }

  test("q414: every reported scan window is a positive-LLR excess") {
    q("q414_scan_statistic").collect().foreach { r =>
      assert(r.getAs[Double]("llr") > 0.0)
      assert(r.getAs[Number]("win_len").longValue() >= 1)
    }
  }

  test("q415: gains are sorted descending and within (0, 0.5]") {
    val gains = q("q415_best_split").collect()
      .map(_.getAs[Double]("gini_gain"))
    assert(gains.nonEmpty)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
    assert(gains.forall(g => g > -1e-9 && g <= 0.5))
  }

  test("q416: confidence dominates support for every rule") {
    q("q416_association_rules").collect().foreach { r =>
      assert(r.getAs[Long]("conf_a_to_b_ppm") >=
        r.getAs[Long]("support_ppm"))
      assert(r.getAs[Long]("conf_b_to_a_ppm") >=
        r.getAs[Long]("support_ppm"))
    }
  }

  test("q417: matched pairs respect the caliper and cover most treated") {
    val r = q("q417_propensity_matching").collect().head
    assert(r.getAs[Double]("mean_covariate_gap") <= 2.0)
    assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_treated"))
    assert(r.getAs[Long]("n_matched") > 0)
  }

  test("q418: EM parameters are probabilities with m above u per field") {
    val r = q("q418_linkage_em").collect().head
    Seq("pi", "m_brand", "m_type", "m_size", "u_brand", "u_type",
      "u_size").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c=$v out of [0,1]")
    }
    assert(r.getAs[Double]("m_size") >= r.getAs[Double]("u_size"),
      "agreement should be likelier under match than non-match")
  }
}
