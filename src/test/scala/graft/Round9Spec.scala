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
