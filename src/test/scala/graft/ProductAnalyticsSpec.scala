package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the product-analytics family (q260-q263). */
class ProductAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q260: spine is complete and every hour is filled") {
    val rows = SparkEntry.queries("q260_resample_gapfill")(spark, sf)
      .collect()
    val hours = rows.map(_.getAs[java.sql.Timestamp]("h").getTime).sorted
    // Contiguous hourly spine: max-min spans exactly (n-1) hours.
    assert(hours.last - hours.head == (hours.length - 1) * 3600000L)
    // LOCF with a 96 h lookback must fill every hour at fixture scale,
    // and some hours must actually BE gap-filled (else the test is vacuous).
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("filled_avg")), r.toString)
      assert(r.getAs[java.sql.Timestamp]("last_obs_h")
        .compareTo(r.getAs[java.sql.Timestamp]("h")) <= 0, r.toString)
    }
    assert(rows.exists(r => !r.getAs[Boolean]("observed")))
  }

  test("q261: funnel stages are monotone non-increasing") {
    val r = SparkEntry.queries("q261_funnel")(spark, sf).collect()(0)
    val (a, b, c) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_view7"),
      r.getAs[Long]("n_purchase7"))
    assert(a >= b && b >= c && c >= 0, r.toString)
  }

  test("q262: week_offset 0 exists for every cohort and users add up") {
    val rows = SparkEntry.queries("q262_cohort_retention")(spark, sf)
      .collect()
    val byCohort = rows.groupBy(_.getAs[java.sql.Timestamp]("cohort_week"))
    byCohort.foreach { case (ck, rs) =>
      // The first-activity week IS the cohort week, so offset 0 exists
      // and is each cohort's maximum (retention can only shed users).
      val off0 = rs.find(_.getAs[Int]("week_offset") == 0)
      assert(off0.isDefined, s"cohort $ck missing offset 0")
      val m = off0.get.getAs[Long]("active_users")
      rs.foreach(r => assert(r.getAs[Long]("active_users") <= m, r.toString))
    }
    val users = Tables.t(spark, sf, "events")
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(byCohort.values.flatten
      .filter(_.getAs[Int]("week_offset") == 0)
      .map(_.getAs[Long]("active_users")).sum == users)
  }

  test("q266: attribution partitions all purchases exactly once") {
    val rows = SparkEntry.queries("q266_attribution")(spark, sf).collect()
    val attributed = rows.map(_.getAs[Long]("n_purchases")).sum
    val purchases = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases, s"$attributed != $purchases")
    // Purchases never self-attribute.
    assert(!rows.exists(_.getAs[String]("attributed_to") == "purchase"))
  }

  test("q267: arms partition users; variances are non-negative") {
    val r = SparkEntry.queries("q267_ab_test")(spark, sf).collect()(0)
    val users = Tables.t(spark, sf, "events")
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    assert(r.getAs[Double]("var_a") >= 0 && r.getAs[Double]("var_b") >= 0)
    // Hash assignment is unbiased-ish: neither arm may be empty or tiny.
    assert(r.getAs[Long]("n_a") * 5 > users && r.getAs[Long]("n_b") * 5 > users)
  }

  test("q270: flagged hours genuinely exceed their type threshold") {
    val rows = SparkEntry.queries("q270_anomaly_hours")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n").toDouble > r.getAs[Double]("threshold") ||
        // round(threshold, 4) may round UP past n; the unrounded
        // comparison is the filter itself, so tolerate the edge.
        r.getAs[Long]("n").toDouble > r.getAs[Double]("threshold") - 1e-4,
        r.toString)
      assert(r.getAs[Double]("threshold") > r.getAs[Double]("mean_n"))
    }
  }

  test("q271: erasure is complete and the books balance") {
    val r = SparkEntry.queries("q271_erasure_audit")(spark, sf).collect()(0)
    assert(r.getAs[Long]("residual_events") == 0L, r.toString)
    assert(r.getAs[Long]("n_events_before") ==
      r.getAs[Long]("n_events_left") + r.getAs[Long]("n_events_removed"))
    assert(r.getAs[Long]("n_users_erased") > 0)
  }

  test("q263: transition probabilities sum to 1 per source type") {
    val rows = SparkEntry.queries("q263_event_transitions")(spark, sf)
      .collect()
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (src, rs) =>
      val tot = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(tot - 1.0) < 0.01, s"$src sums to $tot")
    }
  }

  test("multi-touch attribution: per-purchase credits sum to 1M ppm " +
      "minus only integer-split residue") {
    val rows = SparkEntry.queries("q322_multitouch_attribution")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Long]("credit_ppm_total")).sum
    // replay per-purchase touch counts to bound the truncation residue:
    // each n>=3-touch purchase loses at most (nt-2)-1 ppm to DIV
    val ev = Tables.t(spark, sf, "events")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        unix_micros(col("ts")).as("pts"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tts"))
    val nts = purch.join(touch, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("pts") - col("tts") <= lit(24L * 3600 * 1000000))
      .groupBy(col("pid")).count()
      .collect().map(_.getLong(1))
    val expected = nts.map {
      case 1L => 1000000L
      case 2L => 1000000L
      case n  => 800000L + (200000L / (n - 2)) * (n - 2)
    }.sum
    assert(totalCredit == expected,
      s"credit total $totalCredit != replayed $expected")
  }

  test("ratio to report: shares sum to ~1M ppm, ranks dense and " +
      "revenue-ordered") {
    val rows = SparkEntry.queries("q329_ratio_to_report")(spark, sf)
      .collect().sortBy(_.getAs[Int]("rev_rank"))
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length,
      s"shares sum to $shareSum")
    assert(rows.map(_.getAs[Int]("rev_rank")).toSeq ==
      (1 to rows.length))
    val revs = rows.map(_.getAs[Long]("rev_cents"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("bot regularity: all five planted machine-cadence users " +
      "flagged at exactly 60s mean gap") {
    val rows = SparkEntry.queries("q324_bot_regularity")(spark, sf)
      .collect()
    val bots = rows.filter(_.getAs[Long]("user_id") >= 900001L)
    assert(bots.length == 5)
    bots.foreach { r =>
      assert(r.getAs[Long]("n_gaps") == 49L)
      assert(r.getAs[Long]("mean_gap_s") == 60L)
    }
  }
}
