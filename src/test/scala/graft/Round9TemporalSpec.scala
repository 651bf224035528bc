package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch Y (q469-q471). */
class Round9TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q469: rolling slopes exist for every series tail and stay " +
      "within the |y|max/day bound") {
    val rows = q("q469_rolling_regression").collect()
    assert(rows.nonEmpty)
    val maxY = rows.map(_.getAs[Long]("y")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("n") >= 3 && r.getAs[Long]("n") <= 7)
      // a 7-point daily series can't have |slope| > max(y) per day
      assert(math.abs(r.getAs[Long]("slope_milli")) <= maxY * 1000,
        s"slope bound violated: $r")
    }
  }

  test("q470: imputation audit — missing counts match the knockout " +
      "rule and group-mean imputation keeps drift small") {
    import org.apache.spark.sql.functions._
    val rows = q("q470_null_imputation").collect()
    val expectMissing = graft.Tables.t(spark, sf, "events")
      .filter(col("event_id") % 13 === 0).count()
    assert(rows.map(_.getAs[Long]("n_missing")).sum == expectMissing)
    rows.foreach { r =>
      // drift is attributable ONLY to the knocked-out rows: each can
      // move the mass by at most the value range (~200.00 = 20k cents)
      val driftCents = math.abs(r.getAs[Long]("imputed_cents") -
        r.getAs[Long]("original_cents"))
      assert(driftCents <= r.getAs[Long]("n_missing") * 20000L,
        s"imputation drifted beyond per-row bound: $r")
    }
  }

  test("q471: SCD2 as-of census covers exactly the users active " +
      "before the midpoint") {
    import org.apache.spark.sql.functions._
    val rows = q("q471_scd2_build").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_users_in_state")).sum
    // every user with an event at/before the midpoint is in exactly
    // one state; nobody else is
    val ev = graft.Tables.t(spark, sf, "events")
    val bounds = ev.agg(min(col("ts")).cast("long"),
      max(col("ts")).cast("long")).collect().head
    val probe = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val expected = ev.filter(col("ts").cast("long") <= probe)
      .select(col("user_id")).distinct().count()
    assert(total == expected, s"census $total != active users $expected")
  }
}
