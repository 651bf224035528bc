package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for batch O (q437-q440): snap soundness vs a brute-force
  * re-derivation, tail share algebra, encoding cost dominance, z-test
  * symmetry.
  */
class Round9SnapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q437: every snap is within tolerance and the cell-bucketed " +
      "candidate set loses no point vs brute force") {
    val rows = q("q437_snap_to_segment").collect()
    assert(rows.nonEmpty)
    val tol2micro = 25000000L
    rows.foreach { r =>
      assert(r.getAs[Long]("max_micro_d2") <= tol2micro)
      assert(r.getAs[Long]("avg_micro_d2") <= r.getAs[Long]("max_micro_d2"))
    }
    // brute-force count of snappable points must equal the bucketed
    // join's total (candidate completeness — the scale-path claim)
    val ev = graft.Tables.t(spark, sf, "events")
      .filter(col("event_id") % 4 === 0)
      .select(col("event_id"),
        ((col("event_id") * 17 % 10000) / 100.0).as("px"),
        ((col("event_id") * 31 % 10000) / 100.0).as("py"))
    val segs = graft.Tables.t(spark, sf, "supplier").select(
      col("s_suppkey").as("seg_id"),
      (col("s_suppkey") * 37 % 100).cast("double").as("ax"),
      (col("s_suppkey") * 53 % 100).cast("double").as("ay"),
      (col("s_suppkey") % 7 - 3 +
        when(col("s_suppkey") % 7 === 3 && col("s_suppkey") % 5 === 2, 1)
          .otherwise(0)).cast("double").as("dx"),
      (col("s_suppkey") % 5 - 2).cast("double").as("dy"))
    val brute = ev.crossJoin(segs)
      .withColumn("len2", col("dx") * col("dx") + col("dy") * col("dy"))
      .withColumn("tt", least(lit(1.0), greatest(lit(0.0),
        ((col("px") - col("ax")) * col("dx") +
          (col("py") - col("ay")) * col("dy")) / col("len2"))))
      .withColumn("d2",
        (col("px") - (col("ax") + col("tt") * col("dx"))) *
          (col("px") - (col("ax") + col("tt") * col("dx"))) +
        (col("py") - (col("ay") + col("tt") * col("dy"))) *
          (col("py") - (col("ay") + col("tt") * col("dy"))))
      .filter(floor(col("d2") * 1000000).cast("long") <= tol2micro)
      .select(col("event_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_snapped")).sum == brute,
      "bucketed join dropped snappable points")
  }

  test("q438: tail shares sum to ~1e6 ppm and every tail row clears " +
      "the threshold") {
    val rows = q("q438_tail_attribution").collect()
    assert(rows.nonEmpty)
    val share = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(share - 1000000L) <= rows.length, s"shares=$share")
    val thr = rows.head.getAs[Long]("thr_micro")
    rows.foreach { r =>
      // per-type average tail value >= threshold
      assert(r.getAs[Long]("tail_value_micro") >=
        thr * r.getAs[Long]("n_tail"))
    }
  }

  test("q439: recommended encoding is the cost argmin for every column") {
    val rows = q("q439_encoding_advisor").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val d = r.getAs[Long]("est_dict_bits")
      val e = r.getAs[Long]("est_rle_bits")
      val p = r.getAs[Long]("est_plain_bits")
      val rec = r.getAs[String]("recommended")
      val best = math.min(d, math.min(e, p))
      val expect = if (e == best) "rle" else if (d == best) "dict"
        else "plain"
      assert(rec == expect, s"recommended=$rec costs=($d,$e,$p)")
    }
  }

  test("q440: proportions are consistent with counts and significance " +
      "tracks |z|") {
    val r = q("q440_ab_conversion_ztest").collect().head
    assert(r.getAs[Long]("p0_ppm") ==
      1000000L * r.getAs[Long]("c0") / r.getAs[Long]("n0"))
    assert(r.getAs[Long]("p1_ppm") ==
      1000000L * r.getAs[Long]("c1") / r.getAs[Long]("n1"))
    val sig = r.getAs[Long]("significant") == 1L
    assert(sig == (math.abs(r.getAs[Long]("z_milli")) >= 1960L))
  }
}
