package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch Z (q472-q474). */
class Round9BehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q472: funnel-instance counts match a brute-force triple " +
      "count on one user") {
    import org.apache.spark.sql.functions._
    val rows = q("q472_subsequence_count").collect()
    assert(rows.nonEmpty && rows.forall(
      _.getAs[Long]("funnel_instances") >= 0))
    // brute-force verify the global total on the tiny fixture
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    val brute = ev.values.map { es =>
      val sorted = es.sortBy(r => (r.getAs[java.sql.Timestamp]("ts")
        .getTime, r.getAs[Long]("event_id")))
      val types = sorted.map(_.getAs[String]("event_type"))
      var c1 = 0L; var c2 = 0L; var c3 = 0L
      types.foreach {
        case "signup" => c1 += 1
        case "click" => c2 += c1
        case "purchase" => c3 += c2
        case _ =>
      }
      c3
    }.sum
    assert(rows.map(_.getAs[Long]("funnel_instances")).sum == brute,
      "window count disagrees with brute-force DP")
  }

  test("q473: co-occurrence is bounded by min degree and cosine by 1") {
    val rows = q("q473_brand_cooccurrence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val co = r.getAs[Long]("co")
      assert(co <= math.min(r.getAs[Long]("dega"),
        r.getAs[Long]("degb")), s"support exceeds degree: $r")
      assert(r.getAs[Long]("cosine_milli") <= 1000L)
      assert(r.getAs[String]("ba") < r.getAs[String]("bb"))
    }
  }

  test("q474: ANOVA decomposition is non-negative and eta2 " +
      "consistent with SSB/(SSB+SSW)") {
    val r = q("q474_anova_f").collect().head
    val ssb = r.getAs[Long]("ssb_centi")
    val ssw = r.getAs[Long]("ssw_centi")
    assert(ssb >= 0 && ssw > 0)
    assert(r.getAs[Long]("k") == 7)
    val eta = r.getAs[Long]("eta2_ppm")
    val expect = math.floor(1e6 * ssb.toDouble / (ssb + ssw))
    assert(math.abs(eta - expect) <= 200,
      s"eta2 $eta vs ${expect} (centi-quantization slack)")
  }
}
