package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AC (q481-q483). */
class Round9SignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q481: deciles partition the users and cumulative counts " +
      "are monotone") {
    val rows = q("q481_uplift_qini").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_t") <= r.getAs[Long]("n_t"))
      assert(r.getAs[Long]("c_c") <= r.getAs[Long]("n_c"))
    }
    val users = graft.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c"))
      .sum == users)
  }

  test("q482: entropy is within [0, max] and predictability is the " +
      "exact complement") {
    val rows = q("q482_transition_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("entropy_milli")
      val hMax = r.getAs[Long]("max_entropy_milli")
      assert(h >= 0 && h <= hMax + 1,
        s"entropy outside [0, max]: $r")
      assert(r.getAs[Long]("predictability_milli") == hMax - h)
    }
  }

  test("q483: a Poisson-ish event stream scores near-zero " +
      "burstiness and cv stays positive") {
    val rows = q("q483_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cv_milli") > 0)
      assert(r.getAs[Long]("mean_gap_s") > 0)
      val b = r.getAs[Long]("burstiness_milli")
      assert(b > -1000 && b < 1000, s"burstiness outside (-1,1): $r")
    }
  }
}
