package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch BA (q553-q555). */
class Round9BootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q553: 32 replicas, positive SE, CI brackets the point " +
      "estimate symmetrically") {
    val r = q("q553_poisson_bootstrap").collect().head
    assert(r.getAs[Long]("n_replicas") == 32)
    val (pt, se) = (r.getAs[Long]("point_milli"),
      r.getAs[Long]("se_milli"))
    assert(se > 0, "degenerate bootstrap SE")
    assert(r.getAs[Long]("ci_lo_milli") == pt - se * 196 / 100)
    assert(r.getAs[Long]("ci_hi_milli") == pt + se * 196 / 100)
    // SE of a mean over n orders must be far below the mean itself
    assert(se < pt / 10, s"SE implausibly large: $se vs $pt")
  }

  test("q554: one EWMA row per (series, day); first day's EWMA " +
      "equals the day value; flags are 0/1") {
    val rows = q("q554_ewma_control_chart").collect()
    assert(rows.nonEmpty)
    val bySeries = rows.groupBy(_.getAs[String]("event_type"))
    bySeries.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[Long]("day"))
      assert(days.distinct.length == days.length)
    }
    rows.foreach { r =>
      val f = r.getAs[Long]("out_of_control")
      assert(f == 0L || f == 1L)
    }
  }

  test("q555: 11 candidates, gini ascending, bounded by 0.5 " +
      "(2-class max), children partition the corpus") {
    val rows = q("q555_gini_stump").collect()
    assert(rows.length == 11)
    val ginis = rows.map(_.getAs[Long]("gini_micro"))
    assert(ginis.zip(ginis.tail).forall { case (a, b) => a <= b })
    ginis.foreach(g => assert(g >= 0 && g <= 500000L,
      s"gini outside [0, 0.5]: $g"))
    val n = graft.Tables.t(spark, sf, "lineitem").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n0") == n)
    }
  }
}
