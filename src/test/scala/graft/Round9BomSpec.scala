package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for batch R (q448-q450). */
class Round9BomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q448: the level-synchronous rollup matches a driver-side " +
      "recursive evaluation of the same tree") {
    import org.apache.spark.sql.expressions.Window
    val rows = q("q448_bom_rollup").collect()
      .map(r => r.getAs[Long]("node") -> r).toMap
    // independent reference: collect the (bounded, dimension-sized)
    // tree and roll it up recursively on the driver
    val own = graft.Tables.t(spark, sf, "part")
      .withColumn("u",
        row_number().over(Window.orderBy(col("p_partkey"))).cast("long")
          - 1)
      .select(col("u"), floor(col("p_retailprice") * 100).cast("long")
        .as("own"))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[Long]("own"))
      .toMap
    val children = own.keys.filter(_ > 0).groupBy(u => (u - 1) / 4)
    def roll(u: Long): Long = own(u) +
      children.getOrElse(u, Nil).map(c => (c % 3 + 1) * roll(c)).sum
    Seq(0L, 1L, 2L, 3L).filter(own.contains).foreach { u =>
      assert(rows(u).getAs[Long]("rolled_cents") == roll(u),
        s"node $u rollup mismatch")
      assert(rows(u).getAs[Long]("own_cents") == own(u))
    }
  }

  test("q449: exactly one pick per non-empty bucket, span preserved") {
    val rows = q("q449_lttb_downsample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_points")
      assert(n >= 2 && n <= 24, s"bucket picks out of range: $r")
      assert(r.getAs[Long]("last_h") > r.getAs[Long]("first_h"))
      assert(r.getAs[Long]("area_sum") > 0,
        "no interior triangle area — neighbors never joined")
    }
  }

  test("q450: business days never exceed calendar span and whole " +
      "weeks contribute exactly five") {
    val rows = q("q450_business_days").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_bdays")
      assert(avg >= 0 && avg <= 15)
      // span < 21 days -> at most 15 business days
      assert(r.getAs[Long]("max_bdays") <= 15)
      assert(r.getAs[Long]("sum_bdays") <=
        r.getAs[Long]("n_orders") * 15)
    }
  }
}
