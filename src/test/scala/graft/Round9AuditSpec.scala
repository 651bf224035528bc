package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for batch P (q441-q444). */
class Round9AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q441: FK edges estimate near-exactly, the skew-correlated " +
      "edge underestimates badly") {
    val rows = q("q441_join_card_estimate").collect()
      .map(r => r.getAs[String]("edge") -> r).toMap
    assert(rows.size == 4)
    Seq("lineitem-orders", "lineitem-part", "orders-customer")
      .foreach { e =>
        assert(rows(e).getAs[Long]("abs_err_ppm") <= 50000,
          s"FK edge $e should estimate within 5%: ${rows(e)}")
      }
    val skew = rows("skewed-derived")
    assert(skew.getAs[Long]("abs_err_ppm") > 500000,
      s"skewed edge should mis-estimate >50%: $skew")
    rows.values.foreach { r =>
      assert((r.getAs[Long]("overestimates") == 1L) ==
        (r.getAs[Long]("est") >= r.getAs[Long]("actual")), s"flag: $r")
    }
  }

  test("q442: prior revenue is leakage-free (first month has no " +
      "history) and history coverage grows monotonically") {
    val rows = q("q442_pit_feature_backfill").collect()
      .sortBy(_.getAs[String]("month"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("sum_prior_cents") <
      rows.last.getAs[Long]("sum_prior_cents") ||
      rows.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("orders_with_history") <=
        r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("sum_prior_cents") >= 0)
    }
    // coverage ratio in the last month strictly above the first
    val f = rows.head; val l = rows.last
    assert(l.getAs[Long]("orders_with_history") * f.getAs[Long]("n_orders")
      >= f.getAs[Long]("orders_with_history") * l.getAs[Long]("n_orders"))
  }

  test("q443: diff counts reconcile with the planted mutation rates") {
    val r = q("q443_snapshot_diff").collect().head
    val base = graft.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("k"))
    val added = base.filter(col("k") % 13 === 0 && col("k") % 11 =!= 0)
      .count()
    val removed = base.filter(col("k") % 11 === 0 && col("k") % 13 =!= 0)
      .count()
    val changed = base.filter(col("k") % 7 === 0 && col("k") % 11 =!= 0 &&
      col("k") % 13 =!= 0).count()
    assert(r.getAs[Long]("n_added") == added)
    assert(r.getAs[Long]("n_removed") == removed)
    assert(r.getAs[Long]("n_changed") == changed)
    // every changed row moved exactly +1 cent
    assert(r.getAs[Long]("changed_cents_delta") == changed)
  }

  test("q444: uniform keys need no salt, the skewed key gets one " +
      "proportional to its share of 32 partitions") {
    val rows = q("q444_skew_salt_advisor").collect()
      .map(r => r.getAs[String]("join_key") -> r).toMap
    rows.values.foreach { r =>
      val expected = math.ceil(r.getAs[Long]("top_cnt").toDouble /
        math.max(1L, r.getAs[Long]("n_rows") / 32)).toLong
      assert(r.getAs[Long]("salt_factor") == math.max(1L, expected),
        s"salt formula: $r")
    }
    val skew = rows("skewed_demo")
    assert(skew.getAs[Long]("top_share_ppm") > 700000)
    assert(skew.getAs[Long]("salt_factor") >
      rows("o_custkey").getAs[Long]("salt_factor"),
      "the planted heavy key must out-salt the uniform key")
  }
}
