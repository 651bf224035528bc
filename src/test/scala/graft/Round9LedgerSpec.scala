package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch S (q451-q453). */
class Round9LedgerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q451: FIFO consumes exactly min(in, out) per part in total " +
      "and never more than was bought") {
    val r = q("q451_fifo_cogs").collect().head
    assert(r.getAs[Long]("total_consumed") <= r.getAs[Long]("total_in"))
    assert(r.getAs[Long]("total_consumed") <= r.getAs[Long]("total_out"))
    assert(r.getAs[Long]("total_cogs_cents") > 0)
    assert(r.getAs[Long]("n_parts_short") <= r.getAs[Long]("n_parts"))
  }

  test("q452: validation SSE is finite and the path is smooth — " +
      "slope shrinks monotonically toward zero as lambda grows") {
    val rows = q("q452_ridge_path").collect()
      .sortBy(_.getAs[Double]("lambda"))
    assert(rows.length == 7)
    val slopes = rows.map(_.getAs[Double]("slope"))
    // |slope| strictly decreasing in lambda (ridge shrinkage)
    slopes.map(math.abs).sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"shrinkage violated: $a -> $b")
    }
    rows.foreach(r => assert(!r.getAs[Double]("sse_val").isNaN &&
      r.getAs[Double]("sse_val") > 0))
  }

  test("q453: the true key FD holds, non-keys violate, and violation " +
      "rows are bounded by group excess") {
    val rows = q("q453_fd_discovery").collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(rows("orderkey->custkey").getAs[Long]("holds") == 1L)
    assert(rows("priority->status").getAs[Long]("holds") == 0L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("violating_rows") >=
        r.getAs[Long]("violating_groups"),
        "each violating group contributes at least one violating row")
      assert((r.getAs[Long]("holds") == 1L) ==
        (r.getAs[Long]("violating_groups") == 0L))
    }
  }
}
