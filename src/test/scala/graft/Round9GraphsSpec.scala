package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Invariants for batch Q (q445-q447), including the q445 lifting
  * contract: the image of f^1024 must already be stable (equal to the
  * image of f^2048), i.e. every tail is shorter than 1024.
  */
class Round9GraphsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q445: image of f^1024 is stable (== image of f^2048) and " +
      "cyclic nodes are closed under f") {
    val keys = graft.Tables.t(spark, sf, "part").select(col("p_partkey"))
    val n = keys.count()
    val nodes = keys
      .withColumn("u",
        row_number().over(Window.orderBy(col("p_partkey"))).cast("long")
          - 1)
      .select(col("u"))
    val f = nodes.select(col("u"), ((col("u") * col("u") + 1) % n)
      .as("v"))
    val g1024 = (1 to 10).foldLeft(f) { (g, _) =>
      val hop = g.select(col("u").as("m"), col("v").as("w"))
      g.join(hop, g("v") === hop("m")).select(col("u"), col("w").as("v"))
    }
    val g2048 = {
      val hop = g1024.select(col("u").as("m"), col("v").as("w"))
      g1024.join(hop, g1024("v") === hop("m"))
        .select(col("u"), col("w").as("v"))
    }
    val img1 = g1024.select(col("v")).distinct()
    val img2 = g2048.select(col("v")).distinct()
    assert(img1.exceptAll(img2).isEmpty && img2.exceptAll(img1).isEmpty,
      "image not stable at 1024 steps — tails exceed the lift depth")
    // closure: f(cyclic) stays cyclic
    val fImg = img1.withColumnRenamed("v", "u")
      .join(f, "u").select(col("v"))
    assert(fImg.exceptAll(img1).isEmpty, "cycle set not closed under f")
    val r = q("q445_cycle_core").collect().head
    assert(r.getAs[Long]("n_cyclic") == img1.count())
    assert(r.getAs[Long]("n_cyclic") + r.getAs[Long]("n_acyclic") ==
      r.getAs[Long]("n_nodes"))
  }

  test("q446: allocation exhausts the budget up to integer slack and " +
      "caps exactly the demands above the level") {
    val r = q("q446_waterfill_allocation").collect().head
    val b = r.getAs[Long]("budget_cents")
    val alloc = r.getAs[Long]("allocated_cents")
    val n = r.getAs[Long]("n_demands")
    assert(alloc <= b, "over-allocated")
    assert(b - alloc < n, s"slack ${b - alloc} >= n=$n — level too low")
    assert(r.getAs[Long]("n_uncapped") + r.getAs[Long]("n_capped") == n)
  }

  test("q447: language fertility ratios are positive and chars <= bytes") {
    val rows = q("q447_token_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Long]("n_bytes") >= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("tokens_per_kchar_ppm") > 0)
      assert(r.getAs[Long]("bytes_per_token_ppm") > 0)
    }
  }
}
