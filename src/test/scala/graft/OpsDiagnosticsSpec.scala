package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the ops-diagnostics family (q292 skew advisor, q293 CDC
  * latest-per-key, q294 segment overlap) + the SUMMARIZE command.
  */
class OpsDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("skew advisor: fractions sum under 1, salt brings load under " +
      "2x mean") {
    val rows = SparkEntry.queries("q292_skew_advisor")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ev = Tables.t(spark, sf, "events")
    val total = ev.count()
    val nKeys = ev.select("user_id").distinct().count()
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      val salt = r.getAs[Long]("salt_rec")
      // the recommendation's contract: per-salt-bucket load <= 2x mean
      assert(cnt.toDouble / salt <= 2.0 * total / nKeys + 1e-9)
      // ...and salt is minimal (salt-1 would overload, unless salt=1)
      if (salt > 1)
        assert(cnt.toDouble / (salt - 1) > 2.0 * total / nKeys - 1e-9)
    }
    // ordered heaviest-first
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("cdc latest: the winning version is the max (ts, event_id) and " +
      "version counts cover the log") {
    val rows = SparkEntry.queries("q293_cdc_latest_compaction")(spark, sf)
      .collect()
    val logSize = Tables.t(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum == logSize)
    // replay one entity end-to-end
    val probe = rows.maxBy(_.getAs[Long]("n_versions"))
    val (u, et) = (probe.getAs[Long]("user_id"),
      probe.getAs[String]("event_type"))
    val last = Tables.t(spark, sf, "events")
      .filter(col("user_id") === u && col("event_type") === et)
      .orderBy(col("ts").desc, col("event_id").desc).limit(1)
      .collect().head
    assert(probe.getAs[Long]("last_event_id") ==
      last.getAs[Long]("event_id"))
    assert(probe.getAs[Double]("last_value") ==
      last.getAs[Double]("value"))
  }

  test("segment overlap: symmetric-free matrix with consistent sizes") {
    val rows = SparkEntry.queries("q294_segment_overlap")(spark, sf)
      .collect()
    val types = Tables.t(spark, sf, "events")
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2) // each pair once
    rows.foreach { r =>
      assert(r.getAs[String]("seg_a") < r.getAs[String]("seg_b"))
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val j = r.getAs[Long]("n_both").toDouble /
        (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") -
          r.getAs[Long]("n_both"))
      assert(math.abs(r.getAs[Double]("jaccard") -
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-12)
    }
  }

  test("SUMMARIZE <table> routes to the one-pass profiler") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP TABLE IF EXISTS t_prof")
    eng.sql("CREATE TABLE t_prof AS SELECT CAST(1 AS BIGINT) AS k, " +
      "'x' AS s UNION ALL SELECT 2, NULL UNION ALL SELECT 2, 'y'")
    val prof = eng.sql("SUMMARIZE t_prof").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(prof.keySet == Set("k", "s"))
    assert(prof("k").getAs[Long]("n_rows") == 3L)
    assert(prof("k").getAs[Long]("n_distinct") == 2L)
    assert(prof("k").getAs[Double]("max_num") == 2.0)
    assert(prof("s").getAs[Long]("n_nulls") == 1L)
    assert(prof("s").getAs[String]("min_str") == "x")
    eng.sql("DROP TABLE t_prof")
  }

  test("k-anonymity: partition of rows is exact and k is the true min") {
    val r = SparkEntry.queries("q317_k_anonymity")(spark, sf)
      .collect().head
    val total = Tables.t(spark, sf, "customer").count()
    assert(r.getAs[Long]("n_rows_at_risk") +
      r.getAs[Long]("n_rows_after_suppression") == total)
    val sizes = Tables.t(spark, sf, "customer")
      .groupBy("c_nationkey", "c_mktsegment").count()
      .collect().map(_.getAs[Long]("count"))
    assert(r.getAs[Long]("k_anonymity") == sizes.min)
    assert(r.getAs[Long]("n_groups") == sizes.length.toLong)
  }

  test("fk orphans: clean star has zero, planted corruption detected") {
    val rows = SparkEntry.queries("q318_fk_orphans")(spark, sf)
      .collect().map(r => r.getAs[String]("relation") -> r).toMap
    for (rel <- Seq("lineitem->orders", "lineitem->part",
        "orders->customer", "nation->region"))
      assert(rows(rel).getAs[Long]("n_orphans") == 0L, rel)
    assert(rows("lineitem->orders_planted").getAs[Long]("n_orphans") > 0L)
  }

  test("table fingerprint is layout-invariant and content-sensitive") {
    val fps = SparkEntry.queries("q319_table_fingerprint")(spark, sf)
      .collect().map(r => r.getAs[String]("tbl") ->
        (r.getAs[Long]("xor_fp"), r.getAs[Long]("sum_fp"))).toMap
    // recompute region's fingerprint under a different layout
    val re = Tables.t(spark, sf, "region")
      .repartition(7).sortWithinPartitions("r_name")
      .select(operatorsHash(concat_ws("|",
        coalesce(col("r_regionkey").cast("string"), lit("")),
        coalesce(col("r_name").cast("string"), lit("")))).as("h"))
      .agg(expr("bit_xor(h)"), sum(pmod(col("h"), lit(1073741824L))))
      .collect().head
    assert((re.getLong(0), re.getLong(1)) == fps("region"))
    // content sensitivity: nation and supplier must differ
    assert(fps("nation") != fps("supplier"))
  }

  private def operatorsHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("join advisor: recommendation consistent with its own stats") {
    val rows = SparkEntry.queries("q325_join_strategy_advisor")(
      spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val rec = r.getAs[String]("rec_strategy")
      val pb = r.getAs[Long]("parent_bytes")
      val skew = r.getAs[Long]("max_key") * r.getAs[Long]("n_keys") >
        r.getAs[Long]("child_rows") * 10
      if (pb < 10000000L) assert(rec == "broadcast")
      else if (skew) assert(rec == "salted_smj")
      else assert(rec == "smj")
      assert(r.getAs[Long]("max_key") >= 1L &&
        r.getAs[Long]("n_keys") <= r.getAs[Long]("child_rows"))
    }
  }
}
