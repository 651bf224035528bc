package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the warehouse-ops family (q288 profiler, q289 stratified
  * sample, q290 compaction planning, q291 fixed-point PageRank).
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("profiler: one row per column, stats agree with direct queries") {
    val rows = SparkEntry.queries("q288_table_profile")(spark, sf).collect()
    assert(rows.length == 11)
    val li = Tables.t(spark, sf, "lineitem")
    val nRows = li.count()
    assert(rows.forall(_.getAs[Long]("n_rows") == nRows))
    val byCol = rows.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol("l_returnflag").getAs[Long]("n_distinct") ==
      li.select("l_returnflag").distinct().count())
    assert(byCol("l_linenumber").getAs[Double]("min_num") ==
      li.agg(min(col("l_linenumber"))).head().getInt(0).toDouble)
    // string columns report into the str slots, numeric into num slots
    assert(byCol("l_returnflag").isNullAt(
      byCol("l_returnflag").fieldIndex("min_num")))
    assert(byCol("l_orderkey").isNullAt(
      byCol("l_orderkey").fieldIndex("min_str")))
  }

  test("profiler plan: ONE scan of lineitem, not one per column") {
    val qe = SparkEntry.queries("q288_table_profile")(spark, sf)
      .queryExecution
    val leaves = qe.optimizedPlan.collectLeaves()
    assert(leaves.length == 1, qe.optimizedPlan.toString.take(500))
  }

  test("stratified sample: exactly min(K, stratum size) per language, " +
      "stable across runs") {
    val a = SparkEntry.queries("q289_stratified_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    val sizes = Tables.t(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = a.groupBy(_._2).view.mapValues(_.length)
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(5L, sizes(lang)))
    }
    val b = SparkEntry.queries("q289_stratified_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("compaction plan: every file binned once, sorted-fill bound holds") {
    val bins = SparkEntry.queries("q290_compaction_plan")(spark, sf)
      .collect()
    val manifestRows = Tables.t(spark, sf, "orders")
      .select((unix_micros(col("o_orderdate").cast("timestamp"))
        .cast("double") / lit(86400000000L)).cast("long").as("day"))
      .select((col("day") / 7L).cast("long").as("file_id")).groupBy("file_id")
      .count().collect()
    assert(bins.map(_.getAs[Long]("n_files")).sum == manifestRows.length)
    assert(bins.map(_.getAs[Long]("total_rows")).sum ==
      manifestRows.map(_.getAs[Long]("count")).sum)
    // sorted-fill: a bin overflows the target by at most one file, so
    // total_rows < target + max file size.
    val maxFile = manifestRows.map(_.getAs[Long]("count")).max
    bins.foreach(b =>
      assert(b.getAs[Long]("total_rows") < 500L + maxFile))
  }

  test("pagerank: exact integer replay matches and mass is conserved " +
      "up to floor + dangling loss") {
    import spark.implicits._
    val got = SparkEntry.queries("q291_pagerank_fixedpoint")(spark, sf)
      .collect().map(r => r.getAs[String]("node") ->
        r.getAs[Long]("pr_scaled")).toMap
    // replay: weighted transition edges + 3 integer rounds
    val ev = Tables.t(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts")
      .orderBy("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val edges = ev.sliding(2).collect {
      case Array((u1, a), (u2, b)) if u1 == u2 => (a, b)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wOut = edges.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val nodes = ev.map(_._2).distinct.sorted
    val S = 1000000000L
    var p = nodes.map(_ -> S / nodes.length).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.toSeq.groupBy(_._1._2).view.mapValues(_.map {
        case ((src, _), cnt) => ((p(src) * 17) / 20) * cnt / wOut(src)
      }.sum)
      p = nodes.map(v => v ->
        ((S * 3 / 20) / nodes.length + inflow.getOrElse(v, 0L))).toMap
    }
    assert(got == p)
    val total = got.values.sum
    assert(total <= S && total > S / 2) // mass bounded, not degenerate
  }
}
