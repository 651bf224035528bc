package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("llm_transform: choice, regex, identity modes + constraint check") {
    import spark.implicits._
    import graft.functions.LlmTransform.llm_transform
    val df = Seq("the cat sat", "dogs run 42 fast", "nothing here")
      .toDF("t")
    val rows = df.select(
      llm_transform(col("t"), "Classify", "cat|dog|bird").as("c"),
      llm_transform(col("t"), "Extract", "/[0-9]+/").as("r"),
      llm_transform(col("t"), "Echo").as("q")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("cat", "dog", "cat"))
    assert(rows.map(_.getString(1)).toSeq == Seq("", "42", ""))
    assert(rows.head.getString(2) == "Echo:\nthe cat sat")
    // invalid constraint (no '|' choices, not /regex/) must error, not
    // be silently ignored — same contract as the reference
    intercept[IllegalArgumentException](
      llm_transform(col("t"), "p", "single_choice"))
    // SQL surface: prompt must be a literal
    val eng = HeavyEngine(spark, sf)
    val viaSql = eng.sql(
      """SELECT llm_transform('west wind', 'Pick', 'east|west') AS v""")
      .collect().head.getString(0)
    assert(viaSql == "west")
    intercept[Exception](
      eng.sql("SELECT llm_transform(p_name, p_name) FROM part").collect())
  }

  test("single_value returns the value on single-valued groups") {
    import spark.implicits._
    import graft.functions.GraftFunctions.single_value
    val got = Seq((1, "a"), (1, "a"), (2, "b"))
      .toDF("k", "v")
      .groupBy(col("k")).agg(single_value(col("v")).as("sv"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "a", 2 -> "b"))
  }

  test("single_value errors when a group has >1 distinct value") {
    import spark.implicits._
    import graft.functions.GraftFunctions.single_value
    val df = Seq((1, "a"), (1, "b"))
      .toDF("k", "v")
      .groupBy(col("k")).agg(single_value(col("v")).as("sv"))
    val e = intercept[Exception](df.collect())
    assert(e.getMessage.contains("single_value") ||
      Option(e.getCause).exists(_.getMessage.contains("single_value")))
  }

  test("HeavyEngine.sql resolves tables and extension functions") {
    val eng = HeavyEngine(spark, sf)
    val row = eng.sql(
      """SELECT quarterday(TIMESTAMP '2024-05-01 13:00:00') AS qd,
                truncate(3.789, 1) AS tr,
                jarowinkler_similarity('MARTHA', 'MARHTA') AS jw,
                single_value(x) AS sv
         FROM (SELECT 7 AS x)""").collect().head
    assert(row.getInt(0) == 3)
    assert(row.getDouble(1) == 3.7)
    assert(row.getInt(2) == 96)
    assert(row.getInt(3) == 7)
  }

  test("reference EXPLAIN forms map to Spark explain modes") {
    val eng = HeavyEngine(spark, sf)
    val ext = eng.sql("EXPLAIN OPTIMIZED SELECT count(*) FROM nation")
      .collect().head.getString(0)
    assert(ext.contains("Optimized Logical Plan"))
    val fmt = eng.sql("EXPLAIN PLAN SELECT count(*) FROM nation")
      .collect().head.getString(0)
    assert(fmt.contains("Physical Plan"))
  }

  test("EXPLAIN and hints flow through the facade") {
    val eng = HeavyEngine(spark, sf)
    val rows = eng.sql(
      "EXPLAIN SELECT /*+ BROADCAST(nation) */ * FROM nation JOIN region ON n_regionkey = r_regionkey")
      .collect()
    assert(rows.nonEmpty && rows.head.getString(0).contains("Physical Plan"))
  }

  test("reference query hints are parsed, recorded, and no-op'd") {
    // `QueryEngine/QueryHint.h:65-94`: comment hints like cpu_mode /
    // watchdog / query_time_limit(N). They must be accepted (reference
    // SQL runs unchanged), introspectable (lastHints, the
    // RegisteredQueryHint analog), and stripped as no-ops — while
    // Spark-native hints in the SAME block still reach Catalyst.
    val eng = HeavyEngine(spark, sf)
    val n = eng.sql(
      """SELECT /*+ cpu_mode, watchdog, query_time_limit(1000) */
               count(*) AS n FROM nation""").collect().head.getLong(0)
    assert(eng.lastHints == Map("cpu_mode" -> "", "watchdog" -> "",
      "query_time_limit" -> "1000"))
    assert(n == eng.sql("SELECT count(*) AS n FROM nation")
      .collect().head.getLong(0))
    // mixed block: reference hint stripped+recorded, BROADCAST survives
    val df = eng.sql(
      """SELECT /*+ disable_loop_join, BROADCAST(region) */ n_name
         FROM nation JOIN region ON n_regionkey = r_regionkey""")
    assert(eng.lastHints == Map("disable_loop_join" -> ""))
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(df.count() > 0)
  }

  test("sample_ratio is deterministic and near the requested fraction") {
    import graft.functions.GraftFunctions.sample_ratio
    val li = Tables.t(spark, sf, "lineitem")
    val key = col("l_orderkey") * 10 + col("l_linenumber")
    val n = li.count().toDouble
    val k1 = li.filter(sample_ratio(key, 0.25)).count()
    val k2 = li.filter(sample_ratio(key, 0.25)).count()
    assert(k1 == k2)
    assert(math.abs(k1 / n - 0.25) < 0.03)
  }

  test("keep_result recycler: hit serves the kept scan, engines are " +
      "isolated, unhinted queries never recycle") {
    val q = """SELECT /*+ keep_result */ r_regionkey, count(*) AS n
               FROM region GROUP BY r_regionkey"""
    val eng = HeavyEngine(spark, sf)
    val first = eng.sql(q).collect().sortBy(_.get(0).toString)
    val hit = eng.sql(q)
    assert(eng.recyclerStats == ((1L, 1L, 1)))
    // the hit's physical plan is a scan of the kept result, not a
    // re-executed aggregate — and the rows are identical.
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") &&
      !plan.contains("HashAggregate"), plan.take(500))
    assert(hit.collect().sortBy(_.get(0).toString).sameElements(first))
    // unhinted identical query: executes normally, counters untouched.
    eng.sql("SELECT r_regionkey, count(*) AS n FROM region GROUP BY 1")
    assert(eng.recyclerStats == ((1L, 1L, 1)))
    // a second engine over the SAME session shares nothing (the
    // reference recycler is per-process; ours is per-engine).
    val eng2 = HeavyEngine(spark, sf)
    assert(eng2.recyclerStats == ((0L, 0L, 0)))
    eng2.sql(q)
    assert(eng2.recyclerStats == ((0L, 1L, 1)))
  }
}
