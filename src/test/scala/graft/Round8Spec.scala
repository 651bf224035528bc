package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactSelection

/** Round-8 contracts: the scale-safe exact-selection refinement, MV
  * staleness invalidation on base-table mutation, MERGE source-cardinality
  * enforcement, QUALIFY identifier boundaries, and decimal-safe MV
  * re-aggregation.
  */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("ExactSelection: refinement recurses under skew and the only " +
      "sort is driver-bounded") {
    import spark.implicits._
    // 60k rows, 90% piled into one narrow value band — the single-level
    // probe's failure shape. Small cap/fanout force real recursion.
    val n = 60000
    val df = spark.range(n).select(
      when(col("id") % 10 =!= 0, lit(500.0) + (col("id") % 97) / 1e6)
        .otherwise(col("id").cast("double")).as("x"))
      .cache()
    val xs = df.as[Double].collect().sorted
    for (k <- Seq(1L, n / 4L, n / 2L, n - 1L, n.toLong)) {
      val sel = ExactSelection.kth(df, "x", k, cap = 1000L, fanout = 16)
      assert(sel.value == xs((k - 1).toInt), s"rank $k wrong")
      assert(sel.finalN <= 1000L,
        s"rank $k sorted ${sel.finalN} rows — unbounded in-bucket sort")
      assert(sel.levels >= 1, s"rank $k never refined")
    }
    df.unpersist()
  }

  test("ExactSelection: randomized multisets match sorted ground truth " +
      "(ties, continuous, extreme outlier skew)") {
    import spark.implicits._
    val gens: Seq[IndexedSeq[Double]] = Seq(
      (0 until 5000).map(i => ((i * 2654435761L) % 977 % 13).toDouble),
      (0 until 5000).map(i => math.abs(math.sin(i.toDouble)) * 1e6),
      (0 until 5000).map(i =>
        if (i % 100 == 0) (i + 1).toDouble * 1e9 else 42.0))
    for ((xs, gi) <- gens.zipWithIndex) {
      val df = xs.toDF("x")
      val sorted = xs.sorted
      for (k <- Seq(1, 17, 2500, 4999, 5000)) {
        val sel = operators.ExactSelection
          .kth(df, "x", k.toLong, cap = 200L, fanout = 8)
        assert(sel.value == sorted(k - 1), s"gen $gi rank $k")
        assert(sel.finalN <= 200L, s"gen $gi rank $k unbounded sort")
      }
    }
  }

  test("ExactSelection: all-equal column terminates via the " +
      "single-value bucket, never by sorting") {
    val df = spark.range(50000).select(lit(42.5).as("x"))
    val sel = ExactSelection.kth(df, "x", 25000L, cap = 100L, fanout = 8)
    assert(sel.value == 42.5)
    assert(sel.finalN == 0L, "all-equal bucket should resolve sort-free")
  }

  test("ExactSelection: kthAll shares level histograms across ranks") {
    import spark.implicits._
    val df = spark.range(20000)
      .select((col("id") % 1000).cast("double").as("x"))
    val xs = df.as[Double].collect().sorted
    val ks = Seq(1L, 5000L, 10000L, 19999L)
    val sels = ExactSelection.kthAll(df, "x", ks, cap = 500L, fanout = 16)
    ks.zip(sels).foreach { case (k, sel) =>
      assert(sel.value == xs((k - 1).toInt), s"rank $k wrong")
    }
  }

  test("MV rewrite is withdrawn when the base table is dropped and " +
      "re-created with different data") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_r8a")
    eng.sql("DROP TABLE IF EXISTS mvb_r8a")
    eng.sql("CREATE TABLE mvb_r8a AS SELECT l_returnflag AS g, " +
      "l_quantity AS q FROM lineitem WHERE l_orderkey % 5 = 0")
    eng.sql("CREATE MATERIALIZED VIEW mv_r8a AS " +
      "SELECT g, sum(q) AS sq, count(*) AS cnt FROM mvb_r8a GROUP BY g")
    // sanity: the rewrite fires before the drop
    val pre = eng.sql("SELECT g, sum(q) AS s FROM mvb_r8a GROUP BY g")
    assert(pre.queryExecution.executedPlan.toString.contains("sum(sq"))
    // drop + re-create with DIFFERENT data: stale MV must not answer
    eng.sql("DROP TABLE mvb_r8a")
    eng.sql("CREATE TABLE mvb_r8a AS SELECT l_returnflag AS g, " +
      "l_quantity * 2 AS q FROM lineitem WHERE l_orderkey % 5 = 1")
    val post = eng.sql("SELECT g, sum(q) AS s FROM mvb_r8a GROUP BY g")
    assert(!post.queryExecution.executedPlan.toString.contains("sum(sq"),
      "stale MV still answers after base drop/re-create")
    val want = Tables.t(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 5 === 1)
      .groupBy(col("l_returnflag").as("g"))
      .agg(sum(col("l_quantity") * 2).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    post.collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - want(r.getString(0))) < 1e-6))
    eng.sql("DROP TABLE mvb_r8a")
  }

  test("MV rewrite is withdrawn when the base table is mutated " +
      "(UPDATE / INSERT)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_r8b")
    eng.sql("DROP TABLE IF EXISTS mvb_r8b")
    eng.sql("CREATE TABLE mvb_r8b AS SELECT n_name AS g, " +
      "CAST(n_nationkey AS DOUBLE) AS v FROM nation")
    eng.sql("CREATE MATERIALIZED VIEW mv_r8b AS " +
      "SELECT g, sum(v) AS sv, count(*) AS cnt FROM mvb_r8b GROUP BY g")
    assert(eng.sql("SELECT g, sum(v) AS s FROM mvb_r8b GROUP BY g")
      .queryExecution.executedPlan.toString.contains("sum(sv"))
    eng.sql("UPDATE mvb_r8b SET v = v + 100")
    val post = eng.sql("SELECT g, sum(v) AS s FROM mvb_r8b GROUP BY g")
    assert(!post.queryExecution.executedPlan.toString.contains("sum(sv"),
      "stale MV still answers after base UPDATE")
    // each nation is one row: s = nationkey + 100 exactly
    post.collect().foreach { r =>
      assert(r.getDouble(1) >= 100.0, s"update not visible: $r")
    }
    eng.sql("DROP TABLE mvb_r8b")
  }

  test("MERGE INTO rejects a source matching one target row twice") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP TABLE IF EXISTS t_merge_r8")
    eng.sql("CREATE TABLE t_merge_r8 (k BIGINT, v STRING)")
    eng.sql("INSERT INTO t_merge_r8 VALUES (1, 'a'), (2, 'b')")
    val e = intercept[Exception] {
      eng.sql("MERGE INTO t_merge_r8 t USING " +
        "(SELECT CAST(1 AS BIGINT) AS k, 'x' AS v UNION ALL " +
        "SELECT 1, 'y') s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(e.getMessage.contains("multiple source rows"))
    // the failed MERGE must not have mutated the table
    val vs = eng.sql("SELECT v FROM t_merge_r8").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(vs == Seq("a", "b"))
    // a unique source still merges fine
    eng.sql("MERGE INTO t_merge_r8 t USING " +
      "(SELECT CAST(1 AS BIGINT) AS k, 'z' AS v) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    assert(eng.sql("SELECT v FROM t_merge_r8 WHERE k = 1")
      .collect().head.getString(0) == "z")
    eng.sql("DROP TABLE t_merge_r8")
  }

  test("QUALIFY: underscore identifiers are not keyword boundaries") {
    // order_rank must not truncate the predicate at 'ORDER'
    val split = HeavyEngine.splitQualify(
      "SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderkey) AS order_rank FROM orders " +
        "QUALIFY order_rank = 1 ORDER BY o_custkey LIMIT 5")
    assert(split.isDefined)
    val (_, pred, tail) = split.get
    assert(pred == "order_rank = 1", s"predicate truncated: '$pred'")
    assert(tail.toUpperCase.startsWith("ORDER BY"))
    // escaped quote inside a literal must not flip the in-string state
    val s2 = HeavyEngine.splitQualify(
      "SELECT n_name, rank() OVER (ORDER BY n_nationkey) AS r " +
        "FROM nation WHERE n_name <> 'O''BRIEN LAND' QUALIFY r <= 3")
    assert(s2.isDefined && s2.get._2 == "r <= 3")
    // end-to-end through the engine
    val eng = HeavyEngine(spark, sf)
    val rows = eng.sql(
      """SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderkey) AS order_rank
         FROM orders QUALIFY order_rank = 1""").collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) == 1))
  }

  test("KEY_FOR_STRING: declared dictionary yields dense " +
      "order-preserving ids; undeclared stays hash; unknown is null") {
    import spark.implicits._
    import graft.functions.DictRegistry
    val eng = HeavyEngine(spark, sf)
    val df = Seq("pear", "apple", "zebra", "apple", "mango", "Pear")
      .toDF("fruit_r8")
    df.createOrReplaceTempView("dict_r8")
    val card = DictRegistry.declare(spark, df, "fruit_r8")
    assert(card == 5) // distinct values
    val got = eng.sql(
      "SELECT DISTINCT fruit_r8, key_for_string(fruit_r8) AS id " +
        "FROM dict_r8").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dense [0, D) and id order == value (binary) order
    assert(got.values.toSeq.sorted == (0L until 5L))
    val byValue = got.toSeq.sortBy(_._1)
    assert(byValue.map(_._2) == byValue.map(_._2).sorted,
      "id order diverges from value order")
    // unknown value -> null (transient-dictionary contract)
    val unk = eng.sql("SELECT key_for_string(fruit_r8) AS id FROM " +
      "(SELECT 'durian' AS fruit_r8)").collect().head
    assert(unk.isNullAt(0))
    // undeclared column falls back to the xxhash64 surrogate
    val h = eng.sql("SELECT key_for_string(n_name) AS k, " +
      "xxhash64(n_name) AS x FROM nation").collect()
    assert(h.forall(r => r.getLong(0) == r.getLong(1)))
    // and the dense lookup stays inside whole-stage codegen over a real
    // scan (the tiny local view above constant-folds to LocalTableScan,
    // which exercises only interpreted eval)
    DictRegistry.declare(spark, spark.table("part"), "p_type",
      table = "part")
    val q = eng.sql("SELECT key_for_string(p_type) AS id FROM part")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "dict lookup fell out of codegen")
    // Build-once: an identical re-declaration must NOT rebuild (same
    // registered DictMap identity), while a different source must.
    val d1 = DictRegistry.forColumn(spark, Seq("part", "p_type")).get
    DictRegistry.declare(spark, spark.table("part"), "p_type",
      table = "part")
    val d2 = DictRegistry.forColumn(spark, Seq("part", "p_type")).get
    assert(d1 eq d2, "identical re-declare rebuilt the dictionary")
    // Qualified lookup: a non-matching table qualifier does not resolve
    // through this declaration (falls back to the hash surrogate).
    assert(DictRegistry.forColumn(spark, Seq("other_tab", "p_type")).isEmpty)
    DictRegistry.drop(spark, "fruit_r8")
    DictRegistry.drop(spark, "p_type")
  }

  test("q244: the µs-precision range filter reaches the parquet scan " +
      "as PushedFilters over the physical ts_6 column") {
    val df = operators.HptParity.queries
      .find(_._1 == "q244_hpt_range_us").get._2(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      """PushedFilters: \[[^\]]*ts_6""".r.findFirstIn(plan).isDefined,
      s"ts_6 range not pushed to parquet:\n$plan")
  }

  test("scan-pattern queries funnel no ROWS through one partition " +
      "(q337 skyline, q345 AUC rank): any SinglePartition exchange " +
      "merges only partial aggregates") {
    for (name <- Seq("q337_skyline_pareto", "q345_auc_exact")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val lines = df.queryExecution.executedPlan.toString.split('\n')
      lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
        .foreach { case (_, i) =>
          // the exchange's child must be a map-side partial aggregate —
          // a single-row merge, never a row funnel (a global Sort or
          // Window here would be the scale bug the scan pattern avoids)
          val below = lines.drop(i + 1).take(2).mkString(" ")
          assert(below.contains("partial_"),
            s"$name SinglePartition over non-partial child: $below")
        }
    }
  }

  test("MV rewrite handles DECIMAL sum measures (type preserved)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_r8d")
    eng.sql("DROP TABLE IF EXISTS mvb_r8d")
    eng.sql("CREATE TABLE mvb_r8d AS SELECT l_returnflag AS g, " +
      "l_linestatus AS g2, CAST(l_extendedprice AS DECIMAL(18,2)) AS p " +
      "FROM lineitem WHERE l_orderkey % 7 = 0")
    val want = eng.sql("SELECT g, sum(p) AS s FROM mvb_r8d GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    eng.sql("CREATE MATERIALIZED VIEW mv_r8d AS " +
      "SELECT g, g2, sum(p) AS sp, count(*) AS cnt " +
      "FROM mvb_r8d GROUP BY g, g2")
    val df = eng.sql("SELECT g, sum(p) AS s FROM mvb_r8d GROUP BY g")
    assert(df.queryExecution.executedPlan.toString.contains("sum(sp"),
      "decimal roll-up was not rewritten")
    // dataType identical to the un-rewritten aggregate's schema
    assert(df.schema("s").dataType ==
      org.apache.spark.sql.types.DataTypes.createDecimalType(28, 2))
    df.collect().foreach(r =>
      assert(r.getDecimal(1).compareTo(want(r.getString(0))) == 0))
    eng.sql("DROP MATERIALIZED VIEW mv_r8d")
    eng.sql("DROP TABLE mvb_r8d")
  }
}
