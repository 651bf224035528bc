package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins (the reference pins plans too: `Tests/ExplainTest.cpp`).
  * These assert the 100-TB-critical properties: banded/bucketed joins
  * must stay equi-joins (no nested-loop, no cartesian), and the LSH
  * pipeline must never degrade to an all-pairs product.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("banded range join plans as an equi-join, not a nested loop") {
    val plan = planOf("q75_range_band_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("geo grid-cell distance join avoids the cross product") {
    val plan = planOf("q61_geo_distance_join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("range-join rule leaves manually-bucketed joins untouched") {
    // q61 carries its own grid equi-key; the rule must not stack its
    // __gcell bucketing on top (it only fires on equi-key-less joins).
    graft.HeavyEngine(spark, sf) // rule installed on the shared session
    val plan = planOf("q61_geo_distance_join")
    assert(!plan.contains("__gcell"), plan.take(2000))
  }

  test("LSH candidate generation never plans an all-pairs product") {
    val plan = planOf("q42_dedup_minhash_lsh")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("exact-jaccard verification joins only on the shingle key") {
    val plan = planOf("q76_jaccard_exact")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("GeoRangeJoinRule rewrites a naive distance theta-join to equi-join") {
    val plan = planOf("q104_geo_range_rule")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("1-D numeric |x-y|<r theta-join is auto-rewritten to equi-join") {
    val plan = planOf("q105_num_range_rule")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("range rule fires on reversed comparisons and integer radii") {
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions._
    graft.HeavyEngine(spark, sf)
    val pts = graft.Tables.t(spark, sf, "part").select(
      col("p_partkey"),
      st_point(col("p_size").cast("double") - 25.0,
        col("p_retailprice") % 50.0).as("pt"))
    val a = pts.select(col("p_partkey").as("a_id"), col("pt").as("a_pt"))
    val b = pts.select(col("p_partkey").as("b_id"), col("pt").as("b_pt"))
    val dist = st_distance(col("a_pt"), col("b_pt"))
    // mirrored comparison: radius on the LEFT of the operator
    val rev = a.join(b, lit(1.0) > dist && col("a_id") < col("b_id"))
    assert(!rev.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // integer literal radius (coerced/cast, not a double literal)
    val intLit = a.join(b, dist < lit(1) && col("a_id") < col("b_id"))
    assert(!intLit.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // and the rewrite is semantics-preserving vs the pinned q104 shape
    val base = SparkEntry.queries("q104_geo_range_rule")(spark, sf).count()
    assert(rev.count() == base && intLit.count() == base)
  }

  test("aggregate over UNION ALL keeps partial aggregation below the " +
      "exchange (incremental-ingest corpus+batch plan)") {
    // The q207/q327 production shape: standing corpus UNION ALL daily
    // batch, aggregated. At 100 TB the raw unioned rows must NOT cross
    // the wire — only per-partition partial aggregates may reach the
    // shuffle. Pin: the executed plan's Union sits UNDER a partial
    // HashAggregate which sits UNDER the single exchange (Spark does
    // this today; the pin makes it a contract, like RuntimeFilterSpec
    // pins runtime filters).
    import org.apache.spark.sql.functions._
    val corpus = Tables.t(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 3 =!= 0)
      .select(col("l_returnflag"), col("l_quantity"))
    val batch = Tables.t(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_returnflag"), col("l_quantity"))
    val df = corpus.unionAll(batch)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
    df.collect() // finalize AQE plan before reading its shape
    val s = df.queryExecution.executedPlan.toString
    val iUnion = s.indexOf("Union")
    val iExchange = s.indexOf("Exchange")
    assert(iUnion >= 0 && iExchange >= 0, s.take(2000))
    // textual tree prints parents first: exchange line must appear
    // BEFORE (above) the union line, with a partial aggregate between
    val between = s.substring(iExchange, iUnion)
    assert(iExchange < iUnion,
      "Union appears above the exchange — raw rows would cross the wire")
    assert(between.contains("HashAggregate") &&
      between.contains("partial_sum"),
      s"no partial aggregate between exchange and union:\n${s.take(3000)}")
  }

  test("star join broadcasts the small dimension tables") {
    val plan = planOf("q07_join_star")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("similarity top-k broadcasts the query side, not the corpus") {
    val plan = planOf("q37_similarity_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
    // the corpus must not shuffle before scoring
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("filters are pushed into the parquet scan") {
    val df = SparkEntry.queries("q01_scan_filter_project")(spark, sf)
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: ["), scans.take(2000))
  }

  test("partition_key layout prunes partitions at the scan") {
    SparkEntry.queries("q195_partition_pruning")(spark, sf) // builds pdocs
    val df = spark.table("pdocs")
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    // The lang filter must land in PartitionFilters (directory pruning),
    // not PushedFilters (per-file evaluation).
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      plan.take(2000))
  }

  test("bucketed co-located join plans with zero exchange and zero sort") {
    // Both sides bucketed+sorted on the join key (q191): with broadcast
    // off, the sort-merge join must read bucket-aligned files directly —
    // no Exchange (the 100 TB shuffle), no per-task Sort.
    // The Sort elision additionally needs the bucketed-scan ordering
    // flag (off by default since Spark 3.0 because multi-file buckets
    // only guarantee per-file order; q191 writes one file per bucket,
    // which is exactly the case the flag exists for).
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val order = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val oldB = spark.conf.get(bcast)
    val oldO = spark.conf.get(order, "false")
    try {
      spark.conf.set(bcast, "-1")
      spark.conf.set(order, "true")
      SparkEntry.queries("q191_bucketed_join")(spark, sf) // builds tables
      val joined = spark.table("graft_bkt.b_orders")
        .join(spark.table("graft_bkt.b_lineitem"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(!plan.contains("Sort "), plan.take(2000))
    } finally { spark.conf.set(bcast, oldB); spark.conf.set(order, oldO) }
  }

  test("q282 packed postings are bucketed: joins on doc_id read " +
      "co-located buckets with zero exchange and zero sort") {
    // Round-12 (VERDICT r11 #6): the verify stage's corpus-sized side
    // is a bucketBy(doc_id)+sortBy table written once per fixture —
    // the pin is the q191 shape on the postings table itself: an SMJ
    // whose bucketed sides read with no Exchange and no Sort.
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val order = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val oldB = spark.conf.get(bcast)
    val oldO = spark.conf.get(order, "false")
    try {
      spark.conf.set(bcast, "-1")
      spark.conf.set(order, "true")
      val p = graft.operators.Similarity.packedPostings(spark, sf)
      val joined = p.as("a").join(
        p.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("es").as("es2")).as("b"),
        "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(!plan.contains("Sort "), plan.take(2000))
    } finally { spark.conf.set(bcast, oldB); spark.conf.set(order, oldO) }
  }

  test("q207 corpus fingerprints are a standing bucketed index: the " +
      "batch-classification join reads the corpus side with zero " +
      "exchange") {
    // Round-13 (VERDICT #2): the stated 100 TB production mode — the
    // corpus side of the ingest-dedup join must be the maintained
    // bucketBy(fp) table read bucket-aligned (no Exchange under the
    // SMJ's corpus subtree); only the batch side shuffles. AQE off so
    // the static executedPlan exposes the join nodes to collect.
    val adaptive = "spark.sql.adaptive.enabled"
    val oldA = spark.conf.get(adaptive)
    try {
      spark.conf.set(adaptive, "false")
      val df = SparkEntry.queries("q207_incremental_ingest")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val smjs = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.right.toString.contains("b_corpfp_") => j
      }
      assert(smjs.nonEmpty,
        s"corpus join is not an SMJ over the bucketed index:\n" +
          plan.toString.take(3000))
      smjs.foreach { j =>
        val exch = j.right.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exch.isEmpty,
          s"corpus side of the q207 join shuffles:\n${j.right.toString.take(2000)}")
      }
      // and no plan node broadcasts the corpus-sized index
      val bcastCorpus = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
            if b.toString.contains("b_corpfp_") => b
      }
      assert(bcastCorpus.isEmpty, "corpus index must never broadcast")
    } finally spark.conf.set(adaptive, oldA)
  }

  test("q592 compaction preserves the fp index's bucket layout: fewer " +
      "files, same bucket spec, classify join still exchange-free") {
    import org.apache.spark.sql.functions._
    val ops = graft.operators.Dedup
    val idx = ops.rebuildFpIndex(spark, sf, "corpfp_planspec",
      ops.corpusFps(spark, sf))
    // salt the batch fingerprints: at sf0.001 every src19 fp already
    // exists in the corpus (planted cross-source dups), which would
    // make admission a no-op and leave nothing to compact
    val batch = graft.Tables.t(spark, sf, "documents")
      .filter(col("source") === "src19")
      .select(col("doc_id"),
        md5(concat(col("text"), lit("#planspec"))).as("fp"))
    val rows0 = spark.table(idx).count()
    ops.admitToFpIndex(spark, idx, batch)
    assert(spark.table(idx).count() > rows0, "admission appended no rows")
    val Array(db, tbl) = idx.split("\\.", 2)
    def meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some(db)))
    val specBefore = meta.bucketSpec
    val filesBefore = spark.table(idx).inputFiles.length
    ops.compactFpIndex(spark, idx)
    // one file per bucket exactly — the aligned-write contract
    assert(spark.table(idx).inputFiles.length ==
      specBefore.map(_.numBuckets).getOrElse(0))
    assert(spark.table(idx).inputFiles.length < filesBefore)
    assert(meta.bucketSpec == specBefore,
      s"bucket spec changed: $specBefore -> ${meta.bucketSpec}")
    // the classify join still reads the index side with zero Exchange
    val adaptive = "spark.sql.adaptive.enabled"
    val oldA = spark.conf.get(adaptive)
    try {
      spark.conf.set(adaptive, "false")
      val j = batch.join(spark.table(idx).hint("merge"), Seq("fp"), "left")
      val smjs = j.queryExecution.executedPlan.collect {
        case x: org.apache.spark.sql.execution.joins.SortMergeJoinExec => x
      }
      assert(smjs.nonEmpty)
      smjs.foreach { x =>
        val exch = x.right.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exch.isEmpty,
          s"compacted index side shuffles:\n${x.right.toString.take(1500)}")
      }
    } finally spark.conf.set(adaptive, oldA)
  }

  test("q593 retained view: the index-minus-tombstones anti-join is " +
      "co-located — zero exchange on either corpus-sized side") {
    import org.apache.spark.sql.functions._
    val ops = graft.operators.Dedup
    val idx = ops.rebuildFpIndex(spark, sf, "corpfp_ts_planspec",
      ops.corpusFps(spark, sf))
    ops.retractFromFpIndex(spark, idx, spark.table(idx).limit(5))
    val adaptive = "spark.sql.adaptive.enabled"
    val oldA = spark.conf.get(adaptive)
    try {
      spark.conf.set(adaptive, "false")
      val plan = ops.retainedFpIndex(spark, idx)
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, plan.toString.take(2000))
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exch.isEmpty,
        s"retained-view anti-join shuffles:\n${plan.toString.take(2000)}")
    } finally spark.conf.set(adaptive, oldA)
  }

  test("TPC-H family: pushed filters, broadcast dims, zero cartesian") {
    // Q6 is the pure-scan query: its date/discount/quantity predicates
    // must reach the parquet reader, not a post-scan Filter only.
    val q6 = planOf("q219_tpch_q06")
    assert(q6.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      q6.take(2000))
    // Q3's customer/orders sides are dimension-sized at this sf and
    // must broadcast, never cartesian.
    val q3 = planOf("q216_tpch_q03")
    assert(q3.contains("BroadcastExchange"), q3.take(2000))
    // The whole 22-query family plans with zero CartesianProduct —
    // correlated scalar subqueries (Q2/Q11/Q16/Q22) become broadcast
    // 1-row joins, not products.
    for (q <- SparkEntry.queries.keys.filter(_.contains("_tpch_")))
      assert(!planOf(q).contains("CartesianProduct"), q)
  }

  test("sequence packing windows are sharded, never single-partition") {
    // Round-5 perf-weak flag: an unpartitioned WindowExec funnels the
    // whole corpus through ONE partition. The shipped q175 must window
    // per shard, and the former global-min window sites (q183, q185)
    // must plan with no WindowExec at all (broadcast 1-row crossJoin).
    // Collected from the optimized LOGICAL plan: AQE wraps the physical
    // plan in AdaptiveSparkPlanExec, which hides WindowExec from collect.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val packWins = SparkEntry.queries("q175_sequence_packing")(spark, sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(packWins.nonEmpty, "q175 must still use a window")
    assert(packWins.forall(_.partitionSpec.nonEmpty),
      "q175 window lost its shard partitioning")
    for (q <- Seq("q183_domain_mixture", "q185_raster_contour_polygons")) {
      val wins = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.isEmpty, s"$q plans a Window; expected broadcast " +
        "1-row-aggregate crossJoin for the global min")
    }
  }
}
