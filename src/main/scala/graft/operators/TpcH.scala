package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The 22 canonical TPC-H queries (q214-q235), adapted to the fixture
  * schema and hash-compared against DuckDB.
  *
  * The reference names TPC-H as a benchmark dataset
  * (`Benchmarks/README.md:204-206` in /root/reference) and its test
  * fixtures here are TPC-H-shaped (region/nation/customer/supplier/part/
  * orders/lineitem). The fixtures omit `partsupp` and several canonical
  * columns (l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct,
  * p_mfgr/p_container), so a DERIVED-SCHEMA layer reconstructs them with
  * deterministic integer arithmetic computed identically by Spark and the
  * DuckDB oracle (`ctePrefix` mirrors `li2`/`partsupp`/`part2` below).
  * Where a predicate references a column that cannot be derived
  * (o_comment, c_phone), the query keeps its canonical SHAPE (left-outer
  * distribution, anti-join + scalar-avg subquery) with an equivalent
  * predicate on an existing column; each such adaptation is noted inline.
  *
  * Scale notes (100 TB): every query keeps the canonical TPC-H plan
  * shape Catalyst expects — selective dimension filters broadcast into
  * the lineitem fact scan, correlated subqueries decorrelated into
  * aggregate joins keyed on the correlation column, EXISTS/NOT EXISTS as
  * semi/anti joins. partsupp (4 rows per part) is never broadcast — it
  * scales with `part` — while nation/region and *filtered* part/supplier
  * sides are. Top-k queries (Q2/Q3/Q10/Q18/Q21) append key columns to
  * the canonical ORDER BY so LIMIT is deterministic under ties in both
  * engines.
  */
object TpcH {

  type Q = (SparkSession, String) => DataFrame

  private val shipmodes =
    Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
  private val shipinstructs =
    Seq("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
  private val containers = Seq("SM CASE", "SM BOX", "SM PACK", "SM PKG",
    "MED BAG", "MED BOX", "MED PKG", "LG CASE")

  private def pick(vals: Seq[String], idx: Column): Column =
    element_at(array(vals.map(lit): _*), idx.cast("int") + 1)

  /** lineitem + derived commit/receipt dates, shipmode, shipinstruct. */
  private def li2(s: SparkSession, d: String): DataFrame = {
    val ok = col("l_orderkey"); val ln = col("l_linenumber")
    t(s, d, "lineitem")
      .withColumn("l_commitdate",
        date_add(to_date(col("l_shipdate")), ((ok * 3 + ln) % 30 - 14).cast("int")))
      .withColumn("l_receiptdate",
        date_add(to_date(col("l_shipdate")), ((ok * 5 + ln * 7) % 30 - 14).cast("int")))
      .withColumn("l_shipmode", pick(shipmodes, (ok * 7 + ln) % 7))
      .withColumn("l_shipinstruct", pick(shipinstructs, (ok + ln * 3) % 4))
  }

  /** Synthetic partsupp: 4 deterministic suppliers per part. Scales with
    * `part` (never broadcast unfiltered at 100 TB).
    */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    val scnt = t(s, d, "supplier").agg(count(lit(1)).as("s_cnt"))
    t(s, d, "part").select(col("p_partkey"))
      .crossJoin(broadcast(scnt))
      .withColumn("i", explode(array((0 to 3).map(lit): _*)))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 4 + col("i") * 17 + 3) % col("s_cnt")).as("ps_suppkey"),
        col("i"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        ((col("ps_partkey") * 7 + col("i") * 13) % 9999 + 1).cast("int").as("ps_availqty"),
        (((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 20000 + 100) / 100.0)
          .as("ps_supplycost"))
  }

  /** part + derived p_mfgr, p_container. */
  private def part2(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .withColumn("p_mfgr",
        concat(lit("Manufacturer#"), (col("p_partkey") % 5 + 1).cast("string")))
      .withColumn("p_container", pick(containers, col("p_partkey") % 8))

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  val queries: Seq[(String, Q)] = Seq(

    // Q1 — pricing summary report.
    "q214_tpch_q01" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(rev).as("sum_disc_price"),
          sum(rev * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Q2 — minimum-cost supplier (correlated MIN decorrelated to an
    // aggregate join on ps_partkey). p_type LIKE '%M%' stands in for the
    // canonical '%BRASS' (fixture p_type is a single word).
    "q215_tpch_q02" -> ((s, d) => {
      val natEu = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val suppEu = t(s, d, "supplier")
        .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val psEu = partsupp(s, d)
        .join(broadcast(suppEu), col("ps_suppkey") === col("s_suppkey"))
      val minCost = psEu.groupBy(col("ps_partkey").as("mc_pk"))
        .agg(min("ps_supplycost").as("mc_cost"))
      val pF = part2(s, d)
        .filter(col("p_size") === 15 && col("p_type").like("%M%"))
        .select(col("p_partkey"), col("p_mfgr"))
      psEu.join(broadcast(pF), col("ps_partkey") === col("p_partkey"))
        .join(minCost,
          col("ps_partkey") === col("mc_pk") && col("ps_supplycost") === col("mc_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_mfgr"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // Q3 — shipping priority (top-10 unshipped orders by revenue).
    "q216_tpch_q03" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_orderdate") < ts("1996-03-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = t(s, d, "lineitem").filter(to_date(col("l_shipdate")) > lit("1996-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("revenue"))
        .withColumn("o_shippriority", lit(0))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_shippriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q4 — order priority checking (EXISTS → semi join).
    "q217_tpch_q04" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val late = li2(s, d).filter(col("l_commitdate") < col("l_receiptdate"))
        .select(col("l_orderkey"))
      o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q5 — local supplier volume (ASIA, 1996).
    "q218_tpch_q05" -> ((s, d) => {
      val natAsia = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val supp = t(s, d, "supplier")
        .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, d, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue"))
    }),

    // Q6 — forecasting revenue change (pure scan-side filter).
    "q219_tpch_q06" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    // Q7 — volume shipping between two nations.
    "q220_tpch_q07" -> ((s, d) => {
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      val supp = t(s, d, "supplier")
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = t(s, d, "customer")
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")).between("1996-01-01", "1997-12-31"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_12") ||
          (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_11"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).as("revenue"))
    }),

    // Q8 — national market share (p_type = 'ECONOMY' for the canonical
    // 'ECONOMY ANODIZED STEEL'; nation NATION_3, region EUROPE).
    "q221_tpch_q08" -> ((s, d) => {
      val pEco = part2(s, d).filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val natEu = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_nk"))
      val cust = t(s, d, "customer")
        .join(broadcast(natEu), col("c_nationkey") === col("cn_nk"))
        .select(col("c_custkey"))
      val suppNat = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey").as("sn_nk"),
          col("n_name").as("nation"))), col("s_nationkey") === col("sn_nk"))
        .select(col("s_suppkey"), col("nation"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31")))
      t(s, d, "lineitem")
        .join(broadcast(pEco), col("l_partkey") === col("p_partkey"))
        .join(o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("nation") === "NATION_3", rev).otherwise(lit(0.0))) /
          sum(rev)).as("mkt_share"))
    }),

    // Q9 — product type profit (p_name LIKE '%bolt%' for '%green%').
    "q222_tpch_q09" -> ((s, d) => {
      val pBolt = part2(s, d).filter(col("p_name").like("%bolt%")).select(col("p_partkey"))
      val suppNat = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"),
          col("n_name").as("nation"))), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      t(s, d, "lineitem")
        .join(broadcast(pBolt), col("l_partkey") === col("p_partkey"))
        .join(partsupp(s, d),
          col("l_suppkey") === col("ps_suppkey") && col("l_partkey") === col("ps_partkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(rev - col("ps_supplycost") * col("l_quantity")).as("sum_profit"))
    }),

    // Q10 — returned item reporting (top 20 customers by lost revenue).
    "q223_tpch_q10" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
          col("o_orderdate") < ts("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val custNat = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation").select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(custNat, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q11 — important stock identification (scalar total via broadcast
    // crossJoin, the global-agg idiom; fraction 0.002 sized to fixtures).
    "q224_tpch_q11" -> ((s, d) => {
      val suppN = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val psn = partsupp(s, d)
        .join(broadcast(suppN), col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
      val total = psn.agg(sum(col("v")).as("tot"))
      psn.groupBy(col("ps_partkey")).agg(sum(col("v")).as("value"))
        .crossJoin(broadcast(total))
        .filter(col("value") > col("tot") * 0.002)
        .select(col("ps_partkey"), col("value"))
    }),

    // Q12 — shipping modes and order priority.
    "q225_tpch_q12" -> ((s, d) => {
      val l = li2(s, d)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          to_date(col("l_shipdate")) < col("l_commitdate") &&
          col("l_receiptdate") >= lit("1996-01-01") &&
          col("l_receiptdate") < lit("1997-01-01"))
      l.join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_shipmode"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
    }),

    // Q13 — customer order-count distribution. The canonical o_comment
    // NOT LIKE '%special%requests%' filter maps to an o_orderpriority
    // exclusion (comment column not in fixtures); left-outer + two-level
    // aggregate shape preserved.
    "q226_tpch_q13" -> ((s, d) => {
      val o = t(s, d, "orders").filter(!col("o_orderpriority").like("1%"))
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, d, "customer").select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q14 — promotion effect.
    "q227_tpch_q14" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") &&
          col("l_shipdate") < ts("1996-10-01"))
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev)).as("promo_revenue"))
    }),

    // Q15 — top supplier (revenue view + equality with its max).
    "q228_tpch_q15" -> ((s, d) => {
      val rev0 = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev).as("total_revenue"))
      rev0.crossJoin(broadcast(rev0.agg(max(col("total_revenue")).as("mx"))))
        .filter(col("total_revenue") === col("mx"))
        .join(t(s, d, "supplier").select(col("s_suppkey"), col("s_name")),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q16 — parts/supplier relationship. Supplier "complaints" filter
    // maps to s_acctbal < 0 (comment column not in fixtures); NOT IN →
    // anti join.
    "q229_tpch_q16" -> ((s, d) => {
      val badSupp = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val pF = part2(s, d)
        .filter(col("p_brand") =!= "Brand#25" && !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      partsupp(s, d)
        .join(broadcast(pF), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
    }),

    // Q17 — small-quantity-order revenue (correlated AVG decorrelated
    // to a per-part aggregate join).
    "q230_tpch_q17" -> ((s, d) => {
      val pF = part2(s, d)
        .filter(col("p_brand") === "Brand#3" && col("p_container") === "MED BOX")
        .select(col("p_partkey"))
      val l = t(s, d, "lineitem")
      val avgQ = l.join(broadcast(pF), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("aq_pk"))
        .agg((avg(col("l_quantity")) * 0.2).as("aq_lim"))
      l.join(broadcast(pF), col("l_partkey") === col("p_partkey"))
        .join(broadcast(avgQ), col("l_partkey") === col("aq_pk"))
        .filter(col("l_quantity") < col("aq_lim"))
        .agg((sum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    }),

    // Q18 — large-volume customers (HAVING subquery → semi join).
    "q231_tpch_q18" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val big = l.groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(col("l_quantity")).as("oq"))
        .filter(col("oq") > 300).select(col("big_ok"))
      val o = t(s, d, "orders")
        .join(big, col("o_orderkey") === col("big_ok"), "left_semi")
      o.join(t(s, d, "customer").select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // Q19 — discounted revenue (three OR'd brand/container/quantity
    // bands; containers limited to the derived 8-value enum).
    "q232_tpch_q19" -> ((s, d) => {
      val l = li2(s, d)
        .filter(col("l_shipmode").isin("AIR", "REG AIR") &&
          col("l_shipinstruct") === "DELIVER IN PERSON")
      l.join(broadcast(part2(s, d).select(col("p_partkey"), col("p_brand"),
          col("p_container"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" &&
            col("p_container").isin("SM CASE", "SM BOX", "SM PACK", "SM PKG") &&
            col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_container").isin("MED BAG", "MED BOX", "MED PKG") &&
            col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_container").isin("LG CASE") &&
            col("l_quantity").between(20, 30) && col("p_size").between(1, 15)))
        .agg(sum(rev).as("revenue"))
    }),

    // Q20 — potential part promotion (nested INs → joins; correlated
    // 1996 shipment sum decorrelated on (partkey, suppkey)).
    "q233_tpch_q20" -> ((s, d) => {
      val blue = t(s, d, "part").filter(col("p_name").like("blue%"))
        .select(col("p_partkey"))
      val shipped = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty96"))
      val qualified = partsupp(s, d)
        .join(broadcast(blue), col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped,
          col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("qty96") * 0.5)
        .select(col("ps_suppkey"))
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualified, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"))
    }),

    // Q21 — suppliers who kept orders waiting (EXISTS → semi join with
    // inequality residual, NOT EXISTS → anti join).
    "q234_tpch_q21" -> ((s, d) => {
      val l = li2(s, d)
      val l1 = l.filter(col("l_receiptdate") > col("l_commitdate"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val suppN = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val l2 = l.select(col("l_orderkey").as("l2_ok"), col("l_suppkey").as("l2_sk"))
      val l3 = l.filter(col("l_receiptdate") > col("l_commitdate"))
        .select(col("l_orderkey").as("l3_ok"), col("l_suppkey").as("l3_sk"))
      l1.join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(l2, col("l_orderkey") === col("l2_ok") &&
          col("l_suppkey") =!= col("l2_sk"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_ok") &&
          col("l_suppkey") =!= col("l3_sk"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q22 — global sales opportunity. cntrycode = CAST(c_nationkey) for
    // the canonical substring(c_phone,1,2); "no orders" windowed to
    // o_orderdate >= 1999-01-01 (every fixture customer has some order).
    "q235_tpch_q22" -> ((s, d) => {
      val codes = Seq(1, 3, 5, 13, 17, 21, 23)
      val c = t(s, d, "customer").filter(col("c_nationkey").isin(codes: _*))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("ab"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1999-01-01")).select(col("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("string").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), sum(col("c_acctbal")).as("totacctbal"))
    }),

    // TPC-H refresh streams (RF1 insert / RF2 delete, spec §2.27-2.28)
    // as a functional simulation: a deterministic hash splits orders
    // into base (90%), the RF1 insert batch (10%), and the RF2 delete
    // keys (a different 10%); lineitem cascades by orderkey (the spec's
    // referential rule). The post-refresh state is verified by count +
    // exact-decimal revenue — the ACID-ish maintenance counterpart to
    // q259's incremental aggregate. Insert is a union, delete is an
    // anti-join: both are the 100 TB shapes (no row rewrite).
    "q269_tpch_refresh" -> ((s, d) => {
      val hk = Dedup.hash60(concat_ws("", lit("rf:"), col("o_orderkey"))) % 10
      val orders = t(s, d, "orders").withColumn("hk", hk)
      val base = orders.filter(col("hk") =!= 0).drop("hk")
      val rf1 = orders.filter(col("hk") === 0).drop("hk")
      val rf2keys = orders.filter(col("hk") === 1)
        .select(col("o_orderkey"))
      val post = base.unionByName(rf1)
        .join(rf2keys, Seq("o_orderkey"), "left_anti")
      val liPost = t(s, d, "lineitem")
        .join(rf2keys.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
      val oc = post.agg(count(lit(1)).as("n_orders"))
      val lc = liPost.agg(count(lit(1)).as("n_lineitems"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0).cast("decimal(4,2)") -
            col("l_discount").cast("decimal(4,2)")))
          .cast("double"), 2).as("total_revenue"))
      oc.crossJoin(lc)
    })
  )

  /** Shared DuckDB derived-schema prefix mirroring li2/partsupp/part2. */
  private val ctePrefix: String = """
WITH lineitem2 AS MATERIALIZED (
  SELECT l.*,
    CAST(l_shipdate AS DATE) + CAST((l_orderkey*3 + l_linenumber) % 30 - 14 AS INT) AS l_commitdate,
    CAST(l_shipdate AS DATE) + CAST((l_orderkey*5 + l_linenumber*7) % 30 - 14 AS INT) AS l_receiptdate,
    CASE CAST((l_orderkey*7 + l_linenumber) % 7 AS INT) WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL' WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL' ELSE 'FOB' END AS l_shipmode,
    CASE CAST((l_orderkey + l_linenumber*3) % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct
  FROM lineitem l),
partsupp AS MATERIALIZED (
  SELECT ps_partkey, ps_suppkey,
    CAST((ps_partkey*7 + i*13) % 9999 + 1 AS INT) AS ps_availqty,
    ((ps_partkey*31 + ps_suppkey*17) % 20000 + 100) / 100.0 AS ps_supplycost
  FROM (SELECT p_partkey AS ps_partkey,
               (p_partkey*4 + i*17 + 3) % (SELECT count(*) FROM supplier) AS ps_suppkey, i
        FROM part, (SELECT unnest([0,1,2,3]) AS i) di) b),
part2 AS (
  SELECT p.*, 'Manufacturer#' || CAST(1 + p_partkey % 5 AS VARCHAR) AS p_mfgr,
    CASE CAST(p_partkey % 8 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX' WHEN 2 THEN 'SM PACK' WHEN 3 THEN 'SM PKG' WHEN 4 THEN 'MED BAG' WHEN 5 THEN 'MED BOX' WHEN 6 THEN 'MED PKG' ELSE 'LG CASE' END AS p_container
  FROM part p)
"""

  val oracles: Seq[(String, String)] = Seq(

    "q269_tpch_refresh" ->
      """WITH hk AS (
           SELECT o_orderkey,
                  ('0x' || substr(md5('rf:' || o_orderkey), 1, 15))
                    ::BIGINT % 10 AS h
           FROM orders),
         rf2 AS (SELECT o_orderkey FROM hk WHERE h = 1),
         post AS (
           SELECT o.* FROM orders o
           WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM rf2)),
         li_post AS (
           SELECT l.* FROM lineitem l
           WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM rf2))
         SELECT (SELECT count(*) FROM post)::BIGINT AS n_orders,
                (SELECT count(*) FROM li_post)::BIGINT AS n_lineitems,
                (SELECT round(sum(l_extendedprice::DECIMAL(18,2)
                   * (1::DECIMAL(4,2) - l_discount::DECIMAL(4,2)))
                   ::DOUBLE, 2) FROM li_post) AS total_revenue""",

    "q214_tpch_q01" -> (ctePrefix + """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty, sum(l_extendedprice) AS sum_base_price,
  sum(l_extendedprice*(1-l_discount)) AS sum_disc_price,
  sum(l_extendedprice*(1-l_discount)*(1+l_tax)) AS sum_charge,
  avg(l_quantity) AS avg_qty, avg(l_extendedprice) AS avg_price,
  avg(l_discount) AS avg_disc, count(*) AS count_order
FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""),

    "q215_tpch_q02" -> (ctePrefix + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr
FROM part2 p, partsupp ps, supplier s, nation n, region r
WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
  AND p.p_size = 15 AND p.p_type LIKE '%M%'
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""),

    "q216_tpch_q03" -> (ctePrefix + """
SELECT l_orderkey, sum(l_extendedprice*(1-l_discount)) AS revenue,
  o_orderdate, 0 AS o_shippriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""),

    "q217_tpch_q04" -> (ctePrefix + """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem2 WHERE l_orderkey = o_orderkey
              AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority"""),

    "q218_tpch_q05" -> (ctePrefix + """
SELECT n_name, sum(l_extendedprice*(1-l_discount)) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name"""),

    "q219_tpch_q06" -> (ctePrefix + """
SELECT sum(l_extendedprice*l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),

    "q220_tpch_q07" -> (ctePrefix + """
SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        l_extendedprice*(1-l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12')
          OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
        AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31') shipping
GROUP BY supp_nation, cust_nation, l_year"""),

    "q221_tpch_q08" -> (ctePrefix + """
SELECT o_year,
  sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        l_extendedprice*(1-l_discount) AS volume, n2.n_name AS nation
      FROM part2, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY') all_nations
GROUP BY o_year"""),

    "q222_tpch_q09" -> (ctePrefix + """
SELECT nation, o_year, sum(amount) AS sum_profit
FROM (SELECT n_name AS nation,
        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity AS amount
      FROM part2, supplier, lineitem, partsupp, orders, nation
      WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
        AND ps_partkey = l_partkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%bolt%') profit
GROUP BY nation, o_year"""),

    "q223_tpch_q10" -> (ctePrefix + """
SELECT c_custkey, c_name, sum(l_extendedprice*(1-l_discount)) AS revenue,
  c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20"""),

    "q224_tpch_q11" -> (ctePrefix + """
SELECT ps_partkey, sum(ps_supplycost*ps_availqty) AS value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY ps_partkey
HAVING sum(ps_supplycost*ps_availqty) > (
  SELECT sum(ps_supplycost*ps_availqty) * 0.002
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')"""),

    "q225_tpch_q12" -> (ctePrefix + """
SELECT l_shipmode,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders, lineitem2
WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL','SHIP')
  AND l_commitdate < l_receiptdate AND CAST(l_shipdate AS DATE) < l_commitdate
  AND l_receiptdate >= DATE '1996-01-01' AND l_receiptdate < DATE '1997-01-01'
GROUP BY l_shipmode"""),

    "q226_tpch_q13" -> (ctePrefix + """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
      GROUP BY c_custkey) c_orders
GROUP BY c_count"""),

    "q227_tpch_q14" -> (ctePrefix + """
SELECT 100.00 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount)
    ELSE 0 END) / sum(l_extendedprice*(1-l_discount)) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"""),

    "q228_tpch_q15" -> (ctePrefix + """
, revenue0 AS MATERIALIZED (
  SELECT l_suppkey AS supplier_no, sum(l_extendedprice*(1-l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)"""),

    "q229_tpch_q16" -> (ctePrefix + """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp, part2
WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#25'
  AND p_type NOT LIKE 'MEDIUM%' AND p_size IN (49,14,23,45,19,3,36,9)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size"""),

    "q230_tpch_q17" -> (ctePrefix + """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem, part2
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_container = 'MED BOX'
  AND l_quantity < (SELECT 0.2*avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)"""),

    "q231_tpch_q18" -> (ctePrefix + """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  sum(l_quantity) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100"""),

    "q232_tpch_q19" -> (ctePrefix + """
SELECT sum(l_extendedprice*(1-l_discount)) AS revenue
FROM lineitem2, part2
WHERE p_partkey = l_partkey
  AND l_shipmode IN ('AIR','REG AIR') AND l_shipinstruct = 'DELIVER IN PERSON'
  AND ((p_brand = 'Brand#1' AND p_container IN ('SM CASE','SM BOX','SM PACK','SM PKG')
        AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
    OR (p_brand = 'Brand#2' AND p_container IN ('MED BAG','MED BOX','MED PKG')
        AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
    OR (p_brand = 'Brand#3' AND p_container IN ('LG CASE')
        AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))"""),

    "q233_tpch_q20" -> (ctePrefix + """
SELECT s_name
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      AND ps_availqty > (SELECT 0.5*sum(l_quantity) FROM lineitem
                         WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                           AND l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate < TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'"""),

    "q234_tpch_q21" -> (ctePrefix + """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem2 l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (SELECT 1 FROM lineitem2 l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem2 l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_receiptdate > l3.l_commitdate)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100"""),

    "q235_tpch_q22" -> (ctePrefix + """
SELECT cntrycode, count(*) AS numcust, sum(c_acctbal) AS totacctbal
FROM (SELECT CAST(c_nationkey AS VARCHAR) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey IN (1,3,5,13,17,21,23)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_nationkey IN (1,3,5,13,17,21,23))) custsale
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode""")
  )
}
