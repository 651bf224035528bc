package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-10 ADVICE findings on
  * plans/MvRewrite.scala — each test is the exact false-match (or
  * wrong-value) shape the advisor constructed, asserted to no longer
  * fire while the intended rewrite still does.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("user-written IS NOT NULL over a bare-scan base blocks the MV " +
      "match; the unfiltered roll-up still rewrites") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_inn")
    eng.sql("DROP TABLE IF EXISTS mvb_inn")
    // x is nullable and NOT a join key of anything — an MV defined
    // WITHOUT the filter must not answer a query filtered on x.
    eng.sql(
      """CREATE TABLE mvb_inn AS
         SELECT l_returnflag AS g, l_quantity AS m,
                CASE WHEN l_orderkey % 2 = 0 THEN l_partkey END AS x
         FROM lineitem WHERE l_orderkey % 5 = 0""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_inn AS
         SELECT g, sum(m) AS sm, count(*) AS cnt
         FROM mvb_inn GROUP BY g""")
    // truth computed directly (the filter makes it non-derivable, so
    // even post-MV this SQL must hit the base — that IS the assertion)
    val filtered = eng.sql(
      """SELECT g, sum(m) AS s FROM mvb_inn
         WHERE x IS NOT NULL GROUP BY g""")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("sum(sm"),
      "IS NOT NULL query was wrongly served from the unfiltered MV")
    assert(plan.contains("isnotnull(x"),
      "the user filter vanished from the executed plan")
    // unfiltered roll-up (identical groupings) still rewrites
    val full = eng.sql("SELECT g, sum(m) AS s FROM mvb_inn GROUP BY g")
    assert(full.queryExecution.executedPlan.toString.contains("sum(sm"),
      "the intended unfiltered rewrite stopped firing")
    // and the filtered values are genuinely different from the full ones
    val fv = filtered.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val uv = full.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fv.exists { case (k, v) => uv(k) != v },
      "fixture degenerate: filter removed no rows")
    eng.sql("DROP MATERIALIZED VIEW mv_inn")
    eng.sql("DROP TABLE mvb_inn")
  }

  test("self-join MV on t1.a = t2.b does not answer the transposed " +
      "join t1.b = t2.a; the identical condition still rewrites") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_sj")
    eng.sql("DROP TABLE IF EXISTS sjb_mv")
    eng.sql(
      """CREATE TABLE sjb_mv AS
         SELECT o_orderkey % 50 AS a, o_custkey % 50 AS b,
                o_totalprice AS m
         FROM orders WHERE o_orderkey % 11 = 0""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_sj AS
         SELECT t2.b AS gb, sum(t1.m) AS sm, count(*) AS cnt
         FROM sjb_mv t1 JOIN sjb_mv t2 ON t1.a = t2.b
         GROUP BY t2.b""")
    // transposed condition: both canonicalize to bare-name a=b under
    // the old normalization, but the join pairs are reversed — the
    // rewrite would return sums of the WRONG side's measure
    val transposed = eng.sql(
      """SELECT t2.b AS gb, sum(t1.m) AS s
         FROM sjb_mv t1 JOIN sjb_mv t2 ON t1.b = t2.a
         GROUP BY t2.b""")
    assert(transposed.queryExecution.executedPlan.toString
      .toLowerCase.contains("join"),
      "transposed self-join condition was wrongly served from the MV")
    // positive control: the MV's own condition rewrites join-free
    val same = eng.sql(
      """SELECT t2.b AS gb, sum(t1.m) AS s
         FROM sjb_mv t1 JOIN sjb_mv t2 ON t1.a = t2.b
         GROUP BY t2.b""")
    val p = same.queryExecution.executedPlan.toString
    assert(p.contains("sum(sm") && !p.toLowerCase.contains("join"),
      "the matching self-join roll-up stopped rewriting")
    eng.sql("DROP MATERIALIZED VIEW mv_sj")
    eng.sql("DROP TABLE sjb_mv")
  }

  test("an MV whose GROUP BY rides a computing Project is refused " +
      "registration (the base never collapses past semantics)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_cp")
    eng.sql("DROP TABLE IF EXISTS mvb_cp")
    eng.sql(
      """CREATE TABLE mvb_cp AS
         SELECT l_returnflag, l_linestatus, l_quantity
         FROM lineitem WHERE l_orderkey % 5 = 0""")
    val reg = eng.sql(
      """CREATE MATERIALIZED VIEW mv_cp AS
         SELECT p, sum(l_quantity) AS sq, count(*) AS cnt
         FROM (SELECT concat(l_returnflag, l_linestatus) AS p,
                      l_quantity
               FROM mvb_cp)
         GROUP BY p""").collect().head
    assert(!reg.getAs[Boolean]("rewrite_registered"),
      "computed-dimension MV must not register for rewrite")
    // the MV table itself still materialized and is directly queryable
    assert(eng.sql("SELECT count(*) AS n FROM mv_cp")
      .collect().head.getLong(0) > 0)
    eng.sql("DROP MATERIALIZED VIEW mv_cp")
    eng.sql("DROP TABLE mvb_cp")
  }

  test("global COUNT(*) rewritten against a grouped MV over an empty " +
      "base returns 0, not NULL") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_emp")
    eng.sql("DROP TABLE IF EXISTS mvb_emp")
    eng.sql(
      """CREATE TABLE mvb_emp AS
         SELECT l_returnflag AS g, l_quantity AS m
         FROM lineitem WHERE 1 = 0""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_emp AS
         SELECT g, sum(m) AS sm, count(*) AS cnt
         FROM mvb_emp GROUP BY g""")
    val df = eng.sql("SELECT count(*) AS n FROM mvb_emp")
    // must have been rewritten (re-sums the MV's cnt partials)…
    assert(df.queryExecution.executedPlan.toString.contains("sum(cnt"),
      "global count over the base was not rewritten to the MV")
    val row = df.collect().head
    assert(!row.isNullAt(0) && row.getLong(0) == 0L,
      s"COUNT(*) over empty base via MV must be 0, got $row")
    eng.sql("DROP MATERIALIZED VIEW mv_emp")
    eng.sql("DROP TABLE mvb_emp")
  }

  test("when several MVs can answer, the rewrite picks the smallest " +
      "scan (roll-up lattice cost tie-break)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_lat_fine")
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_lat_coarse")
    eng.sql("DROP TABLE IF EXISTS mvb_lat")
    eng.sql(
      """CREATE TABLE mvb_lat AS
         SELECT l_returnflag AS g1, l_linestatus AS g2,
                l_quantity AS m
         FROM lineitem""")
    val expect = eng.sql(
      "SELECT g1, sum(m) AS s FROM mvb_lat GROUP BY g1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fine grain registered FIRST — a first-hit registry would serve it
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_lat_fine AS
         SELECT g1, g2, sum(m) AS s FROM mvb_lat GROUP BY g1, g2""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_lat_coarse AS
         SELECT g1, sum(m) AS s FROM mvb_lat GROUP BY g1""")
    val df = eng.sql("SELECT g1, sum(m) AS s FROM mvb_lat GROUP BY g1")
    val scans = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }.mkString(";")
    assert(scans.contains("mv_lat_coarse"),
      s"query was not served from the coarse (smaller) MV: $scans")
    assert(!scans.contains("mv_lat_fine") && !scans.contains("mvb_lat"),
      s"query read a larger relation than the best MV: $scans")
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect, s"lattice rewrite changed values: $got vs $expect")
    // dropping the winner falls back to the next-best MV, not the base
    eng.sql("DROP MATERIALIZED VIEW mv_lat_coarse")
    val df2 = eng.sql("SELECT g1, sum(m) AS s FROM mvb_lat GROUP BY g1")
    val scans2 = df2.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }.mkString(";")
    assert(scans2.contains("mv_lat_fine") && !scans2.contains("mvb_lat"),
      s"after dropping the winner the fine MV must serve: $scans2")
    val got2 = df2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2 == expect, s"fallback rewrite changed values: $got2")
    eng.sql("DROP MATERIALIZED VIEW mv_lat_fine")
    eng.sql("DROP TABLE mvb_lat")
  }

  private def scanPaths(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }.mkString(";")

  test("predicate-transparent roll-up: a dim-only WHERE is answered " +
      "from the MV with the filter on the MV scan; non-dim filters " +
      "refuse") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_pf")
    eng.sql("DROP TABLE IF EXISTS mvb_pf")
    eng.sql(
      """CREATE TABLE mvb_pf AS
         SELECT l_returnflag AS g1, l_linestatus AS g2,
                l_quantity AS m
         FROM lineitem""")
    val expect = eng.sql(
      """SELECT g1, sum(m) AS s, count(*) AS n FROM mvb_pf
         WHERE g2 = 'F' GROUP BY g1""")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val expect2 = eng.sql(
      """SELECT g1, sum(m) AS s FROM mvb_pf
         WHERE g2 IN ('F', 'O') AND g1 <> 'R' GROUP BY g1""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_pf AS
         SELECT g1, g2, sum(m) AS s, count(*) AS cnt
         FROM mvb_pf GROUP BY g1, g2""")
    // positive: filter references only dims -> served from the MV,
    // with the predicate sitting on the MV scan
    val df = eng.sql(
      """SELECT g1, sum(m) AS s, count(*) AS n FROM mvb_pf
         WHERE g2 = 'F' GROUP BY g1""")
    val scans = scanPaths(df)
    assert(scans.contains("mv_pf") && !scans.contains("mvb_pf"),
      s"dim-filtered roll-up was not served from the MV: $scans")
    val got = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expect, s"filtered rewrite changed values: $got")
    // compound dim-only predicates (AND / IN / <>) also rewrite
    val df2 = eng.sql(
      """SELECT g1, sum(m) AS s FROM mvb_pf
         WHERE g2 IN ('F', 'O') AND g1 <> 'R' GROUP BY g1""")
    assert(scanPaths(df2).contains("mv_pf"),
      "compound dim-only predicate refused the MV")
    assert(df2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      expect2)
    // negative: a filter referencing the MEASURE must hit the base
    val dfm = eng.sql(
      """SELECT g1, count(*) AS n FROM mvb_pf
         WHERE m > 25 GROUP BY g1""")
    val scansM = scanPaths(dfm)
    assert(scansM.contains("mvb_pf") && !scansM.contains("mv_pf"),
      s"measure-filtered query was wrongly served from the MV: $scansM")
    // negative: mixed dim + non-dim predicate also refuses
    val dfx = eng.sql(
      """SELECT g1, count(*) AS n FROM mvb_pf
         WHERE g2 = 'F' AND m > 25 GROUP BY g1""")
    assert(scanPaths(dfx).contains("mvb_pf"),
      "mixed dim+measure predicate was wrongly served from the MV")
    // global aggregate whose dim filter empties the MV: count = 0
    val z = eng.sql(
      "SELECT count(*) AS n FROM mvb_pf WHERE g2 = 'ZZ'")
    assert(scanPaths(z).contains("mv_pf"),
      "emptying dim filter refused the MV")
    assert(z.collect().head.getLong(0) == 0L,
      "COUNT over an emptied MV scan must be 0, not NULL")
    eng.sql("DROP MATERIALIZED VIEW mv_pf")
    eng.sql("DROP TABLE mvb_pf")
  }

  test("AVG derives from an MV carrying sum(m)+count(m) — null groups " +
      "exact; DECIMAL avg refuses the MV") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_avg")
    eng.sql("DROP TABLE IF EXISTS mvb_avg")
    // g='N' carries an ALL-NULL measure group: its partials are
    // (sum=null, count=0) and the derived avg must stay null
    eng.sql(
      """CREATE TABLE mvb_avg AS
         SELECT CASE WHEN l_orderkey % 7 = 0 THEN 'Z'
                     ELSE l_returnflag END AS g,
                l_linestatus AS g2,
                CASE WHEN l_orderkey % 7 = 0
                     THEN CAST(NULL AS DOUBLE)
                     ELSE l_quantity END AS m,
                CAST(l_extendedprice AS DECIMAL(18,2)) AS dm
         FROM lineitem""")
    val expect = eng.sql(
      "SELECT g, avg(m) AS a, count(m) AS cm FROM mvb_avg GROUP BY g")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), r.getLong(2))).toMap
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_avg AS
         SELECT g, g2, sum(m) AS sm, count(m) AS cm, sum(dm) AS sdm,
                count(dm) AS cdm, count(*) AS cnt
         FROM mvb_avg GROUP BY g, g2""")
    val df = eng.sql(
      "SELECT g, avg(m) AS a, count(m) AS cm FROM mvb_avg GROUP BY g")
    val scans = scanPaths(df)
    assert(scans.contains("mv_avg") && !scans.contains("mvb_avg"),
      s"avg roll-up was not served from the MV: $scans")
    val got = df.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), r.getLong(2))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (a, cm)) =>
      val (ea, ecm) = expect(k)
      assert(cm == ecm, s"count(m) mismatch for $k")
      (a, ea) match {
        case (None, None) => () // the all-null group stays null
        case (Some(x: Double), Some(y: Double)) =>
          assert(x == y, s"avg mismatch for $k: $x vs $y")
        case other => fail(s"avg null-ness diverged for $k: $other")
      }
    }
    assert(got("Z")._1.isEmpty, "all-null group must have null avg")
    // DECIMAL avg must refuse (scale re-rounding — the q300 class)
    val dec = eng.sql("SELECT g, avg(dm) AS a FROM mvb_avg GROUP BY g")
    assert(scanPaths(dec).contains("mvb_avg") &&
      !scanPaths(dec).contains("mv_avg"),
      "DECIMAL avg was wrongly served from the MV")
    eng.sql("DROP MATERIALIZED VIEW mv_avg")
    eng.sql("DROP TABLE mvb_avg")
  }

  test("same-named columns on both join sides: the MV over t2.tag " +
      "does not answer a query grouping t1.tag (round-13 position " +
      "check); the registered side still rewrites") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_amb")
    eng.sql("DROP TABLE IF EXISTS amb_l")
    eng.sql("DROP TABLE IF EXISTS amb_r")
    // both tables expose `tag`, with DIFFERENT values per key — the
    // two groupings genuinely differ
    eng.sql(
      """CREATE TABLE amb_l AS
         SELECT o_orderkey % 100 AS k,
                concat('L', o_orderkey % 3) AS tag,
                o_totalprice AS m
         FROM orders WHERE o_orderkey % 7 = 0""")
    eng.sql(
      """CREATE TABLE amb_r AS
         SELECT o_orderkey % 100 AS k,
                concat('R', o_orderkey % 5) AS tag
         FROM orders WHERE o_orderkey % 13 = 0""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_amb AS
         SELECT t2.tag AS g, sum(t1.m) AS sm, count(*) AS cnt
         FROM amb_l t1 JOIN amb_r t2 ON t1.k = t2.k
         GROUP BY t2.tag""")
    // truth for the OTHER side's grouping
    val expect = eng.sql(
      """SELECT t1.tag AS g, sum(t1.m) AS s
         FROM amb_l t1 JOIN amb_r t2 ON t1.k = t2.k
         GROUP BY t1.tag""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val other = eng.sql(
      """SELECT t1.tag AS g, sum(t1.m) AS s
         FROM amb_l t1 JOIN amb_r t2 ON t1.k = t2.k
         GROUP BY t1.tag""")
    val scansO = scanPaths(other)
    assert(scansO.contains("amb_l") && !scansO.contains("mv_amb"),
      s"t1.tag grouping was wrongly served from the t2.tag MV: $scansO")
    assert(other.collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap == expect)
    // positive control: the registered side's grouping rewrites
    val same = eng.sql(
      """SELECT t2.tag AS g, sum(t1.m) AS s
         FROM amb_l t1 JOIN amb_r t2 ON t1.k = t2.k
         GROUP BY t2.tag""")
    assert(scanPaths(same).contains("mv_amb"),
      s"registered-side grouping stopped rewriting: ${scanPaths(same)}")
    eng.sql("DROP MATERIALIZED VIEW mv_amb")
    eng.sql("DROP TABLE amb_l")
    eng.sql("DROP TABLE amb_r")
  }

  test("an MV referencing the same name at two base positions " +
      "(GROUP BY t1.x, sum(t2.x)) refuses registration") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_dup")
    eng.sql("DROP TABLE IF EXISTS dup_b")
    eng.sql(
      """CREATE TABLE dup_b AS
         SELECT o_orderkey % 40 AS k, CAST(o_orderkey % 9 AS DOUBLE) AS x
         FROM orders WHERE o_orderkey % 3 = 0""")
    val reg = eng.sql(
      """CREATE MATERIALIZED VIEW mv_dup AS
         SELECT t1.x, sum(t2.x) AS sx, count(*) AS cnt
         FROM dup_b t1 JOIN dup_b t2 ON t1.k = t2.k
         GROUP BY t1.x""").collect().head
    assert(!reg.getAs[Boolean]("rewrite_registered"),
      "same-name-two-positions MV must refuse rewrite registration")
    assert(eng.sql("SELECT count(*) AS n FROM mv_dup")
      .collect().head.getLong(0) > 0,
      "the refused MV's table must still be queryable")
    eng.sql("DROP MATERIALIZED VIEW mv_dup")
    eng.sql("DROP TABLE dup_b")
  }

  test("a base dim named like an MV partial-column alias: the derived " +
      "sum keeps reading the partial, not the dim (identity-keyed swap)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_coll")
    eng.sql("DROP TABLE IF EXISTS coll_b")
    // base dim is named `total`; the MV aliases sum(amount) AS total —
    // a name-keyed dim swap would replace the derived Sum's scan
    // attribute `total` with the dim column `d` silently.
    eng.sql(
      """CREATE TABLE coll_b AS
         SELECT concat('g', o_orderkey % 4) AS total,
                o_totalprice AS amount
         FROM orders WHERE o_orderkey % 2 = 0""")
    val expect = eng.sql(
      """SELECT total AS g, round(sum(amount) / 100.0, 4) AS s
         FROM coll_b GROUP BY total""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_coll AS
         SELECT total AS d, sum(amount) AS total, count(*) AS cnt
         FROM coll_b GROUP BY total""")
    // the scalar-expression path exercises the general-case swap
    val df = eng.sql(
      """SELECT total AS g, round(sum(amount) / 100.0, 4) AS s
         FROM coll_b GROUP BY total""")
    assert(scanPaths(df).contains("mv_coll"),
      s"collision roll-up was not served from the MV: ${scanPaths(df)}")
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect,
      s"dim/partial-alias collision corrupted the derived sum: $got vs $expect")
    eng.sql("DROP MATERIALIZED VIEW mv_coll")
    eng.sql("DROP TABLE coll_b")
  }

  test("derived AVG re-sums partials in DOUBLE: a Long re-sum that " +
      "would overflow matches the base avg instead of wrapping/failing") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_ovf")
    eng.sql("DROP TABLE IF EXISTS ovf_b")
    // three per-(g,g2) partial sums of 2^62 each: their exact Long
    // re-sum (3×2^62) overflows Int64, while Average's own Double
    // accumulator — and the fixed derived path — compute 2^62 exactly.
    eng.sql(
      """CREATE TABLE ovf_b AS
         SELECT 'A' AS g, g2, CAST(4611686018427387904 AS BIGINT) AS m
         FROM (SELECT explode(array('x','y','z')) AS g2)""")
    val expect = eng.sql("SELECT g, avg(m) AS a FROM ovf_b GROUP BY g")
      .collect().head.getDouble(1)
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_ovf AS
         SELECT g, g2, sum(m) AS sm, count(m) AS cm, count(*) AS cnt
         FROM ovf_b GROUP BY g, g2""")
    val df = eng.sql("SELECT g, avg(m) AS a FROM ovf_b GROUP BY g")
    assert(scanPaths(df).contains("mv_ovf"),
      s"overflow-avg roll-up was not served from the MV: ${scanPaths(df)}")
    val got = df.collect().head.getDouble(1)
    assert(got == expect && got == math.pow(2, 62),
      s"derived avg diverged from base under Long-overflow partials: " +
        s"$got vs $expect")
    eng.sql("DROP MATERIALIZED VIEW mv_ovf")
    eng.sql("DROP TABLE ovf_b")
  }

  test("REFRESH after INSERT is append-incremental and exact " +
      "(SUM/COUNT/MIN/MAX, null-sum groups); repeated REFRESH is a " +
      "noop; the un-refreshed MV stays invalidated") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf1")
    eng.sql("DROP TABLE IF EXISTS rfb1")
    eng.sql(
      """CREATE TABLE rfb1 AS
         SELECT * FROM VALUES
           ('a', CAST(1.0 AS DOUBLE)), ('a', CAST(2.0 AS DOUBLE)),
           ('n', CAST(NULL AS DOUBLE))
         AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf1 AS
         SELECT g, sum(m) AS sm, count(m) AS cm, min(m) AS mn,
                max(m) AS mx, count(*) AS cnt
         FROM rfb1 GROUP BY g""")
    // batch: extends 'a', turns the all-null 'n' non-null, adds 'z'
    eng.sql(
      """INSERT INTO rfb1 SELECT * FROM VALUES
           ('a', CAST(0.5 AS DOUBLE)), ('n', CAST(7.0 AS DOUBLE)),
           ('z', CAST(9.0 AS DOUBLE)) AS t(g, m)""")
    val stale = eng.sql("SELECT g, sum(m) AS s FROM rfb1 GROUP BY g")
    assert(scanPaths(stale).contains("rfb1") &&
      !scanPaths(stale).contains("mv_rf1"),
      "un-refreshed MV must stay invalidated after INSERT")
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf1")
      .collect().head.getString(1)
    assert(mode == "incremental (append)", s"mode: $mode")
    val df = eng.sql(
      """SELECT g, sum(m) AS s, min(m) AS mn, max(m) AS mx,
                count(*) AS n
         FROM rfb1 GROUP BY g""")
    assert(scanPaths(df).contains("mv_rf1"),
      s"refreshed MV must serve: ${scanPaths(df)}")
    val got = df.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getLong(4))).toMap
    assert(got("a") == ((Some(3.5), Some(0.5), Some(2.0), 3L)), got("a"))
    assert(got("n") == ((Some(7.0), Some(7.0), Some(7.0), 2L)), got("n"))
    assert(got("z") == ((Some(9.0), Some(9.0), Some(9.0), 1L)), got("z"))
    // unchanged base: refresh is a no-op and navigation survives
    val mode2 = eng.sql("REFRESH MATERIALIZED VIEW mv_rf1")
      .collect().head.getString(1)
    assert(mode2 == "noop", s"mode2: $mode2")
    eng.sql("DROP MATERIALIZED VIEW mv_rf1")
    eng.sql("DROP TABLE rfb1")
  }

  test("REFRESH after DELETE takes the diff path: emptied groups " +
      "retire, all-null groups revert to NULL sums, values exact") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf2")
    eng.sql("DROP TABLE IF EXISTS rfb2")
    eng.sql(
      """CREATE TABLE rfb2 AS
         SELECT * FROM VALUES
           ('a', CAST(1.0 AS DOUBLE)), ('a', CAST(2.0 AS DOUBLE)),
           ('b', CAST(3.0 AS DOUBLE)), ('b', CAST(NULL AS DOUBLE)),
           ('c', CAST(NULL AS DOUBLE)), ('c', CAST(5.0 AS DOUBLE))
         AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf2 AS
         SELECT g, sum(m) AS sm, count(m) AS cm, count(*) AS cnt
         FROM rfb2 GROUP BY g""")
    // removes 'a' entirely; strips b's and c's non-null measures
    eng.sql("DELETE FROM rfb2 WHERE g = 'a' OR m = 3.0 OR m = 5.0")
    // truth while the MV is invalidated (query hits the base)
    val truth = eng.sql(
      "SELECT g, sum(m) AS s, count(m) AS cm, count(*) AS n " +
        "FROM rfb2 GROUP BY g")
    assert(scanPaths(truth).contains("rfb2"))
    val expect = truth.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), r.getLong(2), r.getLong(3))).toMap
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf2")
      .collect().head.getString(1)
    assert(mode == "incremental (diff)", s"mode: $mode")
    // the MV table itself: 'a' retired, b/c carry (NULL, 0, 1)
    val mv = eng.sql("SELECT g, sm, cm, cnt FROM mv_rf2 ORDER BY g")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), r.getLong(2), r.getLong(3))).toMap
    assert(!mv.contains("a"), s"emptied group must retire: $mv")
    assert(mv("b") == ((None, 0L, 1L)) && mv("c") == ((None, 0L, 1L)), mv)
    val df = eng.sql(
      "SELECT g, sum(m) AS s, count(m) AS cm, count(*) AS n " +
        "FROM rfb2 GROUP BY g")
    assert(scanPaths(df).contains("mv_rf2"),
      s"refreshed MV must serve: ${scanPaths(df)}")
    val got = df.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, s"diff refresh diverged: $got vs $expect")
    eng.sql("DROP MATERIALIZED VIEW mv_rf2")
    eng.sql("DROP TABLE rfb2")
  }

  test("REFRESH after DELETE on a MIN/MAX-carrying MV takes the " +
      "documented rebuild path and stays exact") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf3")
    eng.sql("DROP TABLE IF EXISTS rfb3")
    eng.sql(
      """CREATE TABLE rfb3 AS
         SELECT * FROM VALUES
           ('a', CAST(1.0 AS DOUBLE)), ('a', CAST(9.0 AS DOUBLE)),
           ('b', CAST(4.0 AS DOUBLE))
         AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf3 AS
         SELECT g, min(m) AS mn, max(m) AS mx, count(*) AS cnt
         FROM rfb3 GROUP BY g""")
    // removes a's maximum — unrecoverable from partials
    eng.sql("DELETE FROM rfb3 WHERE m = 9.0")
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf3")
      .collect().head.getString(1)
    assert(mode.startsWith("rebuilt"), s"mode: $mode")
    val df = eng.sql(
      "SELECT g, min(m) AS mn, max(m) AS mx FROM rfb3 GROUP BY g")
    assert(scanPaths(df).contains("mv_rf3"),
      s"rebuilt MV must serve: ${scanPaths(df)}")
    val got = df.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map("a" -> ((1.0, 1.0)), "b" -> ((4.0, 4.0))), got)
    eng.sql("DROP MATERIALIZED VIEW mv_rf3")
    eng.sql("DROP TABLE rfb3")
  }

  test("scheduled MV refresh: an MV created WITH refresh_interval_s " +
      "is swept by refreshDueMatViews when due, applying its delta " +
      "and restoring navigation; not-due MVs are untouched") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf5")
    eng.sql("DROP TABLE IF EXISTS rfb5")
    eng.sql(
      """CREATE TABLE rfb5 AS
         SELECT * FROM VALUES ('a', CAST(1.0 AS DOUBLE)),
           ('b', CAST(2.0 AS DOUBLE)) AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf5 WITH (refresh_interval_s=60)
         AS SELECT g, sum(m) AS sm, count(*) AS cnt
         FROM rfb5 GROUP BY g""")
    eng.sql(
      """INSERT INTO rfb5 SELECT * FROM VALUES
           ('a', CAST(4.0 AS DOUBLE)) AS t(g, m)""")
    // not yet due: nothing refreshes, navigation stays withdrawn
    val early = System.currentTimeMillis() + 1000L
    assert(!Ddl.refreshDueMatViews(spark, nowMs = early).contains("mv_rf5"))
    val stale = eng.sql("SELECT g, sum(m) AS s FROM rfb5 GROUP BY g")
    assert(scanPaths(stale).contains("rfb5"),
      "not-due MV must stay invalidated")
    // due: the sweep refreshes incrementally and navigation returns
    val due = System.currentTimeMillis() + 61000L
    assert(Ddl.refreshDueMatViews(spark, nowMs = due).contains("mv_rf5"))
    val df = eng.sql("SELECT g, sum(m) AS s FROM rfb5 GROUP BY g")
    assert(scanPaths(df).contains("mv_rf5"),
      s"swept MV must serve: ${scanPaths(df)}")
    assert(df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      == Map("a" -> 5.0, "b" -> 2.0))
    // immediately after the sweep the MV is no longer due
    assert(!Ddl.refreshDueMatViews(spark, nowMs = due + 1000L)
      .contains("mv_rf5"))
    // the SQL form of the tick routes and returns refreshed names
    // (nothing is due right now, so the sweep is empty)
    assert(eng.sql("REFRESH DUE MATERIALIZED VIEWS").columns.toSeq
      == Seq("mv_name"))
    eng.sql("DROP MATERIALIZED VIEW mv_rf5")
    eng.sql("DROP TABLE rfb5")
  }

  test("REFRESH after VACUUM of the base's history takes the rebuild " +
      "path (the recorded snapshot is gone) and stays exact") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf6")
    eng.sql("DROP TABLE IF EXISTS rfb6")
    eng.sql(
      """CREATE TABLE rfb6 AS
         SELECT * FROM VALUES ('a', CAST(1.0 AS DOUBLE)),
           ('a', CAST(2.0 AS DOUBLE)), ('b', CAST(3.0 AS DOUBLE))
         AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf6 AS
         SELECT g, sum(m) AS sm, count(m) AS cm, count(*) AS cnt
         FROM rfb6 GROUP BY g""")
    // COW rewrite bumps the version, then VACUUM removes the old one —
    // the diff path's snapshot is gone
    eng.sql("DELETE FROM rfb6 WHERE m = 1.0")
    eng.sql("VACUUM rfb6")
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf6")
      .collect().head.getString(1)
    assert(mode.startsWith("rebuilt"), s"mode: $mode")
    val df = eng.sql("SELECT g, sum(m) AS s FROM rfb6 GROUP BY g")
    assert(scanPaths(df).contains("mv_rf6"),
      s"rebuilt MV must serve: ${scanPaths(df)}")
    assert(df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      == Map("a" -> 2.0, "b" -> 3.0))
    eng.sql("DROP MATERIALIZED VIEW mv_rf6")
    eng.sql("DROP TABLE rfb6")
  }

  test("REFRESH after MERGE INTO the base takes the diff path and " +
      "is exact (update + insert mutations in one delta)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf7")
    eng.sql("DROP TABLE IF EXISTS rfb7")
    eng.sql(
      """CREATE TABLE rfb7 AS
         SELECT * FROM VALUES (1, 'a', CAST(10 AS BIGINT)),
           (2, 'a', CAST(20 AS BIGINT)), (3, 'b', CAST(30 AS BIGINT))
         AS t(k, g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf7 AS
         SELECT g, sum(m) AS sm, count(m) AS cm, count(*) AS cnt
         FROM rfb7 GROUP BY g""")
    // MERGE: bump k=2's measure, insert a new 'c' row
    eng.sql(
      """MERGE INTO rfb7 t USING (
           SELECT * FROM VALUES (2, 'a', CAST(25 AS BIGINT)),
             (9, 'c', CAST(90 AS BIGINT)) AS v(k, g, m)) s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET m = s.m
         WHEN NOT MATCHED THEN INSERT (k, g, m) VALUES (s.k, s.g, s.m)""")
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf7")
      .collect().head.getString(1)
    assert(mode == "incremental (diff)", s"mode: $mode")
    val df = eng.sql(
      "SELECT g, sum(m) AS s, count(*) AS n FROM rfb7 GROUP BY g")
    assert(scanPaths(df).contains("mv_rf7"),
      s"refreshed MV must serve: ${scanPaths(df)}")
    assert(df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap ==
      Map("a" -> ((35L, 2L)), "b" -> ((30L, 1L)), "c" -> ((90L, 1L))))
    eng.sql("DROP MATERIALIZED VIEW mv_rf7")
    eng.sql("DROP TABLE rfb7")
  }

  test("REFRESH of a filtered MV applies the defining WHERE to the " +
      "delta batch (rows outside the filter never reach the MV)") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MATERIALIZED VIEW IF EXISTS mv_rf4")
    eng.sql("DROP TABLE IF EXISTS rfb4")
    eng.sql(
      """CREATE TABLE rfb4 AS
         SELECT * FROM VALUES
           ('a', CAST(1.0 AS DOUBLE)), ('a', CAST(-5.0 AS DOUBLE)),
           ('b', CAST(2.0 AS DOUBLE))
         AS t(g, m)""")
    eng.sql(
      """CREATE MATERIALIZED VIEW mv_rf4 AS
         SELECT g, sum(m) AS sm, count(*) AS cnt
         FROM rfb4 WHERE m > 0 GROUP BY g""")
    eng.sql(
      """INSERT INTO rfb4 SELECT * FROM VALUES
           ('a', CAST(10.0 AS DOUBLE)), ('a', CAST(-100.0 AS DOUBLE))
         AS t(g, m)""")
    val mode = eng.sql("REFRESH MATERIALIZED VIEW mv_rf4")
      .collect().head.getString(1)
    assert(mode == "incremental (append)", s"mode: $mode")
    val mv = eng.sql("SELECT g, sm, cnt FROM mv_rf4 ORDER BY g")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(mv.toSeq == Seq(("a", 11.0, 2L), ("b", 2.0, 1L)),
      s"filtered delta leaked rows outside the MV's WHERE: ${mv.toSeq}")
    eng.sql("DROP MATERIALIZED VIEW mv_rf4")
    eng.sql("DROP TABLE rfb4")
  }
}
