package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch S (q451-q453):
  *
  *  - q451: FIFO cost-of-goods matching — the classic inventory
  *    ledger, restated closed-form: under FIFO the final quantity
  *    consumed from buy i is clamp(total_out - cum_in_before_i, 0,
  *    qty_i), so per-key prefix sums replace the sequential matcher
  *    entirely (no fold, no loop — two windows and an aggregate),
  *  - q452: ridge regularization path — closed-form 1-feature ridge
  *    slope Sxy/(Sxx + lambda) on a train split, validation SSE per
  *    lambda on the held-out split, all from exact integer sums,
  *  - q453: functional-dependency discovery — for each candidate
  *    A -> B, the violating-group and violating-row counts (the
  *    data-profiling primitive under schema inference and key
  *    detection; complements q380's declared-contract checks).
  *
  * Every corpus stage is a keyed aggregate or a per-key window; the
  * lambda grid and FD candidate set are constants.
  */
object Round9Ledger {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Ledger per part: 'N'-flag lines are inbound lots (qty,
    // price = extendedprice cents / qty), others are outbound demand.
    // FIFO consumption of lot i = clamp(O - cum_before_i, 0, qty_i)
    // where O = min(total_out, total_in) (unfillable demand ignored).
    // COGS = sum over lots of consumed * unit-price cents.
    "q451_fifo_cogs" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_partkey").as("pk"),
        col("l_shipdate").as("ts"), col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        (col("l_returnflag") === "N").as("inbound"))
      val tot = li.groupBy(col("pk")).agg(
        sum(when(col("inbound"), col("qty")).otherwise(0L)).as("tin"),
        sum(when(!col("inbound"), col("qty")).otherwise(0L)).as("tout"))
      val wLot = Window.partitionBy(col("pk"))
        // (orderkey, linenumber) is not unique in the fixture: qty and
        // cents complete the total order (identical rows commute)
        .orderBy(col("ts"), col("l_orderkey"), col("l_linenumber"),
          col("qty"), col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val lots = li.filter(col("inbound"))
        .withColumn("cumBefore",
          coalesce(sum(col("qty")).over(wLot), lit(0L)))
      lots.join(tot, "pk")
        .withColumn("o", least(col("tout"), col("tin")))
        .withColumn("consumed", greatest(lit(0L),
          least(col("qty"), col("o") - col("cumBefore"))))
        // unit price in cents DIV-floors; cost = consumed * unit
        .withColumn("cost", col("consumed") *
          expr("cents DIV greatest(qty, 1)"))
        .groupBy(col("pk")).agg(
          max(col("tin")).as("tin"), max(col("tout")).as("tout"),
          sum(col("consumed")).as("consumed_qty"),
          sum(col("cost")).as("cogs_cents"))
        .groupBy()
        .agg(count(lit(1)).as("n_parts"),
          sum(col("tin")).as("total_in"),
          sum(col("tout")).as("total_out"),
          sum(col("consumed_qty")).as("total_consumed"),
          sum(col("cogs_cents")).as("total_cogs_cents"),
          sum(when(col("tout") > col("tin"), 1L).otherwise(0L))
            .as("n_parts_short"))
    }),

    // Ridge path for y = retailprice cents vs x = p_size on the train
    // split (odd partkeys), validated on even partkeys: slope(l) =
    // Sxy_c / (Sxx_c + l) with centered train moments; intercept =
    // my - slope*mx; SSE_val from the validation moments — a fixed
    // double tree over exact integer sums for each lambda.
    "q452_ridge_path" -> ((s, d) => {
      val p = t(s, d, "part").select(
        (col("p_partkey") % 2).as("half"),
        col("p_size").cast("long").as("x"),
        floor(col("p_retailprice") * 100).cast("long").as("y"))
      def moments(df: DataFrame) = df.agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val tr = moments(p.filter(col("half") === 1))
        .toDF("n_t", "sx_t", "sy_t", "sxx_t", "sxy_t", "syy_t")
      val va = moments(p.filter(col("half") === 0))
        .toDF("n_v", "sx_v", "sy_v", "sxx_v", "sxy_v", "syy_v")
      val lambdas = s.range(0, 7).toDF("i")
        .select((pow(lit(10.0), col("i")) * 10).as("lambda"))
      lambdas.crossJoin(broadcast(tr)).crossJoin(broadcast(va))
        .withColumn("slope", expr(
          """(sxy_t - CAST(sx_t AS DOUBLE) * sy_t / n_t)
             / ((sxx_t - CAST(sx_t AS DOUBLE) * sx_t / n_t) + lambda)"""))
        .withColumn("icept", expr(
          "CAST(sy_t AS DOUBLE) / n_t - slope * (CAST(sx_t AS DOUBLE) / n_t)"))
        // SSE_val = syy - 2a*sy - 2b*sxy + n a^2 + 2ab sx + b^2 sxx
        .withColumn("sse_val", expr(
          """syy_v - 2 * icept * sy_v - 2 * slope * sxy_v
             + n_v * icept * icept + 2 * icept * slope * sx_v
             + slope * slope * sxx_v"""))
        .select(col("lambda"), col("slope"), col("icept"),
          col("sse_val"))
        .orderBy(col("lambda"))
    }),

    // Candidate FDs over joined order facts: which determinant sets
    // actually function. violations(A -> B) = groups of A with >1
    // distinct B; violating rows = rows outside each group's majority
    // B (the repair cost).
    "q453_fd_discovery" -> ((s, d) => {
      val f = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"), col("o_orderstatus"),
        year(col("o_orderdate")).as("oyear"))
      def fd(name: String, a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column): DataFrame = {
        val grp = f.groupBy(a.as("a"), b.as("b"))
          .agg(count(lit(1)).as("c"))
        val perA = grp.groupBy(col("a"))
          .agg(count(lit(1)).as("nb"), sum(col("c")).as("rows"),
            max(col("c")).as("maj"))
        perA.agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1, 1L).otherwise(0L))
              .as("violating_groups"),
            sum(col("rows") - col("maj")).as("violating_rows"),
            sum(col("rows")).as("n_rows"))
          .select(lit(name).as("fd"), col("n_groups"),
            col("violating_groups"), col("violating_rows"),
            (col("violating_groups") === 0).cast("long").as("holds"))
      }
      fd("orderkey->custkey", col("o_orderkey"), col("o_custkey"))
        .unionByName(fd("custkey->priority", col("o_custkey"),
          col("o_orderpriority")))
        .unionByName(fd("priority->status", col("o_orderpriority"),
          col("o_orderstatus")))
        .unionByName(fd("custkey->year", col("o_custkey"), col("oyear")))
        .orderBy(col("fd"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q451_fifo_cogs" ->
      """WITH li AS (
           SELECT l_partkey AS pk, l_shipdate::TIMESTAMP AS ts,
                  l_orderkey, l_linenumber,
                  CAST(l_quantity AS BIGINT) AS qty,
                  floor(l_extendedprice * 100)::BIGINT AS cents,
                  (l_returnflag = 'N') AS inbound
           FROM lineitem),
         tot AS (
           SELECT pk,
                  sum(CASE WHEN inbound THEN qty ELSE 0 END)::BIGINT
                    AS tin,
                  sum(CASE WHEN NOT inbound THEN qty ELSE 0 END)::BIGINT
                    AS tout
           FROM li GROUP BY pk),
         lots AS (
           SELECT pk, qty, cents,
                  coalesce(sum(qty) OVER (PARTITION BY pk
                    ORDER BY ts, l_orderkey, l_linenumber, qty, cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0)::BIGINT AS cumBefore
           FROM li WHERE inbound),
         m AS (
           SELECT l.pk, t.tin, t.tout,
                  greatest(0, least(l.qty,
                    least(t.tout, t.tin) - l.cumBefore))::BIGINT
                    AS consumed,
                  greatest(0, least(l.qty,
                    least(t.tout, t.tin) - l.cumBefore))
                    * (l.cents // greatest(l.qty, 1)) AS cost
           FROM lots l JOIN tot t ON l.pk = t.pk),
         per AS (
           SELECT pk, max(tin) AS tin, max(tout) AS tout,
                  sum(consumed)::BIGINT AS consumed_qty,
                  sum(cost)::BIGINT AS cogs_cents
           FROM m GROUP BY pk)
         SELECT count(*)::BIGINT AS n_parts,
                sum(tin)::BIGINT AS total_in,
                sum(tout)::BIGINT AS total_out,
                sum(consumed_qty)::BIGINT AS total_consumed,
                sum(cogs_cents)::BIGINT AS total_cogs_cents,
                sum(CASE WHEN tout > tin THEN 1 ELSE 0 END)::BIGINT
                  AS n_parts_short
         FROM per""",

    "q452_ridge_path" ->
      """WITH p AS (
           SELECT (p_partkey % 2)::BIGINT AS half,
                  p_size::BIGINT AS x,
                  floor(p_retailprice * 100)::BIGINT AS y
           FROM part),
         tr AS (
           SELECT count(*)::BIGINT AS n_t, sum(x)::BIGINT AS sx_t,
                  sum(y)::BIGINT AS sy_t, sum(x * x)::BIGINT AS sxx_t,
                  sum(x * y)::BIGINT AS sxy_t,
                  sum(y * y)::BIGINT AS syy_t
           FROM p WHERE half = 1),
         va AS (
           SELECT count(*)::BIGINT AS n_v, sum(x)::BIGINT AS sx_v,
                  sum(y)::BIGINT AS sy_v, sum(x * x)::BIGINT AS sxx_v,
                  sum(x * y)::BIGINT AS sxy_v,
                  sum(y * y)::BIGINT AS syy_v
           FROM p WHERE half = 0),
         grid AS (
           SELECT power(10.0, g.i) * 10 AS lambda
           FROM generate_series(0, 6) AS g(i)),
         path AS (
           SELECT lambda,
                  (sxy_t - CAST(sx_t AS DOUBLE) * sy_t / n_t)
                    / ((sxx_t - CAST(sx_t AS DOUBLE) * sx_t / n_t)
                       + lambda) AS slope
           FROM grid CROSS JOIN tr),
         fl AS (
           SELECT p.lambda, p.slope,
                  CAST(sy_t AS DOUBLE) / n_t
                    - p.slope * (CAST(sx_t AS DOUBLE) / n_t) AS icept
           FROM path p CROSS JOIN tr)
         SELECT f.lambda, f.slope, f.icept,
                syy_v - 2 * f.icept * sy_v - 2 * f.slope * sxy_v
                  + n_v * f.icept * f.icept
                  + 2 * f.icept * f.slope * sx_v
                  + f.slope * f.slope * sxx_v AS sse_val
         FROM fl f CROSS JOIN va ORDER BY f.lambda""",

    "q453_fd_discovery" ->
      """WITH f AS (
           SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
                  year(o_orderdate) AS oyear
           FROM orders),
         cands AS (
           SELECT 'orderkey->custkey' AS fd,
                  CAST(o_orderkey AS VARCHAR) AS a,
                  CAST(o_custkey AS VARCHAR) AS b FROM f
           UNION ALL
           SELECT 'custkey->priority', CAST(o_custkey AS VARCHAR),
                  o_orderpriority FROM f
           UNION ALL
           SELECT 'priority->status', o_orderpriority, o_orderstatus
           FROM f
           UNION ALL
           SELECT 'custkey->year', CAST(o_custkey AS VARCHAR),
                  CAST(oyear AS VARCHAR) FROM f),
         grp AS (
           SELECT fd, a, b, count(*)::BIGINT AS c
           FROM cands GROUP BY 1, 2, 3),
         per_a AS (
           SELECT fd, a, count(*)::BIGINT AS nb, sum(c)::BIGINT AS rows,
                  max(c)::BIGINT AS maj
           FROM grp GROUP BY 1, 2)
         SELECT fd, count(*)::BIGINT AS n_groups,
                sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END)::BIGINT
                  AS violating_groups,
                sum(rows - maj)::BIGINT AS violating_rows,
                (CASE WHEN sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0
                      THEN 1 ELSE 0 END)::BIGINT AS holds
         FROM per_a GROUP BY fd ORDER BY fd""",
  )
}
