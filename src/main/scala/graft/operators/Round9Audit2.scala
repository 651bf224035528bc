package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AN (q514-q516) — retention dynamics, audit
  * sampling, and referential integrity:
  *
  *  - q514: retention half-life — weekly cohort retention rates
  *    (distinct actives at week k over cohort size), then a
  *    log-linear decay fit over k ∈ {1,2,3} whose slope collapses
  *    to (w3−w1)/2 (u-values symmetric around 2 — fixed operation
  *    order, no float-sum ambiguity), reported as the cohort's
  *    half-life in milli-weeks. Cohort×week grid is
  *    calendar-bounded; distinct-user counts are the only corpus
  *    aggregates.
  *  - q515: monetary-unit sampling (MUS / dollar-unit sampling) —
  *    the financial-audit selection where every cent is equally
  *    likely, so big invoices are proportionally sampled.
  *    Fixed-interval selection over the GLOBAL cumulative cents in
  *    orderkey order; the running total uses the q345 range-
  *    partition pattern (per-partition window + broadcast offsets),
  *    never a single-partition corpus window; the 12 probe
  *    positions broadcast to one interval-containment join.
  *  - q516: foreign-key orphan audit over the star schema — per
  *    relationship: child rows, orphaned children (anti-join),
  *    childless parents, orphan ppm. The data-contract gate a
  *    warehouse runs before trusting any join; every check is one
  *    distinct-project + one anti-join.
  */
object Round9Audit2 {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q514_retention_halflife" -> ((s, d) => {
      // activity = purchases (any-event weekly presence is ~100% in
      // the fixture -> no decay to fit)
      val act = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("floor(unix_timestamp(ts) / 86400) DIV 7").as("aw"))
        .distinct()
      val first = act.groupBy(col("user_id"))
        .agg(min(col("aw")).as("cw"))
      val horizon = act.agg(max(col("aw")).as("maxw"))
      val grid = graft.Stage(act.join(first, Seq("user_id"))
        .withColumn("k", col("aw") - col("cw"))
        .filter(col("k").between(0, 3))
        .groupBy(col("cw"), col("k"))
        .agg(countDistinct(col("user_id")).as("u")), "q514_grid")
      val sizes = grid.filter(col("k") === 0)
        .select(col("cw"), col("u").as("n0"))
      val rates = grid.join(sizes, Seq("cw"))
        .crossJoin(broadcast(horizon))
        .filter(col("cw") <= col("maxw") - 3) // full 3-week horizon
        .withColumn("r_ppm", expr("u * 1000000 DIV n0"))
        .groupBy(col("cw"), col("n0"))
        .agg(
          sum(when(col("k") === 1, col("r_ppm"))).as("r1_ppm"),
          sum(when(col("k") === 2, col("r_ppm"))).as("r2_ppm"),
          sum(when(col("k") === 3, col("r_ppm"))).as("r3_ppm"))
      rates
        .withColumn("slope",
          // coalesce to 1 (not 0): DuckDB's ln(0) raises even under
          // a CASE guard, and the r>0 gate already voids these rows
          (log(coalesce(col("r3_ppm"), lit(1L)).cast("double") / 1e6)
            - log(coalesce(col("r1_ppm"), lit(1L)).cast("double") / 1e6))
            / 2.0)
        .select(col("cw").as("cohort_week"), col("n0").as("cohort_size"),
          col("r1_ppm"), col("r2_ppm"), col("r3_ppm"),
          when(col("r1_ppm") > 0 && col("r3_ppm") > 0
            && col("slope") < 0,
            floor(lit(-math.log(2.0)) / col("slope") * 1000)
              .cast("long"))
            .otherwise(lit(-1L)).as("halflife_milli_weeks"))
        .orderBy(col("cohort_week"))
    }),

    "q515_monetary_unit_sampling" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val k = 12
      val base = t(s, d, "orders")
        .select(col("o_orderkey").as("okey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val parts = base.repartitionByRange(8, col("okey"))
        .withColumn("pid", spark_partition_id())
      val wCum = Window.partitionBy(col("pid")).orderBy(col("okey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = graft.Stage(parts
        .withColumn("lcum", sum(col("cents")).over(wCum)), "q515_local")
      val per = local.groupBy(col("pid")).agg(sum(col("cents")).as("c"))
        .collect().sortBy(_.getInt(0)) // bounded: one row per partition
      val off = per.scanLeft((0, 0L)) { case ((_, acc), r) =>
        (r.getInt(0), acc + r.getLong(1)) }
      val offDf = off.init.zip(off.tail)
        .map { case ((_, before), (pid, _)) => (pid, before) }
        .toSeq.toDF("pid", "off")
      val total = per.map(_.getLong(1)).sum
      val interval = total / k
      val probes = (0 until k)
        .map(j => (j.toLong, j * interval + interval / 2))
        .toDF("j", "pos")
      local.join(broadcast(offDf), Seq("pid"))
        .withColumn("cum", col("off") + col("lcum"))
        .join(broadcast(probes),
          col("pos") >= col("cum") - col("cents")
            && col("pos") < col("cum"))
        .select(col("j"), col("pos"), col("okey").as("selected_okey"),
          col("cents"), col("cum"))
        .orderBy(col("j"))
    }),

    "q516_fk_orphan_audit" -> ((s, d) => {
      def audit(rel: String, child: DataFrame, ck: String,
                parent: DataFrame, pk: String): DataFrame = {
        val c = child.select(col(ck).as("ck"))
        val p = graft.Stage(parent.select(col(pk).as("pk")).distinct(),
          s"q516_$rel")
        val orphans = c.join(p, c("ck") === p("pk"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val cd = c.distinct()
        val childless = p.join(cd, cd("ck") === p("pk"),
          "left_anti").agg(count(lit(1)).as("n_childless_parents"))
        c.agg(count(lit(1)).as("n_child_rows"))
          .crossJoin(orphans).crossJoin(childless)
          .select(lit(rel).as("relationship"), col("n_child_rows"),
            col("n_orphans"),
            expr("n_orphans * 1000000 DIV n_child_rows")
              .as("orphan_ppm"),
            col("n_childless_parents"))
      }
      val li = t(s, d, "lineitem")
      val or = t(s, d, "orders")
      Seq(
        audit("lineitem_orders", li, "l_orderkey", or, "o_orderkey"),
        audit("lineitem_part", li, "l_partkey",
          t(s, d, "part"), "p_partkey"),
        audit("lineitem_supplier", li, "l_suppkey",
          t(s, d, "supplier"), "s_suppkey"),
        audit("orders_customer", or, "o_custkey",
          t(s, d, "customer"), "c_custkey"),
        audit("customer_nation", t(s, d, "customer"), "c_nationkey",
          t(s, d, "nation"), "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy(col("relationship"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q514_retention_halflife" ->
      s"""WITH act AS (
           SELECT DISTINCT user_id,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT // 7
                    AS aw
           FROM events WHERE event_type = 'purchase'),
         first_w AS (
           SELECT user_id, min(aw) AS cw FROM act GROUP BY user_id),
         horizon AS (SELECT max(aw) AS maxw FROM act),
         grid AS (
           SELECT f.cw, a.aw - f.cw AS k,
                  count(DISTINCT a.user_id)::BIGINT AS u
           FROM act a JOIN first_w f ON a.user_id = f.user_id
           WHERE a.aw - f.cw BETWEEN 0 AND 3
           GROUP BY 1, 2),
         sizes AS (
           SELECT cw, u AS n0 FROM grid WHERE k = 0),
         rates AS (
           SELECT g.cw, s.n0,
                  sum(CASE WHEN g.k = 1
                      THEN g.u * 1000000 // s.n0 END)::BIGINT AS r1_ppm,
                  sum(CASE WHEN g.k = 2
                      THEN g.u * 1000000 // s.n0 END)::BIGINT AS r2_ppm,
                  sum(CASE WHEN g.k = 3
                      THEN g.u * 1000000 // s.n0 END)::BIGINT AS r3_ppm
           FROM grid g
           JOIN sizes s ON g.cw = s.cw, horizon h
           WHERE g.cw <= h.maxw - 3
           GROUP BY g.cw, s.n0),
         fit AS (
           SELECT cw, n0, r1_ppm, r2_ppm, r3_ppm,
             (ln(CAST(coalesce(r3_ppm, 1) AS DOUBLE) / 1e6)
               - ln(CAST(coalesce(r1_ppm, 1) AS DOUBLE) / 1e6))
               / 2.0 AS slope
           FROM rates)
         SELECT cw AS cohort_week, n0 AS cohort_size,
                r1_ppm, r2_ppm, r3_ppm,
                (CASE WHEN r1_ppm > 0 AND r3_ppm > 0 AND slope < 0
                 THEN floor(${-math.log(2.0)} / slope * 1000)
                 ELSE -1 END)::BIGINT AS halflife_milli_weeks
         FROM fit ORDER BY cohort_week""",

    "q515_monetary_unit_sampling" ->
      """WITH base AS (
           SELECT o_orderkey AS okey,
                  floor(o_totalprice * 100)::BIGINT AS cents
           FROM orders),
         cum AS (
           SELECT okey, cents,
                  sum(cents) OVER (ORDER BY okey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    ::BIGINT AS cum
           FROM base),
         tot AS (SELECT sum(cents)::BIGINT AS total FROM base),
         probes AS (
           SELECT j.range::BIGINT AS j,
                  (j.range * (t.total // 12)
                    + (t.total // 12) // 2)::BIGINT AS pos
           FROM range(0, 12) j, tot t)
         SELECT p.j, p.pos, c.okey AS selected_okey, c.cents, c.cum
         FROM probes p JOIN cum c
           ON p.pos >= c.cum - c.cents AND p.pos < c.cum
         ORDER BY p.j""",

    "q516_fk_orphan_audit" -> {
      def one(rel: String, child: String, ck: String,
              parent: String, pk: String) =
        s"""SELECT '$rel' AS relationship,
              (SELECT count(*) FROM $child)::BIGINT AS n_child_rows,
              (SELECT count(*) FROM $child c
               WHERE NOT EXISTS (SELECT 1 FROM $parent p
                 WHERE p.$pk = c.$ck))::BIGINT AS n_orphans,
              ((SELECT count(*) FROM $child c
                WHERE NOT EXISTS (SELECT 1 FROM $parent p
                  WHERE p.$pk = c.$ck)) * 1000000
                // (SELECT count(*) FROM $child))::BIGINT
                AS orphan_ppm,
              (SELECT count(*) FROM (SELECT DISTINCT $pk FROM $parent)
                 p(pk)
               WHERE NOT EXISTS (SELECT 1 FROM $child c
                 WHERE c.$ck = p.pk))::BIGINT AS n_childless_parents"""
      Seq(
        one("lineitem_orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        one("lineitem_part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        one("lineitem_supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        one("orders_customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        one("customer_nation", "customer", "c_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
    }
  )
}
