package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AV (q538-q540) — audience set algebra, sampling
  * certificates, and scan-pruning estimation:
  *
  *  - q538: three-segment Venn decomposition (purchasers / clickers
  *    / error-hitters) with the inclusion-exclusion identity
  *    computed BOTH ways as output columns — the audience-overlap
  *    readout every growth team asks for, and a self-checking one
  *    (union_direct must equal union_incl_excl). One user-grain
  *    aggregate, one global aggregate.
  *  - q539: DKW sampling certificate — the Dvoretzky-Kiefer-
  *    Wolfowitz bound sup|F̂−F| ≤ √(ln(2/δ)/2n) checked empirically:
  *    a deterministic 5% hash sample's ECDF against the full ECDF
  *    on the 10-dollar-bucket value grain (domain-bounded cumulative
  *    windows, never a corpus sort), reporting the observed sup gap
  *    next to the theoretical ε at δ = 0.05. "Can I trust estimates
  *    off my sample" as a query.
  *  - q540: scan-IO pruning advisor — simulates 4096-row row-groups
  *    in insertion order with (shipdate, returnflag) zone maps and
  *    costs a band predicate: row-groups hit, rows scanned vs
  *    matched, and bytes under column pruning vs full-width rows.
  *    The quantitative version of the reference's fragment skipping
  *    (the q498 curve advisor's 1-D sibling).
  */
object Round9Venn {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q538_segment_venn" -> ((s, d) => {
      val seg = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("sa"),
          max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("sb"),
          max(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("sc"))
      seg.agg(count(lit(1)).as("n_users"),
        sum(col("sa")).as("a"), sum(col("sb")).as("b"),
        sum(col("sc")).as("c"),
        sum(col("sa") * col("sb")).as("ab"),
        sum(col("sa") * col("sc")).as("ac"),
        sum(col("sb") * col("sc")).as("bc"),
        sum(col("sa") * col("sb") * col("sc")).as("abc"),
        sum(when(col("sa") + col("sb") + col("sc") > 0, 1L)
          .otherwise(0L)).as("union_direct"))
        .select(col("n_users"), col("a"), col("b"), col("c"),
          col("ab"), col("ac"), col("bc"), col("abc"),
          col("union_direct"),
          (col("a") + col("b") + col("c") - col("ab") - col("ac")
            - col("bc") + col("abc")).as("union_incl_excl"))
    }),

    "q539_dkw_certificate" -> ((s, d) => {
      val base = t(s, d, "orders").select(
        expr("CAST(floor(o_totalprice * 100) AS BIGINT) DIV 1000")
          .as("v"), // 10-dollar buckets: value-domain-bounded grain
        (col("o_orderkey") % 20 === 0).cast("long").as("in_sample"))
      val grain = graft.Stage(base.groupBy(col("v"))
        .agg(count(lit(1)).as("cf"), sum(col("in_sample")).as("cs")),
        "q539_grain")
      val wv = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tots = grain.agg(sum(col("cf")).as("nf"),
        sum(col("cs")).as("ns"))
      val gaps = grain
        .withColumn("cumf", sum(col("cf")).over(wv))
        .withColumn("cums", sum(col("cs")).over(wv))
        .crossJoin(broadcast(tots))
        // |F̂−F| in exact cross-multiplied integers: |cums·nf − cumf·ns|
        .withColumn("gap_num",
          abs(col("cums").cast("decimal(38,0)") * col("nf")
            - col("cumf").cast("decimal(38,0)") * col("ns")))
      gaps.agg(first(col("nf")).as("n_full"),
        first(col("ns")).as("n_sample"),
        max(col("gap_num")).as("mg"))
        .select(col("n_full"), col("n_sample"),
          floor(col("mg").cast("double") * 1e6
            / (col("n_full").cast("decimal(38,0)") * col("n_sample"))
              .cast("double")).cast("long").as("sup_gap_ppm"),
          floor(sqrt(log(lit(2.0) / 0.05)
            / (lit(2.0) * col("n_sample").cast("double"))) * 1e6)
            .cast("long").as("dkw_eps_ppm"),
          when(col("mg").cast("double")
            / (col("n_full").cast("decimal(38,0)") * col("n_sample"))
              .cast("double")
            <= sqrt(log(lit(2.0) / 0.05)
              / (lit(2.0) * col("n_sample").cast("double"))), 1L)
            .otherwise(0L).as("within_bound"))
    }),

    "q540_scan_io_advisor" -> ((s, d) => {
      // fixed physical constants: 4096-row groups in orderkey order;
      // schema widths (bytes/row): full row 62, pruned projection
      // (shipdate+flag+price) 17
      val base = t(s, d, "lineitem").select(
        expr("l_orderkey DIV 1024").as("rg"), // ~4096 rows/group (4/ord)
        floor(unix_timestamp(col("l_shipdate")) / 86400L)
          .cast("long").as("day"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("m"))
      val span = base.agg(min(col("day")).as("d0"))
        .withColumn("lo", col("d0") + 365)
        .withColumn("hi", col("d0") + 730)
      val zones = graft.Stage(base.crossJoin(broadcast(span))
        .groupBy(col("rg"))
        .agg(count(lit(1)).as("nrows"),
          min(col("day")).as("zlo"), max(col("day")).as("zhi"),
          sum(when(col("day").between(col("lo"), col("hi"))
            && col("m") === 1L, 1L).otherwise(0L)).as("matched"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi")),
        "q540_zones")
      zones.agg(count(lit(1)).as("n_rowgroups"),
        sum(col("nrows")).as("rows_total"),
        sum(when(col("zhi") >= col("lo") && col("zlo") <= col("hi"),
          1L).otherwise(0L)).as("rg_hit"),
        sum(when(col("zhi") >= col("lo") && col("zlo") <= col("hi"),
          col("nrows")).otherwise(0L)).as("rows_scanned"),
        sum(col("matched")).as("rows_matched"))
        .select(col("n_rowgroups"), col("rg_hit"), col("rows_total"),
          col("rows_scanned"), col("rows_matched"),
          (col("rows_total") * 62L).as("bytes_full"),
          (col("rows_scanned") * 17L).as("bytes_pruned_zoned"),
          expr("""(rows_total * 62 - rows_scanned * 17) * 1000000
                  DIV (rows_total * 62)""").as("io_savings_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q538_segment_venn" ->
      """WITH seg AS (
           SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1
                 ELSE 0 END)::BIGINT AS sa,
             max(CASE WHEN event_type = 'click' THEN 1
                 ELSE 0 END)::BIGINT AS sb,
             max(CASE WHEN event_type = 'error' THEN 1
                 ELSE 0 END)::BIGINT AS sc
           FROM events GROUP BY user_id),
         agg AS (
           SELECT count(*)::BIGINT AS n_users,
                  sum(sa)::BIGINT AS a, sum(sb)::BIGINT AS b,
                  sum(sc)::BIGINT AS c,
                  sum(sa * sb)::BIGINT AS ab,
                  sum(sa * sc)::BIGINT AS ac,
                  sum(sb * sc)::BIGINT AS bc,
                  sum(sa * sb * sc)::BIGINT AS abc,
                  sum(CASE WHEN sa + sb + sc > 0 THEN 1
                      ELSE 0 END)::BIGINT AS union_direct
           FROM seg)
         SELECT n_users, a, b, c, ab, ac, bc, abc, union_direct,
                (a + b + c - ab - ac - bc + abc)::BIGINT
                  AS union_incl_excl
         FROM agg""",

    "q539_dkw_certificate" ->
      """WITH base AS (
           SELECT floor(o_totalprice * 100)::BIGINT // 1000 AS v,
                  (CASE WHEN o_orderkey % 20 = 0 THEN 1
                   ELSE 0 END)::BIGINT AS in_sample
           FROM orders),
         grain AS (
           SELECT v, count(*)::BIGINT AS cf,
                  sum(in_sample)::BIGINT AS cs
           FROM base GROUP BY v),
         tots AS (
           SELECT sum(cf)::BIGINT AS nf, sum(cs)::BIGINT AS ns
           FROM grain),
         gaps AS (
           SELECT t.nf, t.ns,
             abs((sum(g.cs) OVER w)::HUGEINT * t.nf
               - (sum(g.cf) OVER w)::HUGEINT * t.ns) AS gap_num
           FROM grain g, tots t
           WINDOW w AS (ORDER BY g.v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         mg AS (
           SELECT any_value(nf)::BIGINT AS n_full,
                  any_value(ns)::BIGINT AS n_sample,
                  max(gap_num) AS mg
           FROM gaps)
         SELECT n_full, n_sample,
                floor(CAST(mg AS DOUBLE) * 1e6
                  / CAST(n_full::HUGEINT * n_sample AS DOUBLE))
                  ::BIGINT AS sup_gap_ppm,
                floor(sqrt(ln(2.0 / 0.05)
                  / (2.0 * CAST(n_sample AS DOUBLE))) * 1e6)::BIGINT
                  AS dkw_eps_ppm,
                (CASE WHEN CAST(mg AS DOUBLE)
                    / CAST(n_full::HUGEINT * n_sample AS DOUBLE)
                    <= sqrt(ln(2.0 / 0.05)
                      / (2.0 * CAST(n_sample AS DOUBLE)))
                 THEN 1 ELSE 0 END)::BIGINT AS within_bound
         FROM mg""",

    "q540_scan_io_advisor" ->
      """WITH base AS (
           SELECT l_orderkey // 1024 AS rg,
                  floor(epoch(l_shipdate::TIMESTAMP) / 86400)::BIGINT
                    AS day,
                  (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS m
           FROM lineitem),
         span AS (
           SELECT min(day) + 365 AS lo, min(day) + 730 AS hi
           FROM base),
         zones AS (
           SELECT b.rg, count(*)::BIGINT AS nrows,
                  min(b.day) AS zlo, max(b.day) AS zhi,
                  sum(CASE WHEN b.day BETWEEN s.lo AND s.hi
                       AND b.m = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS matched,
                  any_value(s.lo) AS lo, any_value(s.hi) AS hi
           FROM base b, span s GROUP BY b.rg),
         agg AS (
           SELECT count(*)::BIGINT AS n_rowgroups,
                  sum(nrows)::BIGINT AS rows_total,
                  sum(CASE WHEN zhi >= lo AND zlo <= hi THEN 1
                      ELSE 0 END)::BIGINT AS rg_hit,
                  sum(CASE WHEN zhi >= lo AND zlo <= hi THEN nrows
                      ELSE 0 END)::BIGINT AS rows_scanned,
                  sum(matched)::BIGINT AS rows_matched
           FROM zones)
         SELECT n_rowgroups, rg_hit, rows_total, rows_scanned,
                rows_matched,
                (rows_total * 62)::BIGINT AS bytes_full,
                (rows_scanned * 17)::BIGINT AS bytes_pruned_zoned,
                ((rows_total * 62 - rows_scanned * 17) * 1000000
                  // (rows_total * 62))::BIGINT AS io_savings_ppm
         FROM agg"""
  )
}
