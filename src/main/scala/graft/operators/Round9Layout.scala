package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch M (q431-q433): physical-layout advisors — the tooling
  * a 100 TB lakehouse runs OVER its own storage to decide how to
  * rewrite it (the reference's OPTIMIZE/VACUUM surface told users WHEN
  * to rewrite; these tell them HOW):
  *
  *  - q431: Z-order clustering advisor — simulate laying the fact
  *    table out in Morton-interleaved (date, customer-bucket) order vs
  *    plain date order, compute per-file min/max zone maps for both
  *    layouts, and report how many files / rows two canonical probe
  *    predicates would have to scan under each (the decision input for
  *    an OPTIMIZE ZORDER BY),
  *  - q432: compaction bin packing — per partition, pack the current
  *    small files into target-size bins by descending-size cumulative
  *    fill and report the before/after file counts and bin skew,
  *  - q433: URL canonicalization — normalize scheme/host case, default
  *    ports, tracking params, fragments and trailing slashes, then
  *    report the duplicate-cluster profile (the web-corpus sibling of
  *    the q40 exact-dedup chain).
  *
  * All corpus-scale stages are single keyed aggregates (file id / URL
  * are derived columns); the advisor logic then runs on file-count /
  * cluster-count rows. Everything is exact integer arithmetic.
  */
object Round9Layout {

  type Q = (SparkSession, String) => DataFrame

  // 8-bit Morton interleave: d1 bits land at odd positions, d2 at even.
  private def morton(d1: Column, d2: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(d1, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(d2, i).bitwiseAND(1), 2 * i)
    }.reduce(_ + _)

  val queries: Seq[(String, Q)] = Seq(

    // Probe P1: d1 (decade-of-days since 1995-01-01) in [100, 120];
    // probe P2: d2 (customer bucket) in [30, 40]. Files = 64-cell
    // ranges of the layout's linear index; a file is scanned iff its
    // zone-map [min, max] of the probed dim overlaps the predicate.
    "q431_zorder_advisor" -> ((s, d) => {
      val dims = t(s, d, "orders").select(
        least(lit(255), greatest(lit(0),
          floor(datediff(col("o_orderdate"), lit("1995-01-01")) / 10)
            .cast("int"))).as("d1"),
        (col("o_custkey") % 256).cast("int").as("d2"))
      val laid = dims
        .withColumn("z", morton(col("d1"), col("d2")))
        .withColumn("lin", col("d1") * 256 + col("d2"))
      def layout(name: String, fileOf: Column): DataFrame =
        laid.groupBy(fileOf.as("file"))
          .agg(count(lit(1)).as("nrows"),
            min(col("d1")).as("lo1"), max(col("d1")).as("hi1"),
            min(col("d2")).as("lo2"), max(col("d2")).as("hi2"),
            sum(when(col("d1").between(100, 120), 1L).otherwise(0L))
              .as("m1"),
            sum(when(col("d2").between(30, 40), 1L).otherwise(0L))
              .as("m2"))
          .withColumn("layout", lit(name))
      val files = layout("zorder", expr("z DIV 64"))
        .unionByName(layout("datesort", expr("lin DIV 64")))
      files.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"), sum(col("nrows")).as("rows_total"),
          sum(when(col("hi1") >= 100 && col("lo1") <= 120, 1L)
            .otherwise(0L)).as("p1_files_hit"),
          sum(when(col("hi1") >= 100 && col("lo1") <= 120, col("nrows"))
            .otherwise(0L)).as("p1_rows_scanned"),
          sum(col("m1")).as("p1_rows_matched"),
          sum(when(col("hi2") >= 30 && col("lo2") <= 40, 1L)
            .otherwise(0L)).as("p2_files_hit"),
          sum(when(col("hi2") >= 30 && col("lo2") <= 40, col("nrows"))
            .otherwise(0L)).as("p2_rows_scanned"),
          sum(col("m2")).as("p2_rows_matched"))
        .orderBy(col("layout"))
    }),

    // Current "files" = hash buckets of o_orderkey within each month
    // partition; plan = descending-size cumulative fill into 500-row
    // bins (deterministic tie-break on file id). One corpus aggregate;
    // the packing windows run over <=37 file rows per partition.
    "q432_compaction_plan" -> ((s, d) => {
      val files = t(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part"),
          (col("o_orderkey") % 37).as("file_id"))
        .agg(count(lit(1)).as("nrows"))
      val wFill = Window.partitionBy(col("part"))
        .orderBy(col("nrows").desc, col("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binned = files
        .withColumn("cum", sum(col("nrows")).over(wFill))
        .withColumn("bin", expr("(cum - 1) DIV 500"))
      binned.groupBy(col("part"), col("bin"))
        .agg(count(lit(1)).as("files_in_bin"), sum(col("nrows")).as("binrows"))
        .groupBy(col("part"))
        .agg(sum(col("files_in_bin")).as("n_files"),
          sum(col("binrows")).as("rows_total"),
          count(lit(1)).as("n_bins"),
          max(col("binrows")).as("max_bin_rows"),
          min(col("binrows")).as("min_bin_rows"))
        .withColumn("compaction_ratio_ppm",
          expr("1000000 * n_bins DIV n_files"))
        .orderBy(col("part"))
    }),

    // Deterministic messy-URL synthesis (4 raw variants per canonical
    // target, junk varying by doc_id), then canonicalization:
    // lower-case scheme+host, strip :80/:443, drop utm_*/fbclid
    // params (and a then-empty '?'), drop fragments, collapse '//' in
    // the path, strip one trailing slash. Gate: cluster profile.
    "q433_url_canonicalize" -> ((s, d) => {
      // four raw variants per canonical target (host keyed on the QUAD
      // id so the variants genuinely collide after cleaning); each
      // variant exercises a different canonicalization rule
      val raw = t(s, d, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 4 === 0, lit("HTTP://WWW.site"))
            .when(col("doc_id") % 4 === 2, lit("http://WWW.site"))
            .otherwise(lit("http://www.site")),
          expr("doc_id DIV 4"), lit(".com"),
          when(col("doc_id") % 4 === 0, lit(":80")).otherwise(lit("")),
          lit("/news//item/"), expr("doc_id DIV 4"),
          when(col("doc_id") % 4 === 1, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 4 === 2,
            concat(lit("?utm_source=feed&utm_campaign=c"), col("doc_id")))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 3, concat(lit("#sec"), col("doc_id")))
            .otherwise(lit(""))).as("url"))
      // no regex backreferences anywhere: DuckDB's regexp_replace
      // renders '\2' as a literal control byte, so the port rule is
      // split into a before-slash and an end-of-host form instead
      val canon = raw.withColumn("c0",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(col("url"), "#.*$", ""),
                  "\\?(utm_[^&#]*|fbclid=[^&#]*)(&(utm_[^&#]*|fbclid=[^&#]*))*$",
                  ""),
                ":(80|443)/", "/"),
              ":(80|443)$", ""),
            "//+", "/"),
          "/$", ""))
        // lower-case scheme+host only (path case is significant), and
        // repair the '//' after the scheme that the collapse above ate
        .withColumn("curl", concat(
          lower(regexp_extract(col("c0"), "^([A-Za-z]+:/)", 1)),
          lit("/"),
          lower(regexp_extract(col("c0"), "^[A-Za-z]+:/([^/?#]+)", 1)),
          regexp_extract(col("c0"), "^[A-Za-z]+:/[^/?#]+(.*)$", 1)))
      val clusters = canon.groupBy(col("curl"))
        .agg(count(lit(1)).as("n_raw"),
          countDistinct(col("url")).as("n_distinct_raw"))
      clusters.groupBy(col("n_raw").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_distinct_raw")).as("raw_variants"))
        .orderBy(col("cluster_size"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q431_zorder_advisor" -> {
      val mortonSql = (0 until 8).map { i =>
        s"(((d1 >> $i) & 1) << ${2 * i + 1}) + (((d2 >> $i) & 1) << ${2 * i})"
      }.mkString(" + ")
      s"""WITH dims AS (
           SELECT least(255, greatest(0,
                    floor(datediff('day', DATE '1995-01-01',
                      o_orderdate::DATE) / 10)))::INT AS d1,
                  (o_custkey % 256)::INT AS d2
           FROM orders),
         laid AS (
           SELECT d1, d2, ($mortonSql)::BIGINT AS z,
                  (d1 * 256 + d2)::BIGINT AS lin
           FROM dims),
         files AS (
           SELECT 'zorder' AS layout, z // 64 AS file,
                  count(*)::BIGINT AS rows,
                  min(d1) AS lo1, max(d1) AS hi1,
                  min(d2) AS lo2, max(d2) AS hi2,
                  sum(CASE WHEN d1 BETWEEN 100 AND 120 THEN 1 ELSE 0
                      END)::BIGINT AS m1,
                  sum(CASE WHEN d2 BETWEEN 30 AND 40 THEN 1 ELSE 0
                      END)::BIGINT AS m2
           FROM laid GROUP BY 1, 2
           UNION ALL
           SELECT 'datesort', lin // 64, count(*)::BIGINT,
                  min(d1), max(d1), min(d2), max(d2),
                  sum(CASE WHEN d1 BETWEEN 100 AND 120 THEN 1 ELSE 0
                      END)::BIGINT,
                  sum(CASE WHEN d2 BETWEEN 30 AND 40 THEN 1 ELSE 0
                      END)::BIGINT
           FROM laid GROUP BY 1, 2)
         SELECT layout, count(*)::BIGINT AS n_files,
                sum(rows)::BIGINT AS rows_total,
                sum(CASE WHEN hi1 >= 100 AND lo1 <= 120 THEN 1 ELSE 0
                    END)::BIGINT AS p1_files_hit,
                sum(CASE WHEN hi1 >= 100 AND lo1 <= 120 THEN rows
                    ELSE 0 END)::BIGINT AS p1_rows_scanned,
                sum(m1)::BIGINT AS p1_rows_matched,
                sum(CASE WHEN hi2 >= 30 AND lo2 <= 40 THEN 1 ELSE 0
                    END)::BIGINT AS p2_files_hit,
                sum(CASE WHEN hi2 >= 30 AND lo2 <= 40 THEN rows
                    ELSE 0 END)::BIGINT AS p2_rows_scanned,
                sum(m2)::BIGINT AS p2_rows_matched
         FROM files GROUP BY layout ORDER BY layout""".stripMargin
    },

    "q432_compaction_plan" ->
      """WITH files AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS part,
                  (o_orderkey % 37)::BIGINT AS file_id,
                  count(*)::BIGINT AS rows
           FROM orders GROUP BY 1, 2),
         binned AS (
           SELECT part, file_id, rows,
                  ((sum(rows) OVER (PARTITION BY part
                    ORDER BY rows DESC, file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - 1) // 500)::BIGINT AS bin
           FROM files),
         bins AS (
           SELECT part, bin, count(*)::BIGINT AS files_in_bin,
                  sum(rows)::BIGINT AS rows
           FROM binned GROUP BY 1, 2)
         SELECT part, sum(files_in_bin)::BIGINT AS n_files,
                sum(rows)::BIGINT AS rows_total,
                count(*)::BIGINT AS n_bins,
                max(rows)::BIGINT AS max_bin_rows,
                min(rows)::BIGINT AS min_bin_rows,
                ((1000000 * count(*)) // sum(files_in_bin))::BIGINT
                  AS compaction_ratio_ppm
         FROM bins GROUP BY part ORDER BY part""",

    "q433_url_canonicalize" ->
      """WITH raw AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.site'
                        WHEN doc_id % 4 = 2 THEN 'http://WWW.site'
                        ELSE 'http://www.site' END)
                  || (doc_id // 4) || '.com'
                  || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
                  || '/news//item/' || (doc_id // 4)
                  || (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END)
                  || (CASE WHEN doc_id % 4 = 2
                        THEN '?utm_source=feed&utm_campaign=c' || doc_id
                        ELSE '' END)
                  || (CASE WHEN doc_id % 4 = 3 THEN '#sec' || doc_id
                        ELSE '' END) AS url
           FROM documents),
         canon0 AS (
           SELECT doc_id, url,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(url, '#.*$', '', 'g'),
                            '\?(utm_[^&#]*|fbclid=[^&#]*)(&(utm_[^&#]*|fbclid=[^&#]*))*$',
                            '', 'g'),
                          ':(80|443)/', '/', 'g'),
                        ':(80|443)$', '', 'g'),
                      '//+', '/', 'g'),
                    '/$', '', 'g') AS c0
           FROM raw),
         canon AS (
           SELECT doc_id, url,
                  lower(regexp_extract(c0, '^([A-Za-z]+:/)', 1))
                  || '/'
                  || lower(regexp_extract(c0, '^[A-Za-z]+:/([^/?#]+)', 1))
                  || regexp_extract(c0, '^[A-Za-z]+:/[^/?#]+(.*)$', 1)
                    AS curl
           FROM canon0),
         clusters AS (
           SELECT curl, count(*)::BIGINT AS n_raw,
                  count(DISTINCT url)::BIGINT AS n_distinct_raw
           FROM canon GROUP BY curl)
         SELECT n_raw AS cluster_size, count(*)::BIGINT AS n_clusters,
                sum(n_distinct_raw)::BIGINT AS raw_variants
         FROM clusters GROUP BY 1 ORDER BY 1"""
  )
}
