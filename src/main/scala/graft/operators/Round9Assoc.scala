package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch I (q406-q408): categorical association (Cramér's V),
  * the two-sample Kolmogorov-Smirnov statistic, and the
  * autocorrelation function — the association/distribution-comparison
  * trio next to q385's numeric Pearson grid. Hash-gated vs DuckDB.
  */
object Round9Assoc {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Cramér's V for categorical-categorical association — the
    // profiling complement to q385's numeric correlation matrix:
    // chi-square over the contingency grid (expected = row x col / n)
    // then V = sqrt(chi2 / (n (min(r,c) - 1))). Three dimension pairs
    // over events; each grid is dimension-sized, built from one
    // grouped aggregate per pair.
    "q406_cramers_v" -> ((s, d) => {
      val base = graft.Stage(t(s, d, "events").select(
        col("event_type"),
        pmod(unix_date(col("ts").cast("date")), lit(7)).as("dow"),
        least(floor(col("value") / 80), lit(4L)).cast("long")
          .as("vbucket")), "q406_base")
      def v(name: String, a: String, b: String): DataFrame = {
        val cells = base.groupBy(col(a).as("ka"), col(b).as("kb"))
          .agg(count(lit(1)).as("o"))
        val rows = cells.groupBy(col("ka").as("ra"))
          .agg(sum(col("o")).as("rt"))
        val cols_ = cells.groupBy(col("kb").as("cb"))
          .agg(sum(col("o")).as("ct"))
        val n = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("ka")).as("r"),
          countDistinct(col("kb")).as("c"))
        // Full grid incl. zero cells: expected counts exist for every
        // (row, col) combination even when observed = 0.
        rows.crossJoin(cols_)
          .join(cells, col("ra") === col("ka") && col("cb") === col("kb"),
            "left")
          .select(col("ra"), col("cb"), col("rt"), col("ct"),
            coalesce(col("o"), lit(0L)).as("o"))
          .crossJoin(broadcast(n))
          .select((((col("o") - col("rt") * col("ct")
            / col("n").cast("double"))
            * (col("o") - col("rt") * col("ct") / col("n").cast("double")))
            / (col("rt") * col("ct") / col("n").cast("double")))
            .as("term"),
            col("n"), col("r"), col("c"))
          .groupBy(col("n"), col("r"), col("c"))
          .agg(sum(col("term")).as("chi2"))
          .select(lit(name).as("dims"), col("n"),
            round(col("chi2"), 4).as("chi2"),
            round(sqrt(col("chi2")
              / (col("n") * (least(col("r"), col("c")) - 1))), 6)
              .as("cramers_v"))
      }
      v("event_type_x_dow", "event_type", "dow")
        .unionByName(v("event_type_x_vbucket", "event_type", "vbucket"))
        .unionByName(v("dow_x_vbucket", "dow", "vbucket"))
        .orderBy(col("dims"))
    }),

    // Two-sample Kolmogorov-Smirnov statistic — each source's document-
    // length distribution against the rest of the corpus: D = max
    // |CDF_src - CDF_rest| over the (bounded) distinct-length grid.
    // The exact distributional-shift test next to q210's binned TVD
    // and q383's PSI; the grid is sources x distinct lengths, both
    // dimension-bounded.
    "q407_ks_test" -> ((s, d) => {
      val docs = graft.Stage(t(s, d, "documents")
        .select(col("source"), col("n_chars")), "q407_docs")
      val values = docs.select(col("n_chars")).distinct()
      val srcTot = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val corpusN = docs.agg(count(lit(1)).as("nc"))
      val srcCells = docs.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cs"))
      val allCells = docs.groupBy(col("n_chars"))
        .agg(count(lit(1)).as("ca"))
      val grid = srcTot.crossJoin(values)
        .join(srcCells, Seq("source", "n_chars"), "left")
        .na.fill(0L, Seq("cs"))
        .join(allCells, "n_chars")
        .crossJoin(broadcast(corpusN))
      val wCum = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("cum_s", sum(col("cs")).over(wCum))
        .withColumn("cum_r", sum(col("ca") - col("cs")).over(wCum))
        .select(col("source"), col("ns"),
          abs(col("cum_s").cast("double") / col("ns")
            - col("cum_r").cast("double") / (col("nc") - col("ns")))
            .as("gap"))
        .groupBy(col("source"))
        .agg(first(col("ns")).as("n_docs"),
          round(max(col("gap")), 6).as("ks_d"))
        .orderBy(col("source"))
    }),

    // Autocorrelation function at lags 1, 2, 7 — the seasonality/
    // persistence fingerprint of each daily series (lag-7 spikes =
    // weekly cycle, confirming q382's decomposition independently):
    // r_l = sum (x_t - mean)(x_{t+l} - mean) / sum (x_t - mean)^2 over
    // the day-grain series, lag pairs from a bounded self-join on
    // day + l.
    "q408_autocorrelation" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("sum(vm) DIV count(*)").as("m"))
        .withColumn("di", unix_date(col("day").cast("date"))
          .cast("long")), "q408_daily")
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          (sum(col("m")) / count(lit(1))).as("mu"),
          (sum(col("m") * col("m")) / count(lit(1))).as("m2"))
        .select(col("event_type"), col("n_days"), col("mu"),
          ((col("m2") - col("mu") * col("mu"))).as("varm"))
      def acf(l: Int) = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.di") === col("a.di") + l)
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(col("a.m") * col("b.m")).as(s"sxy_$l"),
          sum(col("a.m")).as(s"sx_$l"), sum(col("b.m")).as(s"sy_$l"),
          count(lit(1)).as(s"np_$l"))
      stats.join(acf(1), "event_type").join(acf(2), "event_type")
        .join(acf(7), "event_type")
        .select(col("event_type"), col("n_days"),
          round((col("sxy_1") - col("mu") * col("sx_1")
            - col("mu") * col("sy_1") + col("np_1") * col("mu") * col("mu"))
            / (col("n_days") * col("varm")), 4).as("acf1"),
          round((col("sxy_2") - col("mu") * col("sx_2")
            - col("mu") * col("sy_2") + col("np_2") * col("mu") * col("mu"))
            / (col("n_days") * col("varm")), 4).as("acf2"),
          round((col("sxy_7") - col("mu") * col("sx_7")
            - col("mu") * col("sy_7") + col("np_7") * col("mu") * col("mu"))
            / (col("n_days") * col("varm")), 4).as("acf7"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q406_cramers_v" -> {
      def arm(name: String, a: String, b: String) =
        s"""SELECT '$name' AS dims, n::BIGINT AS n,
              round(chi2, 4) AS chi2,
              round(sqrt(chi2 / (n * (least(r, c) - 1))), 6)
                AS cramers_v
            FROM (
              SELECT sum((o - rt * ct / n::DOUBLE)
                       * (o - rt * ct / n::DOUBLE)
                       / (rt * ct / n::DOUBLE)) AS chi2,
                     any_value(n) AS n, any_value(r) AS r,
                     any_value(c) AS c
              FROM (
                SELECT rt.ka, ct.kb, rt.rt, ct.ct,
                       coalesce(cells.o, 0) AS o, nn.n, nn.r, nn.c
                FROM (SELECT $a AS ka, sum(1)::BIGINT AS rt FROM base
                      GROUP BY 1) rt
                CROSS JOIN (SELECT $b AS kb, sum(1)::BIGINT AS ct
                            FROM base GROUP BY 1) ct
                LEFT JOIN (SELECT $a AS ka, $b AS kb,
                             count(*)::BIGINT AS o
                           FROM base GROUP BY 1, 2) cells
                  ON cells.ka = rt.ka AND cells.kb = ct.kb
                CROSS JOIN (SELECT count(*)::BIGINT AS n,
                              count(DISTINCT $a)::BIGINT AS r,
                              count(DISTINCT $b)::BIGINT AS c
                            FROM base) nn))"""
      s"""WITH base AS (
           SELECT event_type,
                  ((date_diff('day', DATE '1970-01-01',
                     ts::TIMESTAMP::DATE) % 7) + 7) % 7 AS dow,
                  least(floor(value / 80), 4)::BIGINT AS vbucket
           FROM events)
         SELECT * FROM (
           ${arm("event_type_x_dow", "event_type", "dow")}
           UNION ALL
           ${arm("event_type_x_vbucket", "event_type", "vbucket")}
           UNION ALL
           ${arm("dow_x_vbucket", "dow", "vbucket")})
         ORDER BY dims"""
    },
    "q407_ks_test" ->
      """WITH docs AS (SELECT source, n_chars FROM documents),
         vals AS (SELECT DISTINCT n_chars FROM docs),
         st AS (SELECT source, count(*)::BIGINT AS ns FROM docs
                GROUP BY source),
         nc AS (SELECT count(*)::BIGINT AS nc FROM docs),
         sc AS (SELECT source, n_chars, count(*)::BIGINT AS cs
                FROM docs GROUP BY 1, 2),
         ac AS (SELECT n_chars, count(*)::BIGINT AS ca FROM docs
                GROUP BY 1),
         grid AS (
           SELECT st.source, st.ns, v.n_chars,
                  coalesce(sc.cs, 0) AS cs, ac.ca, nc.nc
           FROM st CROSS JOIN vals v
           LEFT JOIN sc ON sc.source = st.source
             AND sc.n_chars = v.n_chars
           JOIN ac ON ac.n_chars = v.n_chars
           CROSS JOIN nc),
         cum AS (
           SELECT source, ns, nc,
                  sum(cs) OVER (PARTITION BY source ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_s,
                  sum(ca - cs) OVER (PARTITION BY source
                    ORDER BY n_chars
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_r
           FROM grid)
         SELECT source, any_value(ns) AS n_docs,
                round(max(abs(cum_s::DOUBLE / ns
                  - cum_r::DOUBLE / (nc - ns))), 6) AS ks_d
         FROM cum GROUP BY source ORDER BY source""",
    "q408_autocorrelation" -> {
      def arm(l: Int) =
        s"""(SELECT a.event_type, sum(a.m * b.m) AS sxy_$l,
               sum(a.m) AS sx_$l, sum(b.m) AS sy_$l,
               count(*)::BIGINT AS np_$l
             FROM daily a JOIN daily b
               ON a.event_type = b.event_type AND b.di = a.di + $l
             GROUP BY 1) l$l"""
      s"""WITH daily AS (
           SELECT event_type,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  sum(floor(value * 1000)::BIGINT) // count(*) AS m,
                  date_diff('day', DATE '1970-01-01',
                    date_trunc('day', ts::TIMESTAMP)::DATE)::BIGINT
                    AS di
           FROM events GROUP BY 1, 2, 4),
         stats AS (
           SELECT event_type, count(*)::BIGINT AS n_days,
                  sum(m)::DOUBLE / count(*) AS mu,
                  sum(m::DOUBLE * m) / count(*)
                    - (sum(m)::DOUBLE / count(*))
                      * (sum(m)::DOUBLE / count(*)) AS varm
           FROM daily GROUP BY 1)
         SELECT s.event_type, s.n_days,
                round((sxy_1 - mu * sx_1 - mu * sy_1
                  + np_1 * mu * mu) / (s.n_days * varm), 4) AS acf1,
                round((sxy_2 - mu * sx_2 - mu * sy_2
                  + np_2 * mu * mu) / (s.n_days * varm), 4) AS acf2,
                round((sxy_7 - mu * sx_7 - mu * sy_7
                  + np_7 * mu * mu) / (s.n_days * varm), 4) AS acf7
         FROM stats s
         JOIN ${arm(1)} ON l1.event_type = s.event_type
         JOIN ${arm(2)} ON l2.event_type = s.event_type
         JOIN ${arm(7)} ON l7.event_type = s.event_type
         ORDER BY s.event_type"""
    }
  )
}
