package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch T (q454-q456):
  *
  *  - q454: learning curve — fit the closed-form OLS on nested
  *    training subsets (the first k of 10 hash-deciles, k = 1..10)
  *    and report held-out SSE per k: "how much data buys how much
  *    model" is THE planning question for a 100 TB training corpus.
  *    Nested subsets come from cumulative per-decile moments, so one
  *    aggregate serves all ten fits.
  *  - q455: position-bias click model (COEC — clicks over expected
  *    clicks): position-level CTR baseline from one pass; per item,
  *    actual clicks vs the sum of its impressions' positional
  *    baselines (ppm). The de-biased engagement metric behind search
  *    ranking evals (complements q377's recall/MRR/NDCG).
  *  - q456: Mahalanobis outliers in 2-D — closed-form inverse of the
  *    2x2 covariance from exact moments; flag rows whose squared
  *    Mahalanobis distance exceeds the chi-square 99% cut (9.21).
  *    The multivariate sibling of q348's univariate median/MAD gate.
  *
  * All moments are exact integers; doubles only in fixed closed-form
  * trees. One corpus aggregate per query plus a broadcast re-scan for
  * the q456 distance flagging.
  */
object Round9Curves {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // y = o_totalprice cents vs x = customer account balance cents:
    // decile d = o_orderkey % 10; train on deciles < k, validate on a
    // fixed held-out split (o_orderkey % 10 == 9 excluded from every
    // train set; k runs 1..9).
    "q454_learning_curve" -> ((s, d) => {
      val j = t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select((col("o_orderkey") % 10).as("dec"),
          floor(col("c_acctbal") * 100).cast("long").as("x"),
          floor(col("o_totalprice") * 100).cast("long").as("y"))
      // second moments in DECIMAL(38,0): sum(y*y) over cent-scaled
      // totalprice exceeds 2^63 at sf0.1 (~5e19) — long would overflow
      val perDec = j.groupBy(col("dec")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
      val ks = s.range(1, 10).toDF("k")
      // cumulative train moments over deciles < k (10x10 tiny join)
      val train = ks.join(perDec, col("dec") < col("k"))
        .groupBy(col("k")).agg(sum(col("n")).as("n_t"),
          sum(col("sx")).as("sx_t"), sum(col("sy")).as("sy_t"),
          sum(col("sxx")).as("sxx_t"), sum(col("sxy")).as("sxy_t"))
      val va = perDec.filter(col("dec") === 9)
        .select(col("n").as("n_v"), col("sx").as("sx_v"),
          col("sy").as("sy_v"), col("sxx").as("sxx_v"),
          col("sxy").as("sxy_v"), col("syy").as("syy_v"))
      train.crossJoin(broadcast(va))
        .withColumn("slope", expr(
          """(sxy_t - CAST(sx_t AS DOUBLE) * sy_t / n_t)
             / (sxx_t - CAST(sx_t AS DOUBLE) * sx_t / n_t)"""))
        .withColumn("icept", expr(
          "CAST(sy_t AS DOUBLE) / n_t - slope * (CAST(sx_t AS DOUBLE) / n_t)"))
        .withColumn("sse_val", expr(
          """syy_v - 2 * icept * sy_v - 2 * slope * sxy_v
             + n_v * icept * icept + 2 * icept * slope * sx_v
             + slope * slope * sxx_v"""))
        .select(col("k"), col("n_t").as("n_train"), col("slope"),
          col("sse_val"))
        .orderBy(col("k"))
    }),

    // Impressions = view events (position = event_id % 10, item =
    // user_id % 40); clicks = click events under the same derivation.
    // Baseline CTR per position in ppm; per item: clicks, expected
    // clicks (sum of positional baselines, micro), COEC ppm.
    "q455_click_coec" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        (col("event_id") % 10).as("pos"),
        (col("user_id") % 40).as("item"))
      val views = ev.filter(col("event_type") === "view")
      val clicks = ev.filter(col("event_type") === "click")
      val posBase = views.groupBy(col("pos"))
        .agg(count(lit(1)).as("imp"))
        .join(clicks.groupBy(col("pos")).agg(count(lit(1)).as("clk")),
          Seq("pos"), "left")
        .select(col("pos"), col("imp"),
          expr("1000000 * coalesce(clk, 0) DIV imp").as("ctr_ppm"))
      val itemExp = views.join(broadcast(posBase), "pos")
        .groupBy(col("item"))
        .agg(count(lit(1)).as("impressions"),
          sum(col("ctr_ppm")).as("expected_clicks_micro"))
      val itemClk = clicks.groupBy(col("item"))
        .agg(count(lit(1)).as("actual_clicks"))
      itemExp.join(itemClk, Seq("item"), "left")
        .select(col("item"), col("impressions"),
          coalesce(col("actual_clicks"), lit(0L)).as("actual_clicks"),
          col("expected_clicks_micro"),
          expr("""1000000000000 * coalesce(actual_clicks, 0)
              DIV greatest(expected_clicks_micro, 1)""").as("coec_ppm"))
        .orderBy(col("item"))
    }),

    // 2-D outliers over (quantity, discount-adjusted price): d2(x) =
    // (x-mu)' S^-1 (x-mu) with the 2x2 inverse in closed form from
    // exact sums; cut at chi2(2, 0.99) = 9.21. One aggregate pass,
    // one broadcast re-scan.
    "q456_mahalanobis_outliers" -> ((s, d) => {
      // planted corruption (one row in 997 gets 10x the price) gives
      // the detector a real positive class: uniform fixtures have
      // compact support, so natural d2 never crosses the chi2 cut
      val li = t(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("x"),
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("long") *
          when(col("l_orderkey") % 997 === 0, 10L).otherwise(1L))
          .as("y"),
        (col("l_orderkey") % 997 === 0).cast("long").as("planted"))
      val m = li.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      li.crossJoin(broadcast(m))
        .withColumn("mx", expr("CAST(sx AS DOUBLE) / n"))
        .withColumn("my", expr("CAST(sy AS DOUBLE) / n"))
        .withColumn("vxx", expr("CAST(sxx AS DOUBLE) / n - mx * mx"))
        .withColumn("vyy", expr("CAST(syy AS DOUBLE) / n - my * my"))
        .withColumn("vxy", expr("CAST(sxy AS DOUBLE) / n - mx * my"))
        .withColumn("det", expr("vxx * vyy - vxy * vxy"))
        .withColumn("d2", expr(
          """((x - mx) * ((x - mx) * vyy - (y - my) * vxy)
             + (y - my) * ((y - my) * vxx - (x - mx) * vxy)) / det"""))
        .agg(max(col("n")).as("n_rows"),
          sum(col("planted")).as("n_planted"),
          sum(when(col("d2") > 9.21, 1L).otherwise(0L)).as("n_outliers"),
          sum(when(col("d2") > 9.21, col("planted")).otherwise(0L))
            .as("n_planted_caught"),
          expr("floor(max(d2) * 1000)").cast("long").as("max_d2_milli"),
          expr("""1000000 * sum(IF(d2 > 9.21, 1, 0))
              DIV count(*)""").as("outlier_ppm"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q454_learning_curve" ->
      """WITH j AS (
           SELECT (o_orderkey % 10)::BIGINT AS dec,
                  floor(c_acctbal * 100)::BIGINT AS x,
                  floor(o_totalprice * 100)::BIGINT AS y
           FROM orders JOIN customer ON o_custkey = c_custkey),
         per_dec AS (
           -- second moments stay HUGEINT: sum(y*y) over cent-scaled
           -- totalprice exceeds 2^63 at sf0.1
           SELECT dec, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                  sum(y)::BIGINT AS sy, sum(x * x) AS sxx,
                  sum(x * y) AS sxy, sum(y * y) AS syy
           FROM j GROUP BY dec),
         ks AS (SELECT g.k FROM generate_series(1, 9) AS g(k)),
         train AS (
           SELECT k, sum(n)::BIGINT AS n_t, sum(sx)::BIGINT AS sx_t,
                  sum(sy)::BIGINT AS sy_t, sum(sxx) AS sxx_t,
                  sum(sxy) AS sxy_t
           FROM ks JOIN per_dec ON dec < k GROUP BY k),
         va AS (
           SELECT n AS n_v, sx AS sx_v, sy AS sy_v, sxx AS sxx_v,
                  sxy AS sxy_v, syy AS syy_v
           FROM per_dec WHERE dec = 9),
         fit AS (
           SELECT k, n_t,
                  (sxy_t - CAST(sx_t AS DOUBLE) * sy_t / n_t)
                    / (sxx_t - CAST(sx_t AS DOUBLE) * sx_t / n_t)
                    AS slope
           FROM train),
         fit2 AS (
           SELECT f.k, f.n_t, f.slope,
                  CAST(t.sy_t AS DOUBLE) / t.n_t
                    - f.slope * (CAST(t.sx_t AS DOUBLE) / t.n_t)
                    AS icept
           FROM fit f JOIN train t ON f.k = t.k)
         SELECT f.k, f.n_t AS n_train, f.slope,
                syy_v - 2 * f.icept * sy_v - 2 * f.slope * sxy_v
                  + n_v * f.icept * f.icept
                  + 2 * f.icept * f.slope * sx_v
                  + f.slope * f.slope * sxx_v AS sse_val
         FROM fit2 f CROSS JOIN va ORDER BY f.k""",

    "q455_click_coec" ->
      """WITH ev AS (
           SELECT event_type, (event_id % 10)::BIGINT AS pos,
                  (user_id % 40)::BIGINT AS item
           FROM events),
         pos_base AS (
           SELECT v.pos, v.imp,
                  ((1000000 * coalesce(c.clk, 0)) // v.imp)::BIGINT
                    AS ctr_ppm
           FROM (SELECT pos, count(*)::BIGINT AS imp FROM ev
                 WHERE event_type = 'view' GROUP BY pos) v
           LEFT JOIN (SELECT pos, count(*)::BIGINT AS clk FROM ev
                      WHERE event_type = 'click' GROUP BY pos) c
             ON v.pos = c.pos),
         item_exp AS (
           SELECT e.item, count(*)::BIGINT AS impressions,
                  sum(b.ctr_ppm)::BIGINT AS expected_clicks_micro
           FROM ev e JOIN pos_base b ON e.pos = b.pos
           WHERE e.event_type = 'view' GROUP BY e.item),
         item_clk AS (
           SELECT item, count(*)::BIGINT AS actual_clicks
           FROM ev WHERE event_type = 'click' GROUP BY item)
         SELECT x.item, x.impressions,
                coalesce(c.actual_clicks, 0)::BIGINT AS actual_clicks,
                x.expected_clicks_micro,
                ((1000000000000 * coalesce(c.actual_clicks, 0))
                  // greatest(x.expected_clicks_micro, 1))::BIGINT
                  AS coec_ppm
         FROM item_exp x LEFT JOIN item_clk c ON x.item = c.item
         ORDER BY x.item""",

    "q456_mahalanobis_outliers" ->
      """WITH li AS (
           SELECT CAST(l_quantity AS BIGINT) AS x,
                  (floor(l_extendedprice * (1.0 - l_discount))::BIGINT
                   * (CASE WHEN l_orderkey % 997 = 0 THEN 10 ELSE 1
                      END))::BIGINT AS y,
                  (CASE WHEN l_orderkey % 997 = 0 THEN 1 ELSE 0
                   END)::BIGINT AS planted
           FROM lineitem),
         m AS (
           SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                  sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
                  sum(x * y)::BIGINT AS sxy, sum(y * y)::BIGINT AS syy
           FROM li),
         dist AS (
           SELECT li.x, li.y, li.planted, m.n,
                  ((li.x - CAST(m.sx AS DOUBLE) / m.n)
                    * ((li.x - CAST(m.sx AS DOUBLE) / m.n)
                       * (CAST(m.syy AS DOUBLE) / m.n
                          - (CAST(m.sy AS DOUBLE) / m.n)
                            * (CAST(m.sy AS DOUBLE) / m.n))
                       - (li.y - CAST(m.sy AS DOUBLE) / m.n)
                         * (CAST(m.sxy AS DOUBLE) / m.n
                            - (CAST(m.sx AS DOUBLE) / m.n)
                              * (CAST(m.sy AS DOUBLE) / m.n)))
                   + (li.y - CAST(m.sy AS DOUBLE) / m.n)
                     * ((li.y - CAST(m.sy AS DOUBLE) / m.n)
                        * (CAST(m.sxx AS DOUBLE) / m.n
                           - (CAST(m.sx AS DOUBLE) / m.n)
                             * (CAST(m.sx AS DOUBLE) / m.n))
                        - (li.x - CAST(m.sx AS DOUBLE) / m.n)
                          * (CAST(m.sxy AS DOUBLE) / m.n
                             - (CAST(m.sx AS DOUBLE) / m.n)
                               * (CAST(m.sy AS DOUBLE) / m.n))))
                  / ((CAST(m.sxx AS DOUBLE) / m.n
                      - (CAST(m.sx AS DOUBLE) / m.n)
                        * (CAST(m.sx AS DOUBLE) / m.n))
                     * (CAST(m.syy AS DOUBLE) / m.n
                        - (CAST(m.sy AS DOUBLE) / m.n)
                          * (CAST(m.sy AS DOUBLE) / m.n))
                     - (CAST(m.sxy AS DOUBLE) / m.n
                        - (CAST(m.sx AS DOUBLE) / m.n)
                          * (CAST(m.sy AS DOUBLE) / m.n))
                       * (CAST(m.sxy AS DOUBLE) / m.n
                          - (CAST(m.sx AS DOUBLE) / m.n)
                            * (CAST(m.sy AS DOUBLE) / m.n))) AS d2
           FROM li CROSS JOIN m)
         SELECT max(n)::BIGINT AS n_rows,
                sum(planted)::BIGINT AS n_planted,
                sum(CASE WHEN d2 > 9.21 THEN 1 ELSE 0 END)::BIGINT
                  AS n_outliers,
                sum(CASE WHEN d2 > 9.21 THEN planted ELSE 0 END)::BIGINT
                  AS n_planted_caught,
                floor(max(d2) * 1000)::BIGINT AS max_d2_milli,
                ((1000000 * sum(CASE WHEN d2 > 9.21 THEN 1 ELSE 0 END))
                  // count(*))::BIGINT AS outlier_ppm
         FROM dist"""
  )
}
