package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch H (q400-q402): the ops-observability capstone (a
  * one-table health report composing the contract / drift / trend /
  * freshness / volume gates), RAKE keyphrase extraction, and HITS
  * hubs/authorities in exact integer fixed-point. Hash-gated vs
  * DuckDB.
  */
object Round9Sys {

  type Q = (SparkSession, String) => DataFrame

  private val HitsIters = 3
  private val HitsScale = 1000000000000L // 1e12 integer fixed-point

  val queries: Seq[(String, Q)] = Seq(

    // Ops-observability CAPSTONE — the q200 pattern applied to the
    // round's monitoring operators: one health-report table whose rows
    // are independent gates (contract violations, PSI drift ceiling,
    // Mann-Kendall trending series, freshness, week-over-week volume),
    // each a cheap aggregate arm over ONE events/lineitem scan apiece,
    // unioned into (check, value, status). The report a scheduler
    // would publish after every ingest.
    "q400_health_report" -> ((s, d) => {
      val ev = t(s, d, "events")
      // Arm 1: failing data contracts (q380's set; exactly one is
      // designed to fail, so status is 'ok' at value 1).
      val li = t(s, d, "lineitem")
      val contracts = li.agg(
        (sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
          + sum(when(!col("l_discount").between(0.0, 0.1), 1L)
            .otherwise(0L))
          + sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
            .otherwise(0L))
          + sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
          + sum(when(col("l_quantity") > 45, 1L).otherwise(0L)))
          .as("v"))
        .select(lit("contract_violation_rows").as("check_name"),
          col("v").cast("long").as("value"),
          when(col("v") > 0, "expected_fail_only").otherwise("clean")
            .as("status"))
      // Arm 2: max PSI across series in milli (q383's bins).
      val binned = ev.select(col("event_type"),
        (col("ts") >= "2024-01-16").as("late"),
        least(floor(col("value") / 40), lit(9L)).cast("long").as("bin"))
      val cells = binned.groupBy(col("event_type"), col("bin"))
        .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("late"), 1L).otherwise(0L)).as("c2"))
      val tots = cells.groupBy(col("event_type"))
        .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val psi = cells.join(tots, "event_type")
        .groupBy(col("event_type"))
        .agg(sum((((col("c2") + 0.5) / (col("n2") + 5.0))
          - ((col("c1") + 0.5) / (col("n1") + 5.0)))
          * log(((col("c2") + 0.5) / (col("n2") + 5.0))
            / ((col("c1") + 0.5) / (col("n1") + 5.0)))).as("psi"))
        .agg(max(col("psi")).as("mx"))
        .select(lit("max_psi_milli").as("check_name"),
          floor(col("mx") * 1000).cast("long").as("value"),
          when(col("mx") > 0.2, "alert").otherwise("ok").as("status"))
      // Arm 3: freshness — days between the observation horizon and
      // the last event (0 on a healthy fixture).
      val fresh = ev.agg(max(col("ts").cast("date")).as("last_day"))
        .select(lit("freshness_lag_days").as("check_name"),
          datediff(lit("2024-01-30").cast("date"), col("last_day"))
            .cast("long").as("value"))
        .select(col("check_name"), col("value"),
          when(col("value") > 1, "alert").otherwise("ok").as("status"))
      // Arm 4: week-over-week volume change of the last full day, ppm.
      val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val wow = daily.as("a").join(daily.as("b"),
          col("b.day") === expr("a.day - interval 7 days"))
        .orderBy(col("a.day").desc).limit(1)
        .select(lit("volume_wow_ppm").as("check_name"),
          expr("(a.c - b.c) * 1000000 DIV b.c").as("value"))
        .select(col("check_name"), col("value"),
          when(abs(col("value")) > 500000, "alert").otherwise("ok")
            .as("status"))
      contracts.unionByName(psi).unionByName(fresh).unionByName(wow)
        .orderBy(col("check_name"))
    }),

    // RAKE keyphrase extraction (Rose et al. 2010) — stopword-
    // delimited candidate phrases scored by word degree/frequency:
    // per doc, consecutive non-stopword runs become phrases (island
    // ids from a running stopword count over the doc's own bounded
    // positions); globally, deg(w) = sum of hosting-phrase lengths,
    // freq(w) = occurrences, word score = deg*1000 DIV freq (integer),
    // phrase score = sum of its word scores. Top-15 phrases by total
    // corpus score. One token explode, word-keyed joins — no
    // quadratic stage.
    "q401_rake_keyphrases" -> ((s, d) => {
      val stop = Seq("the", "a", "an", "of", "and", "to", "in", "is",
        "on", "for", "with", "as", "by", "at", "or", "it", "are",
        "was", "that", "this")
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "[^a-z0-9]+")))
        .filter(length(col("col")) > 0)
        .select(col("doc_id"), col("pos"), col("col").as("w"),
          col("col").isin(stop: _*).as("is_stop"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val islands = toks
        .withColumn("isl", sum(when(col("is_stop"), 1L).otherwise(0L))
          .over(wDoc))
        .filter(!col("is_stop"))
      val phrases = graft.Stage(islands
        .groupBy(col("doc_id"), col("isl"))
        .agg(concat_ws(" ",
            sort_array(collect_list(struct(col("pos"), col("w"))))
              .getField("w")).as("phrase"),
          count(lit(1)).as("plen")), "q401_phrases")
      val words = graft.Stage(islands.select(col("doc_id"), col("isl"),
        col("w")), "q401_words")
      val wstats = words
        .join(phrases.select(col("doc_id"), col("isl"), col("plen")),
          Seq("doc_id", "isl"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("w"), expr("deg * 1000 DIV freq").as("wscore"))
      val pscore = words.join(wstats, "w")
        .groupBy(col("doc_id"), col("isl"))
        .agg(sum(col("wscore")).as("pscore"))
      phrases.join(pscore, Seq("doc_id", "isl"))
        .filter(col("plen").between(2, 4))
        .groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occur"), max(col("pscore")).as("score"))
        .orderBy(col("score").desc, col("phrase")).limit(15)
    }),

    // HITS hubs & authorities (Kleinberg 1999) — the second classic
    // link-analysis fixed point next to q291's PageRank, on the same
    // event-transition graph, in the same exact integer arithmetic:
    // auth = normalized inflow of hub mass, hub = normalized outflow
    // of auth mass, 3 unrolled iterations, L1-normalized by integer
    // DIV so both engines replay bit-identically.
    "q402_hits" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val edges = graft.Stage(t(s, d, "events")
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("cnt")), "q402_edges")
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
      var hub = nodes.select(col("node"), lit(HitsScale).as("h"))
        .localCheckpoint(true)
      var auth: DataFrame = null
      for (_ <- 1 to HitsIters) {
        val rawA = nodes.join(
            hub.join(edges, hub("node") === edges("src"))
              .groupBy(col("dst"))
              .agg(sum(col("h") * col("cnt")).as("ra")),
            nodes("node") === col("dst"), "left")
          .select(col("node"), coalesce(col("ra"), lit(0L)).as("ra"))
        val aTot = rawA.agg(sum(col("ra")).as("ta"))
        auth = rawA.crossJoin(broadcast(aTot))
          .select(col("node"),
            expr(s"ra DIV (ta DIV ${HitsScale}L)").as("a"))
          .localCheckpoint(true)
        val rawH = nodes.join(
            auth.join(edges, auth("node") === edges("dst"))
              .groupBy(col("src"))
              .agg(sum(col("a") * col("cnt")).as("rh")),
            nodes("node") === col("src"), "left")
          .select(col("node"), coalesce(col("rh"), lit(0L)).as("rh"))
        val hTot = rawH.agg(sum(col("rh")).as("th"))
        hub = rawH.crossJoin(broadcast(hTot))
          .select(col("node"),
            expr(s"rh DIV (th DIV ${HitsScale}L)").as("h"))
          .localCheckpoint(true)
      }
      hub.join(auth, "node")
        .select(col("node"), col("h").as("hub_scaled"),
          col("a").as("auth_scaled"),
          round(col("h") / lit(HitsScale.toDouble), 6).as("hub"),
          round(col("a") / lit(HitsScale.toDouble), 6).as("auth"))
        .orderBy(col("node"))
    }),

    // SQL:2003 linear-regression aggregate family (REGR_*) + COVAR/
    // CORR — the standard surface an analyst reaches for before any ML
    // library (q372's closed-form OLS via the engine's own builtins).
    // All six REGR_ members plus covariance, rounded identically on
    // both engines; per-returnflag grouping keeps it one partial-merge
    // aggregate.
    "q404_regr_aggregates" -> ((s, d) =>
      graft.HeavyEngine(s, d).sql(
        """SELECT l_returnflag,
                  regr_count(l_extendedprice, l_quantity) AS rn,
                  round(regr_slope(l_extendedprice, l_quantity), 4)
                    AS slope,
                  round(regr_intercept(l_extendedprice, l_quantity), 4)
                    AS icept,
                  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                  round(regr_avgx(l_extendedprice, l_quantity), 4)
                    AS avgx,
                  round(regr_avgy(l_extendedprice, l_quantity), 4)
                    AS avgy,
                  round(covar_pop(l_quantity, l_extendedprice), 4)
                    AS cov_p,
                  round(corr(l_quantity, l_extendedprice), 6) AS r
           FROM lineitem GROUP BY l_returnflag""")),

    // SQL:2003 ordered-set aggregates — PERCENTILE_CONT / _DISC with
    // the WITHIN GROUP (ORDER BY ...) syntax, per group: the inverse-
    // distribution functions every SQL dialect spells this way. DuckDB
    // replays with quantile_cont/quantile_disc (same interpolation
    // semantics).
    "q405_within_group" -> ((s, d) =>
      graft.HeavyEngine(s, d).sql(
        """SELECT l_returnflag,
                  round(percentile_cont(0.5)
                    WITHIN GROUP (ORDER BY l_extendedprice), 4)
                    AS median_price,
                  round(percentile_cont(0.9)
                    WITHIN GROUP (ORDER BY l_extendedprice), 4)
                    AS p90_price,
                  percentile_disc(0.5)
                    WITHIN GROUP (ORDER BY l_quantity) AS median_qty_disc,
                  count(*) AS n
           FROM lineitem GROUP BY l_returnflag"""))
  )

  val oracles: Seq[(String, String)] = Seq(
    "q400_health_report" ->
      """WITH c AS (
           SELECT (sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
                      THEN 1 ELSE 0 END)
                 + sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1
                      THEN 1 ELSE 0 END)
                 + sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
                      THEN 1 ELSE 0 END)
                 + sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                 + sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END))
                 ::BIGINT AS v
           FROM lineitem),
         binned AS (
           SELECT event_type,
                  ts::TIMESTAMP >= TIMESTAMP '2024-01-16 00:00:00'
                    AS late,
                  least(floor(value / 40), 9)::BIGINT AS bin
           FROM events),
         cells AS (
           SELECT event_type, bin,
                  sum(CASE WHEN NOT late THEN 1 ELSE 0 END)::BIGINT
                    AS c1,
                  sum(CASE WHEN late THEN 1 ELSE 0 END)::BIGINT AS c2
           FROM binned GROUP BY 1, 2),
         tots AS (
           SELECT event_type, sum(c1)::BIGINT AS n1,
                  sum(c2)::BIGINT AS n2
           FROM cells GROUP BY 1),
         psis AS (
           SELECT cells.event_type,
                  sum(((c2 + 0.5) / (n2 + 5.0)
                       - (c1 + 0.5) / (n1 + 5.0))
                    * ln(((c2 + 0.5) / (n2 + 5.0))
                         / ((c1 + 0.5) / (n1 + 5.0)))) AS psi
           FROM cells JOIN tots USING (event_type)
           GROUP BY 1),
         mp AS (SELECT max(psi) AS mx FROM psis),
         fresh AS (
           SELECT date_diff('day', max(ts::TIMESTAMP)::DATE,
             DATE '2024-01-30')::BIGINT AS v
           FROM events),
         daily AS (
           SELECT date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                  count(*)::BIGINT AS c
           FROM events GROUP BY 1),
         wow AS (
           SELECT ((a.c - b.c) * 1000000 // b.c)::BIGINT AS v
           FROM daily a JOIN daily b
             ON b.day = a.day - INTERVAL 7 DAY
           ORDER BY a.day DESC LIMIT 1)
         SELECT check_name, value, status FROM (
           SELECT 'contract_violation_rows' AS check_name, v AS value,
                  CASE WHEN v > 0 THEN 'expected_fail_only'
                       ELSE 'clean' END AS status
           FROM c
           UNION ALL
           SELECT 'max_psi_milli', floor(mx * 1000)::BIGINT,
                  CASE WHEN mx > 0.2 THEN 'alert' ELSE 'ok' END
           FROM mp
           UNION ALL
           SELECT 'freshness_lag_days', v,
                  CASE WHEN v > 1 THEN 'alert' ELSE 'ok' END
           FROM fresh
           UNION ALL
           SELECT 'volume_wow_ppm', v,
                  CASE WHEN abs(v) > 500000 THEN 'alert' ELSE 'ok' END
           FROM wow) t(check_name, value, status)
         ORDER BY check_name""",
    "q401_rake_keyphrases" ->
      """WITH toks AS (
           SELECT doc_id, i AS pos, tk[i + 1] AS w
           FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '[^a-z0-9]+')
                     AS tk
                 FROM documents),
                unnest(generate_series(0, len(tk) - 1)) t(i)
           WHERE len(tk[i + 1]) > 0),
         flagged AS (
           SELECT doc_id, pos, w,
                  w IN ('the','a','an','of','and','to','in','is','on',
                        'for','with','as','by','at','or','it','are',
                        'was','that','this') AS is_stop
           FROM toks),
         isl AS (
           SELECT doc_id, pos, w, is_stop,
                  sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS isl
           FROM flagged),
         words AS (
           SELECT doc_id, isl, pos, w FROM isl WHERE NOT is_stop),
         phrases AS (
           SELECT doc_id, isl,
                  string_agg(w, ' ' ORDER BY pos) AS phrase,
                  count(*)::BIGINT AS plen
           FROM words GROUP BY doc_id, isl),
         wstats AS (
           SELECT w.w, (sum(p.plen) * 1000 // count(*))::BIGINT
                    AS wscore
           FROM words w JOIN phrases p USING (doc_id, isl)
           GROUP BY w.w),
         pscore AS (
           SELECT w.doc_id, w.isl, sum(s.wscore)::BIGINT AS pscore
           FROM words w JOIN wstats s ON s.w = w.w
           GROUP BY w.doc_id, w.isl)
         SELECT p.phrase, count(*)::BIGINT AS n_occur,
                max(ps.pscore)::BIGINT AS score
         FROM phrases p JOIN pscore ps USING (doc_id, isl)
         WHERE p.plen BETWEEN 2 AND 4
         GROUP BY p.phrase
         ORDER BY score DESC, p.phrase LIMIT 15""",
    "q402_hits" -> {
      val rounds = (1 to HitsIters).map { i =>
        s""", ra$i AS (
           SELECT n.node,
                  coalesce((SELECT sum(h.h * e.cnt) FROM h${i - 1} h
                    JOIN edges e ON e.src = h.node
                    WHERE e.dst = n.node), 0)::BIGINT AS ra
           FROM nodes n),
         a$i AS (
           SELECT node,
                  (ra // ((SELECT sum(ra) FROM ra$i)
                      // ${HitsScale}))::BIGINT AS a
           FROM ra$i),
         rh$i AS (
           SELECT n.node,
                  coalesce((SELECT sum(a.a * e.cnt) FROM a$i a
                    JOIN edges e ON e.dst = a.node
                    WHERE e.src = n.node), 0)::BIGINT AS rh
           FROM nodes n),
         h$i AS (
           SELECT node,
                  (rh // ((SELECT sum(rh) FROM rh$i)
                      // ${HitsScale}))::BIGINT AS h
           FROM rh$i)"""
      }.mkString
      s"""WITH ev AS (
           SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts
           FROM events),
         trans AS (
           SELECT event_type AS src,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) AS dst
           FROM ev),
         edges AS (
           SELECT src, dst, count(*)::BIGINT AS cnt FROM trans
           WHERE dst IS NOT NULL GROUP BY 1, 2),
         nodes AS (
           SELECT DISTINCT src AS node FROM edges
           UNION SELECT DISTINCT dst FROM edges),
         h0 AS (SELECT node, ${HitsScale}::BIGINT AS h FROM nodes)
         $rounds
         SELECT h.node, h.h AS hub_scaled, a.a AS auth_scaled,
                round(h.h / ${HitsScale.toDouble}, 6) AS hub,
                round(a.a / ${HitsScale.toDouble}, 6) AS auth
         FROM h$HitsIters h JOIN a$HitsIters a ON a.node = h.node
         ORDER BY h.node"""
    },
    "q404_regr_aggregates" ->
      """SELECT l_returnflag,
                regr_count(l_extendedprice, l_quantity)::BIGINT AS rn,
                round(regr_slope(l_extendedprice, l_quantity), 4)
                  AS slope,
                round(regr_intercept(l_extendedprice, l_quantity), 4)
                  AS icept,
                round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                round(regr_avgx(l_extendedprice, l_quantity), 4)
                  AS avgx,
                round(regr_avgy(l_extendedprice, l_quantity), 4)
                  AS avgy,
                round(covar_pop(l_quantity, l_extendedprice), 4)
                  AS cov_p,
                round(corr(l_quantity, l_extendedprice), 6) AS r
         FROM lineitem GROUP BY l_returnflag""",
    "q405_within_group" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4)
                  AS median_price,
                round(quantile_cont(l_extendedprice, 0.9), 4)
                  AS p90_price,
                quantile_disc(l_quantity, 0.5) AS median_qty_disc,
                count(*)::BIGINT AS n
         FROM lineitem GROUP BY l_returnflag"""
  )
}
