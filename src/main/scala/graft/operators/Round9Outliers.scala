package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BD (q562-q564) — density outliers, survey
  * allocation, and SLO burn alerting (public algorithms: k-NN
  * distance outlier scoring in the LOF family [Breunig et al. 2000,
  * the k-distance ratio simplification], Neyman optimal allocation
  * [Neyman 1934] with Hamilton rounding, and multi-window burn-rate
  * alerts [Google SRE Workbook ch. 5]):
  *
  *  - q562: embedding outlier gate — within-cluster (label) squared
  *    L2 in integer micro (sequential-fold double, then one floor —
  *    the q202 discipline), each point's 5th-NN distance, scored
  *    against the cluster's lower-median 5th-NN distance in ppm.
  *    Round-10: the all-pairs join (and its round-9 1024-member
  *    truncation cap) is replaced by a deterministic 64-member
  *    REFERENCE SAMPLE per cluster (lowest multiplicative-hash rank
  *    of vec_id — the sampled-kNN outlier scheme of Sugiyama &
  *    Borgwardt, NeurIPS 2013): every member is scored against the
  *    sample, so pair work is n·64 (linear) and membership never
  *    truncates; at the gate fixtures clusters are under 64 members,
  *    so the sample IS the cluster and the statistic is the exact
  *    full kNN. The vector-quality filter a dedup
  *    pipeline runs before SemDeDup.
  *  - q563: Neyman allocation — per-stratum σ from exact integer
  *    moments, allocation n_h ∝ N_h·σ_h for a budget of 1000 probes,
  *    integerized by largest-remainder (the q462 Hamilton machinery
  *    applied to survey design). Strata are schema-bounded.
  *  - q564: SLO burn-rate alerts — hourly error ratios vs a 25%
  *    budget, 1 h and 6 h windows, page when the fast window burns
  *    ≥ 2× AND the slow window ≥ 1× (the multi-window pattern that
  *    suppresses blips without missing slow burns). Exact integer
  *    cross-multiplication (burn_milli = errs·4000 DIV tot); hour
  *    grain is calendar-bounded.
  */
object Round9Outliers {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q562_knn_outlier_gate" -> ((s, d) => {
      // deterministic 64-member reference sample per cluster (lowest
      // splitmix-style hash of vec_id): every member scores against
      // the sample → n·64 pairs, linear in cluster size, zero
      // membership truncation [Sugiyama-Borgwardt 2013]
      val wS = Window.partitionBy(col("label"))
        .orderBy(col("h"), col("vec_id"))
      val vecs = graft.Stage(t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("x"))
        .withColumn("h",
          expr("((vec_id % 2147483648L) * 2654435761L) & 4294967295L"))
        .withColumn("sr", row_number().over(wS)), "q562_vecs")
      val a = vecs.select(col("label"), col("vec_id").as("ia"),
        col("x").as("xa"))
      val b = vecs.filter(col("sr") <= 64)
        .select(col("label"), col("vec_id").as("ib"),
          col("x").as("xb"))
      val d2 = a.join(b, Seq("label"))
        .filter(col("ia") =!= col("ib"))
        .select(col("label"), col("ia"), col("ib"),
          floor(aggregate(zip_with(col("xa"), col("xb"),
            (u, v) => (u - v) * (u - v)), lit(0.0), _ + _)
            * 1e6 + 0.5).cast("long").as("d2m"))
      val wNN = Window.partitionBy(col("label"), col("ia"))
        .orderBy(col("d2m"), col("ib"))
      val dk = graft.Stage(d2
        .withColumn("rn", row_number().over(wNN))
        .filter(col("rn") === 5)
        .select(col("label"), col("ia"), col("d2m").as("dk")),
        "q562_dk")
      val wMed = Window.partitionBy(col("label"))
        .orderBy(col("dk"), col("ia"))
      val nLab = dk.groupBy(col("label"))
        .agg(count(lit(1)).as("nl"))
      val med = dk.withColumn("mrn", row_number().over(wMed))
        .join(broadcast(nLab), Seq("label"))
        .filter(col("mrn") === expr("(nl + 1) DIV 2"))
        .select(col("label"), col("dk").as("med_dk"))
      val scored = dk.join(broadcast(med), Seq("label"))
        .select(col("label"), col("ia").as("vec_id"), col("dk"),
          expr("dk * 1000000 DIV greatest(med_dk, 1)")
            .as("score_ppm"))
      val wAll = Window.orderBy(col("score_ppm").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 10)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dk").as("dk_d2_micro"), col("score_ppm"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    }),

    "q563_neyman_allocation" -> ((s, d) => {
      val strata = t(s, d, "events")
        .select(col("event_type"),
          floor(col("value") * 1000).cast("long").as("xm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("nh"),
          sum(col("xm")).as("sx"),
          // the Σx² SUM itself in DECIMAL(38,0): DuckDB sum(BIGINT)
          // widens to HUGEINT, so past ~20M milli-scaled rows an
          // int64 Spark sum aborts while the oracle still runs
          sum(col("xm").cast("decimal(38,0)") * col("xm")).as("sx2"))
        .select(col("event_type"), col("nh"),
          // moments in DECIMAL(38,0): nh·Σx² overflows int64 once a
          // stratum holds ~2M milli-scaled rows (seen at the sf1 proof)
          expr("""CAST(floor(sqrt(CAST(CAST(nh AS DECIMAL(38,0))
                  * CAST(sx2 AS DECIMAL(38,0))
                  - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                  / CAST(nh * (nh - 1) AS DOUBLE))) AS BIGINT)""")
            .as("sigma_milli"))
        .withColumn("wh", col("nh") * col("sigma_milli"))
      val tot = strata.agg(sum(col("wh")).as("tw"))
      val base = strata.crossJoin(broadcast(tot))
        .select(col("event_type"), col("nh"), col("sigma_milli"),
          expr("wh * 1000 DIV tw").as("base"),
          expr("wh * 1000 % tw").as("rem"))
      val used = base.agg(sum(col("base")).as("ub"))
      val wRem = Window.orderBy(col("rem").desc, col("event_type"))
      base.crossJoin(broadcast(used))
        .withColumn("rr", row_number().over(wRem))
        .select(col("event_type"), col("nh"), col("sigma_milli"),
          (col("base") + when(col("rr") <= lit(1000L) - col("ub"), 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy(col("event_type"))
    }),

    "q564_slo_burn_alerts" -> ((s, d) => {
      val hourly = graft.Stage(t(s, d, "events")
        .select(floor(unix_timestamp(col("ts")) / 3600L).cast("long")
          .as("hr"),
          when(col("event_type") === "error", 1L).otherwise(0L)
            .as("e"))
        .groupBy(col("hr"))
        .agg(sum(col("e")).as("errs"), count(lit(1)).as("tot")),
        "q564_hourly")
      val w6 = Window.orderBy(col("hr")).rangeBetween(-5L, 0L)
      hourly
        .withColumn("errs6", sum(col("errs")).over(w6))
        .withColumn("tot6", sum(col("tot")).over(w6))
        .select(col("hr"), col("errs"), col("tot"),
          expr("errs * 4000 DIV tot").as("burn1_milli"),
          expr("errs6 * 4000 DIV tot6").as("burn6_milli"))
        .withColumn("page",
          when(col("burn1_milli") >= 2000L
            && col("burn6_milli") >= 1000L, 1L).otherwise(0L))
        .filter(col("page") === 1L)
        .orderBy(col("hr"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q562_knn_outlier_gate" ->
      """WITH vecs AS (
           SELECT vec_id, label, x, sr FROM (
             SELECT vec_id, label,
                    list_transform(embedding, e -> CAST(e AS DOUBLE))
                      AS x,
                    ((vec_id % 2147483648) * 2654435761)
                      & 4294967295 AS h,
                    row_number() OVER (PARTITION BY label
                      ORDER BY ((vec_id % 2147483648) * 2654435761)
                        & 4294967295, vec_id) AS sr
             FROM embeddings)),
         d2 AS (
           SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
                  floor(list_aggregate(list_transform(
                    list_zip(a.x, b.x),
                    z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')
                    * 1e6 + 0.5)::BIGINT AS d2m
           FROM vecs a JOIN vecs b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           WHERE b.sr <= 64),
         dk AS (
           SELECT label, ia, d2m AS dk FROM (
             SELECT label, ia, d2m,
                    row_number() OVER (PARTITION BY label, ia
                      ORDER BY d2m, ib) AS rn
             FROM d2)
           WHERE rn = 5),
         med AS (
           SELECT label, dk AS med_dk FROM (
             SELECT label, dk,
                    row_number() OVER (PARTITION BY label
                      ORDER BY dk, ia) AS mrn,
                    count(*) OVER (PARTITION BY label) AS nl
             FROM dk)
           WHERE mrn = (nl + 1) // 2),
         scored AS (
           SELECT d.label, d.ia AS vec_id, d.dk,
                  (d.dk * 1000000 // greatest(m.med_dk, 1))::BIGINT
                    AS score_ppm
           FROM dk d JOIN med m ON d.label = m.label),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY score_ppm DESC,
                    vec_id) AS rk
           FROM scored)
         SELECT vec_id, label::BIGINT AS label,
                dk AS dk_d2_micro, score_ppm, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 10 ORDER BY rk""",

    "q563_neyman_allocation" ->
      """WITH strata AS (
           SELECT event_type, count(*)::BIGINT AS nh,
                  sum(floor(value * 1000)::BIGINT)::BIGINT AS sx,
                  sum(floor(value * 1000)::HUGEINT
                      * floor(value * 1000)::BIGINT) AS sx2
           FROM events GROUP BY event_type),
         sig AS (
           SELECT event_type, nh,
                  CAST(floor(sqrt(CAST(nh::HUGEINT * sx2
                    - sx::HUGEINT * sx AS DOUBLE)
                    / CAST(nh * (nh - 1) AS DOUBLE))) AS BIGINT)
                    AS sigma_milli
           FROM strata),
         wts AS (
           SELECT *, (nh * sigma_milli)::BIGINT AS wh FROM sig),
         tot AS (SELECT sum(wh)::BIGINT AS tw FROM wts),
         base AS (
           SELECT event_type, nh, sigma_milli,
                  (wh * 1000 // tw)::BIGINT AS base,
                  (wh * 1000 % tw)::BIGINT AS rem
           FROM wts, tot),
         used AS (SELECT sum(base)::BIGINT AS ub FROM base)
         SELECT event_type, nh, sigma_milli,
                (base + CASE WHEN row_number() OVER (
                    ORDER BY rem DESC, event_type) <= 1000 - ub
                  THEN 1 ELSE 0 END)::BIGINT AS alloc
         FROM base, used ORDER BY event_type""",

    "q564_slo_burn_alerts" ->
      """WITH hourly AS (
           SELECT floor(epoch(ts::TIMESTAMP) / 3600)::BIGINT AS hr,
                  sum(CASE WHEN event_type = 'error' THEN 1
                      ELSE 0 END)::BIGINT AS errs,
                  count(*)::BIGINT AS tot
           FROM events GROUP BY 1),
         rolled AS (
           SELECT hr, errs, tot,
                  (errs * 4000 // tot)::BIGINT AS burn1_milli,
                  ((sum(errs) OVER w) * 4000
                    // (sum(tot) OVER w))::BIGINT AS burn6_milli
           FROM hourly
           WINDOW w AS (ORDER BY hr RANGE BETWEEN 5 PRECEDING
             AND CURRENT ROW))
         SELECT hr, errs, tot, burn1_milli, burn6_milli,
                1::BIGINT AS page
         FROM rolled
         WHERE burn1_milli >= 2000 AND burn6_milli >= 1000
         ORDER BY hr"""
  )
}
