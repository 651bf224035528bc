package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch M (q417-q418): nearest-neighbor propensity matching
  * with a caliper (the causal-inference estimator behind observational
  * A/B reads) and EM-estimated Fellegi-Sunter linkage parameters (the
  * learning step q350's fixed weights presuppose). Hash-gated vs
  * DuckDB.
  */
object Round9Causal {

  type Q = (SparkSession, String) => DataFrame

  private def knuth(key: org.apache.spark.sql.Column) =
    (key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)) % lit(4294967296L)

  val queries: Seq[(String, Q)] = Seq(

    // Nearest-neighbor propensity matching with caliper 2 — each
    // treated user matched to the closest control on the pre-period
    // activity covariate (|x_t - x_c| <= 2, ties to the smaller
    // control id, WITH replacement), then the average
    // treated-minus-matched-control outcome (ATT) in exact milli.
    // Candidates pair only inside the caliper band (equi-join on the
    // covariate bucket +-1 — never treated x control), the per-treated
    // argmin is one bounded window.
    "q417_propensity_matching" -> ((s, d) => {
      val per = graft.Stage(t(s, d, "events")
        .groupBy(col("user_id"),
          (knuth(col("user_id")) % 2 === 1).as("treated"))
        .agg(
          sum(when(col("ts") < "2024-01-16", 1L).otherwise(0L)).as("x"),
          sum(when(col("ts") >= "2024-01-16" &&
            col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L))
            .as("y")), "q417_per_user")
      val treatedDf = per.filter(col("treated"))
        .select(col("user_id").as("tid"), col("x").as("xt"),
          col("y").as("yt"))
      val controls = per.filter(!col("treated"))
        .select(col("user_id").as("cid"), col("x").as("xc"),
          col("y").as("yc"))
      // Matching with replacement + min-id tiebreak means only the
      // smallest-id control PER DISTINCT COVARIATE VALUE can ever win
      // — so controls first reduce to one representative per value
      // (sf1 ScaleRun caught the naive band join going quadratic when
      // covariate values cluster: 8.1 s / 11x wall for 10x data; the
      // reduced form gives each treated at most 5 candidates at any
      // scale).
      val reps = controls.groupBy(col("xc"))
        .agg(min(struct(col("cid"), col("yc"))).as("r"))
        .select(col("xc"), col("r.cid").as("cid"), col("r.yc").as("yc"))
      val cand = treatedDf
        .withColumn("dx", explode(array((-2 to 2).map(lit(_)): _*)))
        .join(reps, col("xc") === col("xt") + col("dx"))
      val matched = cand.withColumn("rn", row_number().over(
          Window.partitionBy(col("tid"))
            .orderBy(abs(col("xt") - col("xc")), col("cid"))))
        .filter(col("rn") === 1)
      matched.agg(count(lit(1)).as("n_matched"),
          avg(col("yt") - col("yc")).as("att"),
          avg(abs(col("xt") - col("xc"))).as("bal"))
        .crossJoin(broadcast(treatedDf.agg(count(lit(1)).as("n_treated"))))
        .select(col("n_treated"), col("n_matched"),
          round(col("att"), 4).as("att_cents"),
          round(col("bal"), 4).as("mean_covariate_gap"))
    }),

    // EM estimation of Fellegi-Sunter parameters — the learning step
    // q350's hard-coded ln(m/u) weights presuppose: over the blocked
    // candidate pairs' field-agreement vectors (brand, type, size),
    // two EM iterations re-estimate the match prior pi and per-field
    // m/u probabilities from the posterior match weight of every pair.
    // Each iteration is ONE bounded aggregate over the pair table; the
    // 1-row parameter state rides a broadcast (collected driver-side —
    // bounded metadata, like the ExactSelection histograms).
    "q418_linkage_em" -> ((s, d) => {
      val p = t(s, d, "part")
      val pairs = graft.Stage(p.as("a").join(p.as("b"),
          col("b.p_partkey") === col("a.p_partkey") + 1)
        .select(
          (col("a.p_brand") === col("b.p_brand")).cast("int").as("a1"),
          (col("a.p_type") === col("b.p_type")).cast("int").as("a2"),
          (abs(col("a.p_size") - col("b.p_size")) <= 2).cast("int")
            .as("a3")), "q418_pairs")
      var pi = 0.1
      var m = Array(0.9, 0.9, 0.9)
      var u = Array(0.1, 0.1, 0.1)
      for (_ <- 1 to 2) {
        def lik(probs: Array[Double]) =
          (0 until 3).map { k =>
            val a = col(s"a${k + 1}").cast("double")
            pow(lit(probs(k)), a) * pow(lit(1 - probs(k)), lit(1.0) - a)
          }.reduce(_ * _)
        val g = (lit(pi) * lik(m)) /
          (lit(pi) * lik(m) + lit(1 - pi) * lik(u))
        // Bounded driver-side parameter update: one 1-row aggregate.
        val r = pairs.agg(count(lit(1)).cast("double").as("n"),
          sum(g).as("sg"),
          sum(g * col("a1")).as("g1"), sum(g * col("a2")).as("g2"),
          sum(g * col("a3")).as("g3"),
          sum((lit(1.0) - g) * col("a1")).as("h1"),
          sum((lit(1.0) - g) * col("a2")).as("h2"),
          sum((lit(1.0) - g) * col("a3")).as("h3")).head()
        val n = r.getDouble(0); val sg = r.getDouble(1)
        m = Array(r.getDouble(2) / sg, r.getDouble(3) / sg,
          r.getDouble(4) / sg)
        u = Array(r.getDouble(5) / (n - sg), r.getDouble(6) / (n - sg),
          r.getDouble(7) / (n - sg))
        pi = sg / n
      }
      val spark = s
      import spark.implicits._
      pairs.agg(count(lit(1)).as("n_pairs")).select(col("n_pairs"),
        round(lit(pi), 6).as("pi"),
        round(lit(m(0)), 6).as("m_brand"),
        round(lit(m(1)), 6).as("m_type"),
        round(lit(m(2)), 6).as("m_size"),
        round(lit(u(0)), 6).as("u_brand"),
        round(lit(u(1)), 6).as("u_type"),
        round(lit(u(2)), 6).as("u_size"))
    }),

    // Sample-ratio-mismatch check — the first thing to run on ANY
    // experiment before reading its metrics: chi-square of observed
    // variant counts against the designed 50/50 split, with the
    // 3.841 (df = 1, alpha = .05) critical-value verdict. A failed SRM
    // invalidates q267/q394/q396 downstream. One aggregate.
    "q419_srm_check" -> ((s, d) => {
      val counts = t(s, d, "events")
        .select(col("user_id")).distinct()
        .select((knuth(col("user_id")) % 2 === 1).as("is_b"))
        .agg(sum(when(col("is_b"), 1L).otherwise(0L)).as("nb"),
          count(lit(1)).as("n"))
      counts.select(col("n").as("n_users"), col("nb").as("n_variant_b"),
          (((col("nb") - col("n") / 2.0) * (col("nb") - col("n") / 2.0))
            / (col("n") / 4.0)).as("chi2"))
        .select(col("n_users"), col("n_variant_b"),
          round(col("chi2"), 4).as("chi2"),
          when(col("chi2") > 3.841, "srm_detected").otherwise("ok")
            .as("verdict"))
    }),

    // Pythagorean means per group — geometric and harmonic means via
    // their log/reciprocal identities (no native aggregate in either
    // engine), alongside the arithmetic mean: the AM >= GM >= HM
    // inequality doubles as a free sanity gate. One partial-merge
    // aggregate over positive quantities.
    "q420_pythagorean_means" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("l_quantity")), 4).as("arith_mean"),
          round(exp(avg(log(col("l_quantity")))), 4).as("geo_mean"),
          round(count(lit(1)) / sum(lit(1.0) / col("l_quantity")), 4)
            .as("harm_mean"))
        .orderBy(col("l_returnflag")))
  )

  val oracles: Seq[(String, String)] = Seq(
    "q419_srm_check" ->
      """WITH u AS (
           SELECT DISTINCT user_id FROM events),
         counts AS (
           SELECT sum(CASE WHEN (user_id % 2147483648 * 2654435761
                    % 4294967296) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS nb,
                  count(*)::BIGINT AS n
           FROM u)
         SELECT n AS n_users, nb AS n_variant_b,
                round((nb - n / 2.0) * (nb - n / 2.0) / (n / 4.0), 4)
                  AS chi2,
                CASE WHEN (nb - n / 2.0) * (nb - n / 2.0) / (n / 4.0)
                     > 3.841 THEN 'srm_detected' ELSE 'ok' END
                  AS verdict
         FROM counts""",
    "q420_pythagorean_means" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
                round(avg(l_quantity), 4) AS arith_mean,
                round(exp(avg(ln(l_quantity))), 4) AS geo_mean,
                round(count(*) / sum(1.0 / l_quantity), 4) AS harm_mean
         FROM lineitem WHERE l_quantity > 0
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q417_propensity_matching" ->
      """WITH per AS (
           SELECT user_id,
                  (user_id % 2147483648 * 2654435761 % 4294967296)
                    % 2 = 1 AS treated,
                  sum(CASE WHEN ts::TIMESTAMP
                        < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END)::BIGINT AS x,
                  sum(CASE WHEN ts::TIMESTAMP
                        >= TIMESTAMP '2024-01-16 00:00:00'
                        AND event_type = 'purchase'
                      THEN floor(value * 100)::BIGINT ELSE 0 END)
                    ::BIGINT AS y
           FROM events GROUP BY 1, 2),
         tr AS (SELECT user_id AS tid, x AS xt, y AS yt FROM per
                WHERE treated),
         ct AS (SELECT user_id AS cid, x AS xc, y AS yc FROM per
                WHERE NOT treated),
         cand AS (
           SELECT tid, xt, yt, cid, xc, yc
           FROM tr JOIN ct ON abs(xt - xc) <= 2),
         matched AS (
           SELECT tid, yt, yc, xt, xc,
                  row_number() OVER (PARTITION BY tid
                    ORDER BY abs(xt - xc), cid) AS rn
           FROM cand)
         SELECT (SELECT count(*) FROM tr)::BIGINT AS n_treated,
                count(*)::BIGINT AS n_matched,
                round(avg(yt - yc), 4) AS att_cents,
                round(avg(abs(xt - xc)), 4) AS mean_covariate_gap
         FROM matched WHERE rn = 1""",
    "q418_linkage_em" -> {
      // Two unrolled EM iterations over the agreement vectors.
      def lik(piX: String, mPre: String): String =
        (1 to 3).map(k =>
          s"pow($mPre$k, a$k) * pow(1 - $mPre$k, 1 - a$k)")
          .mkString(s"$piX * ", " * ", "")
      s"""WITH pairs AS (
           SELECT (a.p_brand = b.p_brand)::INT AS a1,
                  (a.p_type = b.p_type)::INT AS a2,
                  (abs(a.p_size - b.p_size) <= 2)::INT AS a3
           FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1),
         p0 AS (
           SELECT 0.1 AS pi, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
                  0.1 AS u1, 0.1 AS u2, 0.1 AS u3),
         e1 AS (
           SELECT a1, a2, a3,
                  (${lik("pi", "m")})
                  / ((${lik("pi", "m")}) + (${lik("(1 - pi)", "u")}))
                    AS g
           FROM pairs CROSS JOIN p0),
         p1 AS (
           SELECT sum(g) / count(*) AS pi,
                  sum(g * a1) / sum(g) AS m1,
                  sum(g * a2) / sum(g) AS m2,
                  sum(g * a3) / sum(g) AS m3,
                  sum((1 - g) * a1) / (count(*) - sum(g)) AS u1,
                  sum((1 - g) * a2) / (count(*) - sum(g)) AS u2,
                  sum((1 - g) * a3) / (count(*) - sum(g)) AS u3
           FROM e1),
         e2 AS (
           SELECT a1, a2, a3,
                  (${lik("pi", "m")})
                  / ((${lik("pi", "m")}) + (${lik("(1 - pi)", "u")}))
                    AS g
           FROM pairs CROSS JOIN p1),
         p2 AS (
           SELECT sum(g) / count(*) AS pi,
                  sum(g * a1) / sum(g) AS m1,
                  sum(g * a2) / sum(g) AS m2,
                  sum(g * a3) / sum(g) AS m3,
                  sum((1 - g) * a1) / (count(*) - sum(g)) AS u1,
                  sum((1 - g) * a2) / (count(*) - sum(g)) AS u2,
                  sum((1 - g) * a3) / (count(*) - sum(g)) AS u3
           FROM e2)
         SELECT (SELECT count(*) FROM pairs)::BIGINT AS n_pairs,
                round(pi, 6) AS pi,
                round(m1, 6) AS m_brand, round(m2, 6) AS m_type,
                round(m3, 6) AS m_size,
                round(u1, 6) AS u_brand, round(u2, 6) AS u_type,
                round(u3, 6) AS u_size
         FROM p2"""
    }
  )
}
