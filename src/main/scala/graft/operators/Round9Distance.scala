package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AO (q517-q519) — exact distributional distance,
  * language-model retrieval, and cost-optimal thresholds:
  *
  *  - q517: two-sample ENERGY DISTANCE between document-length
  *    distributions: e = 2·E|X−Y| − E|X−X'| − E|Y−Y'|. Each
  *    expectation is computed EXACTLY on the merged value grain via
  *    the prefix-sum identity Σ_v c(v)·(v·Cnt(<v) − Sum(<v)) — O(V)
  *    with V bounded by the char-length domain, never the O(n²)
  *    pair space and never a corpus sort. Integer until the final
  *    three bounded ratios. Complements KS (tests), QQ
  *    (characterizes): energy metrizes the full distribution gap.
  *  - q518: Dirichlet-smoothed query-likelihood retrieval (the
  *    classic LM alternative to q365's BM25): score(d, q) =
  *    Σ_t ln((tf_dt + μ·p(t|C)) / (|d| + μ)), μ = 2000. The 3-term
  *    query pivots to columns so the per-doc sum has a fixed
  *    operation order; zero-tf docs still score (smoothing), postings
  *    are filtered to the query terms before any join.
  *  - q519: cost-curve threshold picker — extends q344's confusion
  *    sweep with an asymmetric-cost readout (FN = 5× FP): expected
  *    cost per threshold and the deterministic argmin. The decision
  *    layer every alerting pipeline bolts onto a classifier.
  */
object Round9Distance {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q517_energy_distance" -> ((s, d) => {
      def grain(src: String, p: String): DataFrame =
        t(s, d, "documents").filter(col("source") === src)
          .groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as(s"c$p"))
      val merged = graft.Stage(
        grain("src0", "x").join(grain("src1", "y"), Seq("v"), "full")
          .na.fill(0L, Seq("cx", "cy")), "q517_grain")
      val wv = Window.orderBy(col("v")) // value grain: char domain
        .rowsBetween(Window.unboundedPreceding, -1)
      val cums = merged
        .withColumn("cxb", coalesce(sum(col("cx")).over(wv), lit(0L)))
        .withColumn("sxb",
          coalesce(sum(col("cx") * col("v")).over(wv), lit(0L)))
        .withColumn("cyb", coalesce(sum(col("cy")).over(wv), lit(0L)))
        .withColumn("syb",
          coalesce(sum(col("cy") * col("v")).over(wv), lit(0L)))
      // Σ|a−b| over cross pairs: below-v contributions, DECIMAL-lifted
      val sums = cums.agg(
        sum(col("cx")).as("nx"), sum(col("cy")).as("ny"),
        sum(col("cx").cast("decimal(38,0)")
          * (col("v") * col("cyb") - col("syb"))
          + col("cy").cast("decimal(38,0)")
            * (col("v") * col("cxb") - col("sxb"))).as("axy"),
        sum(col("cx").cast("decimal(38,0)")
          * (col("v") * col("cxb") - col("sxb"))).as("axx_half"),
        sum(col("cy").cast("decimal(38,0)")
          * (col("v") * col("cyb") - col("syb"))).as("ayy_half"))
      sums.select(col("nx"), col("ny"),
        floor(col("axy").cast("double") * 1000
          / (col("nx") * col("ny")).cast("double"))
          .cast("long").as("e_xy_milli"),
        floor(col("axx_half").cast("double") * 2000
          / (col("nx").cast("decimal(38,0)") * col("nx")).cast("double"))
          .cast("long").as("e_xx_milli"),
        floor(col("ayy_half").cast("double") * 2000
          / (col("ny").cast("decimal(38,0)") * col("ny")).cast("double"))
          .cast("long").as("e_yy_milli"),
        floor((lit(2.0) * col("axy").cast("double")
          / (col("nx") * col("ny")).cast("double")
          - lit(2.0) * col("axx_half").cast("double")
            / (col("nx").cast("decimal(38,0)") * col("nx")).cast("double")
          - lit(2.0) * col("ayy_half").cast("double")
            / (col("ny").cast("decimal(38,0)") * col("ny")).cast("double"))
          * 1000).cast("long").as("energy_milli"))
    }),

    "q518_dirichlet_lm" -> ((s, d) => {
      val mu = 2000.0
      val terms = Seq("spark", "scan", "join")
      val toks = graft.Stage(t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " +")).as("tok")),
        "q518_toks")
      val dlen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val ctot = toks.agg(count(lit(1)).as("ctot"))
      val ctf = toks.filter(col("tok").isin(terms: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("ctf"))
        .crossJoin(broadcast(ctot))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("tok") === terms(0), 1L).otherwise(0L)).as("tf1"),
          sum(when(col("tok") === terms(1), 1L).otherwise(0L)).as("tf2"),
          sum(when(col("tok") === terms(2), 1L).otherwise(0L)).as("tf3"))
      // one ln-term per query word, fixed order — collection stats
      // broadcast as pivoted scalars
      val cstats = ctf.groupBy()
        .pivot("tok", terms).agg(first(col("ctf")))
        .crossJoin(broadcast(ctot))
        .select(col(terms(0)).as("ctf1"), col(terms(1)).as("ctf2"),
          col(terms(2)).as("ctf3"), col("ctot"))
      def term(tfc: String, ctfc: String) =
        log((col(tfc).cast("double")
          + lit(mu) * col(ctfc).cast("double") / col("ctot"))
          / (col("dl").cast("double") + lit(mu)))
      dlen.join(tf, Seq("doc_id"), "left")
        .na.fill(0L, Seq("tf1", "tf2", "tf3"))
        .crossJoin(broadcast(cstats))
        .withColumn("score_micro",
          floor((term("tf1", "ctf1") + term("tf2", "ctf2")
            + term("tf3", "ctf3")) * 1e6).cast("long"))
        .orderBy(col("score_micro").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("dl"), col("tf1"), col("tf2"),
          col("tf3"), col("score_micro"))
    }),

    "q519_cost_curve_threshold" -> ((s, d) => {
      val ev = graft.Stage(t(s, d, "events")
        .select(col("value").as("score"),
          when(col("event_type") === "error", 1L).otherwise(0L)
            .as("actual")), "q519_base")
      val frames = Seq(0.5, 1.0, 2.0, 3.0, 5.0, 8.0).map { th =>
        ev.agg(
          sum(when(col("score") > th && col("actual") === 0L, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") <= th && col("actual") === 1L, 1L)
            .otherwise(0L)).as("fn"))
          .withColumn("threshold_centi", lit((th * 100).toLong))
      }
      val costs = frames.reduce(_ unionByName _)
        .withColumn("cost", col("fp") + lit(5L) * col("fn"))
      val w = Window.orderBy(col("cost").asc,
        col("threshold_centi").asc) // 6-row threshold grain
      costs.withColumn("is_optimal",
          when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select(col("threshold_centi"), col("fp"), col("fn"),
          col("cost"), col("is_optimal"))
        .orderBy(col("threshold_centi"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q517_energy_distance" ->
      """WITH gx AS (
           SELECT n_chars AS v, count(*)::BIGINT AS cx
           FROM documents WHERE source = 'src0' GROUP BY 1),
         gy AS (
           SELECT n_chars AS v, count(*)::BIGINT AS cy
           FROM documents WHERE source = 'src1' GROUP BY 1),
         merged AS (
           SELECT coalesce(gx.v, gy.v) AS v,
                  coalesce(cx, 0)::BIGINT AS cx,
                  coalesce(cy, 0)::BIGINT AS cy
           FROM gx FULL OUTER JOIN gy ON gx.v = gy.v),
         cums AS (
           SELECT v, cx, cy,
             coalesce(sum(cx) OVER w, 0)::BIGINT AS cxb,
             coalesce(sum(cx * v) OVER w, 0)::BIGINT AS sxb,
             coalesce(sum(cy) OVER w, 0)::BIGINT AS cyb,
             coalesce(sum(cy * v) OVER w, 0)::BIGINT AS syb
           FROM merged
           WINDOW w AS (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         sums AS (
           SELECT sum(cx)::BIGINT AS nx, sum(cy)::BIGINT AS ny,
             sum(cx::HUGEINT * (v * cyb - syb)
               + cy::HUGEINT * (v * cxb - sxb)) AS axy,
             sum(cx::HUGEINT * (v * cxb - sxb)) AS axx_half,
             sum(cy::HUGEINT * (v * cyb - syb)) AS ayy_half
           FROM cums)
         SELECT nx, ny,
           floor(CAST(axy AS DOUBLE) * 1000
             / CAST(nx * ny AS DOUBLE))::BIGINT AS e_xy_milli,
           floor(CAST(axx_half AS DOUBLE) * 2000
             / CAST(nx::HUGEINT * nx AS DOUBLE))::BIGINT AS e_xx_milli,
           floor(CAST(ayy_half AS DOUBLE) * 2000
             / CAST(ny::HUGEINT * ny AS DOUBLE))::BIGINT AS e_yy_milli,
           floor((2.0 * CAST(axy AS DOUBLE) / CAST(nx * ny AS DOUBLE)
             - 2.0 * CAST(axx_half AS DOUBLE)
               / CAST(nx::HUGEINT * nx AS DOUBLE)
             - 2.0 * CAST(ayy_half AS DOUBLE)
               / CAST(ny::HUGEINT * ny AS DOUBLE)) * 1000)::BIGINT
             AS energy_milli
         FROM sums""",

    "q518_dirichlet_lm" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), ' +'))
             AS tok
           FROM documents),
         dlen AS (
           SELECT doc_id, count(*)::BIGINT AS dl
           FROM toks GROUP BY doc_id),
         ctot AS (SELECT count(*)::BIGINT AS ctot FROM toks),
         ctf AS (
           SELECT
             sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END)::BIGINT
               AS ctf1,
             sum(CASE WHEN tok = 'scan' THEN 1 ELSE 0 END)::BIGINT
               AS ctf2,
             sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END)::BIGINT
               AS ctf3
           FROM toks),
         tf AS (
           SELECT doc_id,
             sum(CASE WHEN tok = 'spark' THEN 1 ELSE 0 END)::BIGINT
               AS tf1,
             sum(CASE WHEN tok = 'scan' THEN 1 ELSE 0 END)::BIGINT
               AS tf2,
             sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END)::BIGINT
               AS tf3
           FROM toks WHERE tok IN ('spark', 'scan', 'join')
           GROUP BY doc_id),
         scored AS (
           SELECT d.doc_id, d.dl,
             coalesce(t.tf1, 0)::BIGINT AS tf1,
             coalesce(t.tf2, 0)::BIGINT AS tf2,
             coalesce(t.tf3, 0)::BIGINT AS tf3,
             floor((
               ln((CAST(coalesce(t.tf1, 0) AS DOUBLE)
                 + 2000.0 * CAST(c.ctf1 AS DOUBLE) / n.ctot)
                 / (CAST(d.dl AS DOUBLE) + 2000.0))
               + ln((CAST(coalesce(t.tf2, 0) AS DOUBLE)
                 + 2000.0 * CAST(c.ctf2 AS DOUBLE) / n.ctot)
                 / (CAST(d.dl AS DOUBLE) + 2000.0))
               + ln((CAST(coalesce(t.tf3, 0) AS DOUBLE)
                 + 2000.0 * CAST(c.ctf3 AS DOUBLE) / n.ctot)
                 / (CAST(d.dl AS DOUBLE) + 2000.0))) * 1e6)::BIGINT
               AS score_micro
           FROM dlen d LEFT JOIN tf t ON d.doc_id = t.doc_id,
                ctf c, ctot n)
         SELECT doc_id, dl, tf1, tf2, tf3, score_micro
         FROM scored
         ORDER BY score_micro DESC, doc_id LIMIT 10""",

    "q519_cost_curve_threshold" -> {
      val per = Seq(0.5, 1.0, 2.0, 3.0, 5.0, 8.0).map { th =>
        s"""SELECT ${(th * 100).toLong}::BIGINT AS threshold_centi,
              sum(CASE WHEN value > $th AND event_type <> 'error'
                  THEN 1 ELSE 0 END)::BIGINT AS fp,
              sum(CASE WHEN value <= $th AND event_type = 'error'
                  THEN 1 ELSE 0 END)::BIGINT AS fn
            FROM events"""
      }.mkString("(", ")\nUNION ALL\n(", ")")
      s"""WITH sweep AS (
           $per),
         costs AS (
           SELECT threshold_centi, fp, fn,
                  (fp + 5 * fn)::BIGINT AS cost
           FROM sweep)
         SELECT threshold_centi, fp, fn, cost,
                (CASE WHEN row_number() OVER (
                   ORDER BY cost, threshold_centi) = 1
                 THEN 1 ELSE 0 END)::BIGINT AS is_optimal
         FROM costs ORDER BY threshold_centi"""
    }
  )
}
