package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BC (q559-q561) — community quality, survival
  * hazards, and cluster prototypes (public algorithms: Newman-Girvan
  * modularity [Newman 2006], the Nelson-Aalen cumulative-hazard
  * estimator [Nelson 1972, Aalen 1978], and the k-medoids prototype
  * step [Kaufman-Rousseeuw 1987]; reference surface: graph and
  * survival UDTF families).
  *
  *  - q559: modularity of a 4-round min-label partition over the
  *    weighted category co-occurrence graph. Label propagation is 4
  *    bounded min-joins (the q558 truncation discipline); per-
  *    community Q_c = (Σ_in·2m − Σ_tot²)/(2m)² lands in integer ppm
  *    via DECIMAL/HUGEINT cross-multiplication, and the global Q is
  *    the exact integer sum of the per-community floors.
  *  - q560: Nelson-Aalen cumulative hazard for signup→purchase
  *    conversion, right-censored at the observation horizon. The risk
  *    set is derived from a DAY-GRAIN duration histogram (n_risk(t) =
  *    total − cum(durations < t)) so no per-user window ever forms —
  *    the 100 TB shape; the hazard steps and their running sum are
  *    exact integer ppm on a calendar-bounded grain.
  *  - q561: per-cluster medoid over the embeddings table — the
  *    member maximizing the integer sum of pairwise cosine-micros
  *    (each cosine floor(·1e6 + 0.5) in the repo's bit-reproducible
  *    dot/sqrt shape from q202). Round-10: the all-pairs join (and
  *    its round-9 1024-member truncation cap) is replaced by the
  *    EXACT linear identity Σ_j cos(i,j) = u_i·S − 1 with
  *    S = Σ_j x_j/‖x_j‖ — each unit vector is quantized to integer
  *    micros so the per-cluster dimension sums (and hence the
  *    candidate ranking) are exact integers, identical in any
  *    engine/order; the top-8 candidates per cluster then get the
  *    integer pair statistic against ALL members (8·n pairs, linear),
  *    so membership never truncates. The only gap vs brute force is
  *    pair-level rounding (≤0.5 µ per pair) flipping a near-tie
  *    between candidates ranked by the exact double identity.
  */
object Round9Communities {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q559_partition_modularity" -> ((s, d) => {
      val basket = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % 100).cast("long").as("item"))
        .distinct()
      val up = basket.as("a").join(basket.as("b"),
          col("a.ok") === col("b.ok")
            && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).as("c"))
      // top-300 heaviest pairs — same scale-independent edge rule as
      // q558 (a relative threshold degenerates at sf0.1)
      val wP = Window.orderBy(col("c").desc, col("i"), col("j"))
      val strongUp = up.withColumn("pr", row_number().over(wP))
        .filter(col("pr") <= 300)
        .select(col("i"), col("j"), col("c"))
      val edges = graft.Stage(strongUp.unionByName(
        strongUp.select(col("j").as("i"), col("i").as("j"),
          col("c"))), "q559_edges")
      val deg = edges.groupBy(col("i").as("v"))
        .agg(sum(col("c")).as("dg"))
      var lab = deg.select(col("v"), col("v").as("lb"))
        .localCheckpoint(true)
      for (_ <- 1 to 4) {
        // lab/nb are node-bounded (≤|items| rows) — broadcast both
        // sides of the propagation so each round is map-side
        val nb = edges.join(broadcast(lab), edges("j") === lab("v"))
          .groupBy(edges("i").as("u"))
          .agg(min(col("lb")).as("nlb"))
        lab = lab.join(broadcast(nb), lab("v") === nb("u"), "left")
          .select(col("v"),
            least(col("lb"), coalesce(col("nlb"), col("lb")))
              .as("lb"))
          .localCheckpoint(true) // node-bounded rows, cut lineage
      }
      val m2 = edges.agg(sum(col("c")).as("m2")) // = 2m (symmetric)
      val sin = edges
        .join(lab.select(col("v").as("i"), col("lb").as("li")),
          Seq("i"))
        .join(lab.select(col("v").as("j"), col("lb").as("lj")),
          Seq("j"))
        .filter(col("li") === col("lj"))
        .groupBy(col("li").as("comm"))
        .agg(sum(col("c")).as("sin"))
      val stot = deg.join(lab, Seq("v"))
        .groupBy(col("lb").as("comm"))
        .agg(sum(col("dg")).as("stot"), count(lit(1)).as("n_nodes"))
      val per = stot.join(sin, Seq("comm"), "left")
        .na.fill(0L, Seq("sin"))
        .crossJoin(broadcast(m2))
        .select(col("comm"), col("n_nodes"), col("sin"), col("stot"),
          expr("""CAST((CAST(sin AS DECIMAL(38,0)) * m2
                  - CAST(stot AS DECIMAL(38,0)) * stot) * 1000000
                  DIV (CAST(m2 AS DECIMAL(38,0)) * m2) AS BIGINT)""")
            .as("q_ppm"))
      val total = per.agg(sum(col("q_ppm")).as("q_ppm"),
        sum(col("n_nodes")).as("n_nodes"),
        sum(col("sin")).as("sin"), sum(col("stot")).as("stot"))
        .select(lit(-1L).as("comm"), col("n_nodes"), col("sin"),
          col("stot"), col("q_ppm"))
      per.unionByName(total)
        .orderBy(col("comm"))
    }),

    "q560_nelson_aalen" -> ((s, d) => {
      val days = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
      val horizon = days.agg(max(col("day")).as("hz"))
      val su = days.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("sd"))
      val pu = days.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("day") >= col("sd"))
        .groupBy(col("user_id")).agg(min(col("day")).as("pd"))
      val durs = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("pd").isNotNull, col("pd") - col("sd"))
            .otherwise(col("hz") - col("sd")).as("dur"),
          when(col("pd").isNotNull, 1L).otherwise(0L).as("ev"))
      // day-grain histogram: risk sets via cumulative counts, never a
      // per-user window
      val hist = graft.Stage(durs.groupBy(col("dur"))
        .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d_at")),
        "q560_hist")
      val tot = hist.agg(sum(col("n_at")).as("n_total"))
      val wv = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wc = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("n_total") - coalesce(sum(col("n_at")).over(wv),
            lit(0L)))
        .filter(col("d_at") > 0)
        .withColumn("h_step_ppm",
          expr("d_at * 1000000 DIV n_risk"))
        .withColumn("cum_hazard_ppm", sum(col("h_step_ppm")).over(wc))
        .select(col("dur").as("t_days"), col("n_risk"),
          col("d_at").as("d_events"), col("h_step_ppm"),
          col("cum_hazard_ppm"))
        .orderBy(col("t_days"))
    }),

    "q561_cluster_medoid" -> ((s, d) => {
      def dotp(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), _ + _)
      // Phase 1 — candidate generation via the exact linear identity
      // Σ_j cos(i,j) = u_i·S − 1 (u = x/‖x‖, S = Σ u_j): quantize u
      // to integer micros element-wise (one double div/sqrt per
      // element — deterministic IEEE, no cross-row float sums), so S
      // and every candidate score are exact integers in both engines.
      val vecs = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("x"))
        .withColumn("n2",
          aggregate(transform(col("x"), a => a * a), lit(0.0), _ + _))
      val vstage = graft.Stage(vecs.withColumn("q", expr(
        """transform(x, v ->
           CAST(floor(v / sqrt(n2) * 1000000 + 0.5) AS BIGINT))""")),
        "q561_vecs")
      // per-label per-dimension integer sums — order-independent
      val sq = vstage
        .select(col("label"), posexplode(col("q")).as(Seq("pos", "qd")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("qd")).as("sv"))
        .groupBy(col("label"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, sv))), t -> t.sv)")
          .as("sq"))
      // candidate score dot(q_i, S) in DECIMAL(38,0): q ≤ 1e6/dim but
      // S grows with cluster size — int64 dies past ~1e11 members
      val wC = Window.partitionBy(col("label"))
        .orderBy(col("cscore").desc, col("vec_id"))
      val cands = vstage.join(broadcast(sq), Seq("label"))
        .withColumn("cscore", expr(
          """aggregate(zip_with(q, sq,
             (a, b) -> CAST(a AS DECIMAL(38,0)) * b),
             CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v)"""))
        .withColumn("cr", row_number().over(wC))
        .filter(col("cr") <= 8)
        .select(col("label"), col("vec_id").as("ia"),
          col("x").as("xa"), col("n2").as("na"))
      // Phase 2 — exact integer pair statistic, candidates × ALL
      // members: 8·n pairs per cluster (linear), no truncation
      val b = vstage.select(col("label"), col("vec_id").as("ib"),
        col("x").as("xb"), col("n2").as("nb"))
      val sums = cands.join(b, Seq("label"))
        .filter(col("ia") =!= col("ib"))
        .select(col("label"), col("ia"),
          floor(dotp(col("xa"), col("xb"))
            / sqrt(col("na") * col("nb")) * 1e6 + 0.5)
            .cast("long").as("cm"))
        .groupBy(col("label"), col("ia"))
        .agg(sum(col("cm")).as("sum_cos_micro"),
          count(lit(1)).as("n_others"))
      val wL = Window.partitionBy(col("label"))
        .orderBy(col("sum_cos_micro").desc, col("ia"))
      sums.withColumn("rn", row_number().over(wL))
        .filter(col("rn") === 1)
        .select(col("label").cast("long").as("label"),
          col("ia").as("medoid_vec_id"), col("sum_cos_micro"),
          (col("n_others") + 1L).as("n_members"))
        .orderBy(col("label"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q559_partition_modularity" -> {
      val rounds = (1 to 4).map { k =>
        s"""l$k AS (
           SELECT l.v,
                  least(l.lb, coalesce(nb.nlb, l.lb)) AS lb
           FROM l${k - 1} l LEFT JOIN (
             SELECT e.i AS u, min(p.lb) AS nlb
             FROM edges e JOIN l${k - 1} p ON e.j = p.v
             GROUP BY e.i) nb ON l.v = nb.u)"""
      }.mkString(",\n         ")
      s"""WITH basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 100)::BIGINT AS item
           FROM lineitem),
         up AS (
           SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS c
           FROM basket a JOIN basket b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY 1, 2),
         sup AS (
           SELECT i, j, c FROM (
             SELECT i, j, c,
                    row_number() OVER (ORDER BY c DESC, i, j) AS pr
             FROM up)
           WHERE pr <= 300),
         edges AS (
           SELECT i, j, c FROM sup
           UNION ALL SELECT j, i, c FROM sup),
         deg AS (
           SELECT i AS v, sum(c)::BIGINT AS dg FROM edges
           GROUP BY i),
         l0 AS (SELECT v, v AS lb FROM deg),
         $rounds,
         m2 AS (SELECT sum(c)::BIGINT AS m2 FROM edges),
         sin AS (
           SELECT li.lb AS comm, sum(e.c)::BIGINT AS sin
           FROM edges e
           JOIN l4 li ON e.i = li.v
           JOIN l4 lj ON e.j = lj.v
           WHERE li.lb = lj.lb GROUP BY li.lb),
         stot AS (
           SELECT l.lb AS comm, sum(d.dg)::BIGINT AS stot,
                  count(*)::BIGINT AS n_nodes
           FROM deg d JOIN l4 l ON d.v = l.v GROUP BY l.lb),
         per AS (
           SELECT st.comm, st.n_nodes,
                  coalesce(si.sin, 0)::BIGINT AS sin, st.stot,
                  ((coalesce(si.sin, 0)::HUGEINT * m.m2
                    - st.stot::HUGEINT * st.stot) * 1000000
                    // (m.m2::HUGEINT * m.m2))::BIGINT AS q_ppm
           FROM stot st LEFT JOIN sin si ON st.comm = si.comm, m2 m),
         tot AS (
           SELECT -1::BIGINT AS comm, sum(n_nodes)::BIGINT AS n_nodes,
                  sum(sin)::BIGINT AS sin, sum(stot)::BIGINT AS stot,
                  sum(q_ppm)::BIGINT AS q_ppm
           FROM per)
         SELECT comm, n_nodes, sin, stot, q_ppm FROM per
         UNION ALL SELECT comm, n_nodes, sin, stot, q_ppm FROM tot
         ORDER BY comm"""
    },

    "q560_nelson_aalen" ->
      """WITH days AS (
           SELECT user_id, event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day
           FROM events),
         hz AS (SELECT max(day) AS hz FROM days),
         su AS (
           SELECT user_id, min(day) AS sd FROM days
           WHERE event_type = 'signup' GROUP BY user_id),
         pu AS (
           SELECT d.user_id, min(d.day) AS pd
           FROM days d JOIN su s ON d.user_id = s.user_id
           WHERE d.event_type = 'purchase' AND d.day >= s.sd
           GROUP BY d.user_id),
         durs AS (
           SELECT s.user_id,
                  CASE WHEN p.pd IS NOT NULL THEN p.pd - s.sd
                       ELSE h.hz - s.sd END AS dur,
                  CASE WHEN p.pd IS NOT NULL THEN 1
                       ELSE 0 END::BIGINT AS ev
           FROM su s LEFT JOIN pu p ON s.user_id = p.user_id, hz h),
         hist AS (
           SELECT dur, count(*)::BIGINT AS n_at,
                  sum(ev)::BIGINT AS d_at
           FROM durs GROUP BY dur),
         tot AS (SELECT sum(n_at)::BIGINT AS n_total FROM hist),
         risk AS (
           SELECT h.dur, h.n_at, h.d_at,
                  t.n_total - coalesce(sum(h.n_at) OVER (
                    ORDER BY h.dur
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS n_risk
           FROM hist h, tot t),
         steps AS (
           SELECT dur AS t_days, n_risk::BIGINT AS n_risk,
                  d_at AS d_events,
                  (d_at * 1000000 // n_risk)::BIGINT AS h_step_ppm
           FROM risk WHERE d_at > 0)
         SELECT t_days, n_risk, d_events, h_step_ppm,
                (sum(h_step_ppm) OVER (ORDER BY t_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  ::BIGINT AS cum_hazard_ppm
         FROM steps ORDER BY t_days""",

    "q561_cluster_medoid" ->
      """WITH normed AS (
           SELECT vec_id, label,
                  list_transform(embedding, e -> CAST(e AS DOUBLE))
                    AS x,
                  list_aggregate(list_transform(
                    list_transform(embedding, e -> CAST(e AS DOUBLE)),
                    a -> a * a), 'sum') AS n2
           FROM embeddings),
         qv AS (
           SELECT vec_id, label, x, n2,
                  list_transform(x, v ->
                    floor(v / sqrt(n2) * 1000000 + 0.5)::BIGINT) AS q
           FROM normed),
         dims AS (
           SELECT label, r.range AS i,
                  sum(q[r.range::INT])::BIGINT AS sv
           FROM qv, range(1, 65) r
           GROUP BY label, r.range),
         sq AS (
           SELECT label, list(sv ORDER BY i) AS sq FROM dims
           GROUP BY label),
         cand0 AS (
           SELECT v.vec_id, v.label, v.x, v.n2,
                  list_sum(list_transform(list_zip(v.q, s.sq),
                    z -> z[1]::HUGEINT * z[2])) AS cscore
           FROM qv v JOIN sq s ON v.label = s.label),
         cands AS (
           SELECT label, vec_id AS ia, x AS xa, n2 AS na FROM (
             SELECT *, row_number() OVER (PARTITION BY label
                      ORDER BY cscore DESC, vec_id) AS cr
             FROM cand0)
           WHERE cr <= 8),
         sums AS (
           SELECT c.label, c.ia,
                  sum(floor(
                    list_aggregate(list_transform(list_zip(c.xa, b.x),
                      z -> z[1] * z[2]), 'sum')
                    / sqrt(c.na * b.n2) * 1e6 + 0.5)::BIGINT)
                    ::BIGINT AS sum_cos_micro,
                  count(*)::BIGINT AS n_others
           FROM cands c JOIN normed b
             ON c.label = b.label AND c.ia <> b.vec_id
           GROUP BY c.label, c.ia),
         ranked AS (
           SELECT *, row_number() OVER (PARTITION BY label
                    ORDER BY sum_cos_micro DESC, ia) AS rn
           FROM sums)
         SELECT label::BIGINT AS label, ia AS medoid_vec_id,
                sum_cos_micro, (n_others + 1)::BIGINT AS n_members
         FROM ranked WHERE rn = 1 ORDER BY label"""
  )
}
