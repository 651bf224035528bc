package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AR (q526-q528) — sequential experiment monitoring,
  * panel causal inference, and chain steady states:
  *
  *  - q526: O'Brien-Fleming group-sequential monitoring — the
  *    standard "peek 4 times without inflating alpha" design
  *    (complements q384's SPRT): cumulative two-sample z at each
  *    weekly look against the K=4 OBF two-sided boundaries
  *    {4.333, 2.963, 2.359, 2.014}. All moments exact integer cents
  *    (squares DECIMAL-lifted); one 4-row look grain.
  *  - q527: difference-in-differences — treated vs control supplier
  *    nations across the shipdate-span midpoint, with the
  *    parallel-trends PRE-period slope gap that validates the
  *    design (exact per-group OLS on week-grain revenue). The
  *    panel-data workhorse missing from the q434/q481 causal family.
  *  - q528: stationary distribution of the event-type Markov chain
  *    by synchronous power iteration (8 rounds, each round's vector
  *    rounded to 1e-12 like q497 so engine sum order cannot drift) —
  *    the steady-state companion to q497's absorption probabilities.
  *    The state vector is type-vocab-sized; every join broadcasts.
  */
object Round9Sequential {

  type Q = (SparkSession, String) => DataFrame

  private val OBF = Seq(4.333, 2.963, 2.359, 2.014)

  val queries: Seq[(String, Q)] = Seq(

    "q526_obrien_fleming" -> ((s, d) => {
      val base = graft.Stage(t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"),
          expr("floor(unix_timestamp(ts) / 86400) DIV 7").as("wk"),
          floor(col("value") * 100).cast("long").as("cents")),
        "q526_base")
      val w0 = base.agg(min(col("wk")).as("w0"))
      val looks = (1 to 4).map { look =>
        base.crossJoin(broadcast(w0))
          .filter(col("wk") - col("w0") < look)
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s1"),
            sum(col("cents").cast("decimal(38,0)") * col("cents"))
              .as("s2"))
          .groupBy()
          .agg(
            sum(when(col("arm") === 0, col("n"))).as("n_a"),
            sum(when(col("arm") === 1, col("n"))).as("n_b"),
            sum(when(col("arm") === 0, col("s1"))).as("sa"),
            sum(when(col("arm") === 1, col("s1"))).as("sb"),
            sum(when(col("arm") === 0, col("s2"))).as("qa"),
            sum(when(col("arm") === 1, col("s2"))).as("qb"))
          .withColumn("look", lit(look.toLong))
          .withColumn("boundary_milli",
            lit((OBF(look - 1) * 1000).toLong))
      }
      looks.reduce(_ unionByName _)
        .withColumn("ma", col("sa").cast("double") / col("n_a"))
        .withColumn("mb", col("sb").cast("double") / col("n_b"))
        .withColumn("va",
          (col("qa").cast("double") - col("n_a") * col("ma") * col("ma"))
            / (col("n_a") - 1))
        .withColumn("vb",
          (col("qb").cast("double") - col("n_b") * col("mb") * col("mb"))
            / (col("n_b") - 1))
        .withColumn("z", (col("mb") - col("ma"))
          / sqrt(col("va") / col("n_a") + col("vb") / col("n_b")))
        .select(col("look"), col("n_a"), col("n_b"),
          floor(col("z") * 1000).cast("long").as("z_milli"),
          col("boundary_milli"),
          when(abs(col("z")) * 1000 >= col("boundary_milli"), 1L)
            .otherwise(0L).as("crossed"))
        .orderBy(col("look"))
    }),

    "q527_did_estimator" -> ((s, d) => {
      val base = graft.Stage(t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"),
            col("s_nationkey").cast("long").as("nation"))),
          Seq("l_suppkey"))
        .select(
          when(col("nation") < 12, 1L).otherwise(0L).as("treated"),
          floor(unix_timestamp(col("l_shipdate")) / 86400L)
            .cast("long").as("day"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents")),
        "q527_base")
      val span = base.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"))
        .withColumn("mid", expr("d0 + (d1 - d0 + 1) DIV 2"))
      val marked = base.crossJoin(broadcast(span))
        .withColumn("post", (col("day") >= col("mid")).cast("long"))
        .withColumn("wk", expr("(day - d0) DIV 7"))
      val cells = marked.groupBy(col("treated"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .withColumn("mean_cents", col("s").cast("double") / col("n"))
      val did = cells.groupBy()
        .agg(
          sum(when(col("treated") === 1 && col("post") === 1,
            col("mean_cents"))).as("t_post"),
          sum(when(col("treated") === 1 && col("post") === 0,
            col("mean_cents"))).as("t_pre"),
          sum(when(col("treated") === 0 && col("post") === 1,
            col("mean_cents"))).as("c_post"),
          sum(when(col("treated") === 0 && col("post") === 0,
            col("mean_cents"))).as("c_pre"),
          sum(col("n")).as("n_rows"))
      // pre-trend slope per group over week-grain revenue
      val pre = marked.filter(col("post") === 0)
        .groupBy(col("treated"), col("wk"))
        .agg(sum(col("cents")).as("rev"))
        .groupBy(col("treated"))
        .agg(count(lit(1)).as("nw"), sum(col("wk")).as("sw"),
          sum(col("rev")).as("sr"),
          sum(col("wk").cast("decimal(38,0)") * col("rev")).as("swr"),
          sum(col("wk").cast("decimal(38,0)") * col("wk")).as("sww"))
        .withColumn("slope",
          (col("nw").cast("decimal(38,0)") * col("swr")
            - col("sw").cast("decimal(38,0)") * col("sr")).cast("double")
            / (col("nw").cast("decimal(38,0)") * col("sww")
              - col("sw").cast("decimal(38,0)") * col("sw"))
              .cast("double"))
      val slopes = pre.groupBy()
        .agg(sum(when(col("treated") === 1, col("slope"))).as("st"),
          sum(when(col("treated") === 0, col("slope"))).as("sc"))
      did.crossJoin(slopes)
        .select(col("n_rows"),
          floor(col("t_pre")).cast("long").as("t_pre_cents"),
          floor(col("t_post")).cast("long").as("t_post_cents"),
          floor(col("c_pre")).cast("long").as("c_pre_cents"),
          floor(col("c_post")).cast("long").as("c_post_cents"),
          floor((col("t_post") - col("t_pre"))
            - (col("c_post") - col("c_pre"))).cast("long")
            .as("did_cents"),
          floor((col("st") - col("sc")) * 1000).cast("long")
            .as("pretrend_gap_milli"))
    }),

    "q528_markov_stationary" -> ((s, d) => {
      val wU = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(wU))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      val totals = trans.groupBy(col("src"))
        .agg(sum(col("cnt")).as("tot"))
      val p = trans.join(broadcast(totals), Seq("src"))
        .withColumn("prob", col("cnt").cast("double") / col("tot"))
        .select(col("src"), col("dst"), col("prob"))
      val states = p.select(col("src").as("state")).distinct()
      val k = states.count() // vocab-bounded (5 event types)
      var vec = states.withColumn("pv", lit(1.0) / k.toDouble)
      for (_ <- 1 to 8) {
        vec = p.join(broadcast(vec), p("src") === vec("state"))
          .groupBy(col("dst"))
          .agg(round(sum(col("prob") * col("pv")), 12).as("pv"))
          .select(col("dst").as("state"), col("pv"))
      }
      vec.join(broadcast(totals.withColumnRenamed("src", "state")),
          Seq("state"))
        .select(col("state"), col("tot").as("n_out_transitions"),
          floor(col("pv") * 1e6).cast("long").as("pi_ppm"))
        .orderBy(col("state"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q526_obrien_fleming" -> {
      val looks = (1 to 4).map { look =>
        s"""SELECT $look::BIGINT AS look,
              ${(OBF(look - 1) * 1000).toLong}::BIGINT
                AS boundary_milli,
              sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
              sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
              sum(CASE WHEN arm = 0 THEN cents END)::BIGINT AS sa,
              sum(CASE WHEN arm = 1 THEN cents END)::BIGINT AS sb,
              sum(CASE WHEN arm = 0 THEN cents::HUGEINT * cents END)
                AS qa,
              sum(CASE WHEN arm = 1 THEN cents::HUGEINT * cents END)
                AS qb
            FROM base, w0 WHERE wk - w0 < $look"""
      }.mkString("(", ")\nUNION ALL\n(", ")")
      s"""WITH base AS (
           SELECT user_id % 2 AS arm,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT // 7
                    AS wk,
                  floor(value * 100)::BIGINT AS cents
           FROM events WHERE event_type = 'purchase'),
         w0 AS (SELECT min(wk) AS w0 FROM base),
         looks AS (
           $looks),
         stats AS (
           SELECT look, boundary_milli, n_a, n_b,
             CAST(sa AS DOUBLE) / n_a AS ma,
             CAST(sb AS DOUBLE) / n_b AS mb,
             (CAST(qa AS DOUBLE) - n_a * (CAST(sa AS DOUBLE) / n_a)
               * (CAST(sa AS DOUBLE) / n_a)) / (n_a - 1) AS va,
             (CAST(qb AS DOUBLE) - n_b * (CAST(sb AS DOUBLE) / n_b)
               * (CAST(sb AS DOUBLE) / n_b)) / (n_b - 1) AS vb
           FROM looks),
         z AS (
           SELECT look, n_a, n_b, boundary_milli,
             (mb - ma) / sqrt(va / n_a + vb / n_b) AS z
           FROM stats)
         SELECT look, n_a, n_b,
                floor(z * 1000)::BIGINT AS z_milli,
                boundary_milli,
                (CASE WHEN abs(z) * 1000 >= boundary_milli THEN 1
                 ELSE 0 END)::BIGINT AS crossed
         FROM z ORDER BY look"""
    },

    "q527_did_estimator" ->
      """WITH base AS (
           SELECT (CASE WHEN s.s_nationkey < 12 THEN 1 ELSE 0 END)
                    AS treated,
                  floor(epoch(l.l_shipdate::TIMESTAMP) / 86400)
                    ::BIGINT AS day,
                  floor(l.l_extendedprice * 100)::BIGINT AS cents
           FROM lineitem l JOIN supplier s
             ON l.l_suppkey = s.s_suppkey),
         span AS (
           SELECT min(day) AS d0,
                  min(day) + (max(day) - min(day) + 1) // 2 AS mid
           FROM base),
         marked AS (
           SELECT b.treated,
                  (CASE WHEN b.day >= s.mid THEN 1 ELSE 0 END)
                    AS post,
                  (b.day - s.d0) // 7 AS wk, b.cents
           FROM base b, span s),
         cells AS (
           SELECT treated, post, count(*)::BIGINT AS n,
                  CAST(sum(cents) AS DOUBLE) / count(*) AS mean_cents
           FROM marked GROUP BY treated, post),
         did AS (
           SELECT
             sum(CASE WHEN treated = 1 AND post = 1
                 THEN mean_cents END) AS t_post,
             sum(CASE WHEN treated = 1 AND post = 0
                 THEN mean_cents END) AS t_pre,
             sum(CASE WHEN treated = 0 AND post = 1
                 THEN mean_cents END) AS c_post,
             sum(CASE WHEN treated = 0 AND post = 0
                 THEN mean_cents END) AS c_pre,
             sum(n)::BIGINT AS n_rows
           FROM cells),
         wkrev AS (
           SELECT treated, wk, sum(cents)::BIGINT AS rev
           FROM marked WHERE post = 0 GROUP BY treated, wk),
         pre AS (
           SELECT treated,
             CAST(count(*)::HUGEINT * sum(wk::HUGEINT * rev)
               - sum(wk)::HUGEINT * sum(rev) AS DOUBLE)
               / CAST(count(*)::HUGEINT * sum(wk::HUGEINT * wk)
                 - sum(wk)::HUGEINT * sum(wk) AS DOUBLE) AS slope
           FROM wkrev GROUP BY treated),
         slopes AS (
           SELECT sum(CASE WHEN treated = 1 THEN slope END) AS st,
                  sum(CASE WHEN treated = 0 THEN slope END) AS sc
           FROM pre)
         SELECT d.n_rows,
                floor(d.t_pre)::BIGINT AS t_pre_cents,
                floor(d.t_post)::BIGINT AS t_post_cents,
                floor(d.c_pre)::BIGINT AS c_pre_cents,
                floor(d.c_post)::BIGINT AS c_post_cents,
                floor((d.t_post - d.t_pre) - (d.c_post - d.c_pre))
                  ::BIGINT AS did_cents,
                floor((s.st - s.sc) * 1000)::BIGINT
                  AS pretrend_gap_milli
         FROM did d, slopes s""",

    "q528_markov_stationary" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS (
           SELECT t.dst AS state,
                  round(sum(t.prob * p.pv), 12) AS pv
           FROM tr t JOIN p${k - 1} p ON t.src = p.state
           GROUP BY t.dst)"""
      }.mkString(",\n         ")
      s"""WITH seq AS (
           SELECT event_type AS src,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts::TIMESTAMP, event_id) AS dst
           FROM events),
         cnts AS (
           SELECT src, dst, count(*)::BIGINT AS cnt
           FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
         tot AS (
           SELECT src, sum(cnt)::BIGINT AS tot FROM cnts GROUP BY src),
         tr AS (
           SELECT c.src, c.dst, CAST(c.cnt AS DOUBLE) / t.tot AS prob
           FROM cnts c JOIN tot t ON c.src = t.src),
         nstates AS (SELECT count(DISTINCT src) AS k FROM tr),
         p0 AS (
           SELECT DISTINCT src AS state, 1.0 / (SELECT k FROM nstates)
             AS pv
           FROM tr),
         $rounds
         SELECT p.state, t.tot AS n_out_transitions,
                floor(p.pv * 1e6)::BIGINT AS pi_ppm
         FROM p8 p JOIN tot t ON p.state = t.src
         ORDER BY p.state"""
    }
  )
}
