package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch AA (q475-q477) — econometrics + attribution:
  *
  *  - q475: log-log price elasticity per brand — OLS slope of
  *    ln(quantity) on ln(unit price) from exact closed-form sums
  *    (the econ twin of q469's rolling OLS; one keyed aggregate).
  *  - q476: iterative proportional fitting (raking) — reweight the
  *    (event_type x hour) cell table so both margins match uniform
  *    targets, two full row/column sweeps. The corpus stage is one
  *    cell aggregate; every IPF sweep is arithmetic on the bounded
  *    120-cell table (survey/mixture reweighting for training-data
  *    pipelines).
  *  - q477: EXACT Shapley value attribution over 4 marketing
  *    channels (view/click/signup/error -> purchase conversion).
  *    Users collapse to one of 16 touch patterns; the coalition
  *    value v(S) = conversions reachable with channels ⊆ S is a
  *    16-row zeta transform; Shapley weights s!(3-s)! keep the
  *    whole computation in exact integers (phi x 24). Efficiency
  *    (sum phi = v(full) − v(empty)) is pinned in the spec.
  */
object Round9Econ {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q475_price_elasticity" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity") > 0)
        .select(col("p_brand").as("brand"),
          log(col("l_extendedprice") / col("l_quantity")).as("x"),
          log(col("l_quantity").cast("double")).as("y"))
      li.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .filter(col("n") >= 10)
        .select(col("brand"), col("n"),
          floor(lit(1000.0) *
            (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
            .cast("long").as("elasticity_milli"))
        .orderBy(col("brand"))
    }),

    "q476_ipf_raking" -> ((s, d) => {
      val cells = t(s, d, "events")
        .groupBy(col("event_type"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("total"),
        countDistinct(col("event_type")).as("nt"),
        countDistinct(col("hr")).as("nh"))
      // uniform targets: every row margin total/nt, col margin total/nh
      var w = cells.crossJoin(broadcast(tot))
        .withColumn("w", lit(1.0))
      for (_ <- 1 to 2) {
        // row sweep: scale each event_type so its weighted mass hits
        // the row target (bounded window over the 120-cell table)
        val rowSum = w.groupBy(col("event_type").as("rt"))
          .agg(sum(col("w") * col("n")).as("rmass"))
        w = w.join(broadcast(rowSum), col("event_type") === col("rt"))
          .withColumn("w", col("w") *
            (col("total") / col("nt")) / col("rmass"))
          .drop("rt", "rmass")
        val colSum = w.groupBy(col("hr").as("ch"))
          .agg(sum(col("w") * col("n")).as("cmass"))
        w = w.join(broadcast(colSum), col("hr") === col("ch"))
          .withColumn("w", col("w") *
            (col("total") / col("nh")) / col("cmass"))
          .drop("ch", "cmass")
      }
      // report per-type margin error after the sweeps
      w.groupBy(col("event_type"))
        .agg(sum(col("n")).as("raw_n"),
          floor(sum(col("w") * col("n")) * 1000).cast("long")
            .as("raked_mass_milli"),
          floor(max(col("w")) * 1000000).cast("long")
            .as("max_weight_micro"),
          floor(min(col("w")) * 1000000).cast("long")
            .as("min_weight_micro"))
        .orderBy(col("event_type"))
    }),

    "q477_shapley_attribution" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // per-user touch pattern over the 4 channels + conversion flag
      val users = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          (max(when(col("event_type") === "view", 1L).otherwise(0L)) +
           max(when(col("event_type") === "click", 2L).otherwise(0L)) +
           max(when(col("event_type") === "signup", 4L).otherwise(0L)) +
           max(when(col("event_type") === "error", 8L).otherwise(0L)))
            .as("pattern"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val pat = users.groupBy(col("pattern"))
        .agg(sum(col("conv")).as("convs"))
      // v(S) = conversions among users whose pattern ⊆ S
      val subsets = (0L until 16L).toDF("s")
      val v = subsets.join(pat,
          (col("pattern").bitwiseAND(col("s"))) === col("pattern"),
          "left")
        .groupBy(col("s")).agg(coalesce(sum(col("convs")), lit(0L))
          .as("v"))
      // Shapley x 24 (exact): for channel i, sum over S w/o i of
      // s!(3-s)! * (v(S+i) - v(S)); weights {6,2,2,6} for |S|=0..3
      val channels = Seq((1L, "view"), (2L, "click"), (4L, "signup"),
        (8L, "error")).toDF("bit", "channel")
      val vS = v.select(col("s").as("s0"), col("v").as("v0"))
      val vSi = v.select(col("s").as("s1"), col("v").as("v1"))
      channels.crossJoin(vS)
        .filter((col("s0").bitwiseAND(col("bit"))) === 0L)
        .join(vSi, col("s1") === col("s0") + col("bit"))
        .withColumn("popc", (col("s0").bitwiseAND(lit(1L))) +
          shiftright(col("s0").bitwiseAND(lit(2L)), 1) +
          shiftright(col("s0").bitwiseAND(lit(4L)), 2) +
          shiftright(col("s0").bitwiseAND(lit(8L)), 3))
        .withColumn("wgt", when(col("popc") === 0L, 6L)
          .when(col("popc") === 3L, 6L).otherwise(2L))
        .groupBy(col("channel"))
        .agg(sum(col("wgt") * (col("v1") - col("v0")))
          .as("shapley_x24"))
        .orderBy(col("shapley_x24").desc, col("channel"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q475_price_elasticity" ->
      """WITH li AS (
           SELECT p_brand AS brand,
                  ln(l_extendedprice / l_quantity) AS x,
                  ln(CAST(l_quantity AS DOUBLE)) AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_quantity > 0),
         agg AS (
           SELECT brand, count(*)::BIGINT AS n,
                  sum(x) AS sx, sum(y) AS sy,
                  sum(x * y) AS sxy, sum(x * x) AS sxx
           FROM li GROUP BY brand)
         SELECT brand, n,
                floor(1000.0 * (n * sxy - sx * sy)
                  / (n * sxx - sx * sx))::BIGINT AS elasticity_milli
         FROM agg WHERE n >= 10
         ORDER BY brand""",

    "q476_ipf_raking" ->
      """WITH cells AS (
           SELECT event_type,
                  extract(hour FROM ts::TIMESTAMP)::BIGINT AS hr,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT sum(n) AS total,
                  count(DISTINCT event_type)::BIGINT AS nt,
                  count(DISTINCT hr)::BIGINT AS nh
           FROM cells),
         w0 AS (SELECT event_type, hr, n, 1.0 AS w FROM cells),
         r1 AS (
           SELECT w0.event_type, hr, n,
                  w * ((SELECT total FROM tot)
                       / (SELECT nt FROM tot)) / rmass AS w
           FROM w0 JOIN (SELECT event_type,
                                sum(w * n) AS rmass
                         FROM w0 GROUP BY event_type) rs
             ON w0.event_type = rs.event_type),
         c1 AS (
           SELECT event_type, r1.hr, n,
                  w * ((SELECT total FROM tot)
                       / (SELECT nh FROM tot)) / cmass AS w
           FROM r1 JOIN (SELECT hr, sum(w * n) AS cmass
                         FROM r1 GROUP BY hr) cs
             ON r1.hr = cs.hr),
         r2 AS (
           SELECT c1.event_type, hr, n,
                  w * ((SELECT total FROM tot)
                       / (SELECT nt FROM tot)) / rmass AS w
           FROM c1 JOIN (SELECT event_type,
                                sum(w * n) AS rmass
                         FROM c1 GROUP BY event_type) rs
             ON c1.event_type = rs.event_type),
         c2 AS (
           SELECT event_type, r2.hr, n,
                  w * ((SELECT total FROM tot)
                       / (SELECT nh FROM tot)) / cmass AS w
           FROM r2 JOIN (SELECT hr, sum(w * n) AS cmass
                         FROM r2 GROUP BY hr) cs
             ON r2.hr = cs.hr)
         SELECT event_type, sum(n)::BIGINT AS raw_n,
                floor(sum(w * n) * 1000)::BIGINT AS raked_mass_milli,
                floor(max(w) * 1000000)::BIGINT AS max_weight_micro,
                floor(min(w) * 1000000)::BIGINT AS min_weight_micro
         FROM c2 GROUP BY event_type
         ORDER BY event_type""",

    "q477_shapley_attribution" ->
      """WITH users AS (
           SELECT user_id,
                  (max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   + max(CASE WHEN event_type = 'click' THEN 2
                         ELSE 0 END)
                   + max(CASE WHEN event_type = 'signup' THEN 4
                         ELSE 0 END)
                   + max(CASE WHEN event_type = 'error' THEN 8
                         ELSE 0 END))::BIGINT AS pattern,
                  max(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END)::BIGINT AS conv
           FROM events GROUP BY user_id),
         pat AS (
           SELECT pattern, sum(conv)::BIGINT AS convs
           FROM users GROUP BY pattern),
         subsets AS (SELECT unnest(generate_series(0, 15))::BIGINT AS s),
         v AS (
           SELECT s, coalesce(sum(convs), 0)::BIGINT AS v
           FROM subsets LEFT JOIN pat ON (pattern & s) = pattern
           GROUP BY s),
         channels AS (
           SELECT * FROM (VALUES (1::BIGINT, 'view'),
             (2::BIGINT, 'click'), (4::BIGINT, 'signup'),
             (8::BIGINT, 'error')) t(bit, channel)),
         terms AS (
           SELECT c.channel,
                  ((s0.s & 1) + ((s0.s & 2) >> 1) + ((s0.s & 4) >> 2)
                   + ((s0.s & 8) >> 3)) AS popc,
                  s0.v AS v0, s1.v AS v1
           FROM channels c
           JOIN v s0 ON (s0.s & c.bit) = 0
           JOIN v s1 ON s1.s = s0.s + c.bit)
         SELECT channel,
                sum((CASE WHEN popc = 0 OR popc = 3 THEN 6 ELSE 2 END)
                  * (v1 - v0))::BIGINT AS shapley_x24
         FROM terms
         GROUP BY channel
         ORDER BY shapley_x24 DESC, channel"""
  )
}
