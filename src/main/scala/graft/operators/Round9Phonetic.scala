package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch BB (q556-q558) — phonetic blocking, forecast
  * backtesting, and k-hop centrality (public algorithms: American
  * Soundex [Russell 1918, the simplified textbook variant], the
  * seasonal-naive benchmark forecast [Hyndman-Athanasopoulos, FPP],
  * and harmonic/closeness centrality [Boldi-Vigna 2014]; reference
  * surface: the string-function family and graph UDTFs).
  *
  *  - q556: Soundex codes for part-name first words, computed as a
  *    pure translate/regex expression pipeline (identical algorithm
  *    in both engines: map consonant classes to digits, collapse
  *    runs, drop vowels, pad to 4) — then the record-linkage blocking
  *    readout: block sizes and candidate pair counts per code. One
  *    aggregation; codes are a bounded domain (≤ 26·7³).
  *  - q557: seasonal-naive backtest — forecast(d) = actual(d−7) via
  *    a self-join on the day grain, scored with MAE (milli), MAPE and
  *    sMAPE (per-day integer-floored ratios in ppm, then averaged —
  *    no float aggregation).
  *  - q558: 4-hop harmonic + closeness centrality on the category
  *    co-occurrence graph (edges = the 300 heaviest pairs — a
  *    scale-independent density), distances by 3 bounded min-plus
  *    rounds over the ≤|items|² distance table. Harmonic sums
  *    floor(1000/d); k-hop truncation is explicit in the operator
  *    contract (Boldi-Vigna's HyperBall approximates exactly this at
  *    web scale).
  */
object Round9Phonetic {

  type Q = (SparkSession, String) => DataFrame

  /** Soundex steps shared text: translate map (A-Z →
    * 01230120022455012623010202). */
  private val sdxFrom = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val sdxTo = "01230120022455012623010202"

  val queries: Seq[(String, Q)] = Seq(

    "q556_soundex_blocking" -> ((s, d) => {
      val words = t(s, d, "part")
        .select(upper(regexp_extract(col("p_name"),
          "^([A-Za-z]+)", 1)).as("w"))
        .filter(col("w") =!= "")
      val coded = words
        .withColumn("t1", translate(col("w"), sdxFrom, sdxTo))
        // collapse adjacent duplicate codes (vowel codes 0 included,
        // so vowels separate consonant runs — the textbook variant).
        // One replace per digit: DuckDB's RE2 has no backreferences,
        // so the oracle must collapse the same backref-free way.
        .withColumn("t2", (0 to 6).foldLeft(col("t1")) { (c, k) =>
          regexp_replace(c, s"$k$k+", s"$k")
        })
        .withColumn("body",
          regexp_replace(expr("substring(t2, 2)"), "0", ""))
        .select(col("w"),
          concat(expr("substring(w, 1, 1)"),
            expr("substring(concat(body, '000'), 1, 3)"))
            .as("code"))
      val blocks = coded.groupBy(col("code"))
        .agg(count(lit(1)).as("n_names"),
          countDistinct(col("w")).as("n_distinct"))
        .withColumn("n_pairs",
          expr("n_names * (n_names - 1) DIV 2"))
      val wAll = Window.orderBy(col("n_names").desc, col("code"))
      blocks.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 15)
        .select(col("code"), col("n_names"), col("n_distinct"),
          col("n_pairs"), col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    }),

    "q557_seasonal_naive_backtest" -> ((s, d) => {
      val daily = graft.Stage(t(s, d, "events")
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("vm")).as("a")), "q557_daily")
      val f = daily.select(col("event_type"),
        (col("day") + 7L).as("day"), col("a").as("fc"))
      daily.join(f, Seq("event_type", "day"))
        .select(col("event_type"),
          abs(col("a") - col("fc")).as("ae"),
          expr("abs(a - fc) * 1000000 DIV greatest(abs(a), 1)")
            .as("ape_ppm"),
          expr("""abs(a - fc) * 2000000
                  DIV greatest(abs(a) + abs(fc), 1)""").as("sape_ppm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_scored"),
          expr("sum(ae) DIV count(*)").as("mae_milli"),
          expr("sum(ape_ppm) DIV count(*)").as("mape_ppm"),
          expr("sum(sape_ppm) DIV count(*)").as("smape_ppm"))
        .orderBy(col("event_type"))
    }),

    "q558_khop_centrality" -> ((s, d) => {
      val basket = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"),
          (col("l_partkey") % 100).cast("long").as("item"))
        .distinct()
      val up = basket.as("a").join(basket.as("b"),
          col("a.ok") === col("b.ok")
            && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("i"), col("b.item").as("j"))
        .agg(count(lit(1)).as("c"))
      // scale-independent edge rule: the 300 heaviest pairs (a
      // relative threshold degenerates under binomial concentration —
      // 1.2× mean keeps 990 edges at sf0.001 but only 9 at sf0.1).
      // The rank window runs on the ≤|items|² pair table.
      val wP = Window.orderBy(col("c").desc, col("i"), col("j"))
      val strong = up.withColumn("pr", row_number().over(wP))
        .filter(col("pr") <= 300)
        .select(col("i"), col("j"))
      val edges = graft.Stage(strong.unionByName(
        strong.select(col("j").as("i"), col("i").as("j"))),
        "q558_edges")
      var dist = edges.select(col("i").as("u"), col("j").as("v"),
        lit(1L).as("dd"))
      for (_ <- 1 to 3) { // 3 relaxations → exact distances ≤ 4 hops
        val ext = dist
          .join(edges.select(col("i").as("v"), col("j").as("w")),
            Seq("v"))
          .filter(col("u") =!= col("w"))
          .select(col("u"), col("w").as("v"),
            (col("dd") + 1L).as("dd"))
        dist = dist.unionByName(ext)
          .groupBy(col("u"), col("v"))
          .agg(min(col("dd")).as("dd"))
      }
      val cent = dist.groupBy(col("u").as("item"))
        .agg(count(lit(1)).as("n_reach4"),
          sum(col("dd")).as("sum_dist4"),
          sum(expr("1000 DIV dd")).as("harmonic_milli"))
        .withColumn("closeness_micro",
          expr("n_reach4 * 1000000 DIV greatest(sum_dist4, 1)"))
      val wAll = Window.orderBy(col("harmonic_milli").desc,
        col("item"))
      cent.withColumn("rk", row_number().over(wAll))
        .filter(col("rk") <= 15)
        .select(col("item"), col("n_reach4"), col("sum_dist4"),
          col("harmonic_milli"), col("closeness_micro"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("rk"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q556_soundex_blocking" ->
      s"""WITH words AS (
           SELECT upper(regexp_extract(p_name, '^([A-Za-z]+)', 1))
                    AS w
           FROM part
           WHERE regexp_extract(p_name, '^([A-Za-z]+)', 1) <> ''),
         coded AS (
           SELECT w,
                  substring(w, 1, 1) ||
                  substring(
                    regexp_replace(
                      substring(
                        ${(0 to 6).foldLeft(
                          s"translate(w, '$sdxFrom', '$sdxTo')") {
                          (e, k) =>
                            s"regexp_replace($e, '$k$k+', '$k', 'g')"
                        }},
                        2),
                      '0', '', 'g') || '000',
                    1, 3) AS code
           FROM words),
         blocks AS (
           SELECT code, count(*)::BIGINT AS n_names,
                  count(DISTINCT w)::BIGINT AS n_distinct,
                  (count(*) * (count(*) - 1) // 2)::BIGINT AS n_pairs
           FROM coded GROUP BY code),
         ranked AS (
           SELECT *, row_number() OVER (ORDER BY n_names DESC, code)
                    AS rk
           FROM blocks)
         SELECT code, n_names, n_distinct, n_pairs, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 15 ORDER BY rk""",

    "q557_seasonal_naive_backtest" ->
      """WITH daily AS (
           SELECT event_type,
                  floor(epoch(ts::TIMESTAMP) / 86400)::BIGINT AS day,
                  sum(floor(value * 1000)::BIGINT)::BIGINT AS a
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT d.event_type,
                  abs(d.a - f.a)::BIGINT AS ae,
                  (abs(d.a - f.a) * 1000000
                    // greatest(abs(d.a), 1))::BIGINT AS ape_ppm,
                  (abs(d.a - f.a) * 2000000
                    // greatest(abs(d.a) + abs(f.a), 1))::BIGINT
                    AS sape_ppm
           FROM daily d JOIN daily f
             ON d.event_type = f.event_type AND d.day = f.day + 7)
         SELECT event_type, count(*)::BIGINT AS n_scored,
                (sum(ae) // count(*))::BIGINT AS mae_milli,
                (sum(ape_ppm) // count(*))::BIGINT AS mape_ppm,
                (sum(sape_ppm) // count(*))::BIGINT AS smape_ppm
         FROM scored GROUP BY event_type ORDER BY event_type""",

    "q558_khop_centrality" ->
      """WITH basket AS (
           SELECT DISTINCT l_orderkey AS ok,
                  (l_partkey % 100)::BIGINT AS item
           FROM lineitem),
         up AS (
           SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS c
           FROM basket a JOIN basket b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY 1, 2),
         strong AS (
           SELECT i, j FROM (
             SELECT i, j, row_number() OVER (ORDER BY c DESC, i, j)
                      AS pr
             FROM up)
           WHERE pr <= 300),
         edges AS (
           SELECT i, j FROM strong
           UNION ALL SELECT j, i FROM strong),
         d1 AS (
           SELECT i AS u, j AS v, 1::BIGINT AS dd FROM edges),
         d2 AS (
           SELECT u, v, min(dd)::BIGINT AS dd FROM (
             SELECT u, v, dd FROM d1
             UNION ALL
             SELECT d.u, e.j AS v, d.dd + 1
             FROM d1 d JOIN edges e ON d.v = e.i WHERE d.u <> e.j)
           GROUP BY u, v),
         d3 AS (
           SELECT u, v, min(dd)::BIGINT AS dd FROM (
             SELECT u, v, dd FROM d2
             UNION ALL
             SELECT d.u, e.j AS v, d.dd + 1
             FROM d2 d JOIN edges e ON d.v = e.i WHERE d.u <> e.j)
           GROUP BY u, v),
         d4 AS (
           SELECT u, v, min(dd)::BIGINT AS dd FROM (
             SELECT u, v, dd FROM d3
             UNION ALL
             SELECT d.u, e.j AS v, d.dd + 1
             FROM d3 d JOIN edges e ON d.v = e.i WHERE d.u <> e.j)
           GROUP BY u, v),
         cent AS (
           SELECT u AS item, count(*)::BIGINT AS n_reach4,
                  sum(dd)::BIGINT AS sum_dist4,
                  sum(1000 // dd)::BIGINT AS harmonic_milli
           FROM d4 GROUP BY u),
         ranked AS (
           SELECT *, (n_reach4 * 1000000
                      // greatest(sum_dist4, 1))::BIGINT
                    AS closeness_micro,
                  row_number() OVER (ORDER BY harmonic_milli DESC,
                    item) AS rk
           FROM cent)
         SELECT item, n_reach4, sum_dist4, harmonic_milli,
                closeness_micro, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 15 ORDER BY rk"""
  )
}
