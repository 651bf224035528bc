package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch Q (q445-q447):
  *
  *  - q445: functional-graph cycle core via binary lifting — f^1024 by
  *    10 compose-with-self joins (log-step, each a dimension-sized
  *    hash join), where the image of f^1024 is exactly the cyclic-node
  *    set once every tail is shorter than 1024. The iterative-peel
  *    alternative is O(longest tail) rounds; lifting is O(log) — the
  *    scale-correct shape for dependency/workflow cycle audits.
  *  - q446: water-filling (capped proportional) budget allocation —
  *    the closed-form level: sort demands ascending, find the break
  *    point where level*(remaining) exhausts the budget; everything
  *    below keeps its demand, everything above is capped at the level.
  *  - q447: tokenizer fertility by language — tokens/1k-chars and
  *    bytes/token in ppm from the repo's BPE-ish regex split (the
  *    per-language cost metric a multilingual-corpus owner tracks).
  *
  * Graph nodes / demand rows are dimension-sized; the only corpus
  * stage (q447) is one scan + one keyed aggregate.
  */
object Round9Graphs {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    // Successor function over part keys: the Pollard-rho map
    // f(u) = (u^2 + 1) % n over rank space 0..n-1 — non-invertible, so
    // the functional graph has real tails (expected O(sqrt n), far
    // under 1024 at every fixture scale); cyclic nodes = image of
    // f^1024 provided tails are < 1024 (asserted in the spec via image
    // stability: image(f^1024) == image(f^2048)). An affine map would
    // be a permutation (gcd trick) and everything would be "cyclic".
    "q445_cycle_core" -> ((s, d) => {
      val keys = t(s, d, "part").select(col("p_partkey"))
      val n = keys.count() // dimension-sized driver scalar
      // normalize keys into rank space first so f is total
      val wR = Window.orderBy(col("p_partkey")) // dimension-sized
      val ranked = graft.Stage(keys
        .withColumn("u", row_number().over(wR).cast("long") - 1)
        .select(col("u")), "q445_nodes")
      val f = ranked.select(col("u"), ((col("u") * col("u") + 1) % n)
        .as("v"))
      // binary lifting: g_{k+1} = g_k ∘ g_k  (10 steps -> f^1024)
      val g1024 = (1 to 10).foldLeft(f) { (g, _) =>
        val hop = g.select(col("u").as("m"), col("v").as("w"))
        graft.Stage(g.join(hop, g("v") === hop("m"))
          .select(col("u"), col("w").as("v")), "q445_lift")
      }
      val cyc = g1024.select(col("v")).distinct()
      cyc.agg(count(lit(1)).as("n_cyclic"),
          sum(col("v")).as("cyclic_id_sum"))
        .crossJoin(broadcast(
          ranked.agg(count(lit(1)).as("n_nodes"))))
        .select(col("n_nodes"), col("n_cyclic"),
          (col("n_nodes") - col("n_cyclic")).as("n_acyclic"),
          col("cyclic_id_sum"))
    }),

    // Demands = positive supplier balances (cents); budget = half of
    // total demand. Ascending-demand prefix sums give the unique break
    // index j where level = (B - prefix_j) DIV (n - j) fits between
    // d_j and d_{j+1}; allocation = min(d_i, level).
    "q446_waterfill_allocation" -> ((s, d) => {
      val dem = t(s, d, "supplier")
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"),
          floor(col("s_acctbal") * 100).cast("long").as("dd"))
        // dd >= 1: a zero demand would hit the one numerator where
        // Spark's truncating DIV and DuckDB's flooring // disagree
        .filter(col("dd") > 0)
      val wOrd = Window.orderBy(col("dd"), col("s_suppkey"))
      val ranked = graft.Stage(dem // dimension-sized window
        .withColumn("rk", row_number().over(wOrd).cast("long"))
        .withColumn("prefix", sum(col("dd")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))),
        "q446_ranked")
      val tot = ranked.agg(max(col("prefix")).as("td"),
        max(col("rk")).as("n"))
      // level candidate after position j (0..n-1 uncapped below):
      // lvl_j = (B - prefix_j) DIV (n - j); valid iff d_j <= lvl_j
      // (and d_{j+1} > lvl_j for the break, enforced by taking the
      // LAST valid j). j = 0 row (nothing uncapped) handled by the
      // union'd sentinel.
      // j = 0 sentinel (nothing below the level) so a budget under the
      // smallest demand still resolves: dd = -1 passes the dd <= lvl
      // validity check for any non-negative level
      val withSentinel = ranked
        .select(col("dd"), col("rk"), col("prefix"))
        .unionByName(ranked.sparkSession.range(1).toDF("z")
          .select(lit(-1L).as("dd"), lit(0L).as("rk"),
            lit(0L).as("prefix")))
      val cand = withSentinel.crossJoin(broadcast(tot))
        .withColumn("b", expr("td DIV 2"))
        .filter(col("rk") < col("n"))
        .withColumn("lvl", expr("(b - prefix) DIV (n - rk)"))
        .filter(col("dd") <= col("lvl"))
        .orderBy(col("rk").desc).limit(1)
        .select(col("rk").as("j"), col("lvl"), col("b"), col("n"))
      ranked.crossJoin(broadcast(cand))
        .select(col("dd"), col("rk"), col("lvl"), col("b"), col("n"),
          least(col("dd"), col("lvl")).as("alloc"))
        .agg(max(col("n")).as("n_demands"),
          max(col("b")).as("budget_cents"),
          max(col("lvl")).as("level_cents"),
          sum(when(col("dd") <= col("lvl"), 1L).otherwise(0L))
            .as("n_uncapped"),
          sum(when(col("dd") > col("lvl"), 1L).otherwise(0L))
            .as("n_capped"),
          sum(col("alloc")).as("allocated_cents"))
    }),

    // Fertility per language over the documents corpus: whitespace+
    // punctuation regex token split; tokens per 1000 chars and bytes
    // per token (ppm) — one scan, one keyed aggregate.
    "q447_token_fertility" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("lang"),
        length(col("text")).as("chars"),
        octet_length(col("text")).as("bytes"),
        size(filter(split(col("text"), "[\\s\\p{Punct}]+"),
          x => length(x) > 0)).cast("long").as("tokens"))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).as("n_chars"),
          sum(col("bytes")).as("n_bytes"),
          sum(col("tokens")).as("n_tokens"))
        .withColumn("tokens_per_kchar_ppm",
          expr("1000000000 * n_tokens DIV n_chars DIV 1000"))
        .withColumn("bytes_per_token_ppm",
          expr("1000000 * n_bytes DIV n_tokens"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q445_cycle_core" -> {
      // same binary lifting, unrolled: g1 = f∘f, ..., g10 = f^1024
      val lifts = (1 to 10).map { k =>
        val prev = if (k == 1) "f" else s"g${k - 1}"
        s"g$k AS (SELECT a.u, b.v FROM $prev a JOIN $prev b ON a.v = b.u)"
      }.mkString(",\n         ")
      s"""WITH nodes AS (
           SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS u
           FROM part),
         n AS (SELECT count(*)::BIGINT AS n FROM nodes),
         f AS (SELECT u, (u * u + 1) % (SELECT n FROM n) AS v
               FROM nodes),
         $lifts,
         cyc AS (SELECT DISTINCT v FROM g10)
         SELECT (SELECT n FROM n) AS n_nodes,
                count(*)::BIGINT AS n_cyclic,
                ((SELECT n FROM n) - count(*))::BIGINT AS n_acyclic,
                sum(v)::BIGINT AS cyclic_id_sum
         FROM cyc"""
    },

    "q446_waterfill_allocation" ->
      """WITH dem AS (
           SELECT s_suppkey, floor(s_acctbal * 100)::BIGINT AS dd
           FROM supplier WHERE s_acctbal > 0
             AND floor(s_acctbal * 100) > 0),
         ranked AS (
           SELECT dd,
                  row_number() OVER (ORDER BY dd, s_suppkey)::BIGINT
                    AS rk,
                  sum(dd) OVER (ORDER BY dd, s_suppkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    ::BIGINT AS prefix
           FROM dem),
         tot AS (SELECT max(prefix)::BIGINT AS td,
                        max(rk)::BIGINT AS n FROM ranked),
         with_sentinel AS (
           SELECT dd, rk, prefix FROM ranked
           UNION ALL SELECT -1, 0, 0),
         cand AS (
           SELECT rk AS j, (td // 2 - prefix) // (n - rk) AS lvl,
                  td // 2 AS b, n
           FROM with_sentinel CROSS JOIN tot
           WHERE rk < n AND dd <= (td // 2 - prefix) // (n - rk)
           ORDER BY rk DESC LIMIT 1)
         SELECT (SELECT n FROM cand) AS n_demands,
                (SELECT b FROM cand) AS budget_cents,
                (SELECT lvl FROM cand) AS level_cents,
                sum(CASE WHEN dd <= (SELECT lvl FROM cand) THEN 1
                    ELSE 0 END)::BIGINT AS n_uncapped,
                sum(CASE WHEN dd > (SELECT lvl FROM cand) THEN 1
                    ELSE 0 END)::BIGINT AS n_capped,
                sum(least(dd, (SELECT lvl FROM cand)))::BIGINT
                  AS allocated_cents
         FROM ranked""",

    "q447_token_fertility" ->
      """WITH docs AS (
           SELECT lang, length(text)::BIGINT AS chars,
                  octet_length(encode(text))::BIGINT AS bytes,
                  len(list_filter(
                    string_split_regex(text, '[\s[:punct:]]+'),
                    x -> length(x) > 0))::BIGINT AS tokens
           FROM documents)
         SELECT lang, count(*)::BIGINT AS n_docs,
                sum(chars)::BIGINT AS n_chars,
                sum(bytes)::BIGINT AS n_bytes,
                sum(tokens)::BIGINT AS n_tokens,
                (((1000000000 * sum(tokens)) // sum(chars)) // 1000)
                  ::BIGINT AS tokens_per_kchar_ppm,
                ((1000000 * sum(bytes)) // sum(tokens))::BIGINT
                  AS bytes_per_token_ppm
         FROM docs GROUP BY lang ORDER BY lang"""
  )
}
