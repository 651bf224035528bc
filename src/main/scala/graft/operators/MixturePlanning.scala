package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Training-mix planning operators — the step between corpus curation
  * (q142/q200) and the epoch manifest (q208): select documents INTO a
  * token budget per domain, and construct preference pairs for reward /
  * DPO-style training.
  *
  * Scale notes: q264's only window partitions by lang and its cumsum
  * runs over hash-ordered doc rows — per-domain, never global; at
  * 100 TB the per-domain order key is a write-once sort column and the
  * admission test is a projection against the broadcast budget dim.
  * q265's windows partition by bounded 10-doc groups.
  */
object MixturePlanning {

  type Q = (SparkSession, String) => DataFrame

  private def h60(c: Column): Column = Dedup.hash60(c)

  val queries: Seq[(String, Q)] = Seq(

    // Token-budget mix selection: each language's budget is 30% of its
    // corpus tokens (the budget dim is one tiny per-lang aggregate,
    // broadcast); docs are admitted in deterministic hash-priority
    // order while the running total stays within budget (inclusive
    // rule: a doc is in iff its cumulative total <= budget). The same
    // hash-priority makes the selection engine- and restart-stable —
    // re-planning the mix next week with a grown corpus reselects
    // almost the same documents (priorities don't move, only the
    // budget line does).
    "q264_token_budget_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(filter(split(trim(col("text")), "\\s+"), w => w =!= ""))
            .cast("long").as("n_tok"))
        .withColumn("prio", h60(concat_ws("", lit("mix:"), col("doc_id"))))
      val budgets = docs.groupBy(col("lang"))
        .agg(expr("(sum(n_tok) * 3) div 10").as("budget"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("prio"), col("doc_id"))
      docs.join(broadcast(budgets), Seq("lang"))
        .withColumn("cum", sum(col("n_tok")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum") <= col("budget"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_selected"),
          sum(col("n_tok")).as("tokens_selected"),
          max(col("budget")).as("budget"))
        .withColumn("utilization",
          round(col("tokens_selected") / col("budget"), 4))
    }),

    // Preference-pair construction (reward-model / DPO prep): within
    // each 10-doc group, chosen = highest lexical-diversity score
    // (distinct-token count — an integer, so the gate is float-free),
    // rejected = lowest; ties broken by doc_id; zero-margin groups are
    // dropped (a pair teaches nothing if both sides score equal).
    // One scan + per-group windows over bounded groups.
    "q265_preference_pairs" -> ((s, d) => {
      val scored = t(s, d, "documents")
        .select(expr("doc_id div 10").as("grp"), col("doc_id"),
          size(array_distinct(filter(split(trim(lower(col("text"))),
            "\\s+"), w => w =!= ""))).cast("long").as("score"))
      val wTop = Window.partitionBy(col("grp"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val wBot = Window.partitionBy(col("grp"))
        .orderBy(col("score").asc, col("doc_id").desc)
      scored
        .withColumn("rn_top", row_number().over(wTop))
        .withColumn("rn_bot", row_number().over(wBot))
        .filter(col("rn_top") === 1 || col("rn_bot") === 1)
        .groupBy(col("grp"))
        .agg(
          max(when(col("rn_top") === 1, col("doc_id"))).as("chosen_doc"),
          max(when(col("rn_top") === 1, col("score"))).as("chosen_score"),
          max(when(col("rn_bot") === 1, col("doc_id"))).as("rejected_doc"),
          max(when(col("rn_bot") === 1, col("score"))).as("rejected_score"))
        .withColumn("margin", col("chosen_score") - col("rejected_score"))
        .filter(col("margin") > 0)
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q264_token_budget_mix" ->
      """WITH docs AS (
           SELECT doc_id, lang,
                  len(list_filter(string_split_regex(trim(text), '\s+'),
                    w -> w <> ''))::BIGINT AS n_tok,
                  ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT
                    AS prio
           FROM documents),
         budgets AS (
           SELECT lang, (sum(n_tok) * 3 // 10)::BIGINT AS budget
           FROM docs GROUP BY lang),
         cum AS (
           SELECT d.lang, d.n_tok, b.budget,
                  sum(d.n_tok) OVER (PARTITION BY d.lang
                    ORDER BY d.prio, d.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
           FROM docs d JOIN budgets b ON b.lang = d.lang)
         SELECT lang, count(*)::BIGINT AS n_selected,
                sum(n_tok)::BIGINT AS tokens_selected,
                max(budget) AS budget,
                round(sum(n_tok) / max(budget), 4) AS utilization
         FROM cum WHERE cum <= budget GROUP BY lang""",
    "q265_preference_pairs" ->
      """WITH scored AS (
           SELECT doc_id // 10 AS grp, doc_id,
                  len(list_distinct(list_filter(string_split_regex(
                    trim(lower(text)), '\s+'), w -> w <> '')))::BIGINT
                    AS score
           FROM documents),
         ranked AS (
           SELECT grp, doc_id, score,
                  row_number() OVER (PARTITION BY grp
                    ORDER BY score DESC, doc_id ASC) AS rn_top,
                  row_number() OVER (PARTITION BY grp
                    ORDER BY score ASC, doc_id DESC) AS rn_bot
           FROM scored),
         pairs AS (
           SELECT grp,
                  max(CASE WHEN rn_top = 1 THEN doc_id END) AS chosen_doc,
                  max(CASE WHEN rn_top = 1 THEN score END) AS chosen_score,
                  max(CASE WHEN rn_bot = 1 THEN doc_id END)
                    AS rejected_doc,
                  max(CASE WHEN rn_bot = 1 THEN score END)
                    AS rejected_score
           FROM ranked WHERE rn_top = 1 OR rn_bot = 1 GROUP BY grp)
         SELECT grp, chosen_doc, chosen_score, rejected_doc,
                rejected_score,
                chosen_score - rejected_score AS margin
         FROM pairs WHERE chosen_score - rejected_score > 0"""
  )
}
