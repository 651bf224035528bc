package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * These extend the reference's string-op surface
  * (`StringOps/StringOps.cpp` in /root/reference) with the
  * LLM-data-pipeline capabilities the north star asks for. Everything is
  * built from codegen'd built-ins (regexp_count/split/md5) — single scan,
  * no shuffle, no UDFs — so each operator is embarrassingly parallel at
  * 100 TB: per-row work only, pushdown-friendly.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  // Stopword-profile markers per language (tiny n-gram heuristic — the
  // standard public approach: score by function-word hits).
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|to|in|it|that)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|es)\\b",
    "fr" -> "\\b(le|la|les|des|est|et|que|une)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu)\\b"
  )

  private def lowerText: Column = lower(col("text"))

  val queries: Seq[(String, Q)] = Seq(
    // Language ID: marker-hit scoring + CJK char ratio, deterministic
    // argmax with fixed priority order (en > es > fr > de > zh > und).
    "q45_langid" -> ((s, d) => {
      val scored = langMarkers.foldLeft(
        t(s, d, "documents").select(col("doc_id"), col("text"))) {
        case (df, (lang, re)) =>
          df.withColumn(s"score_$lang", regexp_count(lowerText, lit(re)))
      }.withColumn("score_zh",
        regexp_count(col("text"), lit("[一-鿿]")))
      val langs = Seq("en", "es", "fr", "de", "zh")
      val best = langs.map(l => col(s"score_$l")).reduce(
        (a, b) => greatest(a, b))
      val pred = langs.foldRight(lit("und"): Column) { (l, acc) =>
        when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
      }
      // foldRight gives en-first priority: en wins ties, then es, ...
      scored.select(col("doc_id") +:
        langs.map(l => col(s"score_$l")) :+ pred.as("lang_pred"): _*)
    }),

    // Quality scoring: word stats, punctuation ratio, stopword ratio,
    // composite quality in [0,1].
    "q46_quality" -> ((s, d) => {
      val nWords = size(split(trim(col("text")), " +"))
      val nChars = length(col("text"))
      val punct = regexp_count(col("text"), lit("[.,!?;:']"))
      val stop = regexp_count(lowerText,
        lit("\\b(the|and|of|is|to|in|it|that|a|for)\\b"))
      t(s, d, "documents").select(
        col("doc_id"),
        nWords.as("n_words"),
        nChars.as("n_chars_m"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          nWords.cast("double")).as("avg_word_len"),
        (punct.cast("double") / nChars.cast("double")).as("punct_ratio"),
        (stop.cast("double") / nWords.cast("double")).as("stopword_ratio"),
        least(lit(1.0),
          (stop.cast("double") / nWords.cast("double")) * 4.0 +
            when(nWords.between(50, 100000), 0.5).otherwise(0.0))
          .as("quality"))
    }),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs | digit runs | single non-alnum), ~chars/4 heuristic.
    "q47_token_count" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        regexp_count(lowerText, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .as("bpe_tokens"),
        ceil(length(col("text")).cast("double") / 4.0).cast("bigint")
          .as("approx_tokens"))
    }),

    // Document fingerprint: md5 of whitespace/punct-normalized text —
    // the canonical-form hash used for exact-dup detection at scale.
    "q48_fingerprint" -> ((s, d) => {
      val normalized = regexp_replace(
        regexp_replace(lowerText, "[^a-z0-9 ]", ""), " +", " ")
      t(s, d, "documents").select(
        col("doc_id"),
        md5(normalized).as("fingerprint"))
    }),

    // End-to-end training-data filter: quality score + canonical-copy
    // flag (exact-dup on the normalized fingerprint) + token bounds →
    // per-doc keep decision. One scan + one shuffle on the fingerprint;
    // this is the per-document decision stage of a 100 TB curation
    // pipeline (the LSH near-dup stack q41/q42 feeds the same shape).
    "q142_pipeline_filter" -> ((s, d) => {
      val nWords = size(split(trim(col("text")), " +"))
      val stop = regexp_count(lowerText,
        lit("\\b(the|and|of|is|to|in|it|that|a|for)\\b"))
      val quality = least(lit(1.0),
        (stop.cast("double") / nWords.cast("double")) * 4.0 +
          when(nWords.between(50, 100000), 0.5).otherwise(0.0))
      val normalized = regexp_replace(
        regexp_replace(lowerText, "[^a-z0-9 ]", ""), " +", " ")
      val base = t(s, d, "documents").select(
        col("doc_id"),
        md5(normalized).as("fp"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        quality.as("quality"))
      val canonical = base.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canon_id"))
      base.join(canonical, "fp")
        .withColumn("is_canonical", col("doc_id") === col("canon_id"))
        .select(col("doc_id"), col("ws_tokens"), col("quality"),
          col("is_canonical"),
          (col("is_canonical") && col("quality") >= 0.5 &&
            col("ws_tokens").between(5, 10000)).as("keep"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q45_langid" -> {
      val scores = langMarkers.map { case (l, re) =>
        // RE2 (DuckDB) and Java regex agree on \b and alternation.
        s"len(regexp_extract_all(lower(text), '$re'))::INT AS score_$l"
      }.mkString(",\n                ")
      s"""SELECT doc_id,
                $scores,
                len(regexp_extract_all(text,
                  '[\\x{4e00}-\\x{9fff}]'))::INT AS score_zh,
                CASE
                  WHEN greatest(len(regexp_extract_all(lower(text), '${langMarkers(0)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(1)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(2)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')),
                                len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))) = 0
                    THEN 'und'
                  WHEN len(regexp_extract_all(lower(text), '${langMarkers(0)._2}')) =
                       greatest(len(regexp_extract_all(lower(text), '${langMarkers(0)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(1)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(2)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')),
                                len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')))
                    THEN 'en'
                  WHEN len(regexp_extract_all(lower(text), '${langMarkers(1)._2}')) =
                       greatest(len(regexp_extract_all(lower(text), '${langMarkers(1)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(2)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')),
                                len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')))
                    THEN 'es'
                  WHEN len(regexp_extract_all(lower(text), '${langMarkers(2)._2}')) =
                       greatest(len(regexp_extract_all(lower(text), '${langMarkers(2)._2}')),
                                len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')),
                                len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')))
                    THEN 'fr'
                  WHEN len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')) =
                       greatest(len(regexp_extract_all(lower(text), '${langMarkers(3)._2}')),
                                len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')))
                    THEN 'de'
                  ELSE 'zh'
                END AS lang_pred
         FROM documents"""
    },
    "q46_quality" ->
      """WITH s AS (
           SELECT doc_id, text,
                  len(string_split_regex(trim(text), ' +'))::INT AS n_words,
                  length(text)::INT AS n_chars_m,
                  len(regexp_extract_all(text, '[.,!?;:'']'))::INT AS punct,
                  len(regexp_extract_all(lower(text),
                    '\b(the|and|of|is|to|in|it|that|a|for)\b'))::INT AS stop
           FROM documents)
         SELECT doc_id, n_words, n_chars_m,
                length(replace(text, ' ', ''))::DOUBLE / n_words
                  AS avg_word_len,
                punct::DOUBLE / n_chars_m AS punct_ratio,
                stop::DOUBLE / n_words AS stopword_ratio,
                least(1.0::DOUBLE, (stop::DOUBLE / n_words) * 4.0 +
                  CASE WHEN n_words BETWEEN 50 AND 100000
                       THEN 0.5 ELSE 0.0 END) AS quality
         FROM s""",
    "q47_token_count" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+'))::INT AS ws_tokens,
                len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\s]'))::INT AS bpe_tokens,
                ceil(length(text)::DOUBLE / 4.0)::BIGINT AS approx_tokens
         FROM documents""",
    "q48_fingerprint" ->
      """SELECT doc_id,
                md5(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fingerprint
         FROM documents""",
    "q142_pipeline_filter" ->
      """WITH s AS (
           SELECT doc_id,
                  md5(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fp,
                  len(string_split_regex(trim(text), '\s+'))::INT
                    AS ws_tokens,
                  len(string_split_regex(trim(text), ' +'))::INT AS n_words,
                  len(regexp_extract_all(lower(text),
                    '\b(the|and|of|is|to|in|it|that|a|for)\b'))::INT AS stop
           FROM documents),
         q AS (
           SELECT doc_id, fp, ws_tokens,
                  least(1.0::DOUBLE, (stop::DOUBLE / n_words) * 4.0 +
                    CASE WHEN n_words BETWEEN 50 AND 100000
                         THEN 0.5 ELSE 0.0 END) AS quality
           FROM s),
         c AS (SELECT fp, min(doc_id) AS canon_id FROM q GROUP BY fp)
         SELECT q.doc_id, q.ws_tokens, q.quality,
                q.doc_id = c.canon_id AS is_canonical,
                (q.doc_id = c.canon_id) AND q.quality >= 0.5
                  AND q.ws_tokens BETWEEN 5 AND 10000 AS keep
         FROM q JOIN c ON c.fp = q.fp"""
  )
}
