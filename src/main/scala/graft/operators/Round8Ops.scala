package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-8 additions beyond the reference-parity backlog: interval-union
  * coverage, cohort retention, the higher-order array-lambda surface, and
  * content-defined chunking. Each is a staple of the product-analytics /
  * training-data workloads the engine targets, hash-gated vs DuckDB.
  */
object Round8Ops {

  type Q = (SparkSession, String) => DataFrame

  private def hash60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val queries: Seq[(String, Q)] = Seq(

    // Interval-union coverage (merge-overlaps): per user, the total time
    // covered by [ts, ts + dur) activity intervals after merging
    // overlaps, plus the merged-island count — the classic
    // gaps-and-islands plan: a per-user cummax of interval ends marks
    // island starts, a running sum of the marks numbers islands, and
    // one aggregate per island then per user. Two partitioned windows +
    // two keyed aggregates, all integer µs — one shuffle on user_id at
    // any scale. Durations are deterministic integers from event_id.
    "q336_interval_coverage" -> ((s, d) => {
      val usS = unix_micros(col("ts"))
      val durUs = (lit(60L) + pmod(col("event_id"), lit(600L))) * 1000000L
      val base = t(s, d, "events")
        .select(col("user_id"), col("event_id"), usS.as("s"),
          (usS + durUs).as("e"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("s").asc, col("e").asc, col("event_id").asc)
      val marked = base
        .withColumn("prev_max_e",
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("prev_max_e").isNull ||
            col("s") > col("prev_max_e"), 1L).otherwise(0L))
        .withColumn("island",
          sum(col("new_island"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      marked.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("is_e") - col("is_s")).as("covered_us"))
    }),

    // Cohort retention matrix: users cohorted by first-activity day;
    // for offsets 0..7 days, how many of each cohort were active. The
    // warehouse retention query: one distinct (user, day) projection,
    // a min-day aggregate, a keyed self-join on user, exact integer
    // counts. Shuffles only on user_id / (cohort, offset).
    "q337_cohort_retention" -> ((s, d) => {
      val days = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val cohorts = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"))
      days.join(cohorts, "user_id")
        .select(col("cohort"), col("user_id"),
          datediff(col("day"), col("cohort")).as("day_offset"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // Higher-order array-lambda surface (§2.8 array ops completed):
    // transform / filter / exists / forall / aggregate / zip_with over
    // a deterministic integer array. All lambdas stay codegen'd Catalyst
    // (no UDFs). The oracle replays each with DuckDB's list lambdas
    // (exists/forall via list_filter length; zip_with via an index
    // transform) — different surface syntax, identical semantics.
    "q338_array_lambda" -> ((s, d) => {
      val arr = array(pmod(col("l_orderkey"), lit(10L)),
        pmod(col("l_partkey"), lit(10L)),
        pmod(col("l_suppkey"), lit(10L)),
        col("l_linenumber").cast("long"))
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"), arr.as("arr"))
        .select(col("l_orderkey"), col("l_linenumber"),
          transform(col("arr"), x => x * 2).as("doubled"),
          filter(col("arr"), x => x % 2 === 0).as("evens"),
          exists(col("arr"), x => x > 7).as("has_gt7"),
          forall(col("arr"), x => x >= 0).as("all_nonneg"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("total"),
          zip_with(col("arr"), reverse(col("arr")),
            (a, b) => a + b).as("palindrome_sum"))
    }),

    // Content-defined chunking (FastCDC-style): chunk boundaries where
    // the rolling 3-gram hash of the token stream satisfies
    // h % 16 == 0, so boundaries move WITH content (insert-stable) —
    // the dedup-friendly alternative to q196's fixed-stride windows.
    // The rolling hash is the portable 60-bit md5 over the current and
    // two previous tokens, replayed exactly by the oracle. Per-doc
    // output: token count, chunk count, mean chunk size in millitokens
    // (integer arithmetic). One explode + partitioned windows per doc.
    "q339_cdc_chunking" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          split(regexp_replace(trim(lower(col("text"))), "[^a-z0-9 ]", ""),
            " +").as("toks"))
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"), posexplode(col("toks")))
        .toDF("doc_id", "pos", "tok")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val rolled = toks
        .withColumn("t1", lag(col("tok"), 1).over(w))
        .withColumn("t2", lag(col("tok"), 2).over(w))
        .withColumn("boundary",
          when(col("t2").isNotNull &&
            pmod(hash60(concat_ws(" ", col("t2"), col("t1"), col("tok"))),
              lit(16L)) === 0L, 1L).otherwise(0L))
      rolled.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("boundary")) + 1L).as("n_chunks"))
        .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
          expr("n_tokens * 1000 DIV n_chunks").as("mean_chunk_millitok"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q336_interval_coverage" ->
      """WITH base AS (
           SELECT user_id, event_id,
                  epoch_us(ts::TIMESTAMP) AS s,
                  epoch_us(ts::TIMESTAMP)
                    + (60 + event_id % 600) * 1000000 AS e
           FROM events),
         marked AS (
           SELECT user_id, s, e,
                  CASE WHEN max(e) OVER (PARTITION BY user_id
                         ORDER BY s ASC, e ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) IS NULL
                       OR s > max(e) OVER (PARTITION BY user_id
                         ORDER BY s ASC, e ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS new_island,
                  event_id
           FROM base),
         numbered AS (
           SELECT user_id, s, e,
                  sum(new_island) OVER (PARTITION BY user_id
                    ORDER BY s ASC, e ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS island
           FROM marked),
         islands AS (
           SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
           FROM numbered GROUP BY user_id, island)
         SELECT user_id, count(*)::BIGINT AS n_islands,
                sum(is_e - is_s)::BIGINT AS covered_us
         FROM islands GROUP BY user_id""",
    "q337_cohort_retention" ->
      """WITH days AS (
           SELECT DISTINCT user_id,
                  date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day
           FROM events),
         cohorts AS (
           SELECT user_id, min(day) AS cohort FROM days GROUP BY user_id)
         SELECT c.cohort, date_diff('day', c.cohort, d.day)::INT
                  AS day_offset,
                count(DISTINCT d.user_id)::BIGINT AS n_active
         FROM days d JOIN cohorts c USING (user_id)
         WHERE date_diff('day', c.cohort, d.day) <= 7
         GROUP BY 1, 2""",
    "q338_array_lambda" ->
      """SELECT l_orderkey, l_linenumber,
                list_transform(arr, x -> x * 2) AS doubled,
                list_filter(arr, x -> x % 2 = 0) AS evens,
                len(list_filter(arr, x -> x > 7)) > 0 AS has_gt7,
                len(list_filter(arr, x -> NOT (x >= 0))) = 0
                  AS all_nonneg,
                list_sum(arr)::BIGINT AS total,
                list_transform(range(1, len(arr) + 1),
                  i -> arr[i] + arr[len(arr) + 1 - i])
                  AS palindrome_sum
         FROM (
           SELECT l_orderkey, l_linenumber,
                  [l_orderkey % 10, l_partkey % 10, l_suppkey % 10,
                   l_linenumber::BIGINT] AS arr
           FROM lineitem WHERE l_orderkey < 2000)""",
    "q339_cdc_chunking" ->
      """WITH toks AS (
           SELECT doc_id,
                  string_split_regex(regexp_replace(trim(lower(text)),
                    '[^a-z0-9 ]', '', 'g'), ' +') AS toks
           FROM documents),
         flat AS (
           SELECT doc_id, unnest(toks) AS tok,
                  generate_subscripts(toks, 1) AS pos
           FROM toks WHERE len(toks) >= 1),
         rolled AS (
           SELECT doc_id, pos, tok,
                  lag(tok, 1) OVER w AS t1,
                  lag(tok, 2) OVER w AS t2
           FROM flat
           WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         flagged AS (
           SELECT doc_id,
                  CASE WHEN t2 IS NOT NULL AND
                    ('0x' || substr(md5(t2 || ' ' || t1 || ' ' || tok),
                      1, 15))::BIGINT % 16 = 0
                  THEN 1 ELSE 0 END AS boundary
           FROM rolled)
         SELECT doc_id, count(*)::BIGINT AS n_tokens,
                (sum(boundary) + 1)::BIGINT AS n_chunks,
                (count(*) * 1000 // (sum(boundary) + 1))::BIGINT
                  AS mean_chunk_millitok
         FROM flagged GROUP BY doc_id"""
  )
}
