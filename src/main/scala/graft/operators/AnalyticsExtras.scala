package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-8 additions beyond the reference-parity backlog: interval-union
  * coverage, a distributed 2-D skyline, the higher-order array-lambda
  * surface, content-defined chunking, TWAP, OHLC bars, and weighted
  * sampling. Each is a staple of the product-analytics / time-series /
  * training-data workloads the engine targets, hash-gated vs DuckDB.
  */
object AnalyticsExtras {

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

    // 2-D skyline (Pareto frontier): orders not dominated by any other
    // (earlier-or-same day AND higher-or-equal price, one strict) —
    // the multi-criteria "best offers" operator. A skyline over a
    // date-ordered axis is a PREFIX-MAX scan, which Spark would
    // otherwise plan as one global unpartitioned window; instead this
    // uses the distributed scan pattern (q315's offset trick):
    // range-partition by day, per-partition prefix max (partitioned
    // window), then broadcast each partition's running max so
    // global_prefix_max = max(local, preceding partitions' max).
    // Equal days never straddle partitions (range partitioner keeps
    // equal keys together), so partition-prefix maxes are strictly
    // earlier days. Driver traffic = one 8-row collect.
    "q337_skyline_pareto" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val base = t(s, d, "orders").select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
          .as("day"),
        col("o_totalprice").as("price"))
      val parts = base.repartitionByRange(8, col("day"))
        .withColumn("pid", spark_partition_id())
      val wPrev = Window.partitionBy(col("pid")).orderBy(col("day"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val local = graft.Stage(parts
        .withColumn("cmax_prev", max(col("price")).over(wPrev))
        .withColumn("peer_max",
          max(col("price")).over(
            Window.partitionBy(col("pid"), col("day")))),
        "q337_local")
      val pm = local.groupBy(col("pid")).agg(max(col("price")).as("pm"))
        .collect().sortBy(_.getInt(0)) // bounded: one row per partition
      val scan = pm.scanLeft((0, Double.NegativeInfinity)) {
        case ((_, acc), r) => (r.getInt(0), math.max(acc, r.getDouble(1)))
      }
      val offDf = scan.init.zip(scan.tail)
        .map { case ((_, before), (pid, _)) => (pid, before) }
        .toSeq.toDF("pid", "prev_part_max")
      local.join(broadcast(offDf), "pid")
        .withColumn("gmax_prev",
          greatest(coalesce(col("cmax_prev"),
            lit(Double.NegativeInfinity)), col("prev_part_max")))
        .filter(col("price") > col("gmax_prev") &&
          col("price") === col("peer_max"))
        .select(col("o_orderkey"), col("day"), col("price"))
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
          // Array results are serialized to '|'-joined strings: the
          // driver's pandas harness cannot sort/hash list-valued cells
          // (round-8 q338 err), so the gate contract (DriverGateSpec)
          // requires scalar output columns. The lambdas under test are
          // unchanged — only the presentation is flattened.
          array_join(transform(col("arr"), x => x * 2)
            .cast("array<string>"), "|").as("doubled"),
          array_join(filter(col("arr"), x => x % 2 === 0)
            .cast("array<string>"), "|").as("evens"),
          exists(col("arr"), x => x > 7).as("has_gt7"),
          forall(col("arr"), x => x >= 0).as("all_nonneg"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("total"),
          array_join(zip_with(col("arr"), reverse(col("arr")),
            (a, b) => a + b).cast("array<string>"), "|")
            .as("palindrome_sum"))
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
    }),

    // Time-weighted average (TWAP): each observation holds until the
    // user's next event, so the mean is Σ(v·dt)/Σ(dt) — the correct
    // average for irregularly-sampled series (an arithmetic mean
    // over-weights bursts). Values scaled to exact milli-units
    // (floor(v·1000)) and dt in integer µs, so both engines sum
    // identically; the final ratio is integer millis. One lead window +
    // one aggregate per user — a single user_id shuffle.
    "q340_twap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 1000).cast("long").as("vm"))
        .withColumn("dt_us",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dt_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt_us")).as("span_us"),
          expr("sum(vm * dt_us) DIV sum(dt_us)").as("twap_milli"))
    }),

    // OHLC candle bars — the time-series rollup every market/telemetry
    // store ships (the reference's taxis/flights dashboards are this
    // shape): per (event_type, day): open = first value by time,
    // high/low extrema, close = last, volume. first/last ride the
    // min/max of a (µs-timestamp, tie-break id, value) packed struct —
    // a plain partial-merge aggregate, no window at all, so at 100 TB
    // this is one map-side-combining shuffle on the (series, bar) key.
    "q341_ohlc_bars" -> ((s, d) => {
      val packed = struct(unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      t(s, d, "events")
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("value"), packed.as("pk"))
        .groupBy(col("event_type"), col("day"))
        .agg(min(col("pk")).getField("value").as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(col("pk")).getField("value").as("close"),
          count(lit(1)).as("volume"))
    }),

    // Weighted sampling without replacement (Efraimidis-Spirakis, IPL
    // 2006): key = u^(1/w) with u uniform — the top-k keys ARE a
    // w-weighted sample. Deterministic u from the portable 60-bit md5
    // hash (u = h/2^60), w = document length; keys rounded to 9 so both
    // engines rank identically; ties broken by doc_id. The
    // quality-weighted corpus subsampling step of a data pipeline,
    // reduced to one TakeOrdered top-k — no shuffle beyond it.
    "q342_weighted_sample" -> ((s, d) => {
      val u = hash60(concat(lit("es:"), col("doc_id").cast("string")))
        .cast("double") / lit(1.152921504606846976e18)
      t(s, d, "documents")
        .select(col("doc_id"), length(col("text")).as("w"))
        .withColumn("key",
          round(pow(u, lit(1.0) / col("w").cast("double")), 9))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(25)
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q340_twap" ->
      """WITH base AS (
           SELECT user_id, event_id, ts::TIMESTAMP AS ts,
                  floor(value * 1000)::BIGINT AS vm
           FROM events),
         led AS (
           SELECT user_id, vm,
                  epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC))
                    - epoch_us(ts) AS dt_us
           FROM base)
         SELECT user_id, count(*)::BIGINT AS n_intervals,
                sum(dt_us)::BIGINT AS span_us,
                (sum(vm * dt_us) // sum(dt_us))::BIGINT AS twap_milli
         FROM led WHERE dt_us IS NOT NULL
         GROUP BY user_id""",
    "q341_ohlc_bars" ->
      """SELECT event_type,
                date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day,
                (min({'us': epoch_us(ts::TIMESTAMP), 'id': event_id,
                      'v': value})).v AS open,
                max(value) AS high, min(value) AS low,
                (max({'us': epoch_us(ts::TIMESTAMP), 'id': event_id,
                      'v': value})).v AS close,
                count(*)::BIGINT AS volume
         FROM events
         GROUP BY 1, 2""",
    "q342_weighted_sample" ->
      """WITH base AS (
           SELECT doc_id, length(text)::INT AS w,
                  ('0x' || substr(md5('es:' || doc_id::VARCHAR), 1, 15))
                    ::BIGINT::DOUBLE / 1152921504606846976.0 AS u
           FROM documents)
         SELECT doc_id, w, round(pow(u, 1.0 / w), 9) AS key
         FROM base
         ORDER BY key DESC, doc_id ASC LIMIT 25""",
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
    "q337_skyline_pareto" ->
      """WITH base AS (
           SELECT o_orderkey,
                  date_diff('day', DATE '1990-01-01',
                    o_orderdate::DATE)::INT AS day,
                  o_totalprice AS price
           FROM orders),
         d AS (
           SELECT o_orderkey, day, price,
                  max(price) OVER (ORDER BY day
                    RANGE BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING) AS cmax_prev,
                  max(price) OVER (PARTITION BY day) AS peer_max
           FROM base)
         SELECT o_orderkey, day, price FROM d
         WHERE (cmax_prev IS NULL OR price > cmax_prev)
           AND price = peer_max""",
    "q338_array_lambda" ->
      """SELECT l_orderkey, l_linenumber,
                array_to_string(list_transform(arr, x -> x * 2), '|')
                  AS doubled,
                coalesce(array_to_string(
                    list_filter(arr, x -> x % 2 = 0), '|'), '')
                  AS evens,
                len(list_filter(arr, x -> x > 7)) > 0 AS has_gt7,
                len(list_filter(arr, x -> NOT (x >= 0))) = 0
                  AS all_nonneg,
                list_sum(arr)::BIGINT AS total,
                array_to_string(list_transform(range(1, len(arr) + 1),
                  i -> arr[i] + arr[len(arr) + 1 - i]), '|')
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
