package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-9 batch W (q463-q465) — retrieval + ops surfaces:
  *
  *  - q463: positional phrase search — the exact-phrase sibling of
  *    q364's boolean retrieval. A positional posting list
  *    (doc_id, pos, tok) is filtered to the TWO query terms before
  *    any join (postings for other terms never shuffle), then
  *    adjacency is a self-join on (doc_id, pos+1). At 100 TB the
  *    join input is |postings(term1)| + |postings(term2)|, not the
  *    corpus.
  *  - q464: exponentially-decayed heavy hitters — per-user activity
  *    mass with a 7-day half-life anchored at the corpus horizon
  *    (weight = 2^(-age_days/7)), top-20. One keyed aggregate; the
  *    rank window is over the 20-row candidate set after a
  *    micro-quantized TakeOrdered-style cut.
  *  - q465: CIDR longest-prefix-match join — synthetic ip per user
  *    (Knuth multiplicative hash), a 10-block literal CIDR dim
  *    (8 covering /4s + 2 narrower overlapping blocks), broadcast
  *    range-join ip BETWEEN [start, end], longest prefix wins per
  *    ip via a max-struct aggregate (no window over the fact side).
  */
object Round9Net {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(

    "q463_phrase_search" -> ((s, d) => {
      // cheap containment pre-filter BEFORE tokenizing: a doc without
      // both literal terms cannot contain the phrase, so the explode
      // only runs on candidate docs (4.3x sf1 wall without this)
      val toks = t(s, d, "documents")
        .filter(lower(col("text")).contains("table") &&
          lower(col("text")).contains("hash"))
        .select(col("doc_id"), posexplode(split(regexp_replace(
          trim(lower(col("text"))), "[^a-z0-9 ]", ""), " +")))
        .toDF("doc_id", "pos", "tok")
        .filter(col("tok").isin("table", "hash"))
      val a = toks.filter(col("tok") === "table")
        .select(col("doc_id"), col("pos"))
      val b = toks.filter(col("tok") === "hash")
        .select(col("doc_id").as("doc_id_b"), col("pos").as("pos_b"))
      a.join(b, col("doc_id") === col("doc_id_b") &&
          col("pos_b") === col("pos") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("pos")).cast("long").as("first_pos"))
        .orderBy(col("n_occurrences").desc, col("doc_id"))
        .limit(20)
    }),

    "q464_decayed_heavy_hitters" -> ((s, d) => {
      val ev = t(s, d, "events")
      val hz = ev.agg(max(col("ts")).as("hmax"))
      val mass = ev.crossJoin(broadcast(hz))
        .withColumn("age_days",
          (unix_timestamp(col("hmax")) - unix_timestamp(col("ts"))) /
            lit(86400.0))
        .withColumn("w", pow(lit(0.5), col("age_days") / lit(7.0)))
        .groupBy(col("user_id"))
        .agg(floor(sum(col("w")) * 1000000).cast("long")
            .as("decayed_micro"),
          count(lit(1)).as("n_events"))
      // 20-row candidate set -> the rank window is bounded
      val top = mass.orderBy(col("decayed_micro").desc, col("user_id"))
        .limit(20)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("decayed_micro").desc, col("user_id"))))
        .select(col("rk"), col("user_id"), col("decayed_micro"),
          col("n_events"))
        .orderBy(col("rk"))
    }),

    "q465_cidr_lpm_join" -> ((s, d) => {
      import s.implicits._
      // 8 covering /4 blocks + 2 narrower overlapping blocks: LPM
      // must route the overlap to the more specific prefix
      val covering = (0L until 8L).map { k =>
        (f"blk_${k}%02d", k * 536870912L, (k + 1) * 536870912L - 1, 4)
      }
      val specific = Seq(
        ("blk_fine_a", 536870912L, 536870912L + 16777215L, 8),
        ("blk_fine_b", 3221225472L, 3221225472L + 1048575L, 12))
      val cidr = (covering ++ specific)
        .toDF("block", "ip_start", "ip_end", "prefix_len")
      // pre-aggregate the fact side per user BEFORE the range join:
      // the join input is |users|, not |events|
      val ips = t(s, d, "events")
        .groupBy(col("user_id"))
        // exact integer cents per event before the sum: double
        // summation order is engine-dependent at the ulp
        .agg(sum(floor(col("value") * 100).cast("long")).as("traffic"),
          count(lit(1)).as("n_events"))
        .withColumn("ip",
          pmod(col("user_id") * lit(2654435761L), lit(4294967296L)))
      // broadcast range join, then longest-prefix via max-struct
      ips.join(broadcast(cidr),
          col("ip") >= col("ip_start") && col("ip") <= col("ip_end"))
        .groupBy(col("user_id"), col("ip"), col("traffic"),
          col("n_events"))
        .agg(max(struct(col("prefix_len"), col("block"))).as("m"))
        .select(col("ip"), col("m.block").as("block"), col("traffic"),
          col("n_events"))
        .groupBy(col("block"))
        .agg(count(lit(1)).as("n_ips"),
          sum(col("n_events")).as("n_events"),
          sum(col("traffic")).as("traffic_cents"))
        .orderBy(col("block"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(

    "q463_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(regexp_replace(
                    trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +'))
                    AS tok,
                  generate_subscripts(string_split_regex(regexp_replace(
                    trim(lower(text)), '[^a-z0-9 ]', '', 'g'), ' +'), 1)
                    - 1 AS pos
           FROM documents),
         a AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
         b AS (SELECT doc_id, pos FROM toks WHERE tok = 'hash')
         SELECT a.doc_id, count(*)::BIGINT AS n_occurrences,
                min(a.pos)::BIGINT AS first_pos
         FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         GROUP BY a.doc_id
         ORDER BY n_occurrences DESC, a.doc_id
         LIMIT 20""",

    "q464_decayed_heavy_hitters" ->
      """WITH hz AS (SELECT max(ts::TIMESTAMP) AS hmax FROM events),
         mass AS (
           -- floor(epoch) on BOTH operands: Spark's unix_timestamp
           -- truncates sub-second parts, DuckDB's epoch keeps them
           SELECT user_id,
                  floor(sum(pow(0.5,
                      (floor(epoch((SELECT hmax FROM hz)))
                       - floor(epoch(ts::TIMESTAMP))) / 86400.0 / 7.0))
                    * 1000000)::BIGINT AS decayed_micro,
                  count(*)::BIGINT AS n_events
           FROM events GROUP BY user_id),
         top AS (
           SELECT * FROM mass
           ORDER BY decayed_micro DESC, user_id LIMIT 20)
         SELECT row_number() OVER (ORDER BY decayed_micro DESC, user_id)
                  AS rk,
                user_id, decayed_micro, n_events
         FROM top ORDER BY rk""",

    "q465_cidr_lpm_join" ->
      """WITH cidr AS (
           SELECT * FROM (VALUES
             ('blk_00', 0::BIGINT, 536870911::BIGINT, 4),
             ('blk_01', 536870912::BIGINT, 1073741823::BIGINT, 4),
             ('blk_02', 1073741824::BIGINT, 1610612735::BIGINT, 4),
             ('blk_03', 1610612736::BIGINT, 2147483647::BIGINT, 4),
             ('blk_04', 2147483648::BIGINT, 2684354559::BIGINT, 4),
             ('blk_05', 2684354560::BIGINT, 3221225471::BIGINT, 4),
             ('blk_06', 3221225472::BIGINT, 3758096383::BIGINT, 4),
             ('blk_07', 3758096384::BIGINT, 4294967295::BIGINT, 4),
             ('blk_fine_a', 536870912::BIGINT, 553648127::BIGINT, 8),
             ('blk_fine_b', 3221225472::BIGINT, 3222274047::BIGINT, 12))
             t(block, ip_start, ip_end, prefix_len)),
         ips AS (
           SELECT user_id,
                  sum(floor(value * 100)::BIGINT)::BIGINT AS traffic,
                  count(*)::BIGINT AS n_events,
                  ((user_id * 2654435761) % 4294967296
                   + 4294967296) % 4294967296 AS ip
           FROM events GROUP BY user_id),
         routed AS (
           SELECT user_id, ip, traffic, n_events,
                  max(struct_pack(prefix_len := prefix_len,
                                  block := block)) AS m
           FROM ips JOIN cidr
             ON ip >= ip_start AND ip <= ip_end
           GROUP BY user_id, ip, traffic, n_events)
         SELECT m.block AS block, count(*)::BIGINT AS n_ips,
                sum(n_events)::BIGINT AS n_events,
                sum(traffic)::BIGINT AS traffic_cents
         FROM routed
         GROUP BY m.block
         ORDER BY block"""
  )
}
