package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Hot-key (skew) mitigation for equi-joins: SALT the skewed big side
  * into `salt` sub-keys and replicate the small side once per salt
  * value, so a key whose rows would all land in one reducer spread
  * across `salt` of them. The per-row salt is deterministic (hash of
  * the row id), the small-side replication is an explode over a literal
  * sequence — no rand(), re-runs produce identical plans and results.
  *
  * This is the manual fallback for the skew cases AQE's skew-join split
  * cannot reach (streaming joins, broadcast-ineligible shapes, or
  * pre-AQE engines); AQE handles the rest at runtime (SURVEY §4). The
  * result set is EXACTLY that of the plain equi-join — q154 pins this
  * against the unsalted DuckDB oracle.
  */
object SkewJoin {

  type Q = (SparkSession, String) => DataFrame

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `salt` reducers. `small` is replicated `salt`×: keep it the
    * dimension side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  val queries: Seq[(String, Q)] = Seq(
    // Salted fact ⋈ dimension, aggregated — must equal the plain join.
    "q154_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
      saltedJoin(li, ord, "l_orderkey", salt = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"))
    }),

    // Bucketed CO-LOCATED join — the storage-layout answer to the
    // shuffle (the reference co-locates via shard_key DDL,
    // `Parser/ParserNode.h` CREATE TABLE ... SHARD KEY +
    // `Fragmenter/InsertOrderFragmenter.cpp` shard routing; Spark's
    // equivalent is bucketBy + saveAsTable). Both sides written
    // bucketed AND sorted on the join key join with ZERO Exchange and
    // ZERO Sort — at 100 TB that is the difference between a
    // corpus-sized shuffle per join and a metadata-only plan; the
    // repeated-join fact/dim workload amortizes one bucketed write
    // across every subsequent join. PlanSpec pins the no-Exchange,
    // no-Sort plan with broadcast disabled; the gated query pins result
    // equality with the plain-join oracle.
    "q191_bucketed_join" -> ((s, d) => {
      val db = "graft_bkt"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION " +
        s"'${graft.Stage.scratchDir("graft_bucketed")}'")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      // repartition on the key first: one file per bucket is what lets
      // the join also elide the Sort (multi-file buckets only guarantee
      // per-FILE order, so Spark would re-sort each bucket).
      o.repartition(8, col("o_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.b_orders")
      l.repartition(8, col("l_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.b_lineitem")
      s.table(s"$db.b_orders")
        .join(s.table(s"$db.b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("qty"),
          sum(col("o_orderkey")).cast("long").as("key_sum"))
    }),

    // TPC-H-derived SKEW variant: remap o_custkey to a zipfian head
    // (rank-r head key absorbs a 1/r share of ~60% of all orders; the
    // hottest key alone carries ~22% of the fact table) and run the
    // customer ⋈ orders join the TPC-H suite (Q3/Q10/Q13/Q18 shapes)
    // actually exercises — through saltedJoin, so no reducer sees the
    // hot key whole. The remap is integer-exact in both engines: the
    // portable 60-bit md5 hash of o_orderkey mod 1000 walks a CASE
    // ladder whose thresholds are the normalized zipf(1) CDF over
    // ranks 1..8. The unsalted DuckDB oracle pins that salting is
    // result-invariant on realistically skewed data (q154 pins it on
    // the uniform fixture).
    "q237_tpch_skew_salted" -> ((s, d) => {
      val h = conv(substring(md5(col("o_orderkey").cast("string")),
        1, 15), 16, 10).cast("long")
      val v = pmod(h, lit(1000L))
      val ord = t(s, d, "orders")
        .withColumn("sk_custkey",
          when(v < 221, 1L).when(v < 331, 2L).when(v < 405, 3L)
            .when(v < 460, 4L).when(v < 504, 5L).when(v < 541, 6L)
            .when(v < 573, 7L).when(v < 600, 8L)
            .otherwise(col("o_custkey")))
        .select(col("sk_custkey"), col("o_totalprice"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("sk_custkey"), col("c_mktsegment"))
      saltedJoin(ord, cust, "sk_custkey", salt = 16)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q154_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
                round(sum(l_quantity), 2) AS qty
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         GROUP BY o_orderstatus""",
    "q191_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n,
                round(sum(l_quantity), 2) AS qty,
                sum(o_orderkey)::BIGINT AS key_sum
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         GROUP BY o_orderstatus""",
    "q237_tpch_skew_salted" ->
      """WITH sk AS (
           SELECT CASE WHEN v < 221 THEN 1 WHEN v < 331 THEN 2
                       WHEN v < 405 THEN 3 WHEN v < 460 THEN 4
                       WHEN v < 504 THEN 5 WHEN v < 541 THEN 6
                       WHEN v < 573 THEN 7 WHEN v < 600 THEN 8
                       ELSE o_custkey END AS sk_custkey,
                  o_totalprice
           FROM (SELECT ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
                          % 1000 AS v,
                        o_custkey, o_totalprice
                 FROM orders) h
         )
         SELECT c_mktsegment, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS revenue
         FROM sk JOIN customer ON c_custkey = sk_custkey
         GROUP BY c_mktsegment"""
  )
}
