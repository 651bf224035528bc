package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

/** Scale-machinery pins: salting spreads a hot key across reducers
  * without changing results; bucketed tables co-locate joins (no
  * exchange on either side — the nShards story, SURVEY §1.1).
  */
class ScaleJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join: identical results, hot key spread across salts") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val small = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val plain = big.join(small, "k")
      .agg(count(lit(1)), sum(col("v")), sum(col("w"))).collect().head
    val salted = SkewJoin.saltedJoin(big, small, "k", salt = 8)
      .agg(count(lit(1)), sum(col("v")), sum(col("w"))).collect().head
    assert(plain == salted)
    // the hot key's rows really do split over multiple salt values
    val spread = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .filter(col("k") === 7)
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(spread >= 6, s"hot key used only $spread of 8 salts")
  }

  test("q237 zipf remap: head is genuinely skewed and salted apart") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val h = conv(substring(md5(col("o_orderkey").cast("string")),
      1, 15), 16, 10).cast("long")
    val v = pmod(h, lit(1000L))
    val ord = Tables.t(spark, sf, "orders")
      .withColumn("sk_custkey",
        when(v < 221, 1L).when(v < 331, 2L).when(v < 405, 3L)
          .when(v < 460, 4L).when(v < 504, 5L).when(v < 541, 6L)
          .when(v < 573, 7L).when(v < 600, 8L)
          .otherwise(col("o_custkey")))
    val total = ord.count().toDouble
    val hot = ord.filter(col("sk_custkey") === 1L).count().toDouble
    // zipf(1) head: rank-1 key should carry ~22% of the fact table —
    // far past AQE's default 5x-median skew trigger
    assert(hot / total > 0.15, s"hot share ${hot / total}")
    // and the salted big side spreads those rows over most of the 16
    // salt buckets, so no single reducer sees the key whole
    val spread = ord.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      .filter(col("sk_custkey") === 1L)
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(spread >= 12, s"hot key used only $spread of 16 salts")
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.range(0, 10000).select(col("id").as("k"), col("id").as("a"))
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
      spark.range(0, 10000).select(col("id").as("k"),
          (col("id") * 2).as("b"))
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(joined.count() == 10000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
