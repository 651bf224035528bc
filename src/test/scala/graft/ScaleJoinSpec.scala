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
