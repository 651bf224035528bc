package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.4 dict-encoding pin: parquet dictionary encoding must be
  * semantically invisible — LIKE/ILIKE/equality/ordering/distinct over a
  * dictionary-encoded text column behave exactly as over plain encoding
  * (the reference evaluates these over dictionary ids,
  * `StringDictionary/StringDictionaryProxy.cpp`; Spark decodes at scan).
  */
class DictTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("dictionary-encoded parquet is semantically invisible") {
    import spark.implicits._
    // Low-cardinality pool (dictionary-friendly) with case variants,
    // LIKE metacharacters, and an empty string.
    val pool = Seq("Brass", "brAss", "steel", "BRASS plate",
      "copper%", "_tin", "", "steel")
    val words = (0 until 500).flatMap(i =>
      Gen.oneOf(pool).apply(Gen.Parameters.default, Seed(7L + i)))
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
    def write(dict: Boolean): String = {
      val dir = Stage.scratchDir(s"dictspec_$dict")
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.enable.dictionary", dict.toString).parquet(dir)
      dir
    }
    val (don, doff) = (write(true), write(false))
    def probe(dir: String): Seq[Long] = {
      val r = spark.read.parquet(dir)
      Seq(r.filter(col("s").like("%rass%")).count(),
        r.filter(col("s").ilike("brass%")).count(),
        r.filter(col("s") === "steel").count(),
        r.filter(col("s") < "c").count(),
        r.select("s").distinct().count())
    }
    assert(probe(don) == probe(doff))
    def rows(dir: String) = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows(don) == rows(doff))
  }
}
