package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine property q205's BPE merge loop rests on: Spark's
  * `replace` is greedy leftmost non-overlapping — exactly the BPE merge
  * rule — and the '<sym>' delimited-string encoding admits no
  * cross-symbol false positives. The DuckDB side of the same contract
  * is exercised by the q205 differential oracle every verify run.
  */
class BpeMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def merged(w: String, p1: String, p2: String): String = {
    import spark.implicits._
    Seq(w).toDF("w")
      .select(replace(col("w"), lit(s"<$p1><$p2>"), lit(s"<$p1$p2>")))
      .as[String].head()
  }

  test("odd run merges leftmost pair only: aaa -> [aa, a]") {
    assert(merged("<a><a><a>", "a", "a") == "<aa><a>")
  }

  test("even run merges disjoint pairs: aaaa -> [aa, aa]") {
    assert(merged("<a><a><a><a>", "a", "a") == "<aa><aa>")
  }

  test("merged symbols do not re-match their parts across delimiters") {
    // [aa, a]: pair (a, a) must NOT match the tail of 'aa' + the 'a'
    assert(merged("<aa><a>", "a", "a") == "<aa><a>")
  }

  test("pair symbols match whole symbols, not prefixes") {
    // [a, ab]: pair (a, a) must not match 'a' + prefix of 'ab'
    assert(merged("<a><ab>", "a", "a") == "<a><ab>")
  }

  test("merge applies at every disjoint site in one pass") {
    assert(merged("<e><r><x><e><r>", "e", "r") == "<er><x><er>")
  }
}
