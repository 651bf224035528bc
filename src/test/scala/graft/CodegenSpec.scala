package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-stage-codegen coverage pins: the hot paths of representative
  * queries must sit INSIDE WholeStageCodegen spans (scan -> filter ->
  * project -> partial agg fused into one generated function), because a
  * codegen break in the per-row path costs an interpreter round-trip per
  * row at 100 TB. The reference gets the same effect from its LLVM JIT
  * (SURVEY §4.2); Tungsten is the Spark analog, and these pins keep
  * custom expressions from silently knocking queries out of it.
  */
class CodegenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // AQE only finalizes (and wraps codegen stages) on execution
    df.queryExecution.executedPlan.toString
  }

  // In the executed-plan tree string a `*(n)` operator prefix marks
  // membership in WholeStageCodegen stage n.
  private def codegenStages(p: String): Int =
    "\\*\\(\\d+\\)".r.findAllIn(p).toSeq.distinct.length

  test("TPC-H Q6 scan-filter-agg fuses into whole-stage codegen") {
    val p = plan("q219_tpch_q06")
    assert(codegenStages(p) >= 1, p.take(1200))
    // Both the partial and final aggregates must be codegen'd.
    assert(p.contains("*(2) HashAggregate") || p.contains("*(1) HashAggregate"),
      p.take(1200))
  }

  test("custom codegen'd expressions stay inside codegen spans") {
    // DotProductExpr (q36) and the portable-hash dedup chain (q40) are
    // custom expression trees — they must not break the span.
    for (q <- Seq("q36_vector_math", "q40_dedup_exact")) {
      val p = plan(q)
      assert(codegenStages(p) >= 1, s"$q: ${p.take(1200)}")
    }
  }

  test("the bloom probe projection is codegen'd end to end") {
    val p = plan("q256_bloom_join_prune")
    assert(codegenStages(p) >= 1, p.take(1200))
  }
}
