package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Concat, Contains, Expression, Literal, Lower, RegExpExtract}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** LLM_TRANSFORM(text, prompt [, constraint]) — SURVEY §2.7 string-op
  * kind enum (`Shared/sqldefs.h:134` in /root/reference; operator
  * `StringOps/StringOps.h:719`, `StringOps.cpp:1039`).
  *
  * Reference semantics: compose `question = prompt || ":\n" || text`,
  * POST it to an LLM endpoint at temperature 0, optionally guiding the
  * decode with a '|'-delimited choice list or a '/'-bounded regex
  * (`StringOps.h:736-786` splitConstraint/extractRegex), return the
  * response text.
  *
  * Spark-first design: the runtime is PLUGGABLE (`LlmRuntime`) and the
  * default is a deterministic stand-in — there is no LLM service in this
  * stack, and a network call per row would not be a 100 TB-shape
  * operator anyway. The default runtime expresses each guidance mode as
  * a pure Catalyst expression tree (codegen'd, oracle-checkable, no UDF):
  *
  *  - guided choice: the first listed choice found case-insensitively in
  *    the question, else the first choice — the deterministic analog of
  *    a temperature-0 guided_choice decode;
  *  - guided regex: the first regex match in the question (the
  *    guided_regex contract says the answer must match the pattern);
  *  - unconstrained: the composed question itself (identity template
  *    expansion).
  *
  * A production runtime (batched endpoint calls via mapPartitions with a
  * per-partition cache, like the reference's translation_cache_) plugs in
  * by swapping `runtime`; query code is unchanged.
  */
object LlmTransform {

  trait LlmRuntime {
    /** Answer expression for a composed question, under optional
      * guidance.
      */
    def answer(question: Expression, guidedChoice: Seq[String],
        guidedRegex: Option[String]): Expression
  }

  /** Deterministic, LLM-free default (see object Scaladoc). */
  object TemplateRuntime extends LlmRuntime {
    override def answer(question: Expression, guidedChoice: Seq[String],
        guidedRegex: Option[String]): Expression =
      if (guidedChoice.nonEmpty) {
        val q = Lower(question)
        CaseWhen(
          guidedChoice.map(c =>
            (Contains(q, Literal(c.toLowerCase)): Expression,
              Literal(c): Expression)),
          Some(Literal(guidedChoice.head)))
      } else guidedRegex match {
        case Some(re) => RegExpExtract(question, Literal(re), Literal(0))
        case None => question
      }
  }

  @volatile var runtime: LlmRuntime = TemplateRuntime

  /** Constraint literal: either '/regex/' or 'a|b|c' choices — the same
    * validation as the reference (`StringOps.h:764-775`: anything else
    * errors rather than being silently ignored).
    */
  private def build(text: Expression, prompt: String,
      constraint: Option[String]): Expression = {
    val question = Concat(Seq(Literal(prompt + ":\n"), text))
    constraint match {
      case None => runtime.answer(question, Nil, None)
      case Some(c) if c.length >= 2 && c.head == '/' && c.last == '/' =>
        runtime.answer(question, Nil, Some(c.substring(1, c.length - 1)))
      case Some(c) if c.contains('|') =>
        runtime.answer(question, c.split('|').toIndexedSeq, None)
      case Some(_) => throw new IllegalArgumentException(
        "LLM_TRANSFORM constraint literal must either have at least two " +
          "output choices separated by '|' (i.e. 'west|east'), or be " +
          "bounded by '/' on each side (i.e. '/SELECT .*;/') to signify " +
          "a regex.")
    }
  }

  def llm_transform(text: Column, prompt: String): Column =
    ColumnBridge.column(build(ColumnBridge.expression(text), prompt, None))

  def llm_transform(text: Column, prompt: String, constraint: String)
      : Column =
    ColumnBridge.column(
      build(ColumnBridge.expression(text), prompt, Some(constraint)))

  /** SQL registration: prompt/constraint must be string literals (the
    * reference enforces the same — `StringOps.cpp:1416-1430` literal
    * checks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import org.apache.spark.sql.types.StringType
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("llm_transform"),
      new ExpressionInfo("graft", "llm_transform"),
      ex => {
        def litStr(i: Int, what: String): String = ex(i) match {
          case Literal(s, StringType) if s != null => s.toString
          case _ => throw new IllegalArgumentException(
            s"llm_transform: $what must be a string literal")
        }
        build(ex.head, litStr(1, "prompt"),
          if (ex.length >= 3) Some(litStr(2, "constraint")) else None)
      })
  }
}
