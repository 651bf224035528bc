package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function extensions beyond Spark built-ins, matching the
  * reference's expression surface (SURVEY.md §2.7). All are Column
  * compositions over codegen'd built-ins — they stay inside whole-stage
  * codegen and never leave the optimizer's reach (no UDF black boxes).
  */
object GraftFunctions {

  /** TRUNCATE(x, d): truncate toward zero to d decimal digits.
    * Reference: EXTENSION function Truncate
    * (`QueryEngine/ExtensionFunctions.hpp` in /root/reference).
    * Spark's `round` rounds; this chops: floor for x>=0, ceil for x<0.
    */
  def truncate_num(x: Column, d: Int): Column = {
    val scale = pow(lit(10.0), lit(d))
    when(x >= 0, floor(x * scale) / scale)
      .otherwise(ceil(x * scale) / scale)
  }

  /** QUARTERDAY extract field (1..4, 6-hour buckets).
    * Reference: `QueryEngine/ExtractFromTime.h:77-98` kQUARTERDAY.
    */
  def quarterday(ts: Column): Column =
    (hour(ts) / 6).cast("int") + 1

  /** EXTRACT(WEEK_SUNDAY): ISO-like week number with Sunday week start.
    * Reference: `QueryEngine/ExtractFromTime.h` kWEEK_SUNDAY.
    * Computed as days-since-epoch-aligned week index within the year.
    */
  def week_sunday(ts: Column): Column = {
    // Day-of-year of the first Sunday on/before Jan 1 anchors week 1.
    val jan1 = trunc(ts.cast("date"), "year")
    val jan1Dow = dayofweek(jan1) // 1=Sunday..7=Saturday
    ((dayofyear(ts) + jan1Dow - 2) / 7).cast("int") + 1
  }

  /** EXTRACT(WEEK_SATURDAY): week number with Saturday week start. */
  def week_saturday(ts: Column): Column = {
    val jan1 = trunc(ts.cast("date"), "year")
    val jan1Dow = (dayofweek(jan1) % 7) + 1 // shift so Saturday=1
    ((dayofyear(ts) + jan1Dow - 2) / 7).cast("int") + 1
  }

  /** SAMPLE_RATIO(r): deterministic pseudo-random row filter.
    * Reference: `Analyzer/Analyzer.h:959` (SampleRatioExpr). The reference
    * uses a per-row hash; we hash a key column so the filter is stable
    * across runs and partitioning (scale-safe, unlike rand()).
    */
  def sample_ratio(key: Column, ratio: Double): Column =
    (pmod(xxhash64(key), lit(1000000L)) < lit((ratio * 1000000L).toLong))

  /** Dot product of two numeric arrays (double precision accumulate).
    * Reference: DotProduct operator
    * (`java/calcite/.../HeavyDBSqlOperatorTable.java:531`).
    * `aggregate(zip_with(...))` stays columnar/codegen-friendly.
    */
  def dot_product(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm of a numeric array. */
  def l2_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity between two numeric arrays (double precision).
    * Backs the similarity-search operators
    * (reference `QueryEngine/TableFunctions/SystemFunctions/os/
    * SimilarityTableFunctions.hpp:162`).
    */
  def cosine_similarity(a: Column, b: Column): Column =
    dot_product(a, b) / (l2_norm(a) * l2_norm(b))

  /** JAROWINKLER_SIMILARITY(a, b) → int 0..100, as in the reference
    * (`StringOps/StringOps.h` JaroWinklerSimilarity; scaled like its tests).
    */
  def jarowinkler_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      JaroWinklerSimilarity(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
  }

  /** Register SQL-callable names for the extension functions. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("jarowinkler_similarity"),
      new ExpressionInfo("graft", "jarowinkler_similarity"),
      exprs => JaroWinklerSimilarity(exprs(0), exprs(1)))
  }
}
