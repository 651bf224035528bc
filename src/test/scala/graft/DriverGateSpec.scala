package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DRIVER-harness output contract (round-8 verdict item #3).
  *
  * The driver gates correctness by loading each query result into
  * pandas (Spark parquet via pyarrow, oracle via duckdb.df()), sorting
  * and hashing cell representations. Types that the two loaders render
  * differently — or that pandas cannot sort at all — make a
  * value-correct query red or `err` at the driver:
  *
  *   - ArrayType/MapType/StructType cells break pandas sort_values
  *     (round-8 q338 `err`): serialize to strings in the projection.
  *   - DecimalType arrives as object(Decimal) from pyarrow but float64
  *     from DuckDB (round-8 q356 hash-FAIL): present as DOUBLE, STRING,
  *     or scaled BIGINT (see q32/q356 recipes).
  *   - BinaryType reprs differ (bytes vs bytearray): hex it.
  *
  * Every SparkEntry query's output schema must therefore be scalar,
  * decimal-free, and binary-free. tools/drivergate.py is the runtime
  * twin of this spec (it additionally catches oracle-SIDE kind drift,
  * e.g. DuckDB HUGEINT -> float64, round-8 q366).
  */
class DriverGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def ok(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | IntegerType | LongType |
        ShortType | ByteType | DoubleType | FloatType | DateType |
        TimestampType | TimestampNTZType => true
    case _ => false
  }

  test("every query output schema is driver-gateable " +
    "(scalar, no decimal, no binary)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val fields = fn(spark, sf).schema.fields
        fields.collect {
          case f if !ok(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(bad.isEmpty,
      s"harness-hostile output columns:\n  ${bad.mkString("\n  ")}")
  }
}
