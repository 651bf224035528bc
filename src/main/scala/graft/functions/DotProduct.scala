package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DOT_PRODUCT(a, b) over numeric arrays, as a fully codegen'd Catalyst
  * expression. Reference: the DotProduct operator
  * (`java/calcite/.../HeavyDBSqlOperatorTable.java:531` in
  * /root/reference), which the reference JITs into the kernel.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are interpreted (CodegenFallback) and allocate an intermediate array
  * per row — on an O(n²) similarity pair stage that interpretation cost
  * dominates. This expression generates a tight primitive loop with no
  * allocation, exactly what the vector math needs at scale.
  *
  * Semantics match the HOF composition: double accumulation in element
  * order; NULL if either array (or any element) is NULL; arrays must be
  * the same length (shorter length zips in the HOF version — here we
  * require equal length and return NULL otherwise, which the fixture
  * schema guarantees anyway).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType | IntegerType | LongType),
        _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires numeric arrays, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def prettyName: String = "dot_product"

  private def leftElem = elemType(left.dataType).get
  private def rightElem = elemType(right.dataType).get

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += num(x, i, leftElem) * num(y, i, rightElem)
      i += 1
    }
    s
  }

  private def num(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => throw new IllegalStateException("unreachable")
  }

  private def getter(et: DataType): String = et match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case _ => throw new IllegalStateException("unreachable")
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = $l.numElements();
        if ($n != $r.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($l.isNullAt($i) || $r.isNullAt($i)) {
              ${ev.isNull} = true; break;
            }
            $s += ((double) $l.${getter(leftElem)}($i))
                * ((double) $r.${getter(rightElem)}($i));
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
