package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the scalar-quantization helper behind q201/q202
  * (operators.AnnIvf.dequantized): the int8/int4 embedding-compression
  * path that cuts a float32 ANN corpus 4x/8x at 100 TB. The oracle
  * queries pin cross-engine equality; this spec pins the numeric
  * contract itself.
  */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def deq(vals: Seq[Seq[Double]], levels: Double): Seq[Seq[Double]] = {
    import spark.implicits._
    vals.toDF("x")
      .select(operators.AnnIvf.dequantized(col("x"), levels).as("dq"))
      .as[Seq[Double]].collect().toSeq
  }

  test("int8 reconstruction error is bounded by half a grid step") {
    val x = Seq(Seq(0.31, -0.87, 0.002, 0.5, -1.0, 0.99))
    val out = deq(x, 127.0).head
    val mx = x.head.map(math.abs).max
    val halfStep = mx / 127.0 / 2.0 + 1e-12
    x.head.zip(out).foreach { case (a, b) =>
      assert(math.abs(a - b) <= halfStep, s"$a -> $b")
    }
  }

  test("zero vector dequantizes to zeros, never NaN") {
    val out = deq(Seq(Seq(0.0, 0.0, 0.0)), 127.0).head
    assert(out == Seq(0.0, 0.0, 0.0))
  }

  test("max-abs component maps exactly onto the top grid level") {
    // the scale is chosen so |max| * scale == levels exactly; the
    // round-trip must return the extreme component unchanged
    val out = deq(Seq(Seq(-0.75, 0.25)), 7.0).head
    assert(math.abs(out.head - (-0.75)) < 1e-15)
  }

  test("grid points are fixed points of quantize-dequantize") {
    // components already on the int4 grid of the vector's own scale
    // (mx = 0.7 -> step 0.1) must survive the round trip bit-for-bit
    val x = Seq(Seq(0.7, -0.3, 0.1, 0.0, -0.7))
    val out = deq(x, 7.0).head
    x.head.zip(out).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15, s"$a -> $b")
    }
  }

  test("int4 is coarser than int8 on the same vector") {
    val x = Seq(Seq(0.31, -0.87, 0.002, 0.55, -0.93, 0.14))
    def err(levels: Double): Double =
      x.head.zip(deq(x, levels).head).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(err(7.0) > err(127.0))
  }
}
