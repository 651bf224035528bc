package graft.operators

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeomUtil, JaroWinklerSimilarity}

/** Property tests over the pure per-row logic (no Spark session) —
  * SURVEY §5.4's ScalaCheck leg (reference analog:
  * `Tests/PopulateTableRandom.cpp` random round-trips). Deterministic
  * seed; samples drawn directly from Gen (the scalatestplus bridge is
  * not on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def jw(a: String, b: String): Int =
    JaroWinklerSimilarity(
      Literal(UTF8String.fromString(a)),
      Literal(UTF8String.fromString(b))).eval(null).asInstanceOf[Int]

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  test("jarowinkler: range, symmetry, identity (500 samples)") {
    val pairs = samples(Gen.zip(word, word), 500)
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0 && s <= 100, s"out of range: jw($a,$b)=$s")
      assert(s == jw(b, a), s"asymmetric: $a / $b")
    }
    samples(word, 200).foreach(a => assert(jw(a, a) == 100))
  }

  test("bmp encode/parse round-trip for arbitrary dims (200 samples)") {
    val dims = samples(Gen.zip(Gen.chooseNum(1, 200), Gen.chooseNum(1, 100)),
      200)
    dims.foreach { case (w, h) =>
      val bytes = Multimodal.bmpBytes(w, h)
      val (pw, ph, bpp) = Multimodal.parseBmpHeader(bytes)
      assert((pw, ph, bpp) == (w, h, 24))
      val rowSize = ((w * 3 + 3) / 4) * 4
      assert(bytes.length == 54 + rowSize * h)
    }
  }

  test("aHash: deterministic, and perturbation moves few bits (100 samples)") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dims = samples(Gen.zip(Gen.chooseNum(16, 64), Gen.chooseNum(8, 48)),
      100)
    dims.foreach { case (w, h) =>
      val img = Multimodal.bmpBytes(w, h)
      val h1 = Multimodal.aHash(img)
      assert(h1 == Multimodal.aHash(Multimodal.bmpBytes(w, h)),
        "aHash must be deterministic")
      // Corrupt one pixel hard (blue channel -> 255): at most the grid
      // cells sharing that pixel's block can flip, plus mean-threshold
      // spill — near-dup distance stays far under the 64-bit range.
      val noisy = img.clone()
      noisy(54) = 0xff.toByte
      val d = hamming(h1, Multimodal.aHash(noisy))
      assert(d <= 16, s"one-pixel corruption moved $d bits ($w x $h)")
    }
  }

  test("polygon containment: random rectangles contain their centers") {
    val rects = samples(Gen.zip(Gen.chooseNum(-100.0, 100.0),
      Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0.5, 50.0),
      Gen.chooseNum(0.5, 50.0)), 200)
    rects.foreach { case (x, y, w, h) =>
      val px = Array(x, x + w, x + w, x)
      val py = Array(y, y, y + h, y + h)
      assert(GeomUtil.containsPoint(px, py, x + w / 2, y + h / 2))
      assert(!GeomUtil.containsPoint(px, py, x - 1.0, y + h / 2))
      assert(!GeomUtil.containsPoint(px, py, x + w / 2, y + h + 1.0))
    }
  }
}
