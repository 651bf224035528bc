package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{H3, H3Geo}

/** Geodetic H3 activation contract + internal consistency.
  *
  * The pinned values are the reference's only geodetic H3 vector
  * (`Tests/GeospatialTest.cpp:4317-4341` in /root/reference): cell,
  * parent, center tolerance 1e-4, boundary tolerance 1e-11 — plus the
  * public h3-js README vector and the reference's self-join invariant
  * (`Tests/ExecuteTest.cpp:12512`).
  */
class H3GeoSpec extends AnyFunSuite {

  private val KCell = 0x8f2195c2c540080L // 644605580338790528

  test("reference pinned vector: LonLatToCell(60, 40, 15)") {
    assert(H3Geo.lonLatToCell(60.0, 40.0, 15) == KCell)
    assert(KCell == 644605580338790528L)
  }

  test("reference pinned vector: CellToParent(cell, 12)") {
    assert(H3.toParent(KCell, 12) == 631094781456679423L)
  }

  test("reference pinned vector: center within 1e-4 of (60, 40)") {
    val (lon, lat) = H3Geo.cellToLonLat(KCell)
    assert(math.abs(lon - 60.0) < 1e-4, s"lon $lon")
    assert(math.abs(lat - 40.0) < 1e-4, s"lat $lat")
  }

  test("reference pinned vector: boundary matches kWKTValues at 1e-11") {
    // Tests/GeospatialTest.cpp:4329-4341 (closed 7-point ring)
    val kwkt = Array(
      59.9999887940966801, 40.0000005857359184,
      59.9999930723770873, 39.9999959172691604,
      60.0000004137070206, 39.9999963654760862,
      60.0000034767576835, 40.0000014821500258,
      59.9999991984775178, 40.0000061506173239,
      59.9999918571464477, 40.0000057024101636,
      59.9999887940966801, 40.0000005857359184)
    val b = H3Geo.cellToBoundary(KCell)
    assert(b.length == kwkt.length, s"ring size ${b.length}")
    b.indices.foreach { i =>
      assert(math.abs(b(i) - kwkt(i)) < 1e-11,
        s"boundary[$i]: ${b(i)} vs ${kwkt(i)}")
    }
  }

  test("h3-js README vector: SF at res 9") {
    assert(H3Geo.lonLatToCell(-122.41795063018799, 37.775938728915946, 9) ==
      0x8928308280fffffL)
  }

  test("reference self-join invariant: 161 distinct diagonal cells") {
    // ExecuteTest.cpp:12512 — H3_LonLatToCell(s, s, 10) over -80..80
    val cells = (-80 to 80).map(s =>
      H3Geo.lonLatToCell(s.toDouble, s.toDouble, 10)).toSet
    assert(cells.size == 161)
  }

  private def allCells(res: Int): Iterator[Long] = {
    def leadOk(bc: Int, digits: List[Int]): Boolean =
      !H3.PentagonBaseCells.contains(bc) ||
        digits.dropWhile(_ == 0).headOption.forall(_ != 1)
    def rec(digits: List[Int]): Iterator[List[Int]] =
      if (digits.length == res) Iterator.single(digits)
      else (0 to 6).iterator.flatMap(d => rec(digits :+ d))
    (0 until 122).iterator.flatMap { bc =>
      rec(Nil).filter(ds => leadOk(bc, ds)).map(ds => H3.build(bc, ds))
    }
  }

  test("encode inverts decode over every res-1 cell (842)") {
    var n = 0
    allCells(1).foreach { c =>
      val (lon, lat) = H3Geo.cellToLonLat(c)
      assert(H3Geo.lonLatToCell(lon, lat, 1) == c, H3.toHexString(c))
      n += 1
    }
    assert(n == 842)
  }

  test("encode inverts decode over every res-2 cell (5882)") {
    var n = 0
    allCells(2).foreach { c =>
      val (lon, lat) = H3Geo.cellToLonLat(c)
      assert(H3Geo.lonLatToCell(lon, lat, 2) == c, H3.toHexString(c))
      n += 1
    }
    assert(n == 5882)
  }

  test("encode inverts decode over pentagon res-3 descendants") {
    val rng = new scala.util.Random(11)
    H3.PentagonBaseCells.toSeq.sorted.foreach { bc =>
      (0 to 6).filter(_ != 1).foreach { d1 =>
        (0 to 6).foreach { d2 =>
          val d3 = rng.nextInt(7)
          val c = H3.build(bc, Seq(d1, d2, d3))
          if (H3.isValid(c)) {
            val (lon, lat) = H3Geo.cellToLonLat(c)
            assert(H3Geo.lonLatToCell(lon, lat, 3) == c, H3.toHexString(c))
          }
        }
      }
    }
  }

  test("deep cells round-trip at res 9 and 15") {
    val rng = new scala.util.Random(3)
    (0 until 122).foreach { bc =>
      Seq(9, 15).foreach { res =>
        var digits = List.empty[Int]
        (1 to res).foreach { _ =>
          var d = rng.nextInt(7)
          while (H3.PentagonBaseCells.contains(bc) && d == 1 &&
            digits.forall(_ == 0)) d = rng.nextInt(7)
          digits = digits :+ d
        }
        val c = H3.build(bc, digits)
        val (lon, lat) = H3Geo.cellToLonLat(c)
        assert(H3Geo.lonLatToCell(lon, lat, res) == c, H3.toHexString(c))
      }
    }
  }

  test("boundary ring is closed, finite and tight around the center") {
    val rng = new scala.util.Random(5)
    (1 to 50).foreach { _ =>
      val res = 1 + rng.nextInt(10)
      val bc = rng.nextInt(122)
      var digits = List.empty[Int]
      (1 to res).foreach { _ =>
        var d = rng.nextInt(7)
        while (H3.PentagonBaseCells.contains(bc) && d == 1 &&
          digits.forall(_ == 0)) d = rng.nextInt(7)
        digits = digits :+ d
      }
      val c = H3.build(bc, digits)
      val b = H3Geo.cellToBoundary(c)
      assert(b.length >= (if (digits.forall(_ == 0) &&
        H3.PentagonBaseCells.contains(bc)) 12 else 14))
      assert(b(0) == b(b.length - 2) && b(1) == b(b.length - 1))
      assert(b.forall(v => !v.isNaN && !v.isInfinite))
      val (lon, lat) = H3Geo.cellToLonLat(c)
      // every vertex within ~1.5 cell "radii" of the center (angular)
      val cellRad = math.toDegrees(0.4060 / math.pow(math.sqrt(7.0), res))
      var i = 0
      while (i < b.length) {
        val dLon = math.abs(math.cos(math.toRadians(lat)) * (b(i) - lon))
        val dLat = math.abs(b(i + 1) - lat)
        assert(math.max(dLon, dLat) < 2.5 * cellRad,
          s"vertex too far for ${H3.toHexString(c)}")
        i += 2
      }
    }
  }

  test("pentagon cell boundary has 5 base vertices (res 2, class II)") {
    val c = H3.build(4, Seq(0, 0))
    val b = H3Geo.cellToBoundary(c)
    // closed ring of 5 distinct verts at class II (no icosa crossings)
    assert(b.length == 12)
  }
}
