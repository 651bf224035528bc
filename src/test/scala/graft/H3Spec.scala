package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.H3

/** H3 index bit math + geodetic geometry properties
  * (H3Expressions.scala / H3Geo.scala). The bit math follows the
  * public H3 layout exactly; the geometry is geodetic as of round 9
  * (H3GeoSpec holds the full activation contract against the
  * reference's pinned vector — the formerly-ignored test below now
  * runs).
  */
class H3Spec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def randomCell(): Long = {
    val res = rng.nextInt(10)
    val bc = rng.nextInt(H3.NumBaseCells)
    val digits = Seq.fill(res)(rng.nextInt(7))
    H3.build(bc, digits)
  }

  test("build/accessors/string round-trip on 200 random cells") {
    (1 to 200).foreach { _ =>
      val c = randomCell()
      assert(H3.fromHexString(H3.toHexString(c)) == c)
      assert(H3.resolution(c) >= 0 && H3.resolution(c) <= 15)
      assert(H3.baseCell(c) < H3.NumBaseCells)
      assert(H3.mode(c) == 1)
    }
  }

  test("validity: non-pentagon built cells valid; junk rejected") {
    (1 to 100).foreach { _ =>
      val c = randomCell()
      val pentLeadingK = H3.PentagonBaseCells.contains(H3.baseCell(c)) && {
        val res = H3.resolution(c)
        val lead = (1 to res).map(H3.digit(c, _)).find(_ != 0)
        lead.contains(1)
      }
      assert(H3.isValid(c) == !pentLeadingK, s"cell $c")
    }
    assert(!H3.isValid(0L))
    assert(!H3.isValid(123L))
    assert(!H3.isValid(-1L))
  }

  test("toParent truncates the digit path") {
    (1 to 100).foreach { _ =>
      val c = randomCell()
      val res = H3.resolution(c)
      if (res > 0) {
        val pr = rng.nextInt(res)
        val p = H3.toParent(c, pr)
        assert(H3.resolution(p) == pr)
        (1 to pr).foreach(r => assert(H3.digit(p, r) == H3.digit(c, r)))
        ((pr + 1) to 15).foreach(r => assert(H3.digit(p, r) == 7))
      }
    }
  }

  test("PointToCell inverts CellToPoint on 300 random cells (geodetic)") {
    import graft.functions.H3Geo
    // geodetic round-trip is defined for VALID cells only (a pentagon
    // leading-K cell has no geometric location)
    (1 to 300).foreach { _ =>
      val c = Iterator.continually(randomCell()).find(H3.isValid).get
      val (lon, lat) = H3Geo.cellToLonLat(c)
      assert(H3Geo.lonLatToCell(lon, lat, H3.resolution(c)) == c,
        s"round-trip failed for cell ${H3.toHexString(c)}")
    }
  }

  test("PointToCell quantizes off-center points to the nearest cell") {
    import graft.functions.H3Geo
    val c = H3.build(7, Seq(3, 5, 2))
    val (lon, lat) = H3Geo.cellToLonLat(c)
    // Perturb by well under half the res-3 cell inradius (~0.2 deg).
    assert(H3Geo.lonLatToCell(lon + 0.05, lat - 0.05, 3) == c)
  }

  test("CellToLon/CellToLat are the geodetic point accessors") {
    val spark = SparkTestSession.spark
    import graft.functions.{H3Geo, H3Functions}
    import H3Functions._
    import org.apache.spark.sql.functions._
    val c = H3.build(16, Seq(1, 3, 2, 5))
    val (lon, lat) = H3Geo.cellToLonLat(c)
    val r = spark.range(1)
      .select(h3_celltolon(lit(c)).as("lon"), h3_celltolat(lit(c)).as("lat"))
      .collect().head
    assert(r.getDouble(0) == lon && r.getDouble(1) == lat)
  }

  // GEODETIC ACTIVATION CONTRACT — ACTIVE since round 9 (H3Geo).
  // Values are the reference's pinned geodetic vector
  // (`Tests/GeospatialTest.cpp:4317-4341` in /root/reference); the
  // full boundary/parent/round-trip contract lives in H3GeoSpec.
  test("geodetic: LonLatToCell(60,40,15) and center match libh3") {
    import graft.functions.H3Geo
    val cell = 0x8f2195c2c540080L // 644605580338790528
    assert(H3.isValid(cell) && H3.resolution(cell) == 15
      && H3.baseCell(cell) == 16)
    assert(H3Geo.lonLatToCell(60.0, 40.0, 15) == cell)
    val (lon, lat) = H3Geo.cellToLonLat(cell)
    assert(math.abs(lon - 60.0) < 1e-4 && math.abs(lat - 40.0) < 1e-4)
    // first boundary vertex = kWKTValues[0..1] at the 1e-11 tolerance
    val b = H3Geo.cellToBoundary(cell)
    assert(math.abs(b(0) - 59.9999887940966801) < 1e-11)
    assert(math.abs(b(1) - 40.0000005857359184) < 1e-11)
  }

  test("H3 family is reachable through the SQL surface") {
    val spark = SparkTestSession.spark
    val eng = HeavyEngine(spark, "/root/testdata/sf0.001")
    val c = H3.build(9, Seq(4, 2))
    val r = eng.sql(
      s"""SELECT h3_getresolution(${c}L) AS res,
                 h3_isvalidcell(${c}L) AS valid,
                 h3_stringtocell(h3_celltostring(${c}L)) AS rt,
                 h3_pointtocell(h3_celltopoint(${c}L), 2) AS inv,
                 st_concavehull(
                   array(named_struct('x', 0.0d, 'y', 0.0d),
                         named_struct('x', 1.0d, 'y', 0.0d),
                         named_struct('x', 0.0d, 'y', 1.0d)), 3) AS hull
      """).collect().head
    assert(r.getAs[Int]("res") == 2)
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("rt") == c)
    assert(r.getAs[Long]("inv") == c)
    assert(r.getAs[scala.collection.Seq[Any]]("hull").size == 3)
  }
}
