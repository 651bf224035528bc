package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polygon/linestring geometry as Catalyst expressions — SURVEY §2.7
  * geo row. The reference implements these as JIT'd geo operators
  * (`QueryEngine/GeoOperators/`, accessors/predicates/measures listed in
  * `java/calcite/.../HeavyDBSqlOperatorTable.java:2382-3360`); here each
  * is a per-row expression over the engine's geometry encoding
  * `array<struct<x:double,y:double>>` (one ring / line / point list —
  * the uncompressed-doubles subset, matching `Geospatial/Compression.cpp`
  * NONE encoding).
  *
  * All are null-safe, driver-free, and evaluate inside the generated
  * plan per row (CodegenFallback: no UDF serialization, linear scan
  * cost; vertex counts are small constants in practice so the per-row
  * work is O(vertices) / O(v_a · v_b) for the pair predicate).
  */
private[graft] object GeomUtil {
  val pointType: StructType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))
  val ringType: ArrayType = ArrayType(pointType)

  def xs(a: ArrayData): Array[Double] =
    Array.tabulate(a.numElements())(i => a.getStruct(i, 2).getDouble(0))
  def ys(a: ArrayData): Array[Double] =
    Array.tabulate(a.numElements())(i => a.getStruct(i, 2).getDouble(1))

  def checkPoint(dt: DataType, name: String): TypeCheckResult = dt match {
    case StructType(fields)
        if fields.length == 2 && fields.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires struct<x:double,y:double>, got " + other.simpleString)
  }

  def checkRing(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 &&
          fields.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<struct<x:double,y:double>>, got " +
        other.simpleString)
  }

  /** Ray-cast point-in-polygon (even-odd rule); boundary points follow
    * the crossing rule of the cast (callers should treat boundaries as
    * undefined, as the reference's compressed-coords tests do).
    */
  def containsPoint(px: Array[Double], py: Array[Double],
      x: Double, y: Double): Boolean = {
    val n = px.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      if (((py(i) > y) != (py(j) > y)) &&
        (x < (px(j) - px(i)) * (y - py(i)) / (py(j) - py(i)) + px(i)))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Proper/touching segment intersection test. */
  def segmentsIntersect(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean = {
    def orient(ox: Double, oy: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Double =
      (qx - ox) * (ry - oy) - (qy - oy) * (rx - ox)
    def onSeg(ox: Double, oy: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Boolean =
      math.min(ox, qx) <= rx && rx <= math.max(ox, qx) &&
        math.min(oy, qy) <= ry && ry <= math.max(oy, qy)
    val o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    val o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val o4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    if (((o1 > 0) != (o2 > 0)) && ((o3 > 0) != (o4 > 0))) return true
    (o1 == 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) ||
      (o2 == 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)) ||
      (o3 == 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) ||
      (o4 == 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2))
  }
}

/** ST_CENTROID of a polygon ring — area-weighted (shoelace) centroid,
  * falling back to the vertex mean for degenerate (zero-area) rings.
  * Reference: `QueryEngine/GeoOperators/Centroid.h`.
  */
case class STCentroid(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.pointType
  override def checkInputDataTypes(): TypeCheckResult =
    GeomUtil.checkRing(child.dataType, prettyName)
  override def prettyName: String = "st_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val (px, py) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val n = px.length
    if (n == 0) return null
    var sa = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val cross = px(i) * py(j) - px(j) * py(i)
      sa += cross
      sx += (px(i) + px(j)) * cross
      sy += (py(i) + py(j)) * cross
      i += 1
    }
    if (math.abs(sa) > 1e-12)
      InternalRow(sx / (3.0 * sa), sy / (3.0 * sa))
    else {
      // Degenerate ring: mean of distinct vertices (drop the WKT
      // closing duplicate so it doesn't bias the mean).
      val last = if (n > 1 && px(0) == px(n - 1) && py(0) == py(n - 1))
        n - 1 else n
      InternalRow(px.take(last).sum / last, py.take(last).sum / last)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Multi-ring WKT → array of vertex rings `array<array<struct<x,y>>>`.
  *
  * POLYGON ((outer), (hole), ...): ring 1 is the outer boundary, rings
  * 2..n are holes. MULTIPOLYGON (((p1)), ((p2))) / MULTIPOINT ((a), (b))
  * / MULTILINESTRING ((l1), (l2)): one ring per component geometry
  * (hole-free multis — the flat ring list is the reference's ring-sizes
  * array encoding, `Geospatial/Types.cpp` GeoPolygon/GeoMultiPolygon).
  */
case class STRingsFromWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(GeomUtil.ringType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string WKT, got ${child.dataType.simpleString}")
  override def prettyName: String = "st_rings_from_wkt"

  override protected def nullSafeEval(input: Any): Any = {
    val wkt = input.asInstanceOf[UTF8String].toString.trim
    val open = wkt.indexOf('(')
    if (open < 0) return null
    val body = wkt.substring(open + 1, wkt.lastIndexOf(')'))
    // Rings are the innermost "(x y, x y, ...)" groups at any depth.
    val rings = Array.newBuilder[Any]
    var i = 0
    while (i < body.length) {
      var s = body.indexOf('(', i)
      if (s < 0) { i = body.length }
      else {
        while (s + 1 < body.length && body.charAt(s + 1) == '(') s += 1
        val e = body.indexOf(')', s)
        if (e < 0) { i = body.length }
        else {
          val pts = body.substring(s + 1, e).split(",")
            .map(_.trim).filter(_.nonEmpty).map { p =>
              val parts = p.split("\\s+")
              InternalRow(parts(0).toDouble, parts(1).toDouble)
            }
          rings += new GenericArrayData(pts.asInstanceOf[Array[Any]])
          i = e + 1
        }
      }
    }
    val out = rings.result()
    if (out.isEmpty) null else new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Minimum planar distance between two polygon rings: 0 when they
  * intersect or one contains the other, else the min over all
  * (vertex, edge) pairs. Powers ST_DWithin over geometries (the
  * reference's geometry-pair DWithin, `QueryEngine/GeoOperators/` +
  * `ExtensionFunctionsGeo.hpp` distance paths).
  */
case class STDistancePoly(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomUtil.checkRing(right.dataType, prettyName)
  }
  override def prettyName: String = "st_distance_poly"

  private def pointSegDist(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t = if (len2 == 0.0) 0.0
      else math.max(0.0, math.min(1.0,
        ((px - ax) * dx + (py - ay) * dy) / len2))
    math.hypot(px - (ax + t * dx), py - (ay + t * dy))
  }

  override protected def nullSafeEval(la: Any, ra: Any): Any = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val (ax, ay) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val (bx, by) = (GeomUtil.xs(b), GeomUtil.ys(b))
    val (n, m) = (ax.length, bx.length)
    if (GeomUtil.containsPoint(ax, ay, bx(0), by(0)) ||
      GeomUtil.containsPoint(bx, by, ax(0), ay(0))) return 0.0
    var best = Double.MaxValue
    var i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      var j = 0
      while (j < m) {
        val j2 = (j + 1) % m
        if (GeomUtil.segmentsIntersect(ax(i), ay(i), ax(i2), ay(i2),
          bx(j), by(j), bx(j2), by(j2))) return 0.0
        best = math.min(best, math.min(
          math.min(pointSegDist(ax(i), ay(i), bx(j), by(j), bx(j2), by(j2)),
            pointSegDist(ax(i2), ay(i2), bx(j), by(j), bx(j2), by(j2))),
          math.min(pointSegDist(bx(j), by(j), ax(i), ay(i), ax(i2), ay(i2)),
            pointSegDist(bx(j2), by(j2), ax(i), ay(i), ax(i2), ay(i2)))))
        j += 1
      }
      i += 1
    }
    best
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

private[graft] object GeomAlg {
  /** Drop the WKT closing duplicate vertex if present. */
  def openRing(px: Array[Double], py: Array[Double])
      : (Array[Double], Array[Double]) = {
    val n = px.length
    if (n > 1 && px(0) == px(n - 1) && py(0) == py(n - 1))
      (px.take(n - 1), py.take(n - 1))
    else (px, py)
  }

  def cross(ox: Double, oy: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Andrew monotone chain; returns the CCW hull, no closing duplicate. */
  def convexHull(px0: Array[Double], py0: Array[Double])
      : Array[(Double, Double)] = {
    val (px, py) = openRing(px0, py0)
    val pts = px.zip(py).distinct.sortBy(identity)
    if (pts.length <= 2) return pts
    val lower = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2)._1,
        lower(lower.length - 2)._2, lower.last._1, lower.last._2,
        p._1, p._2) <= 0) lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2)._1,
        upper(upper.length - 2)._2, upper.last._1, upper.last._2,
        p._1, p._2) <= 0) upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }

  /** Force counter-clockwise orientation (positive signed area). */
  def ccw(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    var s = 0.0
    val n = pts.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += pts(i)._1 * pts(j)._2 - pts(j)._1 * pts(i)._2
      i += 1
    }
    if (s < 0) pts.reverse else pts
  }

  /** Sutherland–Hodgman: clip `subject` (any simple polygon) by the
    * CONVEX polygon `clip`; returns the clipped polygon (possibly empty).
    */
  def clipConvex(subject: Array[(Double, Double)],
      clip0: Array[(Double, Double)]): Array[(Double, Double)] = {
    val clip = ccw(clip0)
    var out = subject.toList
    val m = clip.length
    var e = 0
    while (e < m && out.nonEmpty) {
      val (c1, c2) = (clip(e), clip((e + 1) % m))
      def inside(p: (Double, Double)): Boolean =
        cross(c1._1, c1._2, c2._1, c2._2, p._1, p._2) >= 0
      def intersect(a: (Double, Double), b: (Double, Double))
          : (Double, Double) = {
        val (dx, dy) = (b._1 - a._1, b._2 - a._2)
        val (ex, ey) = (c2._1 - c1._1, c2._2 - c1._2)
        val denom = dx * ey - dy * ex
        val t = ((c1._1 - a._1) * ey - (c1._2 - a._2) * ex) / denom
        (a._1 + t * dx, a._2 + t * dy)
      }
      val in = out
      out = Nil
      var i = 0
      while (i < in.length) {
        val cur = in(i)
        val prev = in((i + in.length - 1) % in.length)
        if (inside(cur)) {
          if (!inside(prev)) out = intersect(prev, cur) :: out
          out = cur :: out
        } else if (inside(prev)) out = intersect(prev, cur) :: out
        i += 1
      }
      out = out.reverse
      e += 1
    }
    out.toArray
  }

  def toRing(pts: Array[(Double, Double)]): GenericArrayData =
    new GenericArrayData(pts.map { case (x, y) =>
      InternalRow(x, y): Any })

  /** Moreira-Santos k-NN concave hull (see STConcaveHull Scaladoc). */
  def concaveHull(px0: Array[Double], py0: Array[Double], k0: Int)
      : Array[(Double, Double)] = {
    val (px, py) = openRing(px0, py0)
    val pts = px.zip(py).distinct
    if (pts.length <= 3) return convexHull(px, py)
    var k = math.max(3, k0)
    while (k < pts.length) {
      knnHull(pts, k) match {
        case Some(h) => return h
        case None => k += 1
      }
    }
    convexHull(px, py)
  }

  private def segIntersects(a: (Double, Double), b: (Double, Double),
      c: (Double, Double), d: (Double, Double)): Boolean = {
    // Proper intersection only (shared endpoints don't count).
    val d1 = cross(c._1, c._2, d._1, d._2, a._1, a._2)
    val d2 = cross(c._1, c._2, d._1, d._2, b._1, b._2)
    val d3 = cross(a._1, a._2, b._1, b._2, c._1, c._2)
    val d4 = cross(a._1, a._2, b._1, b._2, d._1, d._2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  private def insideOrOn(p: (Double, Double),
      hull: IndexedSeq[(Double, Double)]): Boolean = {
    val n = hull.length
    var i = 0
    // On-boundary (within eps of a segment) counts as inside.
    while (i < n) {
      val (a, b) = (hull(i), hull((i + 1) % n))
      val (dx, dy) = (b._1 - a._1, b._2 - a._2)
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0,
          ((p._1 - a._1) * dx + (p._2 - a._2) * dy) / len2))
      val (cx, cy) = (a._1 + t * dx, a._2 + t * dy)
      if (math.hypot(p._1 - cx, p._2 - cy) < 1e-9) return true
      i += 1
    }
    var inside = false
    i = 0
    while (i < n) {
      val (a, b) = (hull(i), hull((i + 1) % n))
      if ((a._2 > p._2) != (b._2 > p._2)) {
        val xInt = a._1 + (p._2 - a._2) / (b._2 - a._2) * (b._1 - a._1)
        if (p._1 < xInt) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def knnHull(pts: Array[(Double, Double)], k: Int)
      : Option[Array[(Double, Double)]] = {
    val start = pts.minBy(p => (p._2, p._1))
    val hull = scala.collection.mutable.ArrayBuffer(start)
    val used = scala.collection.mutable.Set(start)
    var current = start
    var prevAngle = 0.0
    var step = 1
    val maxSteps = pts.length * 4
    while (step <= maxSteps) {
      if (step == 4) used.remove(start) // start re-eligible after 3 moves
      val cands = pts.iterator.filter(p => !used.contains(p))
        .toArray
        .sortBy(p => (math.hypot(p._1 - current._1, p._2 - current._2),
          p._1, p._2))
        .take(k)
        // Largest clockwise (right-hand) turn from the incoming
        // direction first.
        .sortBy { p =>
          val ang = math.atan2(p._2 - current._2, p._1 - current._1)
          val diff = prevAngle - ang
          -(diff - 2 * math.Pi * math.floor(diff / (2 * math.Pi)))
        }
      val next = cands.find { c =>
        // The step edge must not cross the hull built so far (edges
        // sharing the current vertex are adjacent, not crossings).
        !(1 until hull.length - 1).exists(i =>
          segIntersects(current, c, hull(i - 1), hull(i)))
      }
      next match {
        case None => return None // stranded: widen k
        case Some(n) if n == start =>
          val h = hull.toArray
          return if (pts.forall(p => used.contains(p) ||
            insideOrOn(p, h))) Some(h) else None
        case Some(n) =>
          prevAngle = math.atan2(current._2 - n._2, current._1 - n._1)
          hull += n
          used += n
          current = n
      }
      step += 1
    }
    None
  }
}

/** ST_CONVEXHULL over a vertex array → CCW hull ring (no closing
  * duplicate). Reference: `Geospatial/Types.cpp` getConvexHull /
  * `HeavyDBSqlOperatorTable.java` ST_ConvexHull.
  */
case class STConvexHull(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult =
    GeomUtil.checkRing(child.dataType, prettyName)
  override def prettyName: String = "st_convexhull"
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    GeomAlg.toRing(GeomAlg.convexHull(GeomUtil.xs(a), GeomUtil.ys(a)))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_CONCAVEHULL(points, k) — the k-nearest-neighbours concave hull
  * (Moreira & Santos 2007), implemented independently from the paper's
  * pseudocode. Reference surface: `HeavyDBSqlOperatorTable.java:300,3213`
  * in /root/reference (GEOS-backed there). Walk: start at the lowest
  * point, repeatedly step to the k-NN candidate with the largest
  * clockwise turn from the incoming direction that does not intersect
  * the hull so far; if the walk strands or leaves points outside,
  * retry with k+1; convex hull is the terminal fallback. Deterministic:
  * ties in the k-NN sort break on (dist, x, y).
  */
case class STConcaveHull(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName k must be int, got ${right.dataType.simpleString}")
  }
  override def prettyName: String = "st_concavehull"
  override protected def nullSafeEval(ring: Any, kIn: Any): Any = {
    val a = ring.asInstanceOf[ArrayData]
    GeomAlg.toRing(GeomAlg.concaveHull(
      GeomUtil.xs(a), GeomUtil.ys(a), kIn.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ST_BUFFER of a point: regular n-gon approximation of the radius-r
  * disc (the reference buffers through GDAL/geos; the n-gon is the
  * closed-form equivalent with area 0.5·n·r²·sin(2π/n)).
  */
case class STBufferPoint(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult = {
    val p = GeomUtil.checkPoint(first.dataType, prettyName)
    if (p != TypeCheckResult.TypeCheckSuccess) p
    else if (second.dataType == DoubleType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (point, double radius, int segments)")
  }
  override def prettyName: String = "st_buffer_point"
  override protected def nullSafeEval(p: Any, r: Any, n: Any): Any = {
    val row = p.asInstanceOf[InternalRow]
    val (x, y) = (row.getDouble(0), row.getDouble(1))
    val rad = r.asInstanceOf[Double]
    val segs = n.asInstanceOf[Int]
    GeomAlg.toRing(Array.tabulate(segs) { k =>
      val t = 2.0 * math.Pi * k / segs
      (x + rad * math.cos(t), y + rad * math.sin(t))
    })
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** ST_INTERSECTION of a simple polygon with a CONVEX polygon
  * (Sutherland–Hodgman clip) → the intersection ring (empty when
  * disjoint). Covers the reference's polygon-overlay set ops for the
  * convex-clip case; areas compose union/difference by
  * inclusion-exclusion.
  */
case class STIntersectionConvex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomUtil.checkRing(right.dataType, prettyName)
  }
  override def prettyName: String = "st_intersection"
  override protected def nullSafeEval(la: Any, ra: Any): Any = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val (sx, sy) = GeomAlg.openRing(GeomUtil.xs(a), GeomUtil.ys(a))
    val (cx, cy) = GeomAlg.openRing(GeomUtil.xs(b), GeomUtil.ys(b))
    GeomAlg.toRing(GeomAlg.clipConvex(
      GeomAlg.ccw(sx.zip(sy)), cx.zip(cy)))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ST_WITHIN(a, b): every vertex of `a` inside `b` and no edge
  * crossings (exact for simple polygons off the boundary —
  * boundary-touching cases follow the ray-cast convention, as the
  * reference's compressed-coordinate tests do).
  */
case class STWithinPoly(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomUtil.checkRing(right.dataType, prettyName)
  }
  override def prettyName: String = "st_within"
  override protected def nullSafeEval(la: Any, ra: Any): Any = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val (ax, ay) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val (bx, by) = (GeomUtil.xs(b), GeomUtil.ys(b))
    var i = 0
    while (i < ax.length) {
      if (!GeomUtil.containsPoint(bx, by, ax(i), ay(i))) return false
      i += 1
    }
    // vertex containment + no boundary crossing ⇒ full containment
    val (n, m) = (ax.length, bx.length)
    i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      var j = 0
      while (j < m) {
        val j2 = (j + 1) % m
        if (GeomUtil.segmentsIntersect(ax(i), ay(i), ax(i2), ay(i2),
          bx(j), by(j), bx(j2), by(j2))) return false
        j += 1
      }
      i += 1
    }
    true
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ST_SIMPLIFY — Douglas–Peucker with tolerance `eps` over the vertex
  * sequence (closed rings keep their closing duplicate). Collinear and
  * near-collinear vertices within eps of the chord are removed.
  * Reference exposes simplification through its GDAL geo pipeline; this
  * is the standard public algorithm.
  */
case class STSimplify(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else if (right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ring, double tolerance)")
  }
  override def prettyName: String = "st_simplify"

  private def perpDist(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val (dx, dy) = (bx - ax, by - ay)
    val len = math.hypot(dx, dy)
    if (len == 0.0) math.hypot(px - ax, py - ay)
    else math.abs(dx * (ay - py) - (ax - px) * dy) / len
  }

  private def dp(px: Array[Double], py: Array[Double], lo: Int, hi: Int,
      eps: Double, keep: Array[Boolean]): Unit = {
    if (hi <= lo + 1) return
    var best = -1.0; var bestI = -1
    var i = lo + 1
    while (i < hi) {
      val d = perpDist(px(i), py(i), px(lo), py(lo), px(hi), py(hi))
      if (d > best) { best = d; bestI = i }
      i += 1
    }
    if (best > eps) {
      keep(bestI) = true
      dp(px, py, lo, bestI, eps, keep)
      dp(px, py, bestI, hi, eps, keep)
    }
  }

  override protected def nullSafeEval(ring: Any, tol: Any): Any = {
    val a = ring.asInstanceOf[ArrayData]
    val eps = tol.asInstanceOf[Double]
    val (px, py) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val n = px.length
    if (n <= 2) return a.copy()
    val closed = px(0) == px(n - 1) && py(0) == py(n - 1)
    val keep = Array.fill(n)(false)
    keep(0) = true; keep(n - 1) = true
    if (closed && n > 3) {
      // anchor the ring at vertex 0 and its farthest vertex so the two
      // half-chains simplify independently (standard closed-ring DP)
      var far = 1; var best = -1.0
      var i = 1
      while (i < n - 1) {
        val d = math.hypot(px(i) - px(0), py(i) - py(0))
        if (d > best) { best = d; far = i }
        i += 1
      }
      keep(far) = true
      dp(px, py, 0, far, eps, keep)
      dp(px, py, far, n - 1, eps, keep)
    } else dp(px, py, 0, n - 1, eps, keep)
    new GenericArrayData(
      (0 until n).filter(keep).map(i =>
        InternalRow(px(i), py(i)): Any).toArray)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ST_DISTANCE between two point structs — a DEDICATED expression node
  * (not a sqrt/pow composition) so the optimizer can recognize distance
  * predicates structurally: GeoRangeJoinRule matches
  * `STDistance(a,b) < r` in join conditions and rewrites to the bucketed
  * equi-join (the reference compiles the same recognition into
  * `JoinHashTable/RangeJoinHashTable.cpp`). Full codegen — stays inside
  * whole-stage codegen like the composition it replaces.
  */
case class STDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkPoint(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomUtil.checkPoint(right.dataType, prettyName)
  }
  override def prettyName: String = "st_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (p, q) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    val dx = p.getDouble(0) - q.getDouble(0)
    val dy = p.getDouble(1) - q.getDouble(1)
    math.sqrt(dx * dx + dy * dy)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
        double ${ev.value}_dx = $l.getDouble(0) - $r.getDouble(0);
        double ${ev.value}_dy = $l.getDouble(1) - $r.getDouble(1);
        ${ev.value} = java.lang.Math.sqrt(
          ${ev.value}_dx * ${ev.value}_dx + ${ev.value}_dy * ${ev.value}_dy);
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ST_GEOMFROMTEXT for POINT/LINESTRING/POLYGON (outer ring) → vertex
  * array. Reference: WKT import `Geospatial/Types.cpp` (GeoTypesFactory).
  */
case class STPointsFromWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeomUtil.ringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string WKT, got ${child.dataType.simpleString}")
  override def prettyName: String = "st_points_from_wkt"

  override protected def nullSafeEval(input: Any): Any = {
    val wkt = input.asInstanceOf[UTF8String].toString.trim
    val inner = {
      val open = wkt.indexOf('(')
      if (open < 0) return null
      // strip to the innermost ring of the first (outer) ring group
      wkt.substring(open).dropWhile(_ == '(')
        .takeWhile(c => c != ')' )
    }
    val pts = inner.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
      val parts = p.split("\\s+")
      InternalRow(parts(0).toDouble, parts(1).toDouble)
    }
    new GenericArrayData(pts.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_AREA via the shoelace formula (planar).
  * Reference: `QueryEngine/GeoOperators/AreaPerimeter.h`.
  */
case class STArea(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GeomUtil.checkRing(child.dataType, prettyName)
  override def prettyName: String = "st_area"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val (px, py) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val n = px.length
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += px(i) * py(j) - px(j) * py(i)
      i += 1
    }
    math.abs(s) / 2.0
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_LENGTH / ST_PERIMETER: sum of segment lengths; `closed` adds the
  * wrap-around segment (perimeter of a ring vs length of a linestring).
  */
case class STLength(child: Expression, closed: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GeomUtil.checkRing(child.dataType, prettyName)
  override def prettyName: String = if (closed) "st_perimeter" else "st_length"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val (px, py) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val n = px.length
    if (n < 2) return 0.0
    // A closed WKT ring repeats its first vertex; avoid double-counting.
    val last = if (closed && (px(0) == px(n - 1) && py(0) == py(n - 1)))
      n - 1 else n
    var s = 0.0
    var i = 0
    val upTo = if (closed) last else n - 1
    while (i < upTo) {
      val j = (i + 1) % last
      s += math.hypot(px(j) - px(i), py(j) - py(i))
      i += 1
    }
    s
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ST_CONTAINS(polygon, x, y) — ray-cast point-in-polygon.
  * Reference: `QueryEngine/GeoOperators/Contains.h` (point-in-poly path).
  */
case class STContainsPoint(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ring = GeomUtil.checkRing(first.dataType, prettyName)
    if (ring != TypeCheckResult.TypeCheckSuccess) ring
    else if (second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ring, double, double)")
  }
  override def prettyName: String = "st_contains_point"

  override protected def nullSafeEval(ring: Any, x: Any, y: Any): Any = {
    val a = ring.asInstanceOf[ArrayData]
    GeomUtil.containsPoint(GeomUtil.xs(a), GeomUtil.ys(a),
      x.asInstanceOf[Double], y.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** ST_INTERSECTS(polyA, polyB): any edge pair intersects, or one polygon
  * contains a vertex of the other (covers containment without edge
  * crossings). Reference: bbox-accelerated exact predicate
  * (`QueryEngine/JoinHashTable/BoundingBoxIntersectJoinHashTable.cpp`
  * for the join form; scalar `GeoOperators/`).
  */
case class STIntersectsPoly(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomUtil.checkRing(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomUtil.checkRing(right.dataType, prettyName)
  }
  override def prettyName: String = "st_intersects_poly"

  override protected def nullSafeEval(la: Any, ra: Any): Any = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val (ax, ay) = (GeomUtil.xs(a), GeomUtil.ys(a))
    val (bx, by) = (GeomUtil.xs(b), GeomUtil.ys(b))
    val (n, m) = (ax.length, bx.length)
    var i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      var j = 0
      while (j < m) {
        val j2 = (j + 1) % m
        if (GeomUtil.segmentsIntersect(ax(i), ay(i), ax(i2), ay(i2),
          bx(j), by(j), bx(j2), by(j2))) return true
        j += 1
      }
      i += 1
    }
    GeomUtil.containsPoint(ax, ay, bx(0), by(0)) ||
      GeomUtil.containsPoint(bx, by, ax(0), ay(0))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
