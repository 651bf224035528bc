package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geospatial scalar-function layer — SURVEY §2.7 last row.
  *
  * The reference exposes ~70 ST_* functions
  * (`java/calcite/.../HeavyDBSqlOperatorTable.java:2382-3360`, exec
  * `QueryEngine/GeoOperators/` in /root/reference). This layer covers the
  * point/rectangle subset (constructors, accessors, planar + spherical
  * distance, DWithin, rectangular Contains) as pure Column compositions —
  * fully codegen'd, no UDF, no external geometry dependency. Polygon
  * topology (JTS-grade ST_Intersection etc.) is out of round-1 scope.
  *
  * Representation: POINT = struct(x double, y double) (lon/lat for
  * spherical ops, SRID 4326 semantics); rectangle = 4 bounds.
  */
object GeoFunctions {

  /** ST_Point(x, y) constructor. */
  def st_point(x: Column, y: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"))

  /** ST_X / ST_Y accessors. */
  def st_x(p: Column): Column = p.getField("x")
  def st_y(p: Column): Column = p.getField("y")

  /** ST_Distance between two points — planar euclidean (same-SRID
    * cartesian, as the reference computes for projected geometries).
    * A dedicated Catalyst node so GeoRangeJoinRule can recognize
    * distance predicates structurally (see GeomExpressions.STDistance).
    */
  def st_distance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(STDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** ST_DWithin(a, b, r) — planar. */
  def st_dwithin(a: Column, b: Column, r: Column): Column =
    st_distance(a, b) <= r

  /** ST_Distance on a sphere (haversine, meters, R=6371000) for lon/lat
    * points — the reference's geodesic path for GEOGRAPHY
    * (`QueryEngine/ExtensionFunctionsGeo.hpp` distance_in_meters).
    */
  def st_distance_sphere(a: Column, b: Column): Column = {
    val r = lit(6371000.0)
    val dLat = radians(st_y(b) - st_y(a))
    val dLon = radians(st_x(b) - st_x(a))
    val h = pow(sin(dLat / 2), 2.0) +
      cos(radians(st_y(a))) * cos(radians(st_y(b))) * pow(sin(dLon / 2), 2.0)
    lit(2.0) * r * asin(sqrt(h))
  }

  /** ST_Contains for an axis-aligned rectangle (bounding-box containment —
    * the grid-hash primitive behind the reference's bbox-intersect join,
    * `QueryEngine/JoinHashTable/BoundingBoxIntersectJoinHashTable.cpp`).
    */
  def st_contains_rect(xmin: Column, ymin: Column, xmax: Column,
      ymax: Column, p: Column): Column =
    st_x(p).between(xmin, xmax) && st_y(p).between(ymin, ymax)

  /** Geohash-style grid cell id for bucketed spatial joins: floor-quantize
    * both axes at `cellSize`. Equi-joining on the cell id (± neighbor
    * cells) then exact-filtering reproduces the reference's range-join
    * bucketing (`JoinHashTable/RangeJoinHashTable.cpp`) Spark-natively.
    */
  def st_grid_cell(p: Column, cellSize: Column): Column =
    struct(floor(st_x(p) / cellSize).cast("long").as("cx"),
      floor(st_y(p) / cellSize).cast("long").as("cy"))

  // --- polygon subset (Catalyst expressions, GeomExpressions.scala) ---

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => c, expression => e}

  /** Parse WKT POINT/LINESTRING/POLYGON(outer ring) → vertex array. */
  def st_geom_from_text(wkt: Column): Column = c(STPointsFromWkt(e(wkt)))

  /** Shoelace polygon area (planar). */
  def st_area(ring: Column): Column = c(STArea(e(ring)))

  /** Linestring length / ring perimeter. */
  def st_length(line: Column): Column = c(STLength(e(line), closed = false))
  def st_perimeter(ring: Column): Column = c(STLength(e(ring), closed = true))

  /** Ray-cast point-in-polygon. */
  def st_contains_poly(ring: Column, x: Column, y: Column): Column =
    c(STContainsPoint(e(ring), e(x.cast("double")), e(y.cast("double"))))

  /** Polygon-polygon intersection predicate. */
  def st_intersects(a: Column, b: Column): Column =
    c(STIntersectsPoly(e(a), e(b)))

  /** ST_NPOINTS. */
  def st_npoints(ring: Column): Column = size(ring)

  /** Register the geometry functions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("st_geomfromtext"),
      new ExpressionInfo("graft", "st_geomfromtext"),
      ex => STPointsFromWkt(ex.head))
    reg.registerFunction(FunctionIdentifier("st_area"),
      new ExpressionInfo("graft", "st_area"),
      ex => STArea(ex.head))
    reg.registerFunction(FunctionIdentifier("st_length"),
      new ExpressionInfo("graft", "st_length"),
      ex => STLength(ex.head, closed = false))
    reg.registerFunction(FunctionIdentifier("st_perimeter"),
      new ExpressionInfo("graft", "st_perimeter"),
      ex => STLength(ex.head, closed = true))
    reg.registerFunction(FunctionIdentifier("st_contains"),
      new ExpressionInfo("graft", "st_contains"),
      ex => STContainsPoint(ex(0), ex(1), ex(2)))
    reg.registerFunction(FunctionIdentifier("st_intersects"),
      new ExpressionInfo("graft", "st_intersects"),
      ex => STIntersectsPoly(ex(0), ex(1)))
  }
}
