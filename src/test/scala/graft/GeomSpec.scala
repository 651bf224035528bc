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
}
