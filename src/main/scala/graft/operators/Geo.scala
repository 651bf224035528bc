package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GeoFunctions._

/** Geospatial queries over synthesized point columns (the fixture tables
  * carry no geometry, so points are derived deterministically from part
  * attributes). Exercises constructors, accessors, planar + spherical
  * distance, DWithin, rectangular containment, and a bucketed distance
  * join (SURVEY §2.3 range join / §2.7 geo functions).
  */
object Geo {

  type Q = (SparkSession, String) => DataFrame

  /** part → deterministic lon/lat points: lon in [-25, 25), lat in
    * [0, 50) derived from p_size / p_retailprice.
    */
  private def points(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      st_point(col("p_size").cast("double") - 25.0,
        col("p_retailprice") % 50.0).as("pt"))

  private val baseQueries: Seq[(String, Q)] = Seq(
    // Accessors + planar/spherical measures + predicates.
    "q60_geo_scalar" -> ((s, d) => {
      val origin = st_point(lit(0.0), lit(25.0))
      points(s, d).select(
        col("p_partkey"),
        st_x(col("pt")).as("x"),
        st_y(col("pt")).as("y"),
        st_distance(col("pt"), origin).as("dist"),
        st_distance_sphere(col("pt"), origin).as("dist_m"),
        st_dwithin(col("pt"), origin, lit(10.0)).as("within10"),
        st_contains_rect(lit(-10.0), lit(10.0), lit(10.0), lit(40.0),
          col("pt")).as("in_box"))
    }),

    // Distance self-join via grid bucketing: pairs within r, found by
    // equi-joining 3×3 neighbor cells then exact-filtering — the
    // Spark-native rewrite of the reference's RangeJoinHashTable
    // (sub-quadratic; each point only meets its neighborhood).
    "q61_geo_distance_join" -> ((s, d) => {
      val r = 1.0
      val pts = points(s, d)
      // Assign each point to its cell; probe side replicated to the 9
      // neighbor cells so every within-r pair co-locates in some cell.
      val cell = st_grid_cell(col("pt"), lit(r))
      val build = pts.select(col("p_partkey").as("a_id"),
        col("pt").as("a_pt"), cell.as("c"))
      val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
      val probe = pts.select(col("p_partkey").as("b_id"),
          col("pt").as("b_pt"), cell.as("c0"),
          explode(offsets).as("o"))
        .select(col("b_id"), col("b_pt"),
          struct((col("c0.cx") + col("o.dx")).as("cx"),
            (col("c0.cy") + col("o.dy")).as("cy")).as("c"))
      build.join(probe, "c")
        .filter(col("a_id") < col("b_id") &&
          st_distance(col("a_pt"), col("b_pt")) < r)
        .select(col("a_id"), col("b_id"),
          st_distance(col("a_pt"), col("b_pt")).as("dist"))
    })
  )

  /** Deterministic right-triangle WKT per part row: legs w × h at
    * (cx, cy). Closed-form area/perimeter/containment make the oracle
    * DuckDB-expressible without a spatial extension.
    */
  private def triangles(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      (col("p_size").cast("double") - 25.0).as("cx"),
      (col("p_retailprice") % 50.0).as("cy"),
      (lit(1.0) + col("p_size") % 5).as("w"),
      (lit(1.0) + col("p_partkey") % 7).as("h"))
      .withColumn("wkt", format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s))",
        col("cx"), col("cy"),
        col("cx") + col("w"), col("cy"),
        col("cx"), col("cy") + col("h"),
        col("cx"), col("cy")))

  private val polyQueries: Seq[(String, Q)] = Seq(
    // WKT parse + measures: the full text → geometry → compute path.
    "q68_geo_wkt_measures" -> ((s, d) => {
      triangles(s, d)
        .withColumn("ring", st_geom_from_text(col("wkt")))
        .select(col("p_partkey"),
          st_npoints(col("ring")).as("np"),
          st_area(col("ring")).as("area"),
          st_perimeter(col("ring")).as("perim"))
    }),

    // Ray-cast point-in-polygon on strictly-inside / strictly-outside
    // probes (boundary semantics are excluded by construction).
    "q69_geo_contains_poly" -> ((s, d) => {
      triangles(s, d)
        .withColumn("ring", st_geom_from_text(col("wkt")))
        .select(col("p_partkey"),
          st_contains_poly(col("ring"),
            col("cx") + col("w") / 4,
            col("cy") + col("h") / 4 +
              (col("p_partkey") % 3) * lit(0.4) * col("h"))
            .as("probe_in"),
          st_contains_poly(col("ring"),
            col("cx") - 1.0, col("cy") + col("h") / 4)
            .as("probe_out"))
    }),

    // Polygon-polygon ST_Intersects: each triangle vs its x-shifted
    // copy; shift chosen so pairs are clearly overlapping or clearly
    // disjoint (never exactly touching).
    "q71_geo_intersects" -> ((s, d) => {
      val tri = triangles(s, d)
        .withColumn("ring", st_geom_from_text(col("wkt")))
        .withColumn("dx", (col("p_partkey") % 5) * lit(0.7) * col("w"))
        .withColumn("ring2", transform(col("ring"),
          p => struct((p.getField("x") + col("dx")).as("x"),
            p.getField("y").as("y"))))
      tri.select(col("p_partkey"),
        st_intersects(col("ring"), col("ring2")).as("hits"))
    }),

    // The SAME distance join as q61, but written NAIVELY — a plain
    // θ-join on st_distance < r. GeoRangeJoinRule (installed by
    // HeavyEngine) must rewrite it to the bucketed equi-join
    // automatically; PlanSpec pins the absence of a nested loop.
    "q104_geo_range_rule" -> ((s, d) => {
      graft.HeavyEngine(s, d) // installs the optimizer rule
      val pts = points(s, d)
      val a = pts.select(col("p_partkey").as("a_id"), col("pt").as("a_pt"))
      val b = pts.select(col("p_partkey").as("b_id"), col("pt").as("b_pt"))
      a.join(b, st_distance(col("a_pt"), col("b_pt")) < 1.0 &&
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          st_distance(col("a_pt"), col("b_pt")).as("dist"))
    }),

    // ST_Transform 4326 → 900913 (web mercator) and back — the one CRS
    // pair the reference special-cases (`HeavyDBSqlOperatorTable.java:2541`,
    // `Geospatial/Compression.cpp`). Forward coords + roundtrip recovery.
    "q125_geo_transform" -> ((s, d) => {
      val m = st_transform_4326_900913(col("pt"))
      val back = st_transform_900913_4326(m)
      points(s, d).select(col("p_partkey"),
        st_x(m).as("mx"), st_y(m).as("my"),
        st_x(back).as("rx"), st_y(back).as("ry"))
    }),

    // ST_Centroid over the triangle fixtures — closed form (vertex mean
    // of a triangle = area centroid).
    "q126_geo_centroid" -> ((s, d) => {
      val cent = st_centroid(st_geom_from_text(col("wkt")))
      triangles(s, d).select(col("p_partkey"),
        st_x(cent).as("cent_x"), st_y(cent).as("cent_y"))
    }),

    // Multi-ring polygon (outer rect + rectangular hole): ST_NRINGS,
    // bbox accessor family, and net area (outer minus hole).
    "q127_geo_poly_holes" -> ((s, d) => {
      val withWkt = triangles(s, d).withColumn("pwkt", format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s), " +
          "(%s %s, %s %s, %s %s, %s %s, %s %s))",
        col("cx"), col("cy"), col("cx") + col("w"), col("cy"),
        col("cx") + col("w"), col("cy") + col("h"),
        col("cx"), col("cy") + col("h"), col("cx"), col("cy"),
        col("cx") + col("w") / 4, col("cy") + col("h") / 4,
        col("cx") + col("w") / 2, col("cy") + col("h") / 4,
        col("cx") + col("w") / 2, col("cy") + col("h") / 2,
        col("cx") + col("w") / 4, col("cy") + col("h") / 2,
        col("cx") + col("w") / 4, col("cy") + col("h") / 4))
        .withColumn("rings", st_polygon_from_text(col("pwkt")))
      val outer = element_at(col("rings"), 1)
      withWkt.select(col("p_partkey"),
        st_nrings(col("rings")).as("nrings"),
        st_xmin(outer).as("bxmin"), st_xmax(outer).as("bxmax"),
        st_ymin(outer).as("bymin"), st_ymax(outer).as("bymax"),
        st_area_with_holes(col("rings")).as("area_net"))
    }),

    // ST_DWithin over polygon GEOMETRIES (q71's pair fixture): min ring
    // distance is closed-form (pairs overlap → 0, else the horizontal
    // gap dx - w between the facing vertical edges).
    "q128_geo_dwithin_poly" -> ((s, d) => {
      val tri = triangles(s, d)
        .withColumn("ring", st_geom_from_text(col("wkt")))
        .withColumn("dx", (col("p_partkey") % 5) * lit(0.7) * col("w"))
        .withColumn("ring2", transform(col("ring"),
          p => struct((p.getField("x") + col("dx")).as("x"),
            p.getField("y").as("y"))))
      tri.select(col("p_partkey"),
        st_distance_poly(col("ring"), col("ring2")).as("dist"),
        st_dwithin_poly(col("ring"), col("ring2"), lit(2.5)).as("within"))
    }),

    // ST_ConvexHull + ST_Buffer: hull of the triangle ring (drops the
    // closing duplicate → 3 vertices, area preserved) and a point buffer
    // as a regular 32-gon with closed-form area/perimeter.
    "q139_geo_hull_buffer" -> ((s, d) => {
      val tri = triangles(s, d)
        .withColumn("ring", st_geom_from_text(col("wkt")))
        .withColumn("r", lit(1.0) + col("p_partkey") % 3)
      val hull = st_convex_hull(col("ring"))
      val buf = st_buffer_point(st_point(col("cx"), col("cy")), col("r"))
      tri.select(col("p_partkey"),
        st_npoints(hull).as("hull_np"),
        st_area(hull).as("hull_area"),
        st_area(buf).as("buf_area"),
        st_perimeter(buf).as("buf_perim"))
    }),

    // Polygon overlay set ops (intersection / union / difference areas
    // via convex clipping), ST_Within, ST_Disjoint, and the vertex
    // accessor family — rectangle pairs with closed-form overlap.
    "q140_geo_overlay" -> ((s, d) => {
      val base = triangles(s, d)
        .withColumn("dx", (col("p_partkey") % 4) * lit(0.4) * col("w"))
      def rectWkt(x0: Column, y0: Column, x1: Column, y1: Column) =
        format_string("POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
          x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)
      val withRings = base
        .withColumn("ring_a", st_geom_from_text(rectWkt(col("cx"),
          col("cy"), col("cx") + col("w"), col("cy") + col("h"))))
        .withColumn("ring_b", st_geom_from_text(rectWkt(
          col("cx") + col("dx"), col("cy"),
          col("cx") + col("dx") + col("w"), col("cy") + col("h"))))
        .withColumn("ring_in", st_geom_from_text(rectWkt(
          col("cx") + col("w") / 4, col("cy") + col("h") / 4,
          col("cx") + col("w") / 2, col("cy") + col("h") / 2)))
      withRings.select(col("p_partkey"),
        st_intersection_area(col("ring_a"), col("ring_b"))
          .as("inter_area"),
        st_union_area(col("ring_a"), col("ring_b")).as("union_area"),
        st_difference_area(col("ring_a"), col("ring_b")).as("diff_area"),
        st_within(col("ring_in"), col("ring_a")).as("within_in"),
        st_disjoint(col("ring_a"), col("ring_b")).as("disj"),
        st_x(st_start_point(col("ring_a"))).as("sx"),
        st_y(st_end_point(col("ring_a"))).as("ey"),
        st_x(st_point_n(col("ring_a"), lit(2))).as("p2x"))
    }),

    // MULTIPOLYGON: component count, summed area, global bbox — the
    // multi-geometry types of `Shared/sqltypes.h:84-90` over the flat
    // ring-list encoding (second triangle shifted x+3w, clearly apart).
    "q141_geo_multi" -> ((s, d) => {
      val sh = col("cx") + lit(3.0) * col("w")
      val withWkt = triangles(s, d).withColumn("mwkt", format_string(
        "MULTIPOLYGON (((%s %s, %s %s, %s %s, %s %s)), " +
          "((%s %s, %s %s, %s %s, %s %s)))",
        col("cx"), col("cy"), col("cx") + col("w"), col("cy"),
        col("cx"), col("cy") + col("h"), col("cx"), col("cy"),
        sh, col("cy"), sh + col("w"), col("cy"),
        sh, col("cy") + col("h"), sh, col("cy")))
        .withColumn("rings", st_polygon_from_text(col("mwkt")))
      withWkt.select(col("p_partkey"),
        st_num_geometries(col("rings")).as("n_geoms"),
        st_area_multi(col("rings")).as("total_area"),
        st_xmin(flatten(col("rings"))).as("mxmin"),
        st_xmax(flatten(col("rings"))).as("mxmax"))
    }),

    // GeoJSON-lines source: one Feature per line (the streaming-friendly
    // GeoJSON variant) → json parse → coordinates → ring encoding →
    // measures. The Spark-first answer to the reference's GDAL GeoJSON
    // import (`ImportExport/Importer.cpp` geo path): the parse is a
    // codegen'd projection over a distributed text scan, no pre-load.
    "q143_geojson_source" -> ((s, d) => {
      val dir = graft.Stage.scratchDir("geojson") + "/features"
      triangles(s, d).select(to_json(struct(
        lit("Feature").as("type"),
        struct(lit("Polygon").as("type"),
          array(transform(st_geom_from_text(col("wkt")),
            p => array(p.getField("x"), p.getField("y"))))
            .as("coordinates")).as("geometry"),
        struct(col("p_partkey").as("id")).as("properties"))).as("line"))
        .write.mode("overwrite").text(dir)
      val parsed = s.read.json(dir)
      val ring = transform(flatten(col("geometry.coordinates")),
        a => struct(element_at(a, 1).as("x"), element_at(a, 2).as("y")))
      parsed.select(col("properties.id").as("p_partkey"),
        st_npoints(ring).as("np"),
        st_area(ring).as("area"))
    }),

    // ST_Simplify (Douglas–Peucker): the triangle densified with exact
    // edge midpoints must simplify back to the 3-vertex ring with area
    // and perimeter preserved.
    "q148_geo_simplify" -> ((s, d) => {
      val dense = triangles(s, d).withColumn("wkt7", format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s, %s %s, %s %s))",
        col("cx"), col("cy"),
        col("cx") + col("w") / 2, col("cy"),
        col("cx") + col("w"), col("cy"),
        col("cx") + col("w") / 2, col("cy") + col("h") / 2,
        col("cx"), col("cy") + col("h"),
        col("cx"), col("cy") + col("h") / 2,
        col("cx"), col("cy")))
        .withColumn("ring", st_geom_from_text(col("wkt7")))
        .withColumn("simp", st_simplify(col("ring"), lit(1e-6)))
      dense.select(col("p_partkey"),
        st_npoints(col("ring")).as("np_before"),
        st_npoints(col("simp")).as("np_after"),
        st_area(col("simp")).as("area"),
        st_perimeter(col("simp")).as("perim"))
    }),

    // Bounding-box-intersect JOIN via grid-cell bucketing — the join
    // form of the reference's BoundingBoxIntersectJoinHashTable
    // (`QueryEngine/JoinHashTable/BoundingBoxIntersectJoinHashTable.cpp`):
    // each bbox replicates to the grid cells it covers, pairs form only
    // inside a shared cell (equi-join), then the exact bbox-overlap
    // predicate filters. Never all-pairs.
    "q101_geo_bbox_join" -> ((s, d) => {
      val c = 8.0 // cell size ≥ max bbox extent → ≤4 cells per bbox
      val boxes = triangles(s, d).filter(col("p_partkey") < 500)
        .select(col("p_partkey").as("id"),
          col("cx").as("xmin"), (col("cx") + col("w")).as("xmax"),
          col("cy").as("ymin"), (col("cy") + col("h")).as("ymax"))
      def gridded(prefix: String) = boxes.toDF(
          Seq("id", "xmin", "xmax", "ymin", "ymax").map(prefix + _): _*)
        .withColumn("gx", explode(sequence(
          floor(col(s"${prefix}xmin") / c).cast("long"),
          floor(col(s"${prefix}xmax") / c).cast("long"))))
        .withColumn("gy", explode(sequence(
          floor(col(s"${prefix}ymin") / c).cast("long"),
          floor(col(s"${prefix}ymax") / c).cast("long"))))
      gridded("a_").join(gridded("b_"), Seq("gx", "gy"))
        .filter(col("a_id") < col("b_id") &&
          col("a_xmin") <= col("b_xmax") && col("b_xmin") <= col("a_xmax") &&
          col("a_ymin") <= col("b_ymax") && col("b_ymin") <= col("a_ymax"))
        .select(col("a_id"), col("b_id"))
        .distinct()
    }),

    // Equality / validity / SRID / max-distance family
    // (`HeavyDBSqlOperatorTable.java`: ST_Equals, ST_IsEmpty,
    // ST_IsValid, ST_SetSRID/ST_SRID, ST_MaxDistance, ST_DFullyWithin).
    // Rect fixtures where every expected value is closed-form: ring_b
    // equals ring_a exactly when p_partkey is odd (else shifted w/2),
    // the rect's max self-distance is its diagonal, and the degenerate
    // all-same-vertex ring is invalid.
    "q163_geo_validity" -> ((s, d) => {
      def rectWkt(x0: Column, y0: Column, x1: Column, y1: Column) =
        format_string("POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
          x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)
      val shift = when(col("p_partkey") % 2 === 0, col("w") / 2)
        .otherwise(lit(0.0))
      val withRings = triangles(s, d)
        .withColumn("ring_a", st_geom_from_text(rectWkt(col("cx"),
          col("cy"), col("cx") + col("w"), col("cy") + col("h"))))
        .withColumn("ring_b", st_geom_from_text(rectWkt(
          col("cx") + shift, col("cy"),
          col("cx") + shift + col("w"), col("cy") + col("h"))))
        .withColumn("degen", st_geom_from_text(format_string(
          "POLYGON ((%s %s, %s %s, %s %s, %s %s))",
          col("cx"), col("cy"), col("cx"), col("cy"),
          col("cx"), col("cy"), col("cx"), col("cy"))))
      withRings.select(col("p_partkey"),
        st_equals(col("ring_a"), col("ring_b")).as("eq"),
        st_is_empty(slice(col("ring_a"), 1, 0)).as("empty_ok"),
        st_is_empty(col("ring_a")).as("nonempty_empty"),
        st_is_valid(col("ring_a")).as("valid_a"),
        st_is_valid(col("degen")).as("valid_degen"),
        graft.functions.GeoFunctions.st_srid(
          st_set_srid(col("ring_a"), lit(4326))).as("srid"),
        st_max_distance(col("ring_a"), col("ring_a")).as("maxd"),
        st_dfully_within(col("ring_a"), col("ring_b"), lit(100.0))
          .as("dfw_far"),
        st_dfully_within(col("ring_a"), col("ring_a"), lit(1.0))
          .as("dfw_near"))
    })
  )

  /** H3 hex-grid family (reference `HeavyDBSqlOperatorTable.java:
    * 346-348,4241-4286`, `QueryEngine/ExtensionFunctionsH3.hpp`): index
    * bit math exact per the public H3 spec; CellToPoint/Boundary/
    * PointToCell GEODETIC via H3Geo (libh3-identical ids). The
    * planted set exercises hexagon + pentagon base cells, res 0-3,
    * validity rejections (pentagon leading-K digit, bad mode), parent,
    * and the string round-trip; the oracle replays every value in
    * closed form.
    */
  private val h3Queries: Seq[(String, Q)] = Seq(
    "q179_h3_cells" -> ((s, _) => {
      import s.implicits._
      import graft.functions.H3
      import graft.functions.H3Functions._
      val planted: Seq[Long] = Seq(
        H3.build(0, Nil),           // res-0 hexagon
        H3.build(4, Nil),           // res-0 pentagon (5 boundary verts)
        H3.build(10, Seq(0)),       // res-1 center child
        H3.build(10, Seq(4)),       // res-1 I-direction child
        H3.build(37, Seq(3, 5)),    // res-2
        H3.build(121, Seq(6, 2, 1)),// res-3 (Class III rotation path)
        H3.build(4, Seq(1)),        // INVALID: pentagon leading K digit
        123L)                       // INVALID: mode 0
      val df = planted.toDF("cell")
      val pt = h3_celltopoint(col("cell"))
      val ring = h3_celltoboundary_polygon(col("cell"))
      df.select(col("cell"),
        h3_getresolution(col("cell")).as("res"),
        h3_isvalidcell(col("cell")).as("valid"),
        h3_celltoparent0(col("cell")).as("parent0"),
        h3_celltostring(col("cell")).as("hexstr"),
        (h3_stringtocell(h3_celltostring(col("cell"))) === col("cell"))
          .as("rt_ok"),
        round(pt.getField("x"), 9).as("cx"),
        round(pt.getField("y"), 9).as("cy"),
        round(element_at(ring, 1).getField("x"), 9).as("b0x"),
        round(element_at(ring, 1).getField("y"), 9).as("b0y"),
        size(ring).as("n_verts"),
        // Inverse mapping closes the loop: PointToCell(CellToPoint(c))
        // must rebuild c exactly (false only for the mode-0 junk cell,
        // whose center quantizes to the VALID res-0 cell of base 0).
        (h3_pointtocell(pt, h3_getresolution(col("cell"))) === col("cell"))
          .as("pt_rt_ok"))
    }),

    // ST_ConcaveHull (`HeavyDBSqlOperatorTable.java:300,3213` in
    // /root/reference; GEOS there, Moreira-Santos k-NN hull here — see
    // GeomExpressions.STConcaveHull). Planted shapes whose hulls are
    // known in closed form: a U (concave hull follows the notch, convex
    // hull closes it), a square with interior point (the k=3 k-NN walk
    // dips inward through the interior point, concave area 3.0 vs
    // convex 4.0), and a comb (three concave teeth). The oracle pins
    // vertex count, concave/convex areas, and the exact vertex walk.
    "q182_concave_hull" -> ((s, _) => {
      def ringOf(pts: (Double, Double)*): Column =
        array(pts.map { case (x, y) =>
          struct(lit(x).as("x"), lit(y).as("y")) }: _*)
      val one = s.range(1)
      def row(name: String, pts: Seq[(Double, Double)]) =
        one.select(lit(name).as("shape"), ringOf(pts: _*).as("pts"))
      val shapes =
        row("square_center",
          Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (1.0, 1.0)))
        .unionAll(row("u_shape",
          Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (3.0, 4.0), (3.0, 1.5),
            (2.0, 1.2), (1.0, 1.5), (1.0, 4.0), (0.0, 4.0))))
        .unionAll(row("comb",
          Seq((0.0, 0.0), (6.0, 0.0), (6.0, 3.0), (5.0, 1.2), (4.0, 3.0),
            (3.0, 1.2), (2.0, 3.0), (1.0, 1.2), (0.0, 3.0))))
      val hull = st_concave_hull(col("pts"), lit(3))
      shapes.select(col("shape"),
        size(hull).as("n_hull"),
        st_area(hull).as("area"),
        st_area(st_convex_hull(col("pts"))).as("convex_area"),
        concat_ws(";", transform(hull,
          p => concat(p.getField("x"), lit(","), p.getField("y"))))
          .as("hull_walk"))
    }),

    // Geodetic H3 rollup over fixture data: cells are CONSTRUCTED by
    // pure index bit math on BOTH engines (so DuckDB can replay them),
    // then the Spark side additionally routes every cell through the
    // geodetic geometry — CellToPoint then LonLatToCell must rebuild
    // the cell (libh3-identical encode of the decoded center) — and
    // aggregates per res-1 parent (parent = bit truncation, also
    // DuckDB-expressible). geo_mismatch must be 0 for every parent: a
    // single geodetic divergence anywhere on the globe flips the hash.
    // Scale: one projection + one ~800-group aggregate, no other
    // shuffle; H3 eval is per-row O(res).
    "q421_h3_geodetic_rollup" -> ((s, d) => {
      import graft.functions.H3Functions._
      val pents = Seq(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
      val o = t(s, d, "orders").select(col("o_orderkey").as("id"))
      val bc = (col("id") % 122).cast("long")
      val pent = bc.isin(pents.map(_.toLong): _*)
      val d1r = expr("id div 122") % 7
      val d1 = when(pent && d1r === 1, lit(2L)).otherwise(d1r)
      val d2r = expr("id div 854") % 7
      // pentagon leading-K guard applies to the first NONZERO digit
      val d2 = when(pent && d1 === 0 && d2r === 1, lit(2L)).otherwise(d2r)
      val cell = lit((1L << 59) | (2L << 52) | ((1L << 39) - 1))
        .bitwiseOR(shiftleft(bc, 45))
        .bitwiseOR(shiftleft(d1, 42))
        .bitwiseOR(shiftleft(d2, 39))
      val pt = h3_celltopoint(cell)
      val cell2 = h3_lonlattocell(pt.getField("x"), pt.getField("y"), lit(2))
      val parentKeep = ~((0xFL << 52) | ((1L << 42) - 1))
      val parent1 = cell.bitwiseAND(lit(parentKeep))
        .bitwiseOR(lit((1L << 52) | ((1L << 42) - 1)))
      o.select(parent1.as("parent1"),
          when(cell2 === cell, 0L).otherwise(1L).as("miss"))
        .groupBy(col("parent1"))
        .agg(count(lit(1)).as("n"), sum(col("miss")).as("geo_mismatch"))
    })
  )

  val queries: Seq[(String, Q)] = baseQueries ++ polyQueries ++ h3Queries

  /** Closed-form H3 oracle: every planted cell's center/boundary/parent
    * is literal arithmetic (the per-row derivations are in the planted
    * list's comments in h3Queries); the rotation constants are
    * cos = 5/(2*sqrt(7)), sin = sqrt(3)/(2*sqrt(7)).
    */
  private def h3Oracle: String = {
    import graft.functions.H3
    val c1 = H3.build(0, Nil); val c2 = H3.build(4, Nil)
    val c3 = H3.build(10, Seq(0)); val c4 = H3.build(10, Seq(4))
    val c5 = H3.build(37, Seq(3, 5)); val c6 = H3.build(121, Seq(6, 2, 1))
    val c7 = H3.build(4, Seq(1))
    val clearMask = ~((0xFL << 52) | ((1L << 45) - 1))
    val digitMask = (1L << 45) - 1
    // Geodetic centers / first boundary vertices / ring sizes pinned
    // from the INDEPENDENT Python implementation of the published H3
    // algorithms (tools/h3proto.py — the derivation that also
    // reproduces the reference's Tests/GeospatialTest.cpp pinned
    // vector). Both engines round to 9 decimals, so this is a genuine
    // cross-implementation differential, not a replay.
    s"""WITH cells(cell, res, valid, n_verts, pt_rt_ok, cx, cy, b0x, b0y) AS (VALUES
         ($c1, 0, true, 7, true, 38.023407008, 79.24239851,
          31.831280499, 68.929957882),
         ($c2, 0, true, 6, true, 10.536199075, 64.700000128,
          -10.444977545, 63.095054078),
         ($c3, 1, true, 7, true, 127.087745149, 55.257464629,
          119.522746455, 54.659630264),
         ($c4, 1, true, 7, true, 113.747807474, 57.63969197,
          106.403495638, 56.210610738),
         ($c5, 2, true, 7, true, 137.650852658, 20.632521702,
          136.224646053, 21.684143267),
         ($c6, 3, true, 7, true, 162.539594489, -82.350329479,
          159.947275953, -81.880622585),
         ($c7, 1, false, 8, false, 8.788269519, 70.405910144,
          14.813658726, 67.351768675),
         (123, 0, false, 7, false, 38.023407008, 79.24239851,
          31.831280499, 68.929957882))
       SELECT cell::BIGINT AS cell, res::INT AS res, valid,
              ((cell & $clearMask) | $digitMask)::BIGINT AS parent0,
              lower(to_hex(cell)) AS hexstr,
              (('0x' || lower(to_hex(cell)))::BIGINT = cell) AS rt_ok,
              cx::DOUBLE AS cx, cy::DOUBLE AS cy,
              b0x::DOUBLE AS b0x, b0y::DOUBLE AS b0y,
              n_verts::INT AS n_verts, pt_rt_ok
       FROM cells"""
  }

  private val q421Oracle: String = {
    val pents = "(4,14,24,38,49,58,63,72,83,97,107,117)"
    // the geodetic round-trip is exact (H3GeoSpec); the oracle replays
    // the index algebra and pins geo_mismatch = 0
    s"""WITH c AS (
         SELECT (o_orderkey % 122)::BIGINT AS bc,
                CASE WHEN (o_orderkey % 122) IN $pents
                      AND ((o_orderkey // 122) % 7) = 1
                     THEN 2 ELSE ((o_orderkey // 122) % 7) END AS d1x,
                ((o_orderkey // 854) % 7) AS d2r
         FROM orders),
       c2 AS (
         SELECT bc, d1x,
                CASE WHEN bc IN $pents AND d1x = 0 AND d2r = 1
                     THEN 2 ELSE d2r END AS d2x
         FROM c),
       cells AS (
         SELECT ((1::BIGINT << 59) | (2::BIGINT << 52)
                 | ((1::BIGINT << 39) - 1) | (bc << 45)
                 | (d1x::BIGINT << 42) | (d2x::BIGINT << 39)) AS cell
         FROM c2)
       SELECT ((cell & ${~((0xFL << 52) | ((1L << 42) - 1))})
               | ${(1L << 52) | ((1L << 42) - 1)})::BIGINT AS parent1,
              count(*)::BIGINT AS n, 0::BIGINT AS geo_mismatch
       FROM cells GROUP BY 1"""
  }

  val oracles: Seq[(String, String)] = Seq(
    "q179_h3_cells" -> h3Oracle,
    "q421_h3_geodetic_rollup" -> q421Oracle,
    // Pinned ground truth for the planted shapes (verified by hand:
    // each walk is a simple polygon starting at the min-y vertex,
    // every input point is inside-or-on, and each concave area is
    // strictly below its convex counterpart — 3<4, 13<16, 13.2<18).
    "q182_concave_hull" ->
      """SELECT * FROM (VALUES
           ('square_center', 5::INT, 3.0::DOUBLE, 4.0::DOUBLE,
            '0.0,0.0;1.0,1.0;2.0,0.0;2.0,2.0;0.0,2.0'),
           ('u_shape', 7::INT, 13.0::DOUBLE, 16.0::DOUBLE,
            '0.0,0.0;3.0,1.5;4.0,0.0;4.0,4.0;3.0,4.0;1.0,4.0;0.0,4.0'),
           ('comb', 8::INT, 13.2::DOUBLE, 18.0::DOUBLE,
            '0.0,0.0;3.0,1.2;5.0,1.2;6.0,0.0;6.0,3.0;4.0,3.0;2.0,3.0;0.0,3.0'))
         v(shape, n_hull, area, convex_area, hull_walk)""",
    "q125_geo_transform" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS lon,
                  fmod(p_retailprice, 50.0) AS lat
           FROM part),
         m AS (
           SELECT p_partkey, lon, lat,
                  radians(lon) * 6378137.0 AS mx,
                  ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137.0 AS my
           FROM p)
         SELECT p_partkey, mx, my,
                degrees(mx / 6378137.0) AS rx,
                degrees(2 * atan(exp(my / 6378137.0)) - pi() / 2) AS ry
         FROM m""",
    "q126_geo_centroid" ->
      """SELECT p_partkey,
                (p_size::DOUBLE - 25.0) + (1.0 + (p_size % 5)) / 3.0
                  AS cent_x,
                fmod(p_retailprice, 50.0) + (1.0 + (p_partkey % 7)) / 3.0
                  AS cent_y
         FROM part""",
    "q127_geo_poly_holes" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS cx,
                  fmod(p_retailprice, 50.0) AS cy,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h
           FROM part)
         SELECT p_partkey, 2::INT AS nrings,
                cx AS bxmin, cx + w AS bxmax,
                cy AS bymin, cy + h AS bymax,
                w * h - (w / 4) * (h / 4) AS area_net
         FROM p""",
    "q128_geo_dwithin_poly" ->
      """WITH p AS (
           SELECT p_partkey,
                  1.0 + (p_size % 5) AS w,
                  (p_partkey % 5) * 0.7 * (1.0 + (p_size % 5)) AS dx
           FROM part)
         SELECT p_partkey,
                greatest(0.0, dx - w) AS dist,
                greatest(0.0, dx - w) <= 2.5 AS within
         FROM p""",
    "q148_geo_simplify" ->
      """WITH p AS (
           SELECT p_partkey,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h
           FROM part)
         SELECT p_partkey, 7::INT AS np_before, 4::INT AS np_after,
                w * h / 2.0 AS area,
                w + h + sqrt(w * w + h * h) AS perim
         FROM p""",
    "q143_geojson_source" ->
      """SELECT p_partkey, 4::INT AS np,
                (1.0 + (p_size % 5)) * (1.0 + (p_partkey % 7)) / 2.0
                  AS area
         FROM part""",
    "q141_geo_multi" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS cx,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h
           FROM part)
         SELECT p_partkey, 2::INT AS n_geoms,
                (w * h)::DOUBLE AS total_area,
                cx AS mxmin, (cx + 4 * w)::DOUBLE AS mxmax
         FROM p""",
    "q139_geo_hull_buffer" ->
      """WITH p AS (
           SELECT p_partkey,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h,
                  1.0 + (p_partkey % 3) AS r
           FROM part)
         SELECT p_partkey, 3::INT AS hull_np,
                w * h / 2.0 AS hull_area,
                0.5 * 32 * r * r * sin(2 * pi() / 32) AS buf_area,
                32 * 2 * r * sin(pi() / 32) AS buf_perim
         FROM p""",
    "q140_geo_overlay" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS cx,
                  fmod(p_retailprice, 50.0) AS cy,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h,
                  (p_partkey % 4) * 0.4 * (1.0 + (p_size % 5)) AS dx
           FROM part)
         SELECT p_partkey,
                greatest(0.0, w - dx) * h AS inter_area,
                2 * w * h - greatest(0.0, w - dx) * h AS union_area,
                w * h - greatest(0.0, w - dx) * h AS diff_area,
                true AS within_in,
                (p_partkey % 4) = 3 AS disj,
                cx AS sx, cy AS ey, cx + w AS p2x
         FROM p""",
    "q68_geo_wkt_measures" ->
      """WITH p AS (
           SELECT p_partkey,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h
           FROM part)
         SELECT p_partkey, 4::INT AS np, w * h / 2.0 AS area,
                w + h + sqrt(w * w + h * h) AS perim
         FROM p""",
    "q69_geo_contains_poly" ->
      """SELECT p_partkey,
                (0.5 + 0.4 * (p_partkey % 3)) < 1.0 AS probe_in,
                false AS probe_out
         FROM part""",
    "q71_geo_intersects" ->
      """SELECT p_partkey, (p_partkey % 5) <= 1 AS hits FROM part""",
    "q104_geo_range_rule" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y
           FROM part)
         SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                sqrt((a.x - b.x)^2 + (a.y - b.y)^2) AS dist
         FROM p a JOIN p b
           ON a.p_partkey < b.p_partkey
          AND sqrt((a.x - b.x)^2 + (a.y - b.y)^2) < 1.0""",
    "q101_geo_bbox_join" ->
      """WITH p AS (
           SELECT p_partkey AS id,
                  p_size::DOUBLE - 25.0 AS xmin,
                  p_size::DOUBLE - 25.0 + 1.0 + (p_size % 5) AS xmax,
                  fmod(p_retailprice, 50.0) AS ymin,
                  fmod(p_retailprice, 50.0) + 1.0 + (p_partkey % 7) AS ymax
           FROM part WHERE p_partkey < 500)
         SELECT a.id AS a_id, b.id AS b_id
         FROM p a JOIN p b
           ON a.id < b.id
          AND a.xmin <= b.xmax AND b.xmin <= a.xmax
          AND a.ymin <= b.ymax AND b.ymin <= a.ymax""",
    "q60_geo_scalar" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y
           FROM part)
         SELECT p_partkey, x, y,
                sqrt((x - 0.0)^2 + (y - 25.0)^2) AS dist,
                2.0 * 6371000.0 * asin(sqrt(
                  sin(radians(25.0 - y) / 2)^2 +
                  cos(radians(y)) * cos(radians(25.0)) *
                  sin(radians(0.0 - x) / 2)^2)) AS dist_m,
                sqrt((x - 0.0)^2 + (y - 25.0)^2) <= 10.0 AS within10,
                (x BETWEEN -10.0 AND 10.0) AND (y BETWEEN 10.0 AND 40.0)
                  AS in_box
         FROM p""",
    "q61_geo_distance_join" ->
      """WITH p AS (
           SELECT p_partkey,
                  p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y
           FROM part)
         SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                sqrt((a.x - b.x)^2 + (a.y - b.y)^2) AS dist
         FROM p a JOIN p b
           ON a.p_partkey < b.p_partkey
          AND sqrt((a.x - b.x)^2 + (a.y - b.y)^2) < 1.0""",
    "q163_geo_validity" ->
      """WITH p AS (
           SELECT p_partkey,
                  1.0 + (p_size % 5) AS w,
                  1.0 + (p_partkey % 7) AS h
           FROM part)
         SELECT p_partkey,
                (p_partkey % 2) <> 0 AS eq,
                true AS empty_ok,
                false AS nonempty_empty,
                true AS valid_a,
                false AS valid_degen,
                4326 AS srid,
                sqrt(w * w + h * h) AS maxd,
                true AS dfw_far,
                false AS dfw_near
         FROM p"""
  )
}
