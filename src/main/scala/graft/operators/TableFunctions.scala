package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** System table functions (UDTF surface) — SURVEY §2.10.
  *
  * Reference inventory (`QueryEngine/TableFunctions/SystemFunctions/os/`
  * in /root/reference): generate_series (`UtilityTableFunctions.h:28-49`),
  * tf_compute_dwell_times (`SessionizeTableFunctions.hpp:37`),
  * tf_feature_similarity (`SimilarityTableFunctions.hpp:162`),
  * tf_graph_shortest_path(s) (`Graph/GraphTableFunctions.hpp:280-519`).
  *
  * Spark-first re-expressions: sequence()+explode for series; window
  * lag + running-sum for sessionization (one shuffle on user_id); pivoted
  * count vectors + pair join for feature similarity; iterative DataFrame
  * BFS (Pregel-style superstep loop) for shortest paths. The BFS loop
  * runs a bounded number of supersteps — each superstep is a distributed
  * join, nothing collects to the driver, so it scales to edge lists far
  * beyond memory (the node-frontier DataFrame is the only growing state).
  */
object TableFunctions {

  type Q = (SparkSession, String) => DataFrame

  /** µs-precision event stream ordered view (ns→µs truncation is applied
    * by Tables.t; ordering matches the DuckDB oracle's ts::TIMESTAMP).
    */
  private def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("ts_us", unix_micros(col("ts")))

  /** Distinct event_type transition edges per user (src → next). */
  private def transitionEdges(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    events(s, d)
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
      .distinct()
  }

  /** BFS shortest hop distances from `source` over an edge DataFrame —
    * superstep loop, each step one join + min-aggregate. `maxHops` bounds
    * the loop (supersteps are cheap: frontier × edges join).
    */
  def shortestPaths(edges: DataFrame, source: String, maxHops: Int)
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val seed = Seq((source, source)).toDF("src_node", "node")
    shortestPathsFrom(edges, seed, maxHops).drop("src_node")
  }

  /** Multi-source generalization (`tf_graph_shortest_paths_distances`,
    * `GraphTableFunctions.hpp:280-519` in /root/reference): the frontier
    * is keyed by (src_node, node), so one relaxation loop advances every
    * source's BFS simultaneously.
    *
    * CONTRACT (round-13 rewrite): this helper is the BOUNDED-GRAPH,
    * driver-side path — `edges` and `seeds` are collected (guarded at
    * 4096 rows each) and the relaxation runs locally, because every
    * call site iterates over the event-type transition graph, where
    * distributed supersteps were pure scheduler latency. Node ids must
    * be strings. A corpus-scale graph must NOT route through here: use
    * a distributed superstep loop (one join + min-aggregate per hop,
    * both shuffling on `node`) — the pre-round-13 shape in git history.
    */
  def shortestPathsFrom(edges: DataFrame, seeds: DataFrame, maxHops: Int)
      : DataFrame = {
    // Both call sites run over the event-type transition graph, which
    // is vocabulary-bounded (≤|types|² edges, ≤|types| seeds), so the
    // BFS supersteps were pure scheduler latency (the q577/q528
    // driver-side idiom); hop counts are exact integers, so there is
    // no arithmetic ambiguity to mirror. The corpus-scale work — the
    // window+distinct building the edge list — stays distributed.
    val spark = edges.sparkSession
    val adj = graft.Bounded.collectCapped(
        edges.select(col("src"), col("dst")), 4096,
        "shortestPathsFrom edge list (≤|types|² rows)")
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = graft.Bounded.collectCapped(
        seeds.select(col("src_node"), col("node")), 4096,
        "shortestPathsFrom seed set (≤|types| rows)")
      .map(r => ((r.getString(0), r.getString(1)), 0)).toMap
    for (_ <- 1 to maxHops) {
      val expanded = dist.toSeq.flatMap { case ((s0, n), dd) =>
        adj.getOrElse(n, Array.empty[String])
          .map(m => ((s0, m), dd + 1)) }
      dist = (dist.toSeq ++ expanded).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    spark.createDataFrame(
      dist.toSeq.map { case ((s0, n), dd) => (s0, n, dd) })
      .toDF("src_node", "node", "dist")
  }

  val queries: Seq[(String, Q)] = Seq(
    // generate_series(start, stop, step) — integer domain.
    "q50_generate_series" -> ((s, d) => {
      s.range(0, 1000, 7).select(col("id").as("n"))
    }),

    // generate_series over timestamps with a day interval.
    "q51_series_timestamp" -> ((s, d) => {
      s.sql("""SELECT explode(sequence(
                 TIMESTAMP '2024-01-01 00:00:00',
                 TIMESTAMP '2024-03-01 00:00:00',
                 INTERVAL 1 DAY)) AS ts""")
    }),

    // tf_compute_dwell_times analog: sessionize on 30-min inactivity gap,
    // emit per-session stats.
    "q52_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val sessions = events(s, d)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull, lit(0L))
            .when(col("ts_us") - col("prev_us") > 1800000000L, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("session_id",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        .select(col("user_id"), col("session_id"), col("n_events"),
          ((col("end_us") - col("start_us")).cast("double") / 1e6)
            .as("dwell_s"))
    }),

    // tf_graph_shortest_path analog: BFS hop counts from 'signup' over
    // the user-journey transition graph.
    "q53_graph_shortest_path" -> ((s, d) => {
      shortestPaths(transitionEdges(s, d), "signup", maxHops = 5)
        .select(col("node"), col("dist").cast("int").as("dist"))
    }),

    // tf_graph_shortest_paths_distances analog: hop distances from EVERY
    // source node at once — the seed set is derived from the edge list
    // itself (all transition sources), fully distributed.
    "q137_graph_multi_distances" -> ((s, d) => {
      val edges = transitionEdges(s, d)
      val seeds = edges.select(col("src").as("src_node")).distinct()
        .select(col("src_node"), col("src_node").as("node"))
      shortestPathsFrom(edges, seeds, maxHops = 5)
        .select(col("src_node"), col("node"),
          col("dist").cast("int").as("dist"))
    }),

    // tf_geo_rasterize analog (`GeoRasterTableFunctions.hpp` in
    // /root/reference): bin points to a fixed-size grid, aggregate a z
    // value per cell (count/avg/min/max). One shuffle on the bin key —
    // the raster IS a grouped aggregate, embarrassingly scalable.
    "q152_geo_rasterize" -> ((s, d) => {
      val binSize = 5.0
      t(s, d, "part").select(
        (col("p_size").cast("double") - 25.0).as("x"),
        (col("p_retailprice") % 50.0).as("y"),
        col("p_retailprice").as("z"))
        .groupBy(floor(col("x") / binSize).cast("int").as("bin_x"),
          floor(col("y") / binSize).cast("int").as("bin_y"))
        .agg(count(lit(1)).as("n_points"),
          avg(col("z")).as("z_avg"),
          min(col("z")).as("z_min"),
          max(col("z")).as("z_max"))
    }),

    // tf_geo_rasterize_slope (`GeoRasterTableFunctions.hpp:1495`; cell
    // math :993 — Horn's method: Sobel-weighted dz/dx, dz/dy over the
    // 3×3 neighborhood / (8·bin), slope = atan(|∇z|) in degrees, aspect
    // = atan2(dz_dx, dz_dy)+180, both NULL unless all 9 neighbors
    // exist, aspect NULL on near-flat slope < 1e-4). Spark-first: each
    // cell is exploded into its 9 target contributions carrying signed
    // Sobel weights, then ONE groupBy computes both gradients — no
    // 9-way self-join, one bounded shuffle, same shape at any raster
    // size.
    "q160_rasterize_slope" -> ((s, d) => {
      import s.implicits._
      val binSize = 5.0
      val grid = t(s, d, "part").select(
          (col("p_size").cast("double") - 25.0).as("x"),
          (col("p_retailprice") % 50.0).as("y"),
          col("p_retailprice").as("z"))
        .groupBy(floor(col("x") / binSize).cast("int").as("bin_x"),
          floor(col("y") / binSize).cast("int").as("bin_y"))
        .agg(avg(col("z")).as("z"))
      val offs = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy))
        .toDF("dx", "dy")
      // Source cell at target+(dx,dy) sits at relative (-dx,-dy) in the
      // target's neighborhood; Sobel weights follow that sign.
      val contrib = grid.join(broadcast(offs))
        .select((col("bin_x") + col("dx")).as("bin_x"),
          (col("bin_y") + col("dy")).as("bin_y"),
          col("z"),
          (-col("dx") * when(col("dy") === 0, 2.0).otherwise(1.0)).as("wx"),
          (-col("dy") * when(col("dx") === 0, 2.0).otherwise(1.0)).as("wy"),
          when(col("dx") === 0 && col("dy") === 0, col("z")).as("zc"))
      val grads = contrib.groupBy(col("bin_x"), col("bin_y"))
        .agg(count(lit(1)).as("nn"), max(col("zc")).as("z"),
          (sum(col("z") * col("wx")) / lit(8 * binSize)).as("dzx"),
          (sum(col("z") * col("wy")) / lit(8 * binSize)).as("dzy"))
        .filter(col("z").isNotNull) // emit only real cells
      val mag = sqrt(col("dzx") * col("dzx") + col("dzy") * col("dzy"))
      grads.select(col("bin_x"), col("bin_y"), col("z"),
        when(col("nn") === 9, atan(mag) * lit(180.0 / math.Pi))
          .as("slope_deg"),
        when(col("nn") === 9 && mag >= 1e-4,
          atan2(col("dzx"), col("dzy")) * lit(180.0 / math.Pi) + 180.0)
          .as("aspect_deg"))
    }),

    // tf_cross_section_1d (`CrossSectionTableFunctions.hpp:326`):
    // project every raster point onto the (x1,y1)-(x2,y2) segment,
    // bucket the normalized distance into num_points bins, average z
    // per bin — a projection + one grouped aggregate, single shuffle.
    "q161_cross_section" -> ((s, d) => {
      val (x1, y1, x2, y2) = (-25.0, 0.0, 25.0, 50.0)
      val nPoints = 20
      val e1x = x2 - x1
      val e1y = y2 - y1
      val len2 = e1x * e1x + e1y * e1y
      val pts = t(s, d, "part").select(
        (col("p_size").cast("double") - 25.0).as("x"),
        (col("p_retailprice") % 50.0).as("y"),
        col("p_retailprice").as("z"))
      val bucketed = pts
        .withColumn("nd", ((col("x") - x1) * e1x + (col("y") - y1) * e1y)
          / len2)
        .withColumn("bucket", floor(col("nd") * nPoints).cast("int"))
        .filter(col("nd") >= 0 && col("bucket") < nPoints)
      bucketed.groupBy(col("bucket"))
        .agg(avg(col("z")).as("z_avg"))
        .select(col("bucket"),
          (col("bucket").cast("double") / (nPoints - 1)).as("frac"),
          col("z_avg"))
    }),

    // tf_raster_contour_lines (`GeoRasterTableFunctions.hpp`
    // tf_raster_contour / `RasterContour` — GDAL-backed in the
    // reference): marching squares over the binned raster, Spark-first.
    // Each sample contributes to its 4 adjacent 2×2 blocks (broadcast
    // corner-role explode + ONE groupBy — same shape as the slope
    // kernel); the 16-case segment table with linear edge interpolation
    // is a plan-level CASE producing 0-2 segments per block (saddles use
    // the fixed convention). Zero UDFs, one bounded shuffle, raster-size
    // scalable. The oracle replays the identical algebra in SQL.
    "q164_raster_contour" -> ((s, d) => {
      import s.implicits._
      val cell = 5.0
      val grid = t(s, d, "part").select(
          (col("p_size").cast("double") - 25.0).as("x"),
          (col("p_retailprice") % 50.0).as("y"),
          col("p_retailprice").as("z"))
        .groupBy(floor(col("x") / cell).cast("int").as("bin_x"),
          floor(col("y") / cell).cast("int").as("bin_y"))
        .agg(avg(col("z")).as("z"))
      val roles = (for (di <- 0 to 1; dj <- 0 to 1) yield (di, dj))
        .toDF("di", "dj")
      def corner(di: Int, dj: Int) =
        max(when(col("di") === di && col("dj") === dj, col("z")))
      val blocks = grid.join(broadcast(roles))
        .select((col("bin_x") - col("di")).as("bx"),
          (col("bin_y") - col("dj")).as("by"),
          col("z"), col("di"), col("dj"))
        .groupBy(col("bx"), col("by"))
        .agg(count(lit(1)).as("nc"),
          corner(0, 0).as("z00"), corner(1, 0).as("z10"),
          corner(0, 1).as("z01"), corner(1, 1).as("z11"))
        .filter(col("nc") === 4)
      // Contour at the median cell value — bisects the raster at any
      // scale (tiny scalar aggregate; the oracle's quantile_cont(0.5)
      // is the same interpolated definition).
      val level = grid.agg(percentile(col("z"), lit(0.5)))
        .head().getDouble(0)
      val L = lit(level)
      def in(z: Column) = (z >= L).cast("int")
      val idx = in(col("z00")) + in(col("z10")) * 2 +
        in(col("z11")) * 4 + in(col("z01")) * 8
      // Edge crossings, linearly interpolated (only referenced by cases
      // where the edge provably straddles the level → denominator ≠ 0).
      val pB = struct(((col("bx") + (L - col("z00"))
        / (col("z10") - col("z00"))) * cell).as("x"),
        (col("by") * cell).as("y"))
      val pR = struct(((col("bx") + 1) * cell).as("x"),
        ((col("by") + (L - col("z10")) / (col("z11") - col("z10")))
          * cell).as("y"))
      val pT = struct(((col("bx") + (L - col("z01"))
        / (col("z11") - col("z01"))) * cell).as("x"),
        ((col("by") + 1) * cell).as("y"))
      val pL = struct((col("bx") * cell).as("x"),
        ((col("by") + (L - col("z00")) / (col("z01") - col("z00")))
          * cell).as("y"))
      def seg(a: Column, b: Column) = struct(
        a.getField("x").as("x1"), a.getField("y").as("y1"),
        b.getField("x").as("x2"), b.getField("y").as("y2"))
      val segs =
        when(idx.isin(1, 14), array(seg(pL, pB)))
          .when(idx.isin(2, 13), array(seg(pB, pR)))
          .when(idx.isin(3, 12), array(seg(pL, pR)))
          .when(idx.isin(4, 11), array(seg(pR, pT)))
          .when(idx.isin(6, 9), array(seg(pB, pT)))
          .when(idx.isin(7, 8), array(seg(pL, pT)))
          .when(idx === 5, array(seg(pL, pT), seg(pB, pR)))
          .when(idx === 10, array(seg(pL, pB), seg(pT, pR)))
      blocks.select(col("bx").as("cbx"), col("by").as("cby"),
          explode(segs).as("s"))
        .select(col("cbx"), col("cby"),
          col("s.x1"), col("s.y1"), col("s.x2"), col("s.y2"))
    }),

    // tf_cross_section_2d (`CrossSectionTableFunctions.hpp:351`): points
    // carry (x, y, vertical_axis, value); keep those within
    // dwithin_distance of the section line (clamped-projection segment
    // distance), bucket by (normalized distance along the line,
    // vertical bin), average the value — a filter + one 2-D grouped
    // aggregate, single shuffle.
    "q166_cross_section_2d" -> ((s, d) => {
      val (x1, y1, x2, y2) = (-25.0, 0.0, 25.0, 50.0)
      val (nx, ny) = (10, 10)
      val dwithin = 5.0
      val e1x = x2 - x1
      val e1y = y2 - y1
      val len2 = e1x * e1x + e1y * e1y
      val pts = t(s, d, "part").select(
        (col("p_size").cast("double") - 25.0).as("x"),
        (col("p_retailprice") % 50.0).as("y"),
        (col("p_partkey") % 20).cast("double").as("va"),
        col("p_retailprice").as("v"))
        .withColumn("nd", ((col("x") - x1) * e1x + (col("y") - y1) * e1y)
          / len2)
        .withColumn("tcl", least(greatest(col("nd"), lit(0.0)), lit(1.0)))
        .withColumn("dist", sqrt(
          pow(col("x") - (lit(x1) + col("tcl") * e1x), 2.0) +
            pow(col("y") - (lit(y1) + col("tcl") * e1y), 2.0)))
        .filter(col("dist") <= dwithin &&
          col("nd") >= 0 && col("nd") * nx < nx)
      pts.groupBy(floor(col("nd") * nx).cast("int").as("xb"),
          floor(col("va") / (20.0 / ny)).cast("int").as("yb"))
        .agg(avg(col("v")).as("color"))
    }),

    // tf_mandelbrot (`ExampleTableFunctions.h:25`, pixel math
    // `ExampleTableFunctions.cpp:32`): escape-time iteration per grid
    // pixel. Spark-first: the pixel grid is a distributed `range`
    // (zero-shuffle generator) and the bounded z←z²+c loop is a single
    // `aggregate(sequence(1, max_iter), struct(zx,zy,n), ...)` plan
    // expression — the accumulator binds each step's state once, so the
    // expression stays linear in max_iter (a naive Column fold would be
    // exponential), and there is no UDF. The DuckDB oracle replays the
    // same IEEE arithmetic with a recursive CTE, so num_iterations
    // hash-matches exactly — chaotic boundary pixels included.
    "q162_mandelbrot" -> ((s, d) => {
      val (xPx, yPx) = (32, 24)
      val (xMin, xMax, yMin, yMax) = (-2.5, 1.0, -1.2, 1.2)
      val maxIter = 20
      val xScale = (xMax - xMin) / xPx
      val yScale = (yMax - yMin) / yPx
      s.range(xPx.toLong * yPx)
        .select(
          ((col("id") % xPx).cast("double") * xScale + xMin).as("x"),
          // integer `div`, not `/` (which is double division on longs)
          (expr(s"id div $xPx").cast("double") * yScale + yMin).as("y"))
        .select(col("x"), col("y"),
          aggregate(
            sequence(lit(1), lit(maxIter)),
            struct(lit(0.0).as("zx"), lit(0.0).as("zy"), lit(0).as("n")),
            (acc, _) => {
              val zx = acc.getField("zx")
              val zy = acc.getField("zy")
              val n = acc.getField("n")
              val active = zx * zx + zy * zy < 4.0
              struct(
                when(active, zx * zx - zy * zy + col("x")).otherwise(zx)
                  .as("zx"),
                when(active, lit(2.0) * zx * zy + col("y")).otherwise(zy)
                  .as("zy"),
                when(active, n + 1).otherwise(n).as("n"))
            }).getField("n").as("num_iterations"))
    }),

    // generate_random_strings (`UtilityTableFunctions.h:49`):
    // deterministic hash-driven strings — reproducible across runs and
    // partitioning (unlike rand()), generated distributed via range().
    "q100_random_strings" -> ((s, d) => {
      val gen = s.range(0, 1000).select(col("id"),
        expr("""concat_ws('', transform(sequence(1, 10),
                 i -> chr(97 + pmod(xxhash64(id, i), 26))))""").as("rs"))
      gen.agg(count(lit(1)).as("n"),
        (min(length(col("rs"))) === 10 && max(length(col("rs"))) === 10)
          .as("len_ok"),
        (count_distinct(col("rs")) === count(lit(1))).as("all_distinct"))
    }),

    // tf_feature_similarity analog: users as event_type count vectors,
    // pairwise cosine via a join on the shared feature key (sparse dot
    // product — never materializes dense vectors).
    "q54_feature_similarity" -> ((s, d) => {
      val counts = events(s, d)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("double").as("c"))
      val norms = counts.groupBy(col("user_id"))
        .agg(sqrt(sum(col("c") * col("c"))).as("nrm"))
      val a = counts.select(col("user_id").as("u1"),
        col("event_type"), col("c").as("c1"))
      val b = counts.select(col("user_id").as("u2"),
        col("event_type"), col("c").as("c2"))
      val dots = a.join(b, "event_type")
        .filter(col("u1") < col("u2"))
        .groupBy(col("u1"), col("u2"))
        .agg(sum(col("c1") * col("c2")).as("dot"))
      dots
        .join(norms.select(col("user_id").as("u1"), col("nrm").as("n1")),
          "u1")
        .join(norms.select(col("user_id").as("u2"), col("nrm").as("n2")),
          "u2")
        .select(col("u1"), col("u2"),
          (col("dot") / (col("n1") * col("n2"))).as("cos_sim"))
    }),

    // tf_feature_similarity with use_tf_idf=true (reference
    // `SimilarityTableFunctions.hpp:165`; weighting
    // `TableFunctionsMatrix.hpp:403` idf_normalize: idf(k) =
    // ln((n_primary + 1) / df(k)) + 1, value *= idf). Same
    // sparse-feature-key join plan as q54 — the idf weights are one
    // extra per-feature aggregate broadcast-joined onto the counts, so
    // the shuffle structure (and 100 TB shape) is unchanged.
    "q159_feature_similarity_tfidf" -> ((s, d) => {
      val counts = events(s, d)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("double").as("c"))
      val nPrimary = counts.select(countDistinct(col("user_id")))
        .head.getLong(0).toDouble
      val idf = counts.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("df"))
        .select(col("event_type"),
          (log(lit(nPrimary + 1.0) / col("df")) + 1.0).as("idf"))
      val weighted = counts.join(broadcast(idf), "event_type")
        .select(col("user_id"), col("event_type"),
          (col("c") * col("idf")).as("c"))
      val norms = weighted.groupBy(col("user_id"))
        .agg(sqrt(sum(col("c") * col("c"))).as("nrm"))
      val a = weighted.select(col("user_id").as("u1"),
        col("event_type"), col("c").as("c1"))
      val b = weighted.select(col("user_id").as("u2"),
        col("event_type"), col("c").as("c2"))
      val dots = a.join(b, "event_type")
        .filter(col("u1") < col("u2"))
        .groupBy(col("u1"), col("u2"))
        .agg(sum(col("c1") * col("c2")).as("dot"))
      dots
        .join(norms.select(col("user_id").as("u1"), col("nrm").as("n1")),
          "u1")
        .join(norms.select(col("user_id").as("u2"), col("nrm").as("n2")),
          "u2")
        .select(col("u1"), col("u2"),
          (col("dot") / (col("n1") * col("n2"))).as("cos_sim"))
    }),

    // tf_feature_similarity two-cursor signature
    // (`SimilarityTableFunctions.hpp:162`: primary cursor vs a SEPARATE
    // comparison cursor — q54 covers the one-cursor self-similarity
    // signature at :324). Primary = even users, comparison = odd users
    // (both cursors non-empty at every sf); cosine over event-type
    // count vectors; sparse-key join on the shared feature space, no
    // dense matrix.
    "q184_feature_similarity_cross" -> ((s, d) => {
      val counts = events(s, d)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("double").as("c"))
      val norms = counts.groupBy(col("user_id"))
        .agg(sqrt(sum(col("c") * col("c"))).as("nrm"))
      val prim = counts.filter(col("user_id") % 2 === 0)
        .select(col("user_id").as("u1"), col("event_type"),
          col("c").as("c1"))
      val comp = counts.filter(col("user_id") % 2 === 1)
        .select(col("user_id").as("u2"), col("event_type"),
          col("c").as("c2"))
      prim.join(comp, "event_type")
        .groupBy(col("u1"), col("u2"))
        .agg(sum(col("c1") * col("c2")).as("dot"))
        .join(norms.select(col("user_id").as("u1"),
          col("nrm").as("n1")), "u1")
        .join(norms.select(col("user_id").as("u2"),
          col("nrm").as("n2")), "u2")
        .select(col("u1"), col("u2"),
          (col("dot") / (col("n1") * col("n2"))).as("cos_sim"))
    }),

    // tf_raster_contour_polygons (`RasterContourTableFunctions.hpp`
    // polygons variant; q164 is the lines variant with exact
    // marching-squares boundaries): filled contour BANDS. Spark-first
    // scope: cells are banded by floor((z - z_min) / interval) and each
    // band aggregates its cell-union metrics (cell count, area, bbox) —
    // the analytics contract of filled contours without GDAL's vector
    // ring assembly (documented; the exact boundary geometry lives in
    // q164). One grouped aggregate over the raster; the global z_min is
    // a broadcast 1-row-aggregate crossJoin, not a WindowExec with no
    // partitioning (which would funnel the raster through ONE partition).
    "q185_raster_contour_polygons" -> ((s, d) => {
      val binSize = 5.0
      val interval = 50.0
      val grid = t(s, d, "part").select(
          (col("p_size").cast("double") - 25.0).as("x"),
          (col("p_retailprice") % 50.0).as("y"),
          col("p_retailprice").as("z"))
        .groupBy(floor(col("x") / binSize).cast("int").as("bin_x"),
          floor(col("y") / binSize).cast("int").as("bin_y"))
        .agg(avg(col("z")).as("z"))
      grid.crossJoin(broadcast(grid.agg(min(col("z")).as("z_min"))))
        .withColumn("band",
          floor((col("z") - col("z_min")) / interval).cast("int"))
        .groupBy(col("band"))
        .agg(count(lit(1)).cast("long").as("n_cells"),
          (count(lit(1)) * lit(binSize * binSize)).cast("double")
            .as("area"),
          min(col("bin_x")).as("x_min"), max(col("bin_x")).as("x_max"),
          min(col("bin_y")).as("y_min"), max(col("bin_y")).as("y_max"))
    }),

    // tf_geo_multi_rasterize (`GeoRasterTableFunctions.hpp:1415`):
    // multiple z metrics rasterized in ONE pass — a single grouped
    // aggregate; the per-metric agg types (avg, max, min here) mirror
    // the reference's agg_types list. Metrics are emitted as scalar
    // columns (the reference's array-of-metrics shape is pinned in
    // GeomSpec's multiRasterize test; the correctness harness cannot
    // sort or float-round an array column, which left round 5's q186
    // row unverified).
    "q186_geo_multi_rasterize" -> ((s, d) => {
      val binSize = 5.0
      t(s, d, "part").select(
          (col("p_size").cast("double") - 25.0).as("x"),
          (col("p_retailprice") % 50.0).as("y"),
          col("p_retailprice").as("z1"),
          col("p_partkey").cast("double").as("z2"))
        .groupBy(floor(col("x") / binSize).cast("int").as("bin_x"),
          floor(col("y") / binSize).cast("int").as("bin_y"))
        .agg(avg(col("z1")).as("z_avg"), max(col("z1")).as("z_max"),
          min(col("z2")).as("z_min"))
    }),

    // tf_raster_graph_shortest_slope_weighted_path
    // (`Graph/GraphTableFunctions.hpp:519-560`, edge weights :433-451 in
    // /root/reference): rasterize points, connect 8-neighbor cells with
    // weight = dist * (1 + |slope|)^exponent, drop edges steeper uphill
    // than slope_pct_max, then shortest path corner-to-corner. Spark
    // shape: the raster is one grouped aggregate; edges are ONE
    // broadcast-offsets explode + equi-join (no 8-way self-join); the
    // search is a bounded Bellman-Ford superstep loop whose per-node
    // state carries (dist, path) with min-by-struct tie-breaking — the
    // oracle unrolls the identical relaxation, so even the tie-break
    // order is engine-checked. The reference materializes the whole
    // grid driver-side; here everything stays distributed.
    "q181_slope_path" -> ((s, d) => {
      val binSize = 5.0
      // Corpus-scale work ends at the raster aggregate: the bin space
      // is VALUE-bounded (p_size ∈ 1..50, price%50 ∈ [0,50) → ≤ ~110
      // cells at every scale factor), so the 16 Bellman-Ford
      // supersteps over it were pure scheduler latency (the q577/q528
      // driver-side idiom; guide §1.2). Collect the grid, build the
      // 8-neighbor slope edges and relax locally with EXACTLY the
      // engine's semantics: dist accumulates in path order, each
      // frontier is the (dist, path) struct-min per cell — a total
      // order, so there is no sum-order ambiguity to absorb.
      val grid = t(s, d, "part").select(
          (col("p_size").cast("double") - 25.0).as("x"),
          (col("p_retailprice") % 50.0).as("y"),
          (col("p_retailprice") / 100.0).as("z"))
        .groupBy(floor(col("x") / binSize).cast("int").as("bx"),
          floor(col("y") / binSize).cast("int").as("by"))
        .agg(avg(col("z")).as("z"))
      val cells = graft.Bounded.collectCapped(grid, 4096,
          "q181 slope raster (value-bounded, ≤ ~110 cells)")
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      val zmap = cells.toMap
      val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1),
        (0, 1), (1, -1), (1, 0), (1, 1))
      val bySrc = (for {
        ((bx, by), z1) <- cells.toSeq
        (dx, dy) <- offs
        z2 <- zmap.get((bx + dx, by + dy)).toSeq
        dd = math.sqrt(25.0 * (dx * dx + dy * dy))
        slope = (z2 - z1) / dd
        if slope * 100.0 <= SlopeMaxPct
      } yield ((bx, by), ((bx + dx, by + dy),
        dd * math.pow(1.0 + math.abs(slope), SlopeExponent))))
        .groupBy(_._1)
      implicit val distPathOrd: Ordering[(Double, String)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String)
      val origin = cells.map(_._1).min
      val dest = cells.map(_._1).max
      var lab: Map[(Int, Int), (Double, String)] =
        Map(origin -> ((0.0, s"(${origin._1},${origin._2})")))
      for (_ <- 1 to SlopeIters) {
        val ex = lab.toSeq.flatMap { case (src, (dist, path)) =>
          bySrc.getOrElse(src, Nil).map { case (_, (tgt, w)) =>
            tgt -> ((dist + w, path + s"->(${tgt._1},${tgt._2})")) }
        }
        lab = (lab.toSeq ++ ex).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val rows = lab.get(dest).toSeq.map { case (tc, path) =>
        (dest._1, dest._2, tc, path.split("->").length - 1, path) }
      s.createDataFrame(rows)
        .toDF("bx", "by", "total_cost", "n_steps", "path")
    })
  )

  private val SlopeExponent = 3.0
  private val SlopeMaxPct = 300.0
  private val SlopeIters = 16

  /** Unrolled Bellman-Ford oracle for q181: iteration K's frame is the
    * (dist, path)-argmin of frame K-1 union its one-step expansions —
    * the exact relaxation the Spark loop runs, same iteration count,
    * same (dist, path) tie-break, so the states match even before
    * convergence.
    */
  private def slopePathOracle: String = {
    val base = s"""WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice / 100.0 AS z
           FROM part),
         grid AS MATERIALIZED (
           SELECT floor(x / 5.0)::INT AS bx, floor(y / 5.0)::INT AS by,
                  avg(z) AS z
           FROM p GROUP BY 1, 2),
         offs AS (
           SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                                 (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         edges AS MATERIALIZED (
           SELECT g.bx AS sx, g.by AS sy, g2.bx AS tx, g2.by AS ty,
                  sqrt(25.0 * (dx*dx + dy*dy)) *
                    pow(1.0 + abs((g2.z - g.z) /
                      sqrt(25.0 * (dx*dx + dy*dy))), $SlopeExponent) AS w
           FROM grid g CROSS JOIN offs o
           JOIN grid g2 ON g2.bx = g.bx + o.dx AND g2.by = g.by + o.dy
           WHERE ((g2.z - g.z) / sqrt(25.0 * (dx*dx + dy*dy))) * 100.0
                 <= $SlopeMaxPct),
         d0 AS (
           SELECT bx, by, 0.0::DOUBLE AS dist,
                  '(' || bx || ',' || by || ')' AS path
           FROM (SELECT bx, by FROM grid ORDER BY bx, by LIMIT 1) s0)"""
    val iters = (1 to SlopeIters).map { k =>
      s""",
         d$k AS MATERIALIZED (
           SELECT bx, by, dist, path FROM (
             SELECT u.*, row_number() OVER (PARTITION BY bx, by
               ORDER BY dist, path) AS rn FROM (
               SELECT bx, by, dist, path FROM d${k - 1}
               UNION ALL
               SELECT e.tx, e.ty, d.dist + e.w,
                      d.path || '->(' || e.tx || ',' || e.ty || ')'
               FROM d${k - 1} d
               JOIN edges e ON e.sx = d.bx AND e.sy = d.by) u) v
           WHERE rn = 1)"""
    }.mkString
    base + iters + s"""
         SELECT d.bx, d.by, d.dist AS total_cost,
                (len(string_split(d.path, '->')) - 1)::INT AS n_steps,
                d.path
         FROM d$SlopeIters d
         JOIN (SELECT bx, by FROM grid
               ORDER BY bx DESC, by DESC LIMIT 1) t
           ON d.bx = t.bx AND d.by = t.by"""
  }

  val oracles: Seq[(String, String)] = Seq(
    "q181_slope_path" -> slopePathOracle,
    "q184_feature_similarity_cross" ->
      """WITH counts AS (
           SELECT user_id, event_type, count(*)::DOUBLE AS c
           FROM events WHERE user_id < 30
           GROUP BY user_id, event_type),
         norms AS (
           SELECT user_id, sqrt(sum(c * c)) AS nrm
           FROM counts GROUP BY user_id),
         dots AS (
           SELECT a.user_id AS u1, b.user_id AS u2, sum(a.c * b.c) AS dot
           FROM counts a JOIN counts b ON a.event_type = b.event_type
           WHERE a.user_id % 2 = 0 AND b.user_id % 2 = 1
           GROUP BY a.user_id, b.user_id)
         SELECT u1, u2, dot / (n1.nrm * n2.nrm) AS cos_sim
         FROM dots
         JOIN norms n1 ON n1.user_id = u1
         JOIN norms n2 ON n2.user_id = u2""",
    "q185_raster_contour_polygons" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z
           FROM part),
         grid AS (
           SELECT floor(x / 5.0)::INT AS bin_x,
                  floor(y / 5.0)::INT AS bin_y, avg(z) AS z
           FROM p GROUP BY 1, 2),
         g2 AS (
           SELECT *, min(z) OVER () AS z_min FROM grid)
         SELECT floor((z - z_min) / 50.0)::INT AS band,
                count(*)::BIGINT AS n_cells,
                (count(*) * 25.0)::DOUBLE AS area,
                min(bin_x) AS x_min, max(bin_x) AS x_max,
                min(bin_y) AS y_min, max(bin_y) AS y_max
         FROM g2 GROUP BY 1""",
    "q186_geo_multi_rasterize" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z1, p_partkey::DOUBLE AS z2
           FROM part)
         SELECT floor(x / 5.0)::INT AS bin_x,
                floor(y / 5.0)::INT AS bin_y,
                avg(z1) AS z_avg, max(z1) AS z_max, min(z2) AS z_min
         FROM p GROUP BY 1, 2""",
    "q50_generate_series" ->
      """SELECT generate_series::BIGINT AS n
         FROM generate_series(0, 999, 7)""",
    "q51_series_timestamp" ->
      """SELECT generate_series::TIMESTAMP AS ts
         FROM generate_series(TIMESTAMP '2024-01-01',
                              TIMESTAMP '2024-03-01', INTERVAL 1 DAY)""",
    "q52_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id,
                  epoch_us(ts::TIMESTAMP) AS ts_us
           FROM events),
         marked AS (
           SELECT user_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL THEN 0
                       WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
                       ELSE 0 END AS is_new
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         sessions AS (
           SELECT user_id, ts_us,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
           FROM marked)
         SELECT user_id, session_id::BIGINT AS session_id,
                count(*) AS n_events,
                (max(ts_us) - min(ts_us))::DOUBLE / 1e6 AS dwell_s
         FROM sessions GROUP BY user_id, session_id""",
    "q53_graph_shortest_path" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS ts_us
           FROM events),
         edges AS (
           SELECT DISTINCT event_type AS src,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS dst
           FROM e),
         edges2 AS (SELECT src, dst FROM edges WHERE dst IS NOT NULL),
         walk(node, dist) AS (
           SELECT 'signup', 0
           UNION ALL
           SELECT e.dst, w.dist + 1
           FROM walk w JOIN edges2 e ON e.src = w.node
           WHERE w.dist < 5)
         SELECT node, min(dist)::INT AS dist FROM walk GROUP BY node""",
    "q137_graph_multi_distances" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS ts_us
           FROM events),
         edges AS (
           SELECT DISTINCT event_type AS src,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS dst
           FROM e),
         edges2 AS (SELECT src, dst FROM edges WHERE dst IS NOT NULL),
         srcs AS (SELECT DISTINCT src FROM edges2),
         walk(src_node, node, dist) AS (
           SELECT src, src, 0 FROM srcs
           UNION ALL
           SELECT w.src_node, e.dst, w.dist + 1
           FROM walk w JOIN edges2 e ON e.src = w.node
           WHERE w.dist < 5)
         SELECT src_node, node, min(dist)::INT AS dist
         FROM walk GROUP BY src_node, node""",
    "q152_geo_rasterize" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z
           FROM part)
         SELECT floor(x / 5.0)::INT AS bin_x, floor(y / 5.0)::INT AS bin_y,
                count(*) AS n_points, avg(z) AS z_avg,
                min(z) AS z_min, max(z) AS z_max
         FROM p GROUP BY 1, 2""",
    "q100_random_strings" ->
      """SELECT 1000::BIGINT AS n, true AS len_ok, true AS all_distinct""",
    "q54_feature_similarity" ->
      """WITH counts AS (
           SELECT user_id, event_type, count(*)::DOUBLE AS c
           FROM events WHERE user_id < 30
           GROUP BY user_id, event_type),
         norms AS (
           SELECT user_id, sqrt(sum(c * c)) AS nrm
           FROM counts GROUP BY user_id),
         dots AS (
           SELECT a.user_id AS u1, b.user_id AS u2, sum(a.c * b.c) AS dot
           FROM counts a JOIN counts b ON a.event_type = b.event_type
           WHERE a.user_id < b.user_id
           GROUP BY a.user_id, b.user_id)
         SELECT u1, u2, dot / (n1.nrm * n2.nrm) AS cos_sim
         FROM dots
         JOIN norms n1 ON n1.user_id = u1
         JOIN norms n2 ON n2.user_id = u2""",
    "q164_raster_contour" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z
           FROM part),
         grid AS (
           SELECT floor(x / 5.0)::INT AS bin_x,
                  floor(y / 5.0)::INT AS bin_y, avg(z) AS z
           FROM p GROUP BY 1, 2),
         roles AS (SELECT * FROM (VALUES (0,0),(1,0),(0,1),(1,1))
                   r(di, dj)),
         blocks AS (
           SELECT bin_x - di AS cbx, bin_y - dj AS cby, count(*) AS nc,
                  max(CASE WHEN di=0 AND dj=0 THEN z END) AS z00,
                  max(CASE WHEN di=1 AND dj=0 THEN z END) AS z10,
                  max(CASE WHEN di=0 AND dj=1 THEN z END) AS z01,
                  max(CASE WHEN di=1 AND dj=1 THEN z END) AS z11
           FROM grid CROSS JOIN roles GROUP BY 1, 2),
         lev AS (SELECT quantile_cont(z, 0.5) AS lv FROM grid),
         c AS (
           SELECT cbx, cby, z00, z10, z01, z11, lv,
                  (z00 >= lv)::INT + 2 * (z10 >= lv)::INT
                  + 4 * (z11 >= lv)::INT + 8 * (z01 >= lv)::INT
                    AS idx
           FROM blocks CROSS JOIN lev WHERE nc = 4),
         pts AS (
           SELECT cbx, cby, idx, lv,
                  (cbx + (lv - z00) / nullif(z10 - z00, 0)) * 5.0
                    AS b_x, cby * 5.0 AS b_y,
                  (cbx + 1) * 5.0 AS r_x,
                  (cby + (lv - z10) / nullif(z11 - z10, 0)) * 5.0
                    AS r_y,
                  (cbx + (lv - z01) / nullif(z11 - z01, 0)) * 5.0
                    AS t_x, (cby + 1) * 5.0 AS t_y,
                  cbx * 5.0 AS l_x,
                  (cby + (lv - z00) / nullif(z01 - z00, 0)) * 5.0
                    AS l_y
           FROM c),
         segs1 AS (
           SELECT cbx, cby,
                  CASE WHEN idx IN (1,14,3,12,7,8,5,10) THEN l_x
                       WHEN idx IN (2,13,6,9) THEN b_x
                       WHEN idx IN (4,11) THEN r_x END AS x1,
                  CASE WHEN idx IN (1,14,3,12,7,8,5,10) THEN l_y
                       WHEN idx IN (2,13,6,9) THEN b_y
                       WHEN idx IN (4,11) THEN r_y END AS y1,
                  CASE WHEN idx IN (1,14,10) THEN b_x
                       WHEN idx IN (2,13,3,12) THEN r_x
                       ELSE t_x END AS x2,
                  CASE WHEN idx IN (1,14,10) THEN b_y
                       WHEN idx IN (2,13,3,12) THEN r_y
                       ELSE t_y END AS y2
           FROM pts WHERE idx NOT IN (0, 15)),
         segs2 AS (
           SELECT cbx, cby,
                  CASE WHEN idx = 5 THEN b_x ELSE t_x END AS x1,
                  CASE WHEN idx = 5 THEN b_y ELSE t_y END AS y1,
                  r_x AS x2, r_y AS y2
           FROM pts WHERE idx IN (5, 10))
         SELECT * FROM segs1 UNION ALL SELECT * FROM segs2""",
    "q166_cross_section_2d" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  (p_partkey % 20)::DOUBLE AS va,
                  p_retailprice AS v
           FROM part),
         pr AS (
           SELECT *,
                  ((x - (-25.0)) * 50.0 + (y - 0.0) * 50.0) / 5000.0 AS nd
           FROM p),
         cl AS (
           SELECT *, least(greatest(nd, 0.0), 1.0) AS tcl FROM pr),
         ds AS (
           SELECT *, sqrt(power(x - (-25.0 + tcl * 50.0), 2)
                          + power(y - (0.0 + tcl * 50.0), 2)) AS dist
           FROM cl)
         SELECT floor(nd * 10)::INT AS xb, floor(va / 2.0)::INT AS yb,
                avg(v) AS color
         FROM ds
         WHERE dist <= 5.0 AND nd >= 0 AND nd * 10 < 10
         GROUP BY 1, 2""",
    "q162_mandelbrot" ->
      """WITH RECURSIVE grid AS (
           SELECT gx.generate_series AS px, gy.generate_series AS py
           FROM generate_series(0, 31) gx, generate_series(0, 23) gy),
         pix AS (
           SELECT px::DOUBLE * ((1.0 - (-2.5)) / 32) + (-2.5) AS x,
                  py::DOUBLE * ((1.2 - (-1.2)) / 24) + (-1.2) AS y
           FROM grid),
         it(x, y, zx, zy, n) AS (
           SELECT x, y, 0.0::DOUBLE, 0.0::DOUBLE, 0 FROM pix
           UNION ALL
           SELECT x, y, zx * zx - zy * zy + x, 2.0 * zx * zy + y, n + 1
           FROM it WHERE zx * zx + zy * zy < 4.0 AND n < 20)
         SELECT x, y, max(n) AS num_iterations
         FROM it GROUP BY x, y""",
    "q160_rasterize_slope" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z
           FROM part),
         grid AS (
           SELECT floor(x / 5.0)::INT AS bin_x,
                  floor(y / 5.0)::INT AS bin_y, avg(z) AS z
           FROM p GROUP BY 1, 2),
         offs AS (
           SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                 (0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
         contrib AS (
           SELECT bin_x + dx AS bin_x, bin_y + dy AS bin_y, z,
                  (-dx) * (CASE WHEN dy = 0 THEN 2.0 ELSE 1.0 END) AS wx,
                  (-dy) * (CASE WHEN dx = 0 THEN 2.0 ELSE 1.0 END) AS wy,
                  CASE WHEN dx = 0 AND dy = 0 THEN z END AS zc
           FROM grid CROSS JOIN offs),
         grads AS (
           SELECT bin_x, bin_y, count(*) AS nn, max(zc) AS z,
                  sum(z * wx) / 40.0 AS dzx, sum(z * wy) / 40.0 AS dzy
           FROM contrib GROUP BY bin_x, bin_y)
         SELECT bin_x, bin_y, z,
                CASE WHEN nn = 9
                     THEN atan(sqrt(dzx*dzx + dzy*dzy)) * 180.0 / pi()
                END AS slope_deg,
                CASE WHEN nn = 9 AND sqrt(dzx*dzx + dzy*dzy) >= 1e-4
                     THEN atan2(dzx, dzy) * 180.0 / pi() + 180.0
                END AS aspect_deg
         FROM grads WHERE z IS NOT NULL""",
    "q161_cross_section" ->
      """WITH p AS (
           SELECT p_size::DOUBLE - 25.0 AS x,
                  fmod(p_retailprice, 50.0) AS y,
                  p_retailprice AS z
           FROM part),
         b AS (
           SELECT ((x - (-25.0)) * 50.0 + (y - 0.0) * 50.0) / 5000.0
                    AS nd, z
           FROM p),
         bk AS (
           SELECT floor(nd * 20)::INT AS bucket, z
           FROM b WHERE nd >= 0)
         SELECT bucket, bucket::DOUBLE / 19 AS frac, avg(z) AS z_avg
         FROM bk WHERE bucket < 20 GROUP BY bucket""",
    "q159_feature_similarity_tfidf" ->
      """WITH counts AS (
           SELECT user_id, event_type, count(*)::DOUBLE AS c
           FROM events WHERE user_id < 30
           GROUP BY user_id, event_type),
         idf AS (
           SELECT event_type,
                  ln(((SELECT count(DISTINCT user_id) FROM counts) + 1.0)
                     / count(*)) + 1.0 AS idf
           FROM counts GROUP BY event_type),
         weighted AS (
           SELECT user_id, counts.event_type, c * idf AS c
           FROM counts JOIN idf ON idf.event_type = counts.event_type),
         norms AS (
           SELECT user_id, sqrt(sum(c * c)) AS nrm
           FROM weighted GROUP BY user_id),
         dots AS (
           SELECT a.user_id AS u1, b.user_id AS u2, sum(a.c * b.c) AS dot
           FROM weighted a JOIN weighted b ON a.event_type = b.event_type
           WHERE a.user_id < b.user_id
           GROUP BY a.user_id, b.user_id)
         SELECT u1, u2, dot / (n1.nrm * n2.nrm) AS cos_sim
         FROM dots
         JOIN norms n1 ON n1.user_id = u1
         JOIN norms n2 ON n2.user_id = u2"""
  )
}
