package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Banded 1-D numeric range join — the Spark-native rewrite of the
  * reference's RangeJoinHashTable (`QueryEngine/JoinHashTable/
  * RangeJoinHashTable.cpp` in /root/reference): both sides are
  * floor-quantized at the radius, the probe side replicates to the ±1
  * neighbor buckets, the join is a plain equi-join on the bucket id, and
  * the exact predicate filters the survivors.
  *
  * Why it matters at 100 TB: a θ-join `|a.x - b.x| < r` has no equi-key,
  * so Catalyst can only plan BroadcastNestedLoopJoin (O(n·m), and the
  * build side must fit in memory). The banded form is a shuffled
  * equi-join: each row meets only its 3-bucket neighborhood, work is
  * O(matches), both sides stream, and AQE handles bucket skew. This is
  * the same trick Geo.q61 uses in 2-D (grid cells).
  */
object RangeJoin {

  type Q = (SparkSession, String) => DataFrame

  /** Join `a` × `b` on |ax − bx| < r. Column names of `a` and `b` must
    * be disjoint (standard for join inputs).
    */
  def bandJoin(a: DataFrame, ax: Column, b: DataFrame, bx: Column,
      r: Double): DataFrame = {
    require(r > 0, s"radius must be positive, got $r")
    val bandA = a.withColumn("__band", floor(ax / r).cast("long"))
    val bandB = b
      .withColumn("__b0", floor(bx / r).cast("long"))
      .withColumn("__band",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    bandA.join(bandB, "__band")
      .filter(abs(ax - bx) < r)
      .drop("__band")
  }

  val queries: Seq[(String, Q)] = Seq(
    // Numeric interval self-join: supplier pairs within 100.0 of each
    // other's account balance — banded, never all-pairs (contrast with
    // q11's reference-faithful loop join; PlanSpec pins the plan shape).
    "q75_range_band_join" -> ((s, d) => {
      val a = t(s, d, "supplier").select(
        col("s_suppkey").as("s1"), col("s_acctbal").as("bal1"))
      val b = t(s, d, "supplier").select(
        col("s_suppkey").as("s2"), col("s_acctbal").as("bal2"))
      bandJoin(a, col("bal1"), b, col("bal2"), 100.0)
        .filter(col("s1") < col("s2"))
        .select(col("s1"), col("s2"),
          (col("bal1") - col("bal2")).as("gap"))
    }),

    // The same interval join written NAIVELY as abs(x-y) < r — the
    // GeoRangeJoinRule's 1-D pattern must rewrite it automatically
    // (PlanSpec pins no nested loop).
    "q105_num_range_rule" -> ((s, d) => {
      graft.HeavyEngine(s, d) // installs the optimizer rule
      val a = t(s, d, "supplier").select(
        col("s_suppkey").as("s1"), col("s_acctbal").as("bal1"))
      val b = t(s, d, "supplier").select(
        col("s_suppkey").as("s2"), col("s_acctbal").as("bal2"))
      a.join(b, abs(col("bal1") - col("bal2")) < lit(100.0) &&
          col("s1") < col("s2"))
        .select(col("s1"), col("s2"),
          (col("bal1") - col("bal2")).as("gap"))
    }),

    // Exact n-gram Jaccard on a small document slice, NO LSH pruning —
    // the DuckDB-checkable ground truth for the q41 LSH pipeline (same
    // shingle builder; the LSH path must only ever prune, never invent).
    "q76_jaccard_exact" -> ((s, d) => {
      val sh = Dedup.shingles(s, d).filter(col("doc_id") < 50)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("a_id"), col("sh"))
        .join(sh.select(col("doc_id").as("b_id"), col("sh")), "sh")
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("c"))
      inter
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")),
          "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")),
          "b_id")
        .select(col("a_id"), col("b_id"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c")))
            .as("jaccard"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q75_range_band_join" ->
      """SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
                a.s_acctbal - b.s_acctbal AS gap
         FROM supplier a JOIN supplier b
           ON a.s_suppkey < b.s_suppkey
          AND abs(a.s_acctbal - b.s_acctbal) < 100.0""",
    "q105_num_range_rule" ->
      """SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
                a.s_acctbal - b.s_acctbal AS gap
         FROM supplier a JOIN supplier b
           ON a.s_suppkey < b.s_suppkey
          AND abs(a.s_acctbal - b.s_acctbal) < 100.0""",
    "q76_jaccard_exact" ->
      """WITH docs AS (
           SELECT doc_id,
                  regexp_split_to_array(
                    trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')),
                    ' +') AS toks
           FROM documents WHERE doc_id < 50),
         idx AS (
           SELECT doc_id, toks,
                  unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i
           FROM docs),
         sh AS (
           SELECT DISTINCT doc_id,
                  CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
                       ELSE toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                  END AS sh
           FROM idx),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
                c::DOUBLE / (na.n + nb.n - c) AS jaccard
         FROM inter
         JOIN sizes na ON na.doc_id = a_id
         JOIN sizes nb ON nb.doc_id = b_id"""
  )
}
