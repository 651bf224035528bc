package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions._

/** Array operators + vector similarity search.
  *
  * Covers the reference's array surface (`QueryEngine/ArrayOps.cpp`,
  * `ArrayIR.cpp` in /root/reference: ARRAY_AT `Shared/sqldefs.h:52`
  * (1-based, like Spark's element_at), CARDINALITY, UNNEST :53, array
  * literals `Analyzer/Analyzer.h:3163`, DotProduct
  * `java/.../HeavyDBSqlOperatorTable.java:531`) and the similarity-search
  * table functions (`QueryEngine/TableFunctions/SystemFunctions/os/
  * SimilarityTableFunctions.hpp:162` tf_feature_similarity) — the
  * LLM-pipeline ANN hook.
  *
  * Scale design: brute-force top-k is a broadcast of the (small) query set
  * against a full scan of the corpus — one pass, no shuffle of the corpus,
  * then a per-query top-k (TakeOrdered-style) on k·|queries| candidate
  * rows. At 100 TB the corpus side stays partition-parallel; only the
  * k·|queries| survivors shuffle. The LSH-bucketed variant (Dedup.scala)
  * is the sub-linear path.
  */
object Arrays {

  type Q = (SparkSession, String) => DataFrame

  val queries: Seq[(String, Q)] = Seq(
    // element access (1-based), cardinality, slice, per-array reductions.
    "q34_array_ops" -> ((s, d) => {
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), 64).as("last_v"),
        // slice() is exercised, but reduced to a scalar: the driver's
        // pandas hash-compare cannot canonicalize list-typed cells.
        aggregate(slice(col("embedding"), 1, 4), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("head4_sum"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("vsum"),
        array_max(col("embedding")).as("vmax"),
        array_min(col("embedding")).as("vmin"),
        l2_norm(col("embedding")).as("norm"))
    }),

    // UNNEST (kUNNEST `Shared/sqldefs.h:53`) → explode.
    "q35_unnest" -> ((s, d) => {
      t(s, d, "embeddings")
        .filter(col("vec_id") < 20)
        .select(col("vec_id"), explode(col("embedding")).as("val"))
    }),

    // Dot product / cosine against a fixed query vector — broadcast the
    // single query row, stream the corpus (no corpus shuffle).
    "q36_vector_math" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q0 = broadcast(
        emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb")))
      emb.crossJoin(q0).select(
        col("vec_id"),
        dot_product(col("embedding"), col("q_emb")).as("dot"),
        cosine_similarity(col("embedding"), col("q_emb")).as("cos_sim"))
    }),

    // Brute-force cosine top-k per query vector (exact ANN baseline).
    "q37_similarity_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queriesDf = broadcast(
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      val scored = emb.crossJoin(queriesDf)
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("n_id"), col("rnk"), col("sim"))
    }),

    // Array literals + ANY/ALL quantified comparison (`SQLQualifier`
    // `Shared/sqldefs.h:74`) + membership/position.
    "q98_array_quantifiers" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        array(col("p_partkey") % 5, col("p_partkey") % 7,
          col("p_partkey") % 9).as("arr"))
        .select(col("p_partkey"),
          exists(col("arr"), x => x > 5).as("any_gt5"),
          forall(col("arr"), x => x >= 0).as("all_nonneg"),
          array_contains(col("arr"), lit(3L)).as("has3"),
          array_position(col("arr"), lit(3L)).cast("int").as("pos3"),
          size(col("arr")).as("card"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q34_array_ops" ->
      """SELECT vec_id,
                len(embedding)::INT AS dim,
                embedding[1] AS first_v,
                embedding[64] AS last_v,
                list_sum(embedding[1:4]::DOUBLE[]) AS head4_sum,
                list_sum(embedding::DOUBLE[]) AS vsum,
                list_max(embedding) AS vmax,
                list_min(embedding) AS vmin,
                sqrt(list_sum(list_transform(embedding::DOUBLE[],
                  x -> x * x))) AS norm
         FROM embeddings""",
    "q35_unnest" ->
      """SELECT vec_id, unnest(embedding) AS val
         FROM embeddings WHERE vec_id < 20""",
    "q36_vector_math" ->
      """SELECT e.vec_id,
                list_dot_product(e.embedding::DOUBLE[],
                  q.embedding::DOUBLE[]) AS dot,
                list_cosine_similarity(e.embedding::DOUBLE[],
                  q.embedding::DOUBLE[]) AS cos_sim
         FROM embeddings e,
              (SELECT embedding FROM embeddings WHERE vec_id = 0) q""",
    "q37_similarity_topk" ->
      """WITH scored AS (
           SELECT q.vec_id AS q_id, e.vec_id AS n_id,
                  list_cosine_similarity(e.embedding::DOUBLE[],
                    q.embedding::DOUBLE[]) AS sim
           FROM embeddings e
           JOIN embeddings q ON q.vec_id < 5 AND e.vec_id <> q.vec_id),
         ranked AS (
           SELECT q_id, n_id, sim,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, n_id ASC) AS INT) AS rnk
           FROM scored)
         SELECT q_id, n_id, rnk, sim FROM ranked WHERE rnk <= 10""",
    "q98_array_quantifiers" ->
      """WITH a AS (
           SELECT p_partkey,
                  [p_partkey % 5, p_partkey % 7, p_partkey % 9] AS arr
           FROM part)
         SELECT p_partkey,
                len(list_filter(arr, x -> x > 5)) > 0 AS any_gt5,
                len(list_filter(arr, x -> x >= 0)) = len(arr)
                  AS all_nonneg,
                list_contains(arr, 3) AS has3,
                coalesce(list_position(arr, 3), 0)::INT AS pos3,
                len(arr)::INT AS card
         FROM a"""
  )
}
