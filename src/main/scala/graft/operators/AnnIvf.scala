package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions.cosine_similarity

/** IVF (inverted-file) approximate nearest neighbor — the sub-linear
  * scale path next to q37's exact brute force (SURVEY LLM-pipeline
  * similarity-search requirement; reference hook tf_feature_similarity,
  * `QueryEngine/TableFunctions/SystemFunctions/os/
  * SimilarityTableFunctions.hpp:162` in /root/reference).
  *
  * Coarse quantizer: k-means centroids (MLlib, deterministic seed). The
  * corpus partitions into k cells in ONE pass — the centroids are array
  * LITERALS and the argmax cell is a projection (array_max over
  * (csim, cid) structs), so the assignment stage has zero shuffles and
  * zero joins; queries probe
  * only their `nprobe` nearest cells, so the scan cost per query is
  * ~nprobe/k of the corpus. At 100 TB the assignment is a write-once
  * partition/bucket-by-cell layout and each query reads only its probed
  * buckets (partition pruning on cell id).
  *
  * Recall is data-dependent: on clustered real embeddings nprobe/k ≪ 1
  * gives high recall; the fixture embeddings are iid random (no cluster
  * structure), where IVF recall ≈ probed fraction — the oracle asserts
  * the conservative bound.
  */
object AnnIvf {

  type Q = (SparkSession, String) => DataFrame

  private val K = 16
  private val NPROBE = 8
  private val TOPK = 10

  /** Write-once staging (shared graft.Stage util): the candidate set
    * feeds both the ranking and the scan-fraction stat; staging avoids a
    * recompute without leaking executor storage via `.persist`.
    */
  private def stage(df: DataFrame, name: String): DataFrame =
    graft.Stage(df, name)

  val queries: Seq[(String, Q)] = Seq(
    "q99_ann_ivf" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val emb = t(s, d, "embeddings")
      // 1. coarse quantizer (deterministic).
      val model = new KMeans().setK(K).setSeed(42L).setMaxIter(10)
        .fit(emb.select(array_to_vector(col("embedding")).as("features")))
      val cents: Seq[(Int, Seq[Float])] = model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }.toSeq
      // 2. cell assignment as a PURE PROJECTION over the corpus scan:
      //    the K centroids are array literals and the argmax is
      //    array_max over (csim, cid) structs — zero shuffle, zero
      //    join. At 100 TB this is the map stage of a write-once
      //    bucket-by-cell layout (partition pruning on cid at probe
      //    time).
      val best = array_max(array(cents.map { case (i, cvec) =>
        struct(
          cosine_similarity(col("embedding"), typedLit(cvec)).as("csim"),
          lit(i).as("cid"))
      }: _*))
      val assigned = emb.select(col("vec_id"), col("embedding"),
        best.getField("cid").as("cid"))
      // 3. queries probe their NPROBE nearest cells (|queries| × K rows
      //    — broadcast).
      val centroids = broadcast(cents.toDF("cid", "centroid"))
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val probes = broadcast(qs.crossJoin(centroids)
        .select(col("q_id"), col("q_emb"), col("cid"),
          cosine_similarity(col("q_emb"), col("centroid")).as("csim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("csim").desc)))
        .filter(col("rnk") <= NPROBE)
        .select(col("q_id"), col("q_emb"), col("cid")))
      // 4. candidate set from probed cells only — staged once.
      val cand = stage(assigned.join(probes, "cid")
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim")),
        "ivf_cand")
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id").asc)
      val approx = cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TOPK)
        .select(col("q_id"), col("n_id"))
      // 5. exact top-k (ground truth).
      val exact = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TOPK)
        .select(col("q_id"), col("n_id"))
      // 6. every stat folds into ONE action (three 1-row aggregates
      //    crossJoined) — no driver-side count loop.
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(approx.join(exact, Seq("q_id", "n_id"))
          .agg(count(lit(1)).as("hits")))
        .crossJoin(emb.agg(count(lit(1)).as("n_corpus"),
          count(when(col("vec_id") < 5, 1)).as("n_q")))
        .select(col("n_q").as("n_queries"), lit(K).as("k"),
          lit(NPROBE).as("nprobe"),
          (col("n_cand") <= lit(0.75) * col("n_q") * col("n_corpus"))
            .as("sublinear_scan"),
          (col("hits") >= lit(0.2) * col("n_q") * lit(TOPK) &&
            col("hits") <= col("n_q") * lit(TOPK)).as("recall_ok"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q99_ann_ivf" ->
      """SELECT 5::BIGINT AS n_queries, 16::INT AS k, 8::INT AS nprobe,
                true AS sublinear_scan, true AS recall_ok"""
  )
}
