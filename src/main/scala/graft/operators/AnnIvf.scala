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
  * corpus partitions into k cells in ONE pass (broadcast centroids ×
  * corpus scan, min_by assignment — no corpus shuffle); queries probe
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

  val queries: Seq[(String, Q)] = Seq(
    "q99_ann_ivf" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val emb = t(s, d, "embeddings")
      // 1. coarse quantizer (deterministic).
      val model = new KMeans().setK(K).setSeed(42L).setMaxIter(10)
        .fit(emb.select(array_to_vector(col("embedding")).as("features")))
      val centroids = broadcast(
        model.clusterCenters.zipWithIndex
          .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
          .toSeq.toDF("cid", "centroid"))
      // 2. one-pass cell assignment: argmin centroid per corpus vector.
      val assigned = emb.crossJoin(centroids)
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosine_similarity(col("embedding"), col("centroid")).as("csim"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), col("csim")).as("cid"),
          first(col("embedding")).as("embedding"))
      // 3. queries probe their NPROBE nearest cells.
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val probes = broadcast(qs.crossJoin(centroids)
        .select(col("q_id"), col("q_emb"), col("cid"),
          cosine_similarity(col("q_emb"), col("centroid")).as("csim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("csim").desc)))
        .filter(col("rnk") <= NPROBE)
        .select(col("q_id"), col("q_emb"), col("cid")))
      // 4. approximate top-k from probed cells only.
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("n_id").asc)
      val approx = assigned.join(probes, "cid")
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TOPK)
        .select(col("q_id"), col("n_id"))
      // 5. exact top-k (ground truth) + recall.
      val exact = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TOPK)
        .select(col("q_id"), col("n_id"))
      val nCorpus = emb.count()
      val nCand = assigned.join(probes, "cid")
        .filter(col("vec_id") =!= col("q_id")).count()
      val hits = approx.join(exact, Seq("q_id", "n_id")).count()
      val nQ = qs.count()
      val recall = hits.toDouble / (nQ * TOPK)
      Seq((nQ, K, NPROBE,
        nCand.toDouble / (nQ * nCorpus) <= 0.75,
        recall >= 0.2 && recall <= 1.0))
        .toDF("n_queries", "k", "nprobe", "sublinear_scan", "recall_ok")
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q99_ann_ivf" ->
      """SELECT 5::BIGINT AS n_queries, 16::INT AS k, 8::INT AS nprobe,
                true AS sublinear_scan, true AS recall_ok"""
  )
}
