package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** q303: leading dims kept in the matryoshka-truncated ranking. */
  private val TruncDims = 16
  /** q591: sign bits of the leading dims form the deterministic coarse
    * quantizer (2^SignDims cells) — axis-aligned hyperplane LSH
    * (Charikar 2002), portable to the oracle because cell id is pure
    * arithmetic on the vector, unlike q99's k-means centroids.
    */
  private val SignDims = 4

  /** Write-once staging (shared graft.Stage util): the candidate set
    * feeds both the ranking and the scan-fraction stat; staging avoids a
    * recompute without leaking executor storage via `.persist`.
    */
  private def stage(df: DataFrame, name: String): DataFrame =
    graft.Stage(df, name)

  /** Corpus with the deterministic cell assignment and squared norm —
    * the projection that feeds both the standing index write and the
    * ground-truth ranking. cid = Σ 2^i·[x_{i+1} > 0] over the leading
    * SignDims dims; n2 = Σ x_i² in the same sequential-fold spelling
    * the oracle replays (q202/q303 proved the fold bit-parity).
    */
  private[graft] def assignedVectors(s: SparkSession, d: String): DataFrame =
    assignVectors(t(s, d, "embeddings"), "vec_id", "embedding")

  /** Generic form (the DDL surface builds indexes over arbitrary
    * (id, vector) tables — Ddl's CREATE VECTOR INDEX).
    */
  private[graft] def assignVectors(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), _.cast("double")).as("x"))
      .withColumn("cid", (0 until SignDims).map(i =>
          when(element_at(col("x"), i + 1) > lit(0.0), lit(1 << i))
            .otherwise(lit(0))).reduce(_ + _))
      .withColumn("n2",
        aggregate(transform(col("x"), v => v * v), lit(0.0), _ + _))

  /** Multiprobe cell set of an assigned probe: own cell + its
    * SignDims Hamming-1 neighbors.
    */
  private[graft] def probeCellsExpr(cid: Column): Column =
    array(cid +: (0 until SignDims).map(i =>
      cid.bitwiseXOR(lit(1 << i))): _*)

  private val vecIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** STANDING partitioned vector index (round-13 — the q207/q588
    * ingest lifecycle applied to embeddings). Built once per (session,
    * fixture, JVM): the day-0 corpus (vec_id % 10 != 0) is written
    * partitionBy(cid) — one directory per coarse-quantizer cell — and
    * the day-2 batch (vec_id % 10 == 0) is then APPENDED with the SAME
    * assignment: no retrain, no rewrite; the append touches only the
    * batch's own cell directories. At 100 TB this is the daily vector
    * ingest path: assign (a pure projection), append to the touched
    * cells, and every probe keeps reading nprobe/2^SignDims of the
    * corpus via partition pruning (IvfLayoutSpec pins prunedFiles ⊆
    * probed cells on this very layout).
    */
  private[graft] def vectorIndexDir(s: SparkSession, d: String): String =
    vecIndexCache.computeIfAbsent(
      System.identityHashCode(s) + ":" + d, _ => {
        val dir = graft.Stage.scratchDir("vecidx")
        val a = assignedVectors(s, d)
        a.filter(col("vec_id") % 10 =!= 0)
          .write.mode("overwrite").partitionBy("cid").parquet(dir)
        a.filter(col("vec_id") % 10 === 0)
          .write.mode("append").partitionBy("cid").parquet(dir)
        dir
      })

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
    }),

    // Scalar quantization of the embedding column — the storage-side
    // companion to IVF: int8 (levels=127) cuts a float32 corpus 4x and
    // int4 (levels=7, sign + 3 bits) 8x, which at 100 TB is the
    // difference between an ANN index that fits executor memory and one
    // that doesn't. Quantization is a PURE PROJECTION (per-vector
    // max-abs scale, round-half-up clamp) — zero shuffle; the only
    // shuffle in the whole query is the final per-label aggregate.
    // Round-half-up is spelled floor(v*s + 0.5) because floor is the
    // one rounding primitive Spark and DuckDB define identically.
    "q201_embedding_quantization" -> ((s, d) => {
      val errs = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("x"))
        // scales land in named columns FIRST: referencing them from the
        // per-element lambda keeps the array_max subtree evaluated once
        // per row, not once per element (O(d) not O(d^2) per vector)
        .withColumn("s8", scaleFor(col("x"), 127.0))
        .withColumn("s4", scaleFor(col("x"), 7.0))
        .withColumn("dq8", dequantized(col("x"), col("s8"), 127.0))
        .withColumn("dq4", dequantized(col("x"), col("s4"), 7.0))
        .withColumn("norm2",
          aggregate(transform(col("x"), a => a * a), lit(0.0), _ + _))
        .withColumn("rel_err_q8", sqrt(
          aggregate(zip_with(col("x"), col("dq8"), (a, b) => (a - b) * (a - b)),
            lit(0.0), _ + _) / col("norm2")))
        .withColumn("rel_err_q4", sqrt(
          aggregate(zip_with(col("x"), col("dq4"), (a, b) => (a - b) * (a - b)),
            lit(0.0), _ + _) / col("norm2")))
      errs.groupBy(col("label"))
        .agg(count(lit(1)).cast("int").as("n_vecs"),
          round(avg(col("rel_err_q8")), 6).as("avg_rel_err_q8"),
          round(max(col("rel_err_q8")), 6).as("max_rel_err_q8"),
          round(avg(col("rel_err_q4")), 6).as("avg_rel_err_q4"))
        .orderBy(col("label"))
    }),

    // Does search still work in compressed space? Recall@10 of int4
    // brute-force vs exact brute-force, per probe vector. Probes are a
    // broadcast dim (|corpus|/125 rows) against one corpus scan; both
    // rankings come off the SAME staged sims table (one scan, two
    // window ranks). The cosine is computed dot/sqrt(n2a*n2b) in the
    // exact arithmetic shape the DuckDB oracle uses, so ranks agree
    // bit-for-bit (adjacent top-rank sim gaps measured >= 1e-4 vs
    // ~1e-15 engine float noise).
    "q202_quantized_recall" -> ((s, d) => {
      def dotp(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), _ + _)
      // per-row norms are computed ONCE before the pair join — the
      // arithmetic (sequential sum over the same array) is identical to
      // the oracle's per-pair spelling, so sims match bit-for-bit while
      // the join-side cost drops from 3 to 1 dot products per pair
      val deq = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("x"))
        .withColumn("s4", scaleFor(col("x"), 7.0))
        .withColumn("dq", dequantized(col("x"), col("s4"), 7.0))
        .withColumn("n2x", dotp(col("x"), col("x")))
        .withColumn("n2q", dotp(col("dq"), col("dq")))
      val probes = broadcast(deq
        .filter(col("vec_id") % 125 === 0)
        .select(col("vec_id").as("p_id"), col("x").as("px"),
          col("dq").as("pdq"), col("n2x").as("p_n2x"),
          col("n2q").as("p_n2q")))
      val sims = stage(deq.crossJoin(probes)
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id"),
          (dotp(col("px"), col("x")) / sqrt(col("p_n2x") * col("n2x")))
            .as("sim_x"),
          (dotp(col("pdq"), col("dq")) / sqrt(col("p_n2q") * col("n2q")))
            .as("sim_q")), "q202_sims")
      val wx = Window.partitionBy(col("p_id"))
        .orderBy(col("sim_x").desc, col("vec_id"))
      val wq = Window.partitionBy(col("p_id"))
        .orderBy(col("sim_q").desc, col("vec_id"))
      val rx = sims.withColumn("r", row_number().over(wx))
        .filter(col("r") <= TOPK).select(col("p_id"), col("vec_id"))
      val rq = sims.withColumn("r", row_number().over(wq))
        .filter(col("r") <= TOPK)
        .select(col("p_id"), col("vec_id"), lit(1).as("hit"))
      rx.join(rq, Seq("p_id", "vec_id"), "left")
        .groupBy(col("p_id"))
        .agg((sum(coalesce(col("hit"), lit(0))) / lit(10.0))
          .as("recall_at_10"))
        .select(col("p_id").as("probe_id"), col("recall_at_10"))
        .orderBy(col("probe_id"))
    }),

    // Matryoshka-style truncation eval (Kusupati et al. 2022): how much
    // ranking quality survives keeping only the FIRST 16 of 64 dims
    // (4x storage/compute cut on the read path — the MRL trade next to
    // q201's int8/int4 scalar quantization). Same staged-sims + dual
    // window recipe as q202; adds the rank of the true (full-dim) top-1
    // inside the truncated ranking as an INTEGER-scaled reciprocal
    // rank (2520 = lcm(1..10), so rr is exact arithmetic, no float
    // division before the hash gate).
    "q303_matryoshka_eval" -> ((s, d) => {
      def dotp(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), _ + _)
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("x"))
        .withColumn("xt", slice(col("x"), 1, TruncDims))
        .withColumn("n2f", dotp(col("x"), col("x")))
        .withColumn("n2t", dotp(col("xt"), col("xt")))
      val probes = broadcast(base
        .filter(col("vec_id") % 125 === 0)
        .select(col("vec_id").as("p_id"), col("x").as("px"),
          col("xt").as("pxt"), col("n2f").as("p_n2f"),
          col("n2t").as("p_n2t")))
      val sims = stage(base.crossJoin(probes)
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id"),
          (dotp(col("px"), col("x")) / sqrt(col("p_n2f") * col("n2f")))
            .as("sim_f"),
          (dotp(col("pxt"), col("xt")) / sqrt(col("p_n2t") * col("n2t")))
            .as("sim_t")), "q303_sims")
      val wf = Window.partitionBy(col("p_id"))
        .orderBy(col("sim_f").desc, col("vec_id"))
      val wt = Window.partitionBy(col("p_id"))
        .orderBy(col("sim_t").desc, col("vec_id"))
      val rf = sims.withColumn("r", row_number().over(wf))
        .filter(col("r") <= TOPK)
        .select(col("p_id"), col("vec_id"), col("r").as("r_full"))
      val rt = sims.withColumn("r", row_number().over(wt))
        .filter(col("r") <= TOPK)
        .select(col("p_id"), col("vec_id"), col("r").as("r_trunc"))
      val joined = rf.join(rt, Seq("p_id", "vec_id"), "left")
      joined.groupBy(col("p_id"))
        .agg(sum(when(col("r_trunc").isNotNull, 1L).otherwise(0L))
          .as("n_top10_kept"),
          max(when(col("r_full") === 1,
            coalesce(expr("2520 DIV r_trunc"), lit(0L))))
            .as("rr_top1_scaled"))
        .select(col("p_id").as("probe_id"), col("n_top10_kept"),
          col("rr_top1_scaled"))
        .orderBy(col("probe_id"))
    }),

    // Standing partitioned vector index + day-2 ingest (round-13
    // continuation — the q207/q588 standing-index lifecycle for
    // EMBEDDINGS). Day 0 writes the corpus partitioned by its
    // deterministic coarse-quantizer cell (sign bits of the leading 4
    // dims — 16 cells); day 2's batch is assigned by the SAME quantizer
    // (a projection — no retrain, no corpus rescan) and appended,
    // touching only its own cell directories. Probes multiprobe their
    // own cell plus its 4 Hamming-1 neighbors (5 of 16 cells), and the
    // probed-cell set becomes a STATIC partition filter, so the index
    // scan physically reads only the probed directories — the property
    // that makes probe cost ~nprobe/K of the corpus at any size.
    // Output per probe: candidate count (sublinearity), recall@10 vs
    // exact brute force over corpus∪batch, and how many of the top-10
    // come from the day-2 batch (proves appended vectors are served
    // without any index rebuild). Fully replayed by the DuckDB oracle:
    // cells, multiprobe, cosine ranking are all portable arithmetic.
    "q591_vector_index_day2" -> ((s, d) => {
      def dotp(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (u, v) => u * v), lit(0.0), _ + _)
      val idx = s.read.parquet(vectorIndexDir(s, d))
      // fixed probe workload: the %125 lattice capped to the base id
      // range, so the probe count does NOT grow with corpus copies in
      // scaled fixtures (the exact-audit side would otherwise be
      // quadratic — probes × corpus — at sf10)
      val probes = assignedVectors(s, d)
        .filter(col("vec_id") % 125 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("p_id"), col("x").as("px"),
          col("n2").as("p_n2"), col("cid").as("p_cid"))
      val probeCells = broadcast(probes
        .select(col("p_id"), col("px"), col("p_n2"),
          explode(probeCellsExpr(col("p_cid"))).as("cid")))
      // Bounded metadata collect (≤ n_probes·(SignDims+1), and ≤ 2^SignDims
      // distinct ints): the probed-cell set becomes a static partition
      // filter on the index scan — partition pruning, not a post-scan
      // filter (IvfLayoutSpec pins prunedFiles ⊆ probed cells).
      val cellSet = probeCells.select(col("cid")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val cand = stage(idx.filter(col("cid").isin(cellSet: _*))
        .join(probeCells, "cid")
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id"),
          (dotp(col("px"), col("x")) / sqrt(col("p_n2") * col("n2")))
            .as("sim")), "q591_cand")
      val w = Window.partitionBy(col("p_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      val approx = cand.withColumn("r", row_number().over(w))
        .filter(col("r") <= TOPK).select(col("p_id"), col("vec_id"))
      val exact = assignedVectors(s, d).crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id"),
          (dotp(col("px"), col("x")) / sqrt(col("p_n2") * col("n2")))
            .as("sim"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= TOPK).select(col("p_id"), col("vec_id"))
      val nc = cand.groupBy(col("p_id")).agg(count(lit(1)).as("n_cand"))
      val ap = approx.groupBy(col("p_id"))
        .agg(sum(when(col("vec_id") % 10 === 0, 1L).otherwise(0L))
          .as("n_day2_in_top10"))
      val rec = approx.join(exact, Seq("p_id", "vec_id"))
        .groupBy(col("p_id"))
        .agg((count(lit(1)) / lit(10.0)).as("recall_at_10"))
      nc.join(ap, Seq("p_id")).join(rec, Seq("p_id"), "left")
        .select(col("p_id").as("probe_id"), col("n_cand"),
          coalesce(col("recall_at_10"), lit(0.0)).as("recall_at_10"),
          col("n_day2_in_top10"))
        .orderBy(col("probe_id"))
    })
  )

  /** Per-vector max-abs quantization scale onto [-levels, levels];
    * 0.0 marks the all-zero vector (dequantized maps it to zeros).
    */
  private[graft] def scaleFor(x: Column, levels: Double): Column = {
    val mx = array_max(transform(x, a => abs(a)))
    when(mx > lit(0.0), lit(levels) / mx).otherwise(lit(0.0))
  }

  /** Dequantize(quantize(x)) with a precomputed scale column (stage the
    * scale into a named column first — an inline expression would be
    * re-evaluated per element). Returning the dequantized doubles
    * (rather than the int codes) keeps the reconstruction-error and
    * quantized-search arithmetic replayable verbatim in the oracle.
    */
  private[graft] def dequantized(x: Column, scale: Column,
      levels: Double): Column =
    transform(x, a =>
      when(scale > lit(0.0),
        greatest(lit(-levels), least(lit(levels),
          floor(a * scale + lit(0.5)).cast("double"))) / scale)
        .otherwise(lit(0.0)))

  /** Spec convenience: scale computed inline (fixture-sized inputs). */
  private[graft] def dequantized(x: Column, levels: Double): Column =
    dequantized(x, scaleFor(x, levels), levels)

  val oracles: Seq[(String, String)] = Seq(
    "q591_vector_index_day2" ->
      s"""WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         n AS (
           SELECT vec_id, x,
                  list_aggregate(list_transform(x, v -> v * v), 'sum') AS n2,
                  (CASE WHEN x[1] > 0 THEN 1 ELSE 0 END
                   + CASE WHEN x[2] > 0 THEN 2 ELSE 0 END
                   + CASE WHEN x[3] > 0 THEN 4 ELSE 0 END
                   + CASE WHEN x[4] > 0 THEN 8 ELSE 0 END) AS cid
           FROM base),
         probes AS (
           SELECT vec_id AS p_id, x AS px, n2 AS p_n2, cid AS p_cid
           FROM n WHERE vec_id % 125 = 0 AND vec_id < 5000),
         pcells AS (
           SELECT p_id, px, p_n2,
                  unnest([p_cid, xor(p_cid, 1), xor(p_cid, 2),
                          xor(p_cid, 4), xor(p_cid, 8)]) AS cid
           FROM probes),
         cand AS (
           SELECT p.p_id, e.vec_id,
                  list_aggregate(list_transform(list_zip(p.px, e.x),
                      z -> z[1] * z[2]), 'sum') / sqrt(p.p_n2 * e.n2)
                    AS sim
           FROM n e JOIN pcells p
             ON e.cid = p.cid AND e.vec_id <> p.p_id),
         approx AS (
           SELECT p_id, vec_id FROM (
             SELECT p_id, vec_id, row_number() OVER (PARTITION BY p_id
               ORDER BY sim DESC, vec_id) AS r FROM cand)
           WHERE r <= $TOPK),
         ex AS (
           SELECT p_id, vec_id FROM (
             SELECT p.p_id, e.vec_id, row_number() OVER (
               PARTITION BY p.p_id ORDER BY
                 list_aggregate(list_transform(list_zip(p.px, e.x),
                     z -> z[1] * z[2]), 'sum') / sqrt(p.p_n2 * e.n2)
                 DESC, e.vec_id) AS r
             FROM n e JOIN probes p ON e.vec_id <> p.p_id)
           WHERE r <= $TOPK),
         nc AS (
           SELECT p_id, count(*)::BIGINT AS n_cand FROM cand GROUP BY p_id),
         ap AS (
           SELECT p_id, sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                    ::BIGINT AS n_day2_in_top10
           FROM approx GROUP BY p_id),
         rec AS (
           SELECT a.p_id, (count(*) / 10.0) AS recall_at_10
           FROM approx a JOIN ex e
             ON e.p_id = a.p_id AND e.vec_id = a.vec_id
           GROUP BY a.p_id)
         SELECT nc.p_id AS probe_id, nc.n_cand,
                coalesce(rec.recall_at_10, 0.0)::DOUBLE AS recall_at_10,
                ap.n_day2_in_top10
         FROM nc JOIN ap ON ap.p_id = nc.p_id
         LEFT JOIN rec ON rec.p_id = nc.p_id""",
    "q303_matryoshka_eval" ->
      s"""WITH base AS (
           SELECT vec_id, embedding::DOUBLE[] AS x,
                  (embedding::DOUBLE[])[1:$TruncDims] AS xt
           FROM embeddings),
         n AS (
           SELECT vec_id, x, xt,
                  list_sum(list_transform(x, v -> v * v)) AS n2f,
                  list_sum(list_transform(xt, v -> v * v)) AS n2t
           FROM base),
         probes AS (
           SELECT vec_id AS p_id, x AS px, xt AS pxt, n2f AS p_n2f,
                  n2t AS p_n2t
           FROM n WHERE vec_id % 125 = 0),
         sims AS (
           SELECT p.p_id, e.vec_id,
                  list_dot_product(p.px, e.x) / sqrt(p.p_n2f * e.n2f)
                    AS sim_f,
                  list_dot_product(p.pxt, e.xt) / sqrt(p.p_n2t * e.n2t)
                    AS sim_t
           FROM n e, probes p WHERE e.vec_id <> p.p_id),
         rf AS (
           SELECT p_id, vec_id, r_full FROM (
             SELECT p_id, vec_id, row_number() OVER (PARTITION BY p_id
               ORDER BY sim_f DESC, vec_id) AS r_full FROM sims)
           WHERE r_full <= $TOPK),
         rt AS (
           SELECT p_id, vec_id, r_trunc FROM (
             SELECT p_id, vec_id, row_number() OVER (PARTITION BY p_id
               ORDER BY sim_t DESC, vec_id) AS r_trunc FROM sims)
           WHERE r_trunc <= $TOPK)
         SELECT f.p_id AS probe_id,
                sum(CASE WHEN t.r_trunc IS NOT NULL THEN 1 ELSE 0 END)
                  ::BIGINT AS n_top10_kept,
                max(CASE WHEN f.r_full = 1
                    THEN coalesce(2520 // t.r_trunc, 0) END)
                  ::BIGINT AS rr_top1_scaled
         FROM rf f LEFT JOIN rt t
           ON t.p_id = f.p_id AND t.vec_id = f.vec_id
         GROUP BY f.p_id""",
    "q99_ann_ivf" ->
      """SELECT 5::BIGINT AS n_queries, 16::INT AS k, 8::INT AS nprobe,
                true AS sublinear_scan, true AS recall_ok""",
    "q201_embedding_quantization" ->
      """WITH x AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
         s AS (
           SELECT vec_id, label, x,
                  CASE WHEN list_max(list_transform(x, a -> abs(a))) > 0
                       THEN 127.0 / list_max(list_transform(x, a -> abs(a)))
                       ELSE 0.0 END AS s8,
                  CASE WHEN list_max(list_transform(x, a -> abs(a))) > 0
                       THEN 7.0 / list_max(list_transform(x, a -> abs(a)))
                       ELSE 0.0 END AS s4
           FROM x),
         deq AS (
           SELECT vec_id, label, x,
                  list_transform(x, a -> CASE WHEN s8 > 0
                    THEN greatest(-127.0, least(127.0, floor(a*s8 + 0.5))) / s8
                    ELSE 0.0 END) AS dq8,
                  list_transform(x, a -> CASE WHEN s4 > 0
                    THEN greatest(-7.0, least(7.0, floor(a*s4 + 0.5))) / s4
                    ELSE 0.0 END) AS dq4
           FROM s),
         errs AS (
           SELECT label,
                  sqrt(list_aggregate(list_transform(list_zip(x, dq8),
                      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')
                    / list_aggregate(list_transform(x, a -> a*a), 'sum'))
                    AS rel_err_q8,
                  sqrt(list_aggregate(list_transform(list_zip(x, dq4),
                      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')
                    / list_aggregate(list_transform(x, a -> a*a), 'sum'))
                    AS rel_err_q4
           FROM deq)
         SELECT label, count(*)::INT AS n_vecs,
                round(avg(rel_err_q8), 6) AS avg_rel_err_q8,
                round(max(rel_err_q8), 6) AS max_rel_err_q8,
                round(avg(rel_err_q4), 6) AS avg_rel_err_q4
         FROM errs GROUP BY label""",
    "q202_quantized_recall" ->
      """WITH x AS (
           SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
         s AS (
           SELECT vec_id, x,
                  CASE WHEN list_max(list_transform(x, a -> abs(a))) > 0
                       THEN 7.0 / list_max(list_transform(x, a -> abs(a)))
                       ELSE 0.0 END AS s4
           FROM x),
         deq AS (
           SELECT vec_id, x,
                  list_transform(x, a -> CASE WHEN s4 > 0
                    THEN greatest(-7.0, least(7.0, floor(a*s4 + 0.5))) / s4
                    ELSE 0.0 END) AS dq
           FROM s),
         probes AS (
           SELECT vec_id AS p_id, x AS px, dq AS pdq FROM deq
           WHERE vec_id % 125 = 0),
         sims AS (
           SELECT p.p_id, c.vec_id,
                  list_aggregate(list_transform(list_zip(p.px, c.x),
                      z -> z[1]*z[2]), 'sum')
                    / sqrt(list_aggregate(list_transform(p.px, a -> a*a), 'sum')
                         * list_aggregate(list_transform(c.x, a -> a*a), 'sum'))
                    AS sim_x,
                  list_aggregate(list_transform(list_zip(p.pdq, c.dq),
                      z -> z[1]*z[2]), 'sum')
                    / sqrt(list_aggregate(list_transform(p.pdq, a -> a*a), 'sum')
                         * list_aggregate(list_transform(c.dq, a -> a*a), 'sum'))
                    AS sim_q
           FROM probes p JOIN deq c ON c.vec_id <> p.p_id),
         rx AS (
           SELECT p_id, vec_id,
                  row_number() OVER (PARTITION BY p_id
                    ORDER BY sim_x DESC, vec_id) AS r
           FROM sims),
         rq AS (
           SELECT p_id, vec_id,
                  row_number() OVER (PARTITION BY p_id
                    ORDER BY sim_q DESC, vec_id) AS r
           FROM sims)
         SELECT rx.p_id AS probe_id,
                (count(rq.vec_id)::DOUBLE / 10.0) AS recall_at_10
         FROM rx LEFT JOIN rq
           ON rq.p_id = rx.p_id AND rq.vec_id = rx.vec_id AND rq.r <= 10
         WHERE rx.r <= 10
         GROUP BY rx.p_id"""
  )
}
