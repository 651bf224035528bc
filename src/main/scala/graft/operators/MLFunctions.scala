package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{DenseMatrix, Vector}
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** ML fit/predict surface — SURVEY §2.10 ML rows.
  *
  * Reference: fit/predict table functions (`QueryEngine/TableFunctions/
  * SystemFunctions/os/MLTableFunctions.hpp` in /root/reference —
  * linear_reg_fit/coefs, kmeans, pca_fit, r2_score) and the `ml_predict`
  * scalar (`QueryEngine/MLPredictCodegen.cpp:119`,
  * `codegenLinRegPredict`); test contract `Tests/MLFunctionsTest.cpp`.
  * Spark-first: MLlib estimators are the fit step; the fitted model's
  * coefficients become plain Column arithmetic for predict (exactly the
  * reference's approach — fitted coefficients are codegen'd into the
  * kernel, not a model-server call).
  *
  * Oracle strategy: model internals are engine-specific, so queries emit
  * exact aggregates plus invariant flags the oracle asserts `true`:
  * OLS coefficients must match the closed-form normal-equation solution
  * (computable in any SQL engine), kmeans must partition all points with
  * k non-empty clusters and beat the 1-cluster SSE, PCA components must
  * be orthonormal with non-increasing explained variance.
  *
  * Scale: fitting is MLlib's distributed path (tree-aggregated normal
  * equations / Lloyd iterations over partitions); predict is pure Column
  * arithmetic — codegen'd, no driver loop, no UDF.
  */
object MLFunctions {

  type Q = (SparkSession, String) => DataFrame

  /** ml_predict for a fitted univariate linear model: coefficients are
    * baked into the plan as literals (reference codegens them the same
    * way, `MLPredictCodegen.cpp:119`).
    */
  def mlPredictLinReg(intercept: Double, slope: Double)
      (x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(intercept) + lit(slope) * x.cast("double")

  val queries: Seq[(String, Q)] = Seq(
    // linear_reg_fit + ml_predict + r2_score vs the closed-form OLS the
    // oracle can verify: slope = cov(x,y)/var(x), r2 = corr(x,y)^2.
    "q72_linreg" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
      val fitInput = li.select(array_to_vector(array(col("x")))
        .as("features"), col("y").as("label"))
      val model = new LinearRegression()
        .setSolver("normal").setRegParam(0.0).fit(fitInput)
      val (b0, b1) = (model.intercept, model.coefficients(0))
      val r2 = model.summary.r2
      val relTol = 1e-6
      def closeTo(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =
        abs(a - b) <= lit(relTol) * greatest(abs(a), abs(b), lit(1.0))
      li.agg(
        count(lit(1)).as("n"),
        closeTo(lit(b1), covar_pop(col("x"), col("y")) / var_pop(col("x")))
          .as("slope_ok"),
        closeTo(lit(b0),
          avg(col("y")) - (covar_pop(col("x"), col("y")) / var_pop(col("x")))
            * avg(col("x"))).as("intercept_ok"),
        closeTo(lit(r2), pow(corr(col("x"), col("y")), 2.0)).as("r2_ok"),
        // ml_predict at x = 25 must equal b0 + b1*25 (trivially true by
        // construction — asserts the predict path stays pure arithmetic).
        closeTo(first(mlPredictLinReg(b0, b1)(lit(25.0))),
          lit(b0 + b1 * 25.0)).as("pred_ok"))
    }),

    // kmeans(k=4, fixed seed): total partition + non-empty clusters +
    // SSE strictly better than the single-cluster baseline.
    "q73_kmeans" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"),
          array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(4).setSeed(42L).setMaxIter(10)
        .fit(emb)
      val assigned = model.transform(emb)
      val centers = model.clusterCenters
      val sse = assigned.rdd.map { r =>
        val v = r.getAs[Vector]("features")
        val c = centers(r.getAs[Int]("prediction"))
        var s = 0.0
        var i = 0
        while (i < v.size) { val dd = v(i) - c(i); s += dd * dd; i += 1 }
        s
      }.sum()
      val spark = s
      import spark.implicits._
      val counts = assigned.groupBy(col("prediction")).count()
        .collect().map(_.getLong(1))
      val n = counts.sum
      // Single-cluster baseline SSE = total variance around the mean.
      val dim = emb.select(first(col("features"))).collect()
        .head.getAs[Vector](0).size
      val mean = emb.rdd.map(_.getAs[Vector]("features").toArray)
        .reduce((a, b) => a.zip(b).map(p => p._1 + p._2)).map(_ / n)
      val baseSse = emb.rdd.map { r =>
        val v = r.getAs[Vector]("features")
        var s2 = 0.0
        var i = 0
        while (i < v.size) { val dd = v(i) - mean(i); s2 += dd * dd; i += 1 }
        s2
      }.sum()
      Seq((n, dim, counts.length, counts.forall(_ > 0), sse < baseSse))
        .toDF("n_points", "dim", "k", "all_nonempty", "sse_improves")
    }),

    // pca_fit(k=8): orthonormal components, non-increasing explained
    // variance summing to ≤ 1.
    "q74_pca" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(array_to_vector(col("embedding")).as("features"))
      val model = new PCA().setK(8)
        .setInputCol("features").setOutputCol("pc").fit(emb)
      val pc: DenseMatrix = model.pc
      val k = pc.numCols
      val dim = pc.numRows
      var maxOrthoErr = 0.0
      for (i <- 0 until k; j <- i until k) {
        var dot = 0.0
        for (r <- 0 until dim) dot += pc(r, i) * pc(r, j)
        val want = if (i == j) 1.0 else 0.0
        maxOrthoErr = math.max(maxOrthoErr, math.abs(dot - want))
      }
      val ev = model.explainedVariance.toArray
      val spark = s
      import spark.implicits._
      Seq((k, dim, maxOrthoErr < 1e-8,
        ev.zip(ev.tail).forall(p => p._1 >= p._2 - 1e-12),
        ev.sum <= 1.0 + 1e-9))
        .toDF("k", "dim", "orthonormal", "ev_nonincreasing", "ev_bounded")
    }),

    // decision_tree_reg_fit + random_forest_reg_fit (reference
    // `MLTableFunctions.hpp`): deterministic seeds; models must respect
    // their configured shape and explain most of the (functionally
    // dependent) price = f(quantity, discount) relationship.
    "q93_tree_models" -> ((s, d) => {
      // Learnable target: charge = price·(1−disc)·(1+tax) from its own
      // factors — trees must recover most of the variance. Deterministic
      // 25% sample: fits are statistical, the invariants hold on any
      // representative sample, and training cost is the whole query.
      val li = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 8 === 0)
        .select(
        array_to_vector(array(col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"),
          col("l_tax").cast("double"))).as("features"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("label"))
      val eval = new RegressionEvaluator().setMetricName("r2")
      val dt = new DecisionTreeRegressor().setSeed(7L).setMaxDepth(5)
        .fit(li)
      val rf = new RandomForestRegressor().setSeed(7L).setNumTrees(10)
        .setMaxDepth(5).fit(li)
      val gbt = new GBTRegressor().setSeed(7L).setMaxIter(3).setMaxDepth(3)
        .fit(li)
      val r2dt = eval.evaluate(dt.transform(li))
      val r2rf = eval.evaluate(rf.transform(li))
      val r2gbt = eval.evaluate(gbt.transform(li))
      val n = li.count()
      val spark = s
      import spark.implicits._
      Seq((n, dt.depth <= 5, rf.getNumTrees == 10,
        r2dt > 0.5 && r2dt <= 1.0, r2rf > 0.5 && r2rf <= 1.0,
        gbt.getNumTrees == 3 && r2gbt > 0.5 && r2gbt <= 1.0))
        .toDF("n", "dt_depth_ok", "rf_trees_ok", "dt_r2_ok", "rf_r2_ok",
          "gbt_ok")
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    "q72_linreg" ->
      """SELECT count(*) AS n, true AS slope_ok, true AS intercept_ok,
                true AS r2_ok, true AS pred_ok
         FROM lineitem""",
    "q73_kmeans" ->
      """SELECT count(*) AS n_points, 64::INT AS dim, 4::INT AS k,
                true AS all_nonempty, true AS sse_improves
         FROM embeddings""",
    "q74_pca" ->
      """SELECT 8::INT AS k, 64::INT AS dim, true AS orthonormal,
                true AS ev_nonincreasing, true AS ev_bounded""",
    "q93_tree_models" ->
      """SELECT count(*) AS n, true AS dt_depth_ok, true AS rf_trees_ok,
                true AS dt_r2_ok, true AS rf_r2_ok, true AS gbt_ok
         FROM lineitem WHERE l_orderkey % 8 = 0"""
  )
}
