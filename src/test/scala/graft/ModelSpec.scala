package graft

import org.scalatest.funsuite.AnyFunSuite

/** ML model lifecycle (reference `SqlCreateModel.java`,
  * `Catalog/DdlCommandExecutor.h:289-344`,
  * `HeavyDBSqlOperatorTable.java:846` ML_PREDICT): statement routing,
  * metadata introspection, predict-as-expression semantics, error cases.
  */
class ModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("CREATE MODEL / SHOW / DETAILS / EVALUATE / DROP round-trip") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MODEL IF EXISTS m_lin")
    eng.sql("""CREATE MODEL m_lin OF TYPE LINEAR_REG AS
               SELECT o_totalprice, o_orderkey, o_custkey FROM orders""")
    assert(eng.sql("SHOW MODELS").collect().map(_.getString(0))
      .contains("m_lin"))
    val det = eng.sql("SHOW MODEL DETAILS m_lin").collect().head
    assert(det.getAs[String]("model_type") == "LINEAR_REG")
    assert(det.getAs[String]("target") == "o_totalprice")
    assert(det.getAs[String]("predictors") == "o_orderkey,o_custkey")
    assert(det.getAs[Long]("num_train_rows") > 0)
    val r2 = eng.sql("EVALUATE MODEL m_lin").collect().head.getDouble(0)
    assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
    eng.sql("DROP MODEL m_lin")
    assert(!eng.sql("SHOW MODELS").collect().map(_.getString(0))
      .contains("m_lin"))
  }

  test("ml_predict on a linear model is exact literal arithmetic") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MODEL IF EXISTS m_exact")
    // y = 3 + 2x exactly → fitted model must reproduce it exactly.
    eng.sql("""CREATE MODEL m_exact OF TYPE LINEAR_REG AS
               SELECT 3.0 + 2.0 * p_partkey, p_partkey FROM part""")
    val bad = eng.sql(
      """SELECT max(abs(ml_predict('m_exact', p_partkey)
                        - (3.0 + 2.0 * p_partkey))) AS e FROM part""")
      .collect().head.getDouble(0)
    assert(bad < 1e-6, s"linear ml_predict off by $bad")
    // R² of a perfect fit is 1.
    val r2 = eng.sql("EVALUATE MODEL m_exact").collect().head.getDouble(0)
    assert(math.abs(r2 - 1.0) < 1e-9)
    eng.sql("DROP MODEL m_exact")
  }

  test("train fraction option and EVALUATE ... ON a different query") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MODEL IF EXISTS m_split")
    // Target with real signal (charge ≈ linear in price over the small
    // discount range) so held-out R² is meaningfully positive.
    eng.sql("""CREATE MODEL m_split OF TYPE LINEAR_REG AS
               SELECT l_extendedprice * (1.0 - l_discount),
                      l_extendedprice, l_discount
               FROM lineitem
               WITH (data_split_train_fraction=0.5)""")
    val full = eng.sql("SELECT count(*) AS n FROM lineitem")
      .collect().head.getLong(0)
    val trained = eng.sql("SHOW MODEL DETAILS m_split")
      .collect().head.getAs[Long]("num_train_rows")
    assert(trained > full / 4 && trained < 3 * full / 4,
      s"train fraction 0.5 kept $trained of $full rows")
    val r2 = eng.sql(
      """EVALUATE MODEL m_split ON
         SELECT l_extendedprice * (1.0 - l_discount),
                l_extendedprice, l_discount
         FROM lineitem WHERE l_orderkey % 2 = 1""")
      .collect().head.getDouble(0)
    assert(r2 > 0.9 && r2 <= 1.0, s"held-out r2 = $r2")
    eng.sql("DROP MODEL m_split")
  }

  test("tree model registered via DDL predicts through ml_predict") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MODEL IF EXISTS m_dt")
    eng.sql("""CREATE MODEL m_dt OF TYPE DECISION_TREE_REG AS
               SELECT l_extendedprice * (1.0 - l_discount),
                      l_extendedprice, l_discount
               FROM lineitem WITH (max_tree_depth=4)""")
    // Compiled tree explains most of a functionally dependent target.
    val r2 = eng.sql("EVALUATE MODEL m_dt").collect().head.getDouble(0)
    assert(r2 > 0.5 && r2 <= 1.0, s"tree r2 = $r2")
    // Predict stays codegen-friendly Column arithmetic: no UDF in plan.
    val plan = eng.sql(
      "EXPLAIN SELECT ml_predict('m_dt', l_extendedprice, l_discount) FROM lineitem")
      .collect().head.getString(0)
    assert(!plan.toLowerCase.contains("batchevalpython"))
    eng.sql("DROP MODEL m_dt")
  }

  test("PCA model: pca_project components are decorrelated and ordered") {
    val eng = HeavyEngine(spark, sf)
    eng.sql("DROP MODEL IF EXISTS m_pca")
    eng.sql("""CREATE MODEL m_pca OF TYPE PCA AS
               SELECT l_extendedprice, l_quantity, l_discount
               FROM lineitem WITH (n_components=2)""")
    val r = eng.sql(
      """SELECT var_pop(pca_project('m_pca', l_extendedprice, l_quantity,
                                    l_discount, 1)) AS v1,
                var_pop(pca_project('m_pca', l_extendedprice, l_quantity,
                                    l_discount, 2)) AS v2,
                abs(covar_pop(
                  pca_project('m_pca', l_extendedprice, l_quantity,
                              l_discount, 1),
                  pca_project('m_pca', l_extendedprice, l_quantity,
                              l_discount, 2))) AS cv
         FROM lineitem""").collect().head
    // PC1 captures at least as much variance as PC2; projections are
    // (near-)uncorrelated.
    assert(r.getDouble(0) >= r.getDouble(1))
    assert(r.getDouble(2) <
      1e-6 * math.max(r.getDouble(0), 1.0))
    eng.sql("DROP MODEL m_pca")
  }

  test("error cases: unknown model, bad arity, non-literal name") {
    val eng = HeavyEngine(spark, sf)
    intercept[Exception](
      eng.sql("SELECT ml_predict('nope', 1.0)").collect())
    eng.sql("DROP MODEL IF EXISTS m_arity")
    eng.sql("""CREATE MODEL m_arity OF TYPE LINEAR_REG AS
               SELECT o_totalprice, o_custkey FROM orders""")
    intercept[Exception](
      eng.sql("SELECT ml_predict('m_arity', o_custkey, o_custkey) FROM orders")
        .collect())
    intercept[Exception](
      eng.sql("SELECT ml_predict(o_orderstatus, o_custkey) FROM orders")
        .collect())
    intercept[Exception](
      eng.sql("EVALUATE MODEL nope"))
    eng.sql("DROP MODEL m_arity")
  }

  test("one-hot encoder: top-k by frequency, min proportion, OTHERS") {
    // Planted skew: a=5, b=3, c=1, d=1 over 10 rows.
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d"))
      .toDF("cat")
    def sums(encoded: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val ohCols = encoded.columns.filter(_.startsWith("oh_"))
      val r = encoded.agg(sum(col(ohCols.head)).as(ohCols.head),
        ohCols.tail.map(c => sum(col(c)).as(c)): _*).collect().head
      ohCols.map(c => c -> r.getAs[Long](c)).toMap
    }
    // top-2 + OTHERS: c and d fold into the OTHERS bucket.
    val top2 = sums(operators.MLFunctions.oneHotEncode(
      df, "cat", topK = 2, minProp = 0.0, includeOthers = true))
    assert(top2 == Map("oh_a" -> 5L, "oh_b" -> 3L, "oh_others" -> 2L))
    // min proportion 0.2 drops c and d even with a large k.
    val minp = sums(operators.MLFunctions.oneHotEncode(
      df, "cat", topK = 10, minProp = 0.2, includeOthers = false))
    assert(minp == Map("oh_a" -> 5L, "oh_b" -> 3L))
    // tie at count 1 breaks by category value: c before d at k=3.
    val tie = sums(operators.MLFunctions.oneHotEncode(
      df, "cat", topK = 3, minProp = 0.0, includeOthers = true))
    assert(tie == Map("oh_a" -> 5L, "oh_b" -> 3L, "oh_c" -> 1L,
      "oh_others" -> 1L))
  }

  test("one-hot encoder: NULL categories and sanitized-name collisions") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    // "A-B" and "a b" both sanitize to oh_a_b; NULLs must bucket into
    // OTHERS rather than NPE or become an indicator column.
    val df = Seq(Some("A-B"), Some("A-B"), Some("a b"), None, None)
      .toDF("cat")
    val enc = operators.MLFunctions.oneHotEncode(
      df, "cat", topK = 5, minProp = 0.0, includeOthers = true)
    val ohCols = enc.columns.filter(_.startsWith("oh_"))
    assert(ohCols.length == 3, ohCols.mkString(","))  // 2 cats + others
    assert(ohCols.count(_.startsWith("oh_a_b")) == 2) // suffixed, no clobber
    val r = enc.agg(sum(col(ohCols(0))).as("c0"),
      sum(col(ohCols(1))).as("c1"), sum(col("oh_others")).as("o"))
      .collect().head
    assert(Set(r.getLong(0), r.getLong(1)) == Set(2L, 1L))
    assert(r.getLong(2) == 2L) // both NULL rows land in OTHERS
  }

  test("quality classifier: compiled LR equals MLlib transform and " +
      "beats the majority baseline on balanced accuracy") {
    val r = SparkEntry.queries("q253_quality_classifier")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n") == 500L)
    assert(r.getAs[Boolean]("lr_exact"),
      "compiled sigmoid(w·x+b) diverged from MLlib probability")
    assert(r.getAs[Boolean]("bal_acc_ok"),
      "balanced accuracy below 0.85 — the weighted fit stopped learning")
  }
}
