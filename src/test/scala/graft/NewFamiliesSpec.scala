package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-7 families: logs benchmark via the regex source
  * (q238-q241), flights_hpt sub-second timestamps (q242-q245), and the
  * DSIR / unigram-surprise data-selection scores (q246-q247).
  */
class NewFamiliesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("logs family: parse is staged parquet, no text scan in the query") {
    // First call writes the text corpus and stages the parsed relation;
    // every family member must then plan as a parquet scan of the staged
    // parse (one regex pass per session, not one per query).
    val p1 = SparkEntry.queries("q238_logs_hourly_max")(spark, sf)
      .queryExecution.executedPlan.toString
    val p2 = SparkEntry.queries("q241_logs_sev_hourly")(spark, sf)
      .queryExecution.executedPlan.toString
    for (p <- Seq(p1, p2)) {
      assert(p.contains("FileScan parquet"), p.take(800))
      assert(!p.contains("FileScan text"), p.take(800))
    }
  }

  test("logs round trip preserves every row") {
    val parsed = SparkEntry.queries("q240_logs_api_counts")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val events = Tables.t(spark, sf, "events").count()
    assert(parsed == events)
  }

  test("hpt ns policy: hour keys are exact int64 nanosecond multiples") {
    val rows = SparkEntry.queries("q245_hpt_ns_policy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hourNs = 3600L * 1000 * 1000 * 1000
    rows.foreach { r =>
      val h = r.getAs[Long]("h_ns")
      assert(h % hourNs == 0, s"h_ns $h not hour-aligned")
      assert(r.getAs[Long]("ns_min") >= h &&
        r.getAs[Long]("ns_max") < h + hourNs)
    }
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.t(spark, sf, "events").count())
  }

  test("hpt µs literals filter a strict subset") {
    val all = Tables.t(spark, sf, "events").count()
    val inRange = SparkEntry.queries("q244_hpt_range_us")(spark, sf)
      .agg(sum(col("size"))).collect()(0).getLong(0)
    assert(inRange > 0 && inRange < all)
  }

  test("dsir importance: top-20, scores non-increasing, en-dominated") {
    val rows = SparkEntry.queries("q246_dsir_importance")(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // The target domain is lang='en'; the top-ranked docs should skew en.
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val enTop = Tables.t(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*) && col("lang") === "en")
      .count()
    assert(enTop >= 10, s"only $enTop of 20 top-DSIR docs are en")
  }

  test("bigram backoff: backoff genuinely fires on held-out docs") {
    val rows = SparkEntry.queries("q248_bigram_backoff")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (nb, no, nbg) = rows.map(r => (r.getAs[Long]("n_backoff"),
      r.getAs[Long]("n_oov"), r.getAs[Long]("n_bigrams")))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    assert(nb > 0, "no bigram ever backed off — train/eval split inert")
    assert(no <= nb && nb <= nbg)
    rows.foreach(r => assert(r.getAs[Double]("avg_logscore") < 0))
  }

  test("heavy hitters: result equals the full-groupBy truth and every " +
      "share is consistent") {
    val rows = SparkEntry.queries("q307_heavy_hitters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // independent truth: full groupBy over the same skewed stream
    val h = conv(substring(md5(col("event_id").cast("string")), 1, 15),
      16, 10).cast("long")
    val v = pmod(h, lit(1000L))
    val stream = Tables.t(spark, sf, "events").withColumn("k",
      when(v < 221, 1L).when(v < 331, 2L).when(v < 405, 3L)
        .when(v < 460, 4L).when(v < 504, 5L).when(v < 541, 6L)
        .when(v < 573, 7L).when(v < 600, 8L)
        .otherwise(col("user_id")))
    val n = stream.count()
    val truth = stream.groupBy("k").count()
      .filter(col("count") * 32 > n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("user_key")).toSet == truth.keySet,
      "sketch-pruned result differs from the exact heavy-hitter set")
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") == truth(r.getAs[Long]("user_key")))
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("cnt") * 1000000L / n)
    }
  }

  test("exact 2-pass median equals the sorted median; probe bucket " +
      "holds it") {
    val r = SparkEntry.queries("q313_exact_median_2pass")(spark, sf)
      .collect().head
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val k = (xs.length + 1) / 2
    assert(r.getAs[Long]("n_rows") == xs.length.toLong)
    assert(r.getAs[Long]("k_rank") == k.toLong)
    assert(r.getAs[Double]("median_exact") == xs(k - 1))
    assert(r.getAs[Long]("probe_bucket") ==
      math.floor(xs(k - 1) / 1000.0).toLong)
  }

  test("KMV aggregator: partition merge equals single-pass; estimate " +
      "within theoretical error") {
    // direct unit exercise of the Aggregator merge path
    val agg = new functions.KmvAgg(16)
    val hs = (1 to 500).map(i => (i * 2654435761L) % 100003L)
    val single = hs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(
      hs.take(250).foldLeft(agg.zero)(agg.reduce),
      hs.drop(250).foldLeft(agg.zero)(agg.reduce))
    assert(single.toSeq == merged.toSeq, "min-k of union violated")
    assert(single.length == 16 && single.sorted.sameElements(single))
    // query-level: every estimate within ~3/sqrt(k) of exact
    val rows = SparkEntry.queries("q314_kmv_sketch")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_consistent"))
      assert(r.getAs[Double]("rel_err") < 3.0 / math.sqrt(256),
        s"${r.getAs[String]("scope")} err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("top-k aggregator: partial merge equals single pass; query " +
      "equals a window replay") {
    val agg = new functions.TopKAgg(3)
    val ins = Seq((5L, 2L, 1L), (9L, 1L, 1L), (5L, 1L, 2L), (7L, 3L, 3L),
      (9L, 1L, 2L), (1L, 9L, 9L)).map(x => functions.TopIn(x._1, x._2, x._3))
    val single = ins.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(ins.take(3).foldLeft(agg.zero)(agg.reduce),
      ins.drop(3).foldLeft(agg.zero)(agg.reduce))
    assert(single.toSeq == merged.toSeq)
    assert(single.toSeq == Seq((9L, 1L, 1L), (9L, 1L, 2L), (7L, 3L, 3L)))
    // query vs window replay
    def nl(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue
    val got = SparkEntry.queries("q316_grouped_topk")(spark, sf).collect()
      .map(r => (nl(r, "sk"), nl(r, "rank").toInt,
        nl(r, "qty"), nl(r, "orderkey"), nl(r, "linenumber"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("q").desc, col("l_orderkey"), col("l_linenumber"))
    val want = Tables.t(spark, sf, "lineitem")
      .withColumn("q", col("l_quantity").cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("q"),
        col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getInt(1),
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getAs[Number](4).longValue)).toSet
    assert(got == want)
  }

  test("KMV join-overlap: small-vocabulary mode is exact; estimates " +
      "internally consistent") {
    val r = SparkEntry.queries("q321_kmv_join_overlap")(spark, sf)
      .collect().head
    // sf0.001 has < 256 distinct part keys -> exact mode by contract
    val (nu, ni) = (r.getAs[Long]("n_union"), r.getAs[Long]("n_inter"))
    if (nu < 256) {
      assert(r.getAs[Double]("est_union") == nu.toDouble)
      assert(r.getAs[Double]("est_inter") == ni.toDouble)
      assert(r.getAs[Long]("est_jaccard_ppm") == ni * 1000000L / nu)
    } else {
      assert(math.abs(r.getAs[Double]("est_union") - nu) / nu < 0.25)
      assert(math.abs(r.getAs[Double]("est_inter") - ni) /
        math.max(ni, 1L) < 0.35)
    }
    assert(r.getAs[Long]("n_a") <= nu && r.getAs[Long]("n_b") <= nu)
    assert(ni <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
  }

  test("percentile bands: exact ranks from the sorted column") {
    val rows = SparkEntry.queries("q323_percentile_bands")(spark, sf)
      .collect().map(r => r.getAs[String]("pct") ->
        (r.getAs[Long]("k_rank"), r.getAs[Double]("value"))).toMap
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = xs.length.toLong
    for ((p, num) <- Seq("p10" -> 1L, "p50" -> 5L, "p90" -> 9L)) {
      val k = (num * n + 9) / 10
      assert(rows(p)._1 == k)
      assert(rows(p)._2 == xs((k - 1).toInt), p)
    }
    assert(rows("p10")._2 <= rows("p50")._2 &&
      rows("p50")._2 <= rows("p90")._2)
  }

  test("equi-depth selectivity: estimate error bounded by one bucket " +
      "depth") {
    val rows = SparkEntry.queries("q328_equidepth_selectivity")(
      spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // equi-depth contract: |est - actual| <= n/B  (62 500 ppm at
      // B=16, plus integer-floor slack)
      assert(r.getAs[Long]("err_ppm") <= 63000L,
        s"${r.getAs[String]("pred")}: ${r.getAs[Long]("err_ppm")} ppm")
      assert(r.getAs[Long]("est_rows") >= 0 &&
        r.getAs[Long]("actual_rows") >= 0)
    }
  }

  test("unigram surprise: one row per language, finite positive scores") {
    val rows = SparkEntry.queries("q247_unigram_surprise")(spark, sf).collect()
    val langs = rows.map(_.getAs[String]("lang")).toSet
    assert(rows.length == langs.size)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_surprise")
      assert(avg > 0 && !avg.isNaN && !avg.isInfinite)
      assert(r.getAs[Double]("min_surprise") <= avg &&
        avg <= r.getAs[Double]("max_surprise"))
    }
  }
}
