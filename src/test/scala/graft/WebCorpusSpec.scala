package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the web-corpus curation family (q285 URL canonicalize +
  * domain cap, q286 SCD2 history, q287 time-decayed engagement).
  */
class WebCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("url cap: kept <= cap per domain and doc accounting closes") {
    val rows = SparkEntry.queries("q285_url_canonicalize_cap")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= 8)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_distinct_urls"))
      // every raw doc is either the canonical survivor of its URL or a
      // URL-duplicate: n_docs = distinct urls + url dups.
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_distinct_urls") + r.getAs[Long]("n_url_dups"))
    }
    // the synthesized URLs force collisions (doc_id % 37 paths), so the
    // canonicalizer must actually merge something somewhere.
    assert(rows.map(_.getAs[Long]("n_url_dups")).sum > 0)
    // domains are canonical: lowercase, no www., no scheme mixups.
    rows.foreach(r =>
      assert(r.getAs[String]("domain").matches("[a-z0-9.]+\\.example\\.com")))
  }

  test("scd2: dense versions, chained validity windows, one open row " +
      "per key, no no-op changes") {
    val rows = SparkEntry.queries("q286_scd2_history")(spark, sf)
      .orderBy(col("o_custkey"), col("version")).collect()
    val byKey = rows.groupBy(_.getAs[Long]("o_custkey"))
    byKey.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("version")).toSeq == (1 to rs.length))
      rs.sliding(2).foreach {
        case Array(a, b) =>
          // windows chain with no gap/overlap...
          assert(a.getAs[Any]("valid_to") == b.getAs[Any]("valid_from"))
          // ...and a change row really changes the tracked attribute.
          assert(a.getAs[String]("status") != b.getAs[String]("status"))
        case _ =>
      }
      assert(rs.count(_.getAs[Boolean]("is_current")) == 1)
      assert(rs.last.getAs[Boolean]("is_current"))
    }
  }

  test("point-in-time join: every fact resolves exactly one version " +
      "and the resolved status matches the raw log") {
    val rows = SparkEntry.queries("q295_pit_scd2_join")(spark, sf).collect()
    val nOrders = Tables.t(spark, sf, "orders").count()
    assert(rows.length == nOrders) // windows tile time: no dup/loss
    assert(rows.forall(_.getAs[String]("status_asof") != null))
    // an order's as-of status must equal its own recorded status when
    // the order itself opened a version (change rows), and in general
    // the status of the latest change at-or-before its ts.
    val hist = SparkEntry.queries("q286_scd2_history")(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    rows.take(500).foreach { r =>
      val ts = r.getAs[java.time.LocalDateTime]("ts")
      val expect = hist(r.getAs[Long]("o_custkey"))
        .filter(h => !h.getAs[java.time.LocalDateTime]("valid_from")
          .isAfter(ts))
        .maxBy(_.getAs[Int]("version"))
      assert(r.getAs[String]("status_asof") ==
        expect.getAs[String]("status"))
      assert(r.getAs[Int]("version") == expect.getAs[Int]("version"))
    }
  }

  test("decayed engagement: exact dyadic terms replay bit-for-bit") {
    import spark.implicits._
    val rows = SparkEntry.queries("q287_decayed_engagement")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .as[(Long, Long, Double)].collect()
    val tRef = ev.map(_._2).max
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val s = es.map { case (_, us, v) =>
        val n = math.min((tRef - us) / 86400000000L / 7L, 20L)
        math.round(v * 100).toDouble * math.pow(0.5, n.toDouble)
      }.sum // order-independent because every term is exact dyadic
      u -> BigDecimal(s / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("decayed_score") ==
        expect(r.getAs[Long]("user_id")))
    }
  }
}
