package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the ML-ops batch (q434-q436). */
class Round9MlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q434: every segment gets a policy, propensities are proper " +
      "probabilities, and matched rows never exceed the eval set") {
    val rows = q("q434_ips_policy_eval").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[String]("pi_action") != null)
      val p = r.getAs[Long]("prop_ppm")
      assert(p > 0 && p < 1000000, s"propensity out of (0,1): $r")
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[Long]("ips_value_micro") >= 0)
      assert(r.getAs[Long]("dm_value_micro") >= 0)
    }
  }

  test("q434 never logs the trivially-true self-join predicate warning " +
      "(explicit aliases on shared-lineage joins)") {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender("graft-selfjoin-capture", null, null,
        true, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("trivially true")) hits.add(m)
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try {
      q("q434_ips_policy_eval").collect()
    } finally {
      root.removeAppender("graft-selfjoin-capture")
      ctx.updateLoggers()
      app.stop()
    }
    assert(hits.isEmpty,
      s"self-join resolved via trivially-true predicate repair: $hits")
  }

  test("q435: ranks are a permutation and gains decrease with rank") {
    val rows = q("q435_infogain_ranking").collect()
      .sortBy(_.getAs[Number]("rank").longValue())
    assert(rows.map(_.getAs[Number]("rank").longValue()).toSeq ==
      (1L to rows.length).toSeq)
    val igs = rows.map(_.getAs[Long]("ig_micro_nats"))
    assert(igs.zip(igs.tail).forall { case (a, b) => a >= b })
    // quantization can dip a hair below zero but never materially
    assert(igs.forall(_ >= -4))
  }

  test("q436: alerts fire only when BOTH burn windows exceed their " +
      "thresholds, and the slow window smooths the fast one") {
    val rows = q("q436_burn_rate_alert").collect()
    assert(rows.nonEmpty)
    val fast = rows.map(_.getAs[Long]("burn_fast_ppm"))
    val slow = rows.map(_.getAs[Long]("burn_slow_ppm"))
    rows.foreach { r =>
      val a = r.getAs[Long]("alert") == 1L
      val f = r.getAs[Long]("burn_fast_ppm")
      val s = r.getAs[Long]("burn_slow_ppm")
      assert(a == (f >= 1050000L && s >= 1020000L), s"alert logic: $r")
    }
    assert(slow.max - slow.min <= fast.max - fast.min,
      "slow window should not be spikier than the fast window")
  }
}
