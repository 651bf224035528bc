package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Per-round benchmark harness. Contract: print ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * (also written to BENCH_OUT file so the driver never has to fish it
  * out of sbt log noise).
  *
  * Methodology (round-10 revision — the round-9 driver run diverged 2×
  * from the committed close run on identical code because the driver's
  * colder/contended environment inflated pass-1 and the budget died
  * before the expensive tail was ever re-run: q448 84× its close value):
  *  - every query is fully materialized: a `noop`-format write forces
  *    every column through the executor (a bare .count() lets Catalyst
  *    prune all projections and benchmarks a metadata row count);
  *  - an UNTIMED warm-up preamble runs one scan+agg+join+window+noop
  *    before the clock starts, so parquet listing, codegen compilation,
  *    shuffle machinery and the JIT are warm for query #1;
  *  - pass-1 order is decorrelated by name hash (not module/alphabetic
  *    order) so one heavy iterative family's GC pressure doesn't land
  *    entirely on its alphabetic neighbors;
  *  - TWO passes. Pass 1 warms (and records) every query once, so a
  *    COMPLETE table exists as early as possible no matter where a
  *    driver timeout lands. Pass 2 first reruns the SLOWEST DECILE of
  *    pass 1 regardless of remaining budget (these carry the largest
  *    cold-run distortion and were exactly the band the round-9 budget
  *    never reached), then the sub-second queries ascending, then the
  *    remaining tail descending while budget lasts. Each query reports
  *    the MINIMUM across its passes.
  *  - the emitted JSON carries per-query attribution fields: `cold`
  *    (pass-1 wall), `gc` (GC millis during the recorded best pass) and
  *    `passes` counts plus a `pass2_coverage` fraction, so any future
  *    driver-vs-close divergence is attributable (environmental cold/GC
  *    inflation vs a real plan regression) without a re-run;
  *  - the summary JSON is REWRITTEN after every measurement (BENCH_OUT
  *    + the /tmp fallback + repo BENCH_LOCAL.json) AND printed, so both
  *    the file and a stdout tail-capture hold a valid table at any kill
  *    point instead of `parsed: null`.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "1").toInt
    // Default budget scales with the inventory (~1.9 s per query —
    // derived from the round-8/9 history: every round that lagged the
    // hand-retuned constant left a cold 1-2 s band unrerun that
    // masqueraded as a uniform regression). The slow-decile rerun is
    // budget-EXEMPT, so the budget only governs the cheap/midrange
    // second pass; wall stays bounded and the summary is rewritten
    // after every measurement.
    lazy val defaultBudget = math.max(780.0, 1.9 * SparkEntry.queries.size)
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SECS")
      .map(_.toDouble).getOrElse(defaultBudget)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Stage.scratchDir("warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Focused re-benchmark (regression checks): run only these queries
    // and skip the committed BENCH artifacts, which must always reflect
    // full sweeps.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)

    // Committed per-query reference walls, read BEFORE the sweep starts
    // rewriting BENCH_LOCAL.json in place (round-13, VERDICT #3): pass 2
    // reruns FIRST any query whose cold pass-1 wall exceeds 1.8× its
    // committed value — exactly the cold-single-pass class that
    // manufactured eight phantom ">2× movers" in the r12 driver run.
    val committed: Map[String, Double] = try {
      val p = Paths.get("/root/repo/BENCH_LOCAL.json")
      if (Files.isReadable(p)) {
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(p))
        Option(root.get("queries")).map(q =>
          q.fields().asScala
            .map(e => e.getKey -> e.getValue.asDouble(-1.0)).toMap)
          .getOrElse(Map.empty)
      } else Map.empty
    } catch { case _: Throwable => Map.empty }

    val outPaths: Seq[Path] = {
      val benchOut = sys.env.get("BENCH_OUT").orElse(Some("/tmp/graft_bench.json"))
        .map(Paths.get(_)).toSeq
      // Defensive vs the driver's tail-capture truncation: ALSO keep a
      // committed full-sweep artifact in the repo under a stable name.
      val repo = Paths.get("/root/repo")
      val repoPaths =
        if (Files.isDirectory(repo) && only.isEmpty)
          Seq(repo.resolve("BENCH_LOCAL.json"))
        else Seq.empty
      benchOut ++ repoPaths
    }

    // ---- untimed warm-up preamble (round-10): one representative
    // scan+agg+join+window+noop so query #1 never pays parquet
    // listing / codegen / JIT / shuffle cold costs on the clock.
    val warmT0 = System.nanoTime()
    try {
      val li = Tables.t(spark, sfDir, "lineitem")
      val ord = Tables.t(spark, sfDir, "orders")
      Seq("region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings")
        .foreach(n => Tables.t(spark, sfDir, n).count())
      materialize(li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("c")))
      materialize(li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(avg(col("l_extendedprice")).as("a")))
      materialize(li.select(col("l_orderkey"), col("l_linenumber"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"))).as("rn")))
      // one MINIMAL streaming query (3-row file source, single batch):
      // the session's streaming machinery — state-store coordinator,
      // streaming listener bus, offset/commit-log classes — initializes
      // once per JVM, and without this it lands on whichever
      // q302/q327/q403-class query the interleave runs first
      // (round-11: the streaming-fixture floor is bench hygiene,
      // not plan cost)
      val wsDir = Stage.scratchDir("graft_bench_wsrc")
      val woDir = Stage.scratchDir("graft_bench_wout")
      spark.range(3).select(col("id")).coalesce(1)
        .write.mode("overwrite").parquet(wsDir)
      val wq = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .parquet(wsDir)
        .groupBy(col("id")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", wsDir + "/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(woDir)
        }
        .start()
      try wq.processAllAvailable() finally wq.stop()
    } catch { case _: Throwable => () } // warm-up must never kill the sweep
    val warmupSec = (System.nanoTime() - warmT0) / 1e9

    // 3-decimal rounding (locale-pinned): ~30% shorter one-line JSON, so
    // the driver's tail capture is less likely to truncate mid-line.
    def r3(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", v)

    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val best = scala.collection.mutable.Map.empty[String, Double]
    val cold = scala.collection.mutable.Map.empty[String, Double]
    val gcMs = scala.collection.mutable.Map.empty[String, Long]
    val cgMs = scala.collection.mutable.Map.empty[String, Long]
    val passes = scala.collection.mutable.Map.empty[String, Int]
    var elapsed = 0.0

    def writeSummary(): String = {
      val names = order.toSeq
      def numMap(f: String => String): String =
        names.map(n => "\"" + n + "\":" + f(n)).mkString("{", ",", "}")
      val qs = numMap(n => r3(best(n)))
      val colds = numMap(n => r3(cold.getOrElse(n, -1.0)))
      val gcs = numMap(n => gcMs.getOrElse(n, 0L).toString)
      // per-query session-overhead floor (seconds): GC + janino codegen
      // attributed to the best pass. (wall − floor) is the plan cost a
      // sub-second query actually exercises — the field the driver-vs-
      // close 3× adjudication subtracts before naming a regression
      // (round-10 VERDICT "what's wrong" #2 / next #6).
      val floors = numMap(n => r3(
        (gcMs.getOrElse(n, 0L) + cgMs.getOrElse(n, 0L)) / 1000.0))
      val ps = numMap(n => passes.getOrElse(n, 0).toString)
      val total = r3(names.map(best(_)).filter(_ >= 0).sum)
      val p2cov =
        if (names.isEmpty) "0"
        else r3(names.count(n => passes.getOrElse(n, 0) >= 2).toDouble
          / names.size)
      val json =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
          s""""cold":$colds,"gc_ms":$gcs,"floor":$floors,"passes":$ps,""" +
          s""""pass2_coverage":$p2cov,"warmup_sec":${r3(warmupSec)},""" +
          s""""stage_build_sec":${r3(Stage.buildSecs)},"sf":"$sfDir"}"""
      // The FILE keeps the one-line full-table contract. On STDOUT the
      // LAST line is a contract-shaped JSON sized to survive the
      // driver's 2000-char tail capture (round-13 VERDICT #2: the full
      // table line is ~60 KB and truncates to garbage, so PERF's
      // per_query/geomean/scaling came up empty). It carries the same
      // headline total plus the top per-query walls BY WALL, greedily
      // packed under a ~1500-char budget — the sub-second band it
      // omits is exactly the band whose walls are scheduler floor, and
      // `n_queries`/`q_omitted` make the truncation explicit. The full
      // 580-query map is NEVER trimmed in the file artifacts
      // (BENCH_OUT + BENCH_LOCAL.json).
      val headline = {
        val tailPart =
          s""","n_queries":${names.size},"q_omitted":@OMIT@,""" +
            s""""stage_build_sec":${r3(Stage.buildSecs)},""" +
            s""""pass2_coverage":$p2cov,"sf":"$sfDir"}"""
        val prefix =
          s"""{"metric":"total","value":$total,"unit":"sec","queries":{"""
        val budget = 1500 - tailPart.length - prefix.length
        val ranked = names.filter(best(_) >= 0).sortBy(n => -best(n))
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        var used = 0
        var fits = true
        ranked.foreach { n =>
          val e = "\"" + n + "\":" + r3(best(n))
          val add = e.length + (if (parts.nonEmpty) 1 else 0)
          if (fits && used + add <= budget) { parts += e; used += add }
          else fits = false
        }
        prefix + parts.mkString(",") + "}" +
          tailPart.replace("@OMIT@", (names.size - parts.size).toString)
      }
      outPaths.foreach(p => Files.writeString(p, json + "\n"))
      json + "\n" + headline
    }

    // Cumulative janino compile time (ms) from Spark's codegen metrics
    // source. The Codahale histogram keeps a sampled reservoir, so the
    // sum is reconstructed as count × sampled mean — an attribution
    // estimate, not an exact counter, which is all the floor needs.
    def codegenMillis(): Double = {
      val h = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME
      h.getCount.toDouble * h.getSnapshot.getMean
    }

    def timed(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val g0 = gcMillis()
      val c0 = codegenMillis()
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      val g = gcMillis() - g0
      val c = codegenMillis() - c0
      elapsed += t
      passes(name) = passes.getOrElse(name, 0) + 1
      if (!best.contains(name) || t < best(name)) {
        gcMs(name) = g
        cgMs(name) = math.max(0L, c.round)
      }
      t
    }

    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Pass-1 order: deterministic name-hash interleave so heavy
    // families (iterative graph/bootstrap batches share name prefixes)
    // are spread across the sweep instead of running back-to-back.
    val qs = qs0.sortBy { case (name, _) =>
      scala.util.hashing.MurmurHash3.stringHash(name) }
    // Pass 1: warm every query once — the table is COMPLETE from here on.
    qs.foreach { case (name, fn) =>
      order += name
      best(name) = try timed(name, fn) catch { case _: Throwable => -1.0 }
      cold(name) = best(name)
      println(writeSummary()) // incremental: a timeout still yields data
    }

    // Round-12: the budget is environment-adaptive. `elapsed` includes
    // pass 1, so on a slower box a fixed per-query constant can be
    // consumed entirely by the cold sweep and pass 2 collapses to the
    // exempt decile (measured this round: pass-1 ≈ 1000 s on a box
    // running ~1.4× slower than round 10 → pass2_coverage 0.098 with
    // the 1.9 s/query constant). Guarantee pass 2 at least 40% of the
    // measured pass-1 cost — enough for the sub-second band plus most
    // of the midrange, scaled to whatever the hardware actually does.
    // The adaptive floor applies ONLY when no explicit budget was set
    // (round-13 ADVICE): a user-configured SPARK_GRAFT_BENCH_BUDGET_SECS
    // is a cap and must stay one — bounded CI runs rely on it.
    val pass1Elapsed = elapsed
    val budget2 =
      if (sys.env.contains("SPARK_GRAFT_BENCH_BUDGET_SECS")) budget
      else math.max(budget, pass1Elapsed * 1.4)

    def rerun(name: String, fn: (SparkSession, String) => DataFrame,
        exemptBudget: Boolean): Unit =
      if (best(name) >= 0 && (exemptBudget || elapsed < budget2)) {
        val t = try timed(name, fn) catch { case _: Throwable => best(name) }
        best(name) = math.min(best(name), t)
        println(writeSummary())
      }
    (1 to iters).foreach { _ =>
      val ok = qs.filter { case (name, _) => best(name) >= 0 }
      // (0) REGRESSION-RISK first, budget-EXEMPT (round-13, VERDICT
      // #3): any query whose pass-1 wall exceeds 1.8× its committed
      // BENCH_LOCAL value is a phantom-mover candidate — a cold pass
      // masquerading as a plan regression. Rerun those before anything
      // else, worst inflation first, so every would-be ">2× mover" in
      // a driver run is guaranteed a warm pass even if the budget dies
      // immediately after pass 1.
      val risk = ok.filter { case (n, _) =>
          committed.get(n).exists(c => c > 0 && best(n) > 1.8 * c) }
        .sortBy { case (n, _) => -(best(n) / committed(n)) }
      risk.foreach { case (n, f) => rerun(n, f, exemptBudget = true) }
      val riskNames = risk.map(_._1).toSet
      // (a) slowest decile, descending, budget-EXEMPT: guaranteed
      // best-of-2 for exactly the band whose cold pass most overstates
      // steady state (round-9's unre-run q448-class 84× tails).
      // Round-14 (VERDICT r13 #9): a heavy query whose pass-1 wall
      // already sits within 1.15× of its committed reference has no
      // cold-run distortion to correct — an exempt rerun buys nothing
      // (measured: the mutation-dominated DDL-lifecycle class is
      // cold/warm symmetric and was eating ~25 s of exempt budget every
      // sweep). Steady-at-cold queries drop out of the exempt decile
      // and rerun LAST in the budgeted midrange instead.
      val steadyAtCold = (n: String) =>
        committed.get(n).exists(c => c > 0 && best(n) <= 1.15 * c)
      val decile = math.max(1, ok.size / 10)
      val slowSet = ok
        .filterNot { case (n, _) =>
          riskNames.contains(n) || steadyAtCold(n) }
        .sortBy { case (n, _) => -best(n) }.take(decile)
      slowSet.foreach { case (n, f) => rerun(n, f, exemptBudget = true) }
      val slowNames = slowSet.map(_._1).toSet ++ riskNames
      // (b) sub-second queries ascending — their total warm cost is
      // tiny, so every cheap query gets its second pass early in the
      // budget; (c) the remaining midrange descending with what's left,
      // steady-at-cold heavies last (their rerun is the least
      // informative spend).
      val rest = ok.filterNot { case (n, _) => slowNames.contains(n) }
      val (cheap, mid) = rest.partition { case (n, _) => best(n) < 1.0 }
      cheap.sortBy { case (n, _) => best(n) }
        .foreach { case (n, f) => rerun(n, f, exemptBudget = false) }
      val (midSteady, midCold) =
        mid.partition { case (n, _) => steadyAtCold(n) }
      midCold.sortBy { case (n, _) => -best(n) }
        .foreach { case (n, f) => rerun(n, f, exemptBudget = false) }
      midSteady.sortBy { case (n, _) => -best(n) }
        .foreach { case (n, f) => rerun(n, f, exemptBudget = false) }
    }
    spark.stop()
  }
}
