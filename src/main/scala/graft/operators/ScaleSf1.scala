package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** sf1 fixture generation + the order-of-magnitude scale proof
  * (round-6 VERDICT "next round" #3).
  *
  * SCALE.md's earlier growth points (1x/10x/80x via `Scale`) replicate
  * the corpus with a *prefix* token, which — shingles being content-based
  * 3-word grams — makes every copy a near-dup of its source: a useful
  * clique STRESS, but not what a bigger corpus looks like. A real
  * sf0.1→sf1 step (like the driver's own sf0.01→sf0.1) is 10× mostly
  * DISTINCT documents with the dup-RATE held constant. `GenScaled`
  * produces exactly that: copy 0 is the source verbatim; copy i>0
  * suffixes every token with `v<i>`, which rewrites every 3-word
  * shingle (no cross-copy near-dups) while preserving per-doc token
  * counts, so the planted near-dup structure replicates per copy and
  * the dup fraction is scale-invariant. Embeddings rotate by i
  * positions (norm-preserving, direction-distinct); relational facts
  * re-key each copy into a disjoint key space with consistent offsets
  * across referencing columns, so join fan-outs are unchanged.
  *
  * `ScaleRun` then measures named SparkEntry queries on a given fixture
  * dir in a FRESH forked JVM (run/fork := true): pass 1 warms JIT and
  * codegen, `Stage.clearCache()` drops the session staging index, and
  * pass 2 times the full chain rebuild with warm JIT — the bench's
  * warm-minimum discipline without the staged-reuse shortcut. A third
  * pass with the cache left warm records the staged-reuse mode (the
  * production shape when one session runs the whole dedup family).
  * A SparkListener accumulates task-level shuffle read/write and input
  * bytes per measured pass, so SCALE.md carries wall AND shuffle growth.
  *
  * Text modes (round-11, VERDICT r10 #7): the default `tokens` mode
  * suffixes every token with `v<i>`, which grows BYTES superlinearly
  * (~+30%/copy on short synthetic tokens) — wall ratios over such a
  * fixture overstate how the text family scales per input byte. The
  * `bytes` mode instead applies a per-copy alphabet rotation
  * (`translate` by i positions, case-preserving): every 3-word shingle
  * still rewrites (no cross-copy near-dups), per-doc token counts AND
  * byte counts are preserved exactly, so a mult=10 fixture is 10× the
  * bytes — the honest denominator for byte-bound text walls.
  *
  * Usage:
  *   runMain graft.operators.GenScaled <srcDir> <outDir> <mult> [tokens|bytes]
  *   runMain graft.operators.ScaleRun <dir> <q1,q2,...>
  */
object GenScaled {

  private val OFF_ORD = 50000000L
  private val OFF_KEY = 10000000L // custkey/partkey/suppkey/doc/vec/event

  /** Union of `mult` re-keyed copies; `edit` rewrites one copy given its
    * index (key offsets + content perturbation). Copy 0 is verbatim.
    */
  private def copies(base: DataFrame, mult: Int)(
      edit: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until mult).map { i =>
      if (i == 0) base else edit(base, i)
    }.reduce(_ unionByName _)

  private def off(c: String, step: Long, i: Int): Column =
    (col(c) + lit(step * i)).as(c)

  def main(args: Array[String]): Unit = {
    val Array(src, out, multS) = args.take(3)
    val mult = multS.toInt
    val textMode = args.lift(3).getOrElse("tokens")
    require(textMode == "tokens" || textMode == "bytes",
      s"text mode must be tokens|bytes, got $textMode")
    require(textMode == "tokens" || mult <= 26,
      "bytes mode rotates the alphabet per copy: mult > 26 would wrap " +
        "to verbatim duplicates")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64 output files per table, hash-placed on the table's lead key
    // (deterministic row→file map). The union-of-copies plan otherwise
    // writes one file per copy (10 at mult=10), and a 10-file corpus
    // caps every scan stage at 10 tasks — measured round-14: the
    // 32-core sf1 probe showed ≤2.2× over 8 cores on scan-bound
    // queries purely from idle cores during the scan (guide §6 input
    // splits; parquet row-group granularity makes minPartitionNum
    // ineffective on single-row-group files).
    def write(name: String, df: DataFrame): Unit = {
      val laid = df.repartition(64, col(df.columns.head))
      laid.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // Corpus tables — the heavy-family inputs.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase(java.util.Locale.ROOT)
    def rot(s: String, i: Int): String =
      s.substring(i % 26) + s.substring(0, i % 26)
    write("documents", copies(t(spark, src, "documents"), mult) { (d, i) =>
      val text =
        if (textMode == "bytes")
          translate(col("text"), lower + upper,
            rot(lower, i) + rot(upper, i))
        else regexp_replace(col("text"), "(\\S+)", s"$$1v$i")
      d.select(off("doc_id", OFF_KEY, i), text.as("text"), col("lang"),
        col("source"), length(text).cast("long").as("n_chars"))
    })
    write("embeddings", copies(t(spark, src, "embeddings"), mult) { (d, i) =>
      val dim = size(col("embedding"))
      // rotate by i MOD dim: a raw i ≥ dim made slice() fail silently
      // at mult > dim (observed generating the sf10 fixture) — copies
      // whose rotation wraps to 0 are direction-identical re-keys,
      // which is fine for the relational/text probes a >dim mult feeds
      val r = pmod(lit(i), dim)
      d.select(off("vec_id", OFF_KEY, i),
        concat(slice(col("embedding"), r + lit(1), dim - r),
          slice(col("embedding"), lit(1), r)).as("embedding"),
        col("label"))
    })

    // Relational facts: disjoint key spaces per copy, offsets consistent
    // across referencing columns (join selectivities preserved).
    write("customer", copies(t(spark, src, "customer"), mult) { (d, i) =>
      d.select(off("c_custkey", OFF_KEY, i), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    })
    write("orders", copies(t(spark, src, "orders"), mult) { (d, i) =>
      d.select(off("o_orderkey", OFF_ORD, i), off("o_custkey", OFF_KEY, i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    })
    write("lineitem", copies(t(spark, src, "lineitem"), mult) { (d, i) =>
      d.select(off("l_orderkey", OFF_ORD, i), off("l_partkey", OFF_KEY, i),
        off("l_suppkey", OFF_KEY, i), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
    })
    write("part", copies(t(spark, src, "part"), mult) { (d, i) =>
      d.select(off("p_partkey", OFF_KEY, i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    })
    write("supplier", copies(t(spark, src, "supplier"), mult) { (d, i) =>
      d.select(off("s_suppkey", OFF_KEY, i), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    })
    write("events", copies(t(spark, src, "events"), mult) { (d, i) =>
      d.select(off("event_id", OFF_KEY, i), col("ts"),
        off("user_id", OFF_KEY, i), col("event_type"), col("value"),
        col("props"))
    })
    // Shared dims are scale-invariant in TPC-H.
    write("nation", t(spark, src, "nation"))
    write("region", t(spark, src, "region"))
    spark.stop()
  }
}

object ScaleRun {

  /** Task-level byte counters, reset per measured pass. */
  private class Bytes(sc: SparkContext) extends SparkListener {
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(this)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = { shufRead.set(0); shufWrite.set(0); input.set(0) }
  }

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new Bytes(spark.sparkContext)
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val q = qs(name)
      // Isolate queries from each other: measured 2-3x repeat-pass
      // inflation for late queries in a long sweep came from
      // accumulated cache/heap pressure, not the queries themselves
      // (SCALE.md round-7 addendum).
      spark.catalog.clearCache()
      System.gc()
      // Pass 1: JIT/codegen warm-up (also populates the stage cache).
      materialize(q(spark, dir))
      // Pass 2: full chain rebuild, warm JIT, counters on.
      graft.Stage.clearCache()
      bytes.reset()
      val t0 = System.nanoTime()
      materialize(q(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events drain asynchronously; settle before reading.
      Thread.sleep(500)
      val (sr, sw, in) = (bytes.shufRead.get, bytes.shufWrite.get,
        bytes.input.get)
      // Pass 3: staged-reuse mode (cache warm from pass 2).
      val t1 = System.nanoTime()
      materialize(q(spark, dir))
      val reused = (System.nanoTime() - t1) / 1e9
      println(f"""{"query":"$name","dir":"$dir","wall_s":$wall%.2f,""" +
        f""""shuffle_read_mb":${sr / 1048576.0}%.1f,""" +
        f""""shuffle_write_mb":${sw / 1048576.0}%.1f,""" +
        f""""input_mb":${in / 1048576.0}%.1f,""" +
        f""""reused_wall_s":$reused%.2f}""")
    }
    spark.stop()
  }
}
