package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Deduplication operators for training-data pipelines: exact hash,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * The reference's nearest hook is tf_feature_similarity
  * (`QueryEngine/TableFunctions/SystemFunctions/os/
  * SimilarityTableFunctions.hpp:162` in /root/reference); the dedup
  * algorithms themselves are the standard published ones (Broder 1997
  * MinHash/LSH, Charikar 2002 SimHash).
  *
  * Scale design (100 TB): every stage is explode → hash → groupBy/join on
  * a key whose cardinality grows with the corpus (doc_id, band bucket,
  * shingle) — so work distributes; nothing collects to the driver.
  *  - MinHash signatures: ONE pass over exploded shingles computing all K
  *    permutations as K aggregate expressions (map-side partial agg).
  *  - LSH banding: candidates only form inside a (band, bucket) group —
  *    sub-quadratic; hot buckets are bounded by banding width.
  *  - Exact Jaccard verification joins shingle sets only for LSH-candidate
  *    pairs (semi-join pruning), never all-pairs.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  private val K = 32          // minhash permutations
  private val BANDS = 8       // LSH bands (rows per band = K / BANDS = 4)
  private val SignBits = 8    // q192 sign-bucket bits (dims 0..7)
  private val SignMargin = 0.02 // q192 multi-probe flip threshold

  /** (doc_id, shingle) pairs: 3-word shingles of the normalized text.
    * Duplicate shingles within a doc are dropped (set semantics).
    */
  private[operators] def shingles(s: SparkSession, d: String): DataFrame =
    shinglesOf(t(s, d, "documents"))

  private[operators] def shinglesOf(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"),
        split(regexp_replace(trim(lower(col("text"))), "[^a-z0-9 ]", ""),
          " +").as("toks"))
      // Docs with fewer than 3 tokens contribute the whole doc as one
      // shingle (no degenerate repeated-token shingles from clamping).
      .select(col("doc_id"),
        explode(expr(
          """CASE WHEN size(toks) < 3 THEN array(concat_ws(' ', toks))
             ELSE transform(sequence(1, size(toks) - 2),
               i -> concat_ws(' ', element_at(toks, i),
                              element_at(toks, i + 1),
                              element_at(toks, i + 2))) END"""))
          .as("sh"))
      .distinct()
  }

  /** Portable exact-dup document fingerprint: md5 of the lowercased
    * text with non-alphanumerics stripped and runs of spaces collapsed
    * — the identity key of the q207 ingest-dedup chain (DuckDB
    * computes the identical md5 in the oracle).
    */
  private[graft] def docFingerprint(c: Column): Column =
    md5(regexp_replace(regexp_replace(lower(c),
      "[^a-z0-9 ]", ""), " +", " "))

  /** STANDING corpus fingerprint index (round-13, VERDICT #2 — the
    * stated 100 TB production shape for q207). The corpus's distinct
    * exact-dup fingerprints are written ONCE per (fixture, JVM) as a
    * bucketBy(fp) + sortBy table — the q282/q191 maintained-index
    * machinery — so classifying an ingest batch against the corpus is
    * a join that reads the corpus side bucket-aligned with NO Exchange
    * at ANY corpus size: only the (small) batch shuffles, to the
    * bucket count. At 100 TB this table is appended batch-over-batch
    * (each batch's novel fingerprints MERGE in after admission, the
    * q587 refresh discipline) rather than re-derived; the per-fixture
    * build here stands in for that standing index. Replaces the
    * round-12 broadcast-hinted fingerprint set, which capped out at
    * driver/executor memory (~1M fps at sf10) — the documented
    * scale-killer caveat this index retires. PlanSpec pins the
    * exchange-free corpus side of the q207 join.
    */
  private val fpIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Build (once per (fixture, tag, JVM)) a bucketed fingerprint table
    * from `corpus` and return its name. Tagging keeps independently
    * MAINTAINED indexes apart: q207 reads the pristine corpus index,
    * q588 maintains its own copy batch-over-batch.
    */
  private[graft] def fpIndexTable(s: SparkSession, d: String, tag: String,
      corpus: => DataFrame): String =
    fpIndexCache.computeIfAbsent((d, tag), _ => {
      val db = "graft_bkt"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION " +
        s"'${graft.Stage.scratchDir("graft_bucketed")}'")
      val name = s"$db.b_${tag}_${Similarity.indexTableSuffix(d)}"
      // bucket count = session parallelism (the q282 measurement:
      // fewer buckets than cores halves the probe join's parallelism)
      val buckets = s.conf.get("spark.sql.shuffle.partitions").toInt
      corpus
        .repartition(buckets, col("fp"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "fp").sortBy("fp")
        .saveAsTable(name)
      name
    })

  /** Session-staged (doc_id, source, fp) fingerprint projection of the
    * documents corpus — the shared input of the ingest/index-lifecycle
    * family (q207/q588/q592/q593/q595 and corpusFps below). The
    * md5+regex fingerprint pass is the family's cost center, and each
    * entry's plan re-embeds it once per filter/union branch per
    * materialization (projection subtrees are not exchange boundaries,
    * so ReuseExchange cannot dedup them); staging makes it ONE corpus
    * pass per session, after which every branch reads the narrow
    * 3-column stage (guide §1.2 — the round-3 staging lesson).
    */
  private[graft] def docFps(s: SparkSession, d: String): DataFrame =
    graft.Stage(t(s, d, "documents").select(col("doc_id"), col("source"),
      docFingerprint(col("text")).as("fp")), "docfp")

  private[graft] def corpusFps(s: SparkSession, d: String): DataFrame =
    docFps(s, d)
      .filter(col("source") =!= "src19")
      .select(col("fp"))
      .distinct()

  private[graft] def corpusFpIndex(s: SparkSession, d: String): DataFrame =
    s.table(fpIndexTable(s, d, "corpfp", corpusFps(s, d)))

  /** ADMIT a classified batch into a standing fingerprint index: the
    * batch's fingerprints not already present append as new bucketed
    * files (each append writes one file set per bucket — the standing
    * index stays bucket-aligned forever, no rebuild, no rewrite of
    * existing files). The anti-join makes admission IDEMPOTENT: a
    * replayed batch appends nothing, so re-running a day's ingest —
    * or a bench re-pass — cannot double-admit. At 100 TB this is the
    * day-over-day lifecycle: classify against the index, admit the
    * novel fingerprints, classify tomorrow's batch against the grown
    * index.
    */
  /** Rebuild (overwrite) a tagged index to its day-0 state. The q588
    * entry replays a two-day ingest cycle; resetting first makes the
    * replay deterministic per run (a bench re-pass must not classify
    * day 1 against yesterday's already-grown index).
    */
  private[graft] def rebuildFpIndex(s: SparkSession, d: String,
      tag: String, corpus: DataFrame): String = {
    val name = s"${bucketDb(s)}.b_${tag}_${Similarity.indexTableSuffix(d)}"
    writeFpTable(s, name, corpus)
    fpIndexCache.put((d, tag), name)
    name
  }

  /** The shared bucketed-index database (created on first use). */
  private[graft] def bucketDb(s: SparkSession): String = {
    val db = "graft_bkt"
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION " +
      s"'${graft.Stage.scratchDir("graft_bucketed")}'")
    db
  }

  /** (Over)write a bucketed fingerprint table at `name` from `corpus`
    * (a one-column `fp` DataFrame) and clear any tombstones attached to
    * it — a rebuilt index starts with nothing retracted. Bucket count =
    * session parallelism (the q282 measurement: fewer buckets than
    * cores halves every probe join's parallelism).
    */
  private[graft] def writeFpTable(s: SparkSession, name: String,
      corpus: DataFrame, bucketsOpt: Option[Int] = None): Unit = {
    val buckets = bucketsOpt.getOrElse(
      s.conf.get("spark.sql.shuffle.partitions").toInt)
    corpus
      .repartition(buckets, col("fp"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(name)
    if (s.catalog.tableExists(tombstoneTableOf(name)))
      s.sql(s"DROP TABLE ${tombstoneTableOf(name)}")
    s.catalog.refreshTable(name)
  }

  /** COMPACT a standing bucketed fingerprint index in place (q592 —
    * the day-N maintenance step of the q207/q588/q590 lifecycle).
    * Admission appends one file set per touched bucket per batch, so
    * after N batches a bucket holds up to N+1 small files; at 100 TB
    * the accumulated small-file count is itself a scan-cost problem
    * (every classify join opens every file of every bucket). The
    * compaction rewrites the table to ONE file set while preserving
    * the bucketBy(fp)+sortBy layout — same table name, same bucket
    * spec, so classification plans keep their zero-corpus-side-
    * Exchange property untouched. The rewrite stages into a side
    * table and swaps via DROP + RENAME (the OPTIMIZE dance): readers
    * before the swap see the old files, after it the compacted ones.
    */
  private[graft] def compactFpIndex(s: SparkSession,
      tableName: String): Unit =
    rewriteBucketed(s, tableName, s.table(tableName))

  private def indexBuckets(s: SparkSession, tableName: String): Int = {
    val Array(db, tbl) = tableName.split("\\.", 2)
    s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some(db)))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(s.conf.get("spark.sql.shuffle.partitions").toInt)
  }

  /** Rewrite a bucketed index table in place from `input` rows,
    * preserving the bucket spec — side table + rename swap.
    *
    * Crash ordering: the old table is renamed ASIDE before the new one
    * takes the name, and only then dropped — a crash at any point
    * leaves at least one complete copy on disk (`_compact` or `_old`),
    * never zero. The name itself is briefly absent between the two
    * renames; a single-user embedded engine has no concurrent reader
    * to race (a multi-writer deployment would swap a catalog pointer,
    * the COW-version discipline Ddl's managed tables already use).
    */
  private def rewriteBucketed(s: SparkSession, tableName: String,
      input: DataFrame): Unit = {
    val Array(db, tbl) = tableName.split("\\.", 2)
    val buckets = indexBuckets(s, tableName)
    val tmp = s"$db.${tbl}_compact"
    // Read the fragmented table with bucketed scanning OFF: a bucketed
    // scan advertises HashPartitioning(fp, buckets), which lets the
    // planner elide the repartition — and the writer then emits one
    // file per bucket per SCAN task (file-bin-packed, not bucket-
    // aligned), i.e. the same fragmentation we're removing. With a
    // plain scan the repartition survives, every write task holds
    // exactly its own bucket, and the output is one file per bucket.
    val bucketingConf = "spark.sql.sources.bucketing.enabled"
    val prev = s.conf.get(bucketingConf)
    try {
      s.conf.set(bucketingConf, "false")
      input.repartition(buckets, col("fp"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "fp").sortBy("fp")
        .saveAsTable(tmp)
    } finally s.conf.set(bucketingConf, prev)
    val old = s"$db.${tbl}_old"
    s.sql(s"DROP TABLE IF EXISTS $old")
    s.sql(s"ALTER TABLE $tableName RENAME TO $old")
    s.sql(s"ALTER TABLE $tmp RENAME TO $tableName")
    s.sql(s"DROP TABLE $old")
    s.catalog.refreshTable(tableName)
  }

  /** Tombstone table of a standing index — bucketed by fp with the
    * index's own layout, so the retained view's anti-join is
    * bucket-aligned on BOTH corpus-sized sides (zero exchange).
    */
  private[graft] def tombstoneTableOf(idx: String): String = idx + "_ts"

  /** RETRACT fingerprints from a standing index without rewriting it
    * (q593 — the GDPR/erasure path of the q207/q588 lifecycle). A
    * 100 TB index cannot afford a rewrite per erasure request; instead
    * the retracted fingerprints append to a tombstone side table
    * bucketed identically, and every classification reads the index
    * THROUGH `retainedFpIndex` (index ANTI tombstones — co-located
    * merge join, no shuffle on either corpus-sized side). Idempotent
    * like admission: an already-tombstoned fp appends nothing.
    * `gcFpIndex` later applies the tombstones physically (the
    * delete-vector + compaction-GC discipline of lakehouse deletes).
    */
  private[graft] def retractFromFpIndex(s: SparkSession, idx: String,
      fps: DataFrame): Unit = {
    val ts = tombstoneTableOf(idx)
    val buckets = indexBuckets(s, idx)
    // On the first retraction the tombstone table doesn't exist yet:
    // the anti-join is vacuous and mode("append").saveAsTable CREATES
    // the table with this bucket spec — the old shape paid an extra
    // limit(0) bucketed write + catalog round trip just to make it
    // exist (round-14, one statement job removed per first-retract).
    val novel =
      if (s.catalog.tableExists(ts))
        fps.select(col("fp")).distinct()
          .join(s.table(ts), Seq("fp"), "left_anti")
      else fps.select(col("fp")).distinct()
    novel
      .repartition(buckets, col("fp"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(ts)
    s.catalog.refreshTable(ts)
  }

  /** The index minus its tombstones — what every classification join
    * must read once retraction exists. Both sides are bucketBy(fp)
    * tables with the same bucket count, so the anti-join is a
    * co-located merge join: zero Exchange at any index size.
    */
  private[graft] def retainedFpIndex(s: SparkSession, idx: String): DataFrame =
    if (s.catalog.tableExists(tombstoneTableOf(idx)))
      s.table(idx)
        .join(s.table(tombstoneTableOf(idx)).hint("merge"),
          Seq("fp"), "left_anti")
    else s.table(idx)

  /** Apply tombstones physically: rewrite the index to its retained
    * rows (one file per bucket, layout preserved) and drop the
    * tombstone table. Classification results must be identical before
    * and after — GC is semantically free, it only reclaims the
    * tombstoned bytes and restores the one-file-per-bucket scan shape.
    */
  private[graft] def gcFpIndex(s: SparkSession, idx: String): Unit = {
    rewriteBucketed(s, idx, retainedFpIndex(s, idx))
    if (s.catalog.tableExists(tombstoneTableOf(idx)))
      s.sql(s"DROP TABLE ${tombstoneTableOf(idx)}")
  }

  private[graft] def admitToFpIndex(s: SparkSession, tableName: String,
      batchFps: DataFrame): Unit = {
    // bucket count comes from the EXISTING table's spec, not session
    // conf — an admit running under a different shuffle-partition
    // setting (the streaming harness pins 8) must append with the
    // index's own layout or the write is rejected
    val Array(db, tbl) = tableName.split("\\.", 2)
    val buckets = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some(db)))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(s.conf.get("spark.sql.shuffle.partitions").toInt)
    val novel = batchFps.select(col("fp")).distinct()
      .join(s.table(tableName), Seq("fp"), "left_anti")
    novel
      .repartition(buckets, col("fp"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(tableName)
    s.catalog.refreshTable(tableName)
  }

  /** Engine-portable 60-bit hash: first 15 hex chars of md5, read as a
    * long. DuckDB computes the identical value via
    * `('0x' || substr(md5(x),1,15))::BIGINT`, which is what lets
    * q41-q43 carry real differential oracles (xxhash64 did not —
    * round-4 VERDICT "Missing" item 1). Always non-negative (< 2^60).
    */
  private[operators] def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Affine minhash permutations h_i = (a_i*lo + b_i*hi + c_i) mod M61
    * over the 60-bit base hash split into 30-bit halves, so every
    * intermediate stays < 2^61: overflow-free in BOTH engines (Java
    * wraps silently, DuckDB BIGINT traps — neither is portable, so we
    * stay in range). ONE md5 per shingle instead of K (the round-3
    * staging lesson applied to hashing: don't recompute the expensive
    * part K times when an arithmetic family gives independent perms).
    */
  private[operators] val M61 = 2305843009213693951L // 2^61 - 1
  private def mixConst(i: Int, salt: Long): Long =
    ((i + 1).toLong * 2654435761L + salt) % 1073741789L + 1
  private[operators] val PermA = (0 until K).map(mixConst(_, 98765L))
  private[operators] val PermB = (0 until K).map(mixConst(_, 12345L))
  private[operators] val PermC = (0 until K).map(mixConst(_, 55555L))

  private def minhashSignatures(sh: DataFrame): DataFrame = {
    val halves = sh
      .select(col("doc_id"), hash60(col("sh")).as("hb"))
      .select(col("doc_id"),
        col("hb").bitwiseAND(lit(1073741823L)).as("lo"),
        shiftright(col("hb"), 30).as("hi"))
    val aggs = (0 until K).map { i =>
      min((lit(PermA(i)) * col("lo") + lit(PermB(i)) * col("hi") +
        lit(PermC(i))) % M61).as(s"h$i")
    }
    halves.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-(band,bucket) group-size cap: groups up to this size emit all
    * pairs; larger (hot) buckets — web-crawl boilerplate — emit only
    * (min-doc, member) star pairs, bounding work at O(m) instead of
    * O(m²) per bucket while preserving single-linkage connectivity.
    */
  private val HOT_BUCKET_CAP = 16

  /** Explicit staging-table materialization (shared util, session-scoped
    * root + shutdown cleanup — see graft.Stage). This pipeline read the
    * shingle→minhash→banding chain 4× before staging, 3× the whole q41
    * cost.
    */
  private def stage(df: DataFrame, name: String): DataFrame =
    graft.Stage(df, name)

  /** Banded bucket assignment from minhash signatures:
    * (doc_id, band, bucket).
    */
  private def bandedOf(sig: DataFrame): DataFrame = {
    val bandCols = (0 until BANDS).map { b =>
      val rows = (0 until K / BANDS).map(r => col(s"h${b * (K / BANDS) + r}"))
      struct(lit(b).as("band"),
        hash60(concat_ws(":", rows: _*)).as("bucket"))
    }
    sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs (a < b) from banded minhash signatures. */
  private def lshCandidates(sig: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = bandedOf(sig)
    // Bucket size + representative via ONE window shuffle (no self-join),
    // then staged: the small/hot branches below scan it three ways.
    val w = Window.partitionBy(col("band"), col("bucket"))
    val withStats = stage(banded
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("rep", min(col("doc_id")).over(w)), "banded")
    // Small buckets: all pairs. Hot buckets: star pairs around the rep.
    val small = withStats.filter(col("m") <= HOT_BUCKET_CAP)
    val a = small.select(col("band"), col("bucket"),
      col("doc_id").as("a_id"))
    val b = small.select(col("band"), col("bucket"),
      col("doc_id").as("b_id"))
    val smallPairs = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    val hotPairs = withStats.filter(col("m") > HOT_BUCKET_CAP)
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
    smallPairs.unionAll(hotPairs).distinct()
  }

  /** Cross-corpus DECONTAMINATION — the benchmark-contamination check a
    * training pipeline runs before training: flag TRAIN docs whose
    * n-gram jaccard with ANY TEST doc reaches `threshold`. Same
    * minhash-LSH band machinery as within-corpus dedup, but candidate
    * pairs form ONLY across the corpus boundary (train × test inside a
    * shared (band, bucket)) — the train side never self-pairs, so the
    * candidate volume is driven by the small test side no matter how
    * large the training corpus grows. Returns
    * (a_id = train doc, n_hits, max_jaccard).
    */
  private[operators] def decontaminationFlags(train: DataFrame,
      test: DataFrame, threshold: Double): DataFrame = {
    val shTrain = stage(shinglesOf(train), "dc_sh_train")
    val shTest = stage(shinglesOf(test), "dc_sh_test")
    val cand = bandedOf(minhashSignatures(shTrain))
      .select(col("band"), col("bucket"), col("doc_id").as("a_id"))
      .join(bandedOf(minhashSignatures(shTest))
        .select(col("band"), col("bucket"), col("doc_id").as("b_id")),
        Seq("band", "bucket"))
      .select(col("a_id"), col("b_id")).distinct()
    val sizesA = shTrain.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    val sizesB = shTest.groupBy(col("doc_id")).agg(count(lit(1)).as("n_b"))
    val inter = cand
      .join(shTrain.select(col("doc_id").as("a_id"), col("sh")), "a_id")
      .join(shTest.select(col("doc_id").as("b_id"), col("sh")),
        Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizesA.withColumnRenamed("doc_id", "a_id"), "a_id")
      .join(sizesB.withColumnRenamed("doc_id", "b_id"), "b_id")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("jaccard")).as("max_jaccard"))
  }

  /** Charikar SimHash over a (doc_id, text) frame: 60 bit-vote sums in
    * one aggregation pass, reassembled into a long. 60 bits (not 64)
    * because the token hash is the engine-portable 60-bit md5 prefix —
    * the DuckDB oracle replays the identical signature.
    */
  private[operators] val SimhashBits = 60
  private[operators] def simhashOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(split(regexp_replace(trim(lower(col("text"))),
          "[^a-z0-9 ]", ""), " +")).as("tok"))
      .withColumn("th", hash60(col("tok")))
    val votes = (0 until SimhashBits).map(j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(lit(1L)) === 1L,
        lit(1)).otherwise(lit(-1))).as(s"v$j"))
    val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until SimhashBits).map(j =>
        when(col(s"v$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    voted.select(col("doc_id"), sig.as("simhash"))
  }

  /** LSH-pruned n-gram-Jaccard verdicts over a (doc_id, text) frame:
    * (doc_id, dup_of = smallest similar doc, else itself).
    */
  /** LSH-pruned exact-jaccard edge set: (a_id, b_id, jaccard ≥ 0.5). */
  private[operators] def jaccardPairsOf(docs: DataFrame): DataFrame = {
    // Staged once (corpus-sized): sizes, minhash, and both sides of
    // the intersection join all scan the parquet staging table.
    val sh = stage(shinglesOf(docs), "sh")
    val sizes = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))
    val cand = lshCandidates(minhashSignatures(sh))
    // Exact |A∩B| only for candidate pairs.
    val shA = sh.select(col("doc_id").as("a_id"), col("sh"))
    val shB = sh.select(col("doc_id").as("b_id"), col("sh"))
    val inter = cand.join(shA, "a_id").join(shB, Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n_sh", "n_a"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n_sh", "n_b"), "b_id")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
  }

  private[operators] def jaccardVerdictsOf(docs: DataFrame): DataFrame = {
    val jac = jaccardPairsOf(docs)
    // Per-doc verdict: smallest neighbor id (bidirectional) or self.
    val neigh = jac.select(col("a_id").as("doc_id"),
        col("b_id").as("nb"))
      .unionAll(jac.select(col("b_id").as("doc_id"),
        col("a_id").as("nb")))
      .groupBy(col("doc_id")).agg(min(col("nb")).as("min_nb"))
    docs.select(col("doc_id"))
      .join(neigh, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(coalesce(col("min_nb"), col("doc_id")), col("doc_id"))
          .as("dup_of"))
  }

  /** Dedup GROUPS: transitive connected components over the verified
    * jaccard edge set — single-linkage duplicate clusters, the
    * materialized keep-list a training pipeline actually writes
    * (canonical = the group's min doc_id; everything else drops).
    * Min-label propagation converges in O(component diameter)
    * supersteps, each one bounded shuffle — the same loop that scales
    * the graph table functions; at 100 TB the edge set, not the corpus,
    * drives the cost, and LSH already made it near-linear.
    */
  private[operators] def dedupGroupsOf(docs: DataFrame): DataFrame = {
    val und = jaccardPairsOf(docs).select(col("a_id"), col("b_id"))
    val edges = stage(
      und.unionAll(und.select(col("b_id").as("a_id"),
        col("a_id").as("b_id"))), "dg_edges")
    val labels = ConnectedComponents.run(
      docs.select(col("doc_id").as("id")), edges)
    labels.select(col("id").as("doc_id"), col("label").as("group_id"),
      (col("id") === col("label")).as("is_canonical"))
  }

  val queries: Seq[(String, Q)] = Seq(
    // The composed ingest FRONT DOOR (round-13 — the cascade a 100 TB
    // pipeline runs per batch): exact fingerprint classification
    // against the standing bucketed index FIRST (cheap, catches every
    // verbatim copy), then SEMANTIC near-dup detection — q192's
    // sign-bucket candidates + high-threshold cosine against the
    // corpus embedding space — run ONLY over the exact-new survivors.
    // The funnel is the scale argument: stage-2 (the expensive vector
    // stage) costs proportional to what stage 1 could not dismiss,
    // and its candidates are bucket-bounded, never all-pairs. Planted
    // structure: batch docs with doc_id % 7 == 0 carry a corpus
    // vector verbatim (semantic dups at cosine 1.0); the rest carry
    // its negation (cosine ≤ ~0.5 against anything — kept). τ = 0.9
    // is threshold-robust across engines: every planted pair scores
    // exactly 1, iid 64-dim background concentrates near 0.
    "q595_dedup_cascade" -> ((s, d) => {
      import graft.functions.GraftFunctions.cosine_similarity
      val fp = docFps(s, d) // staged once per session (scaladoc above)
      val feed = fp.filter(col("source") === "src19")
        .select(col("doc_id"), col("fp"))
      val batch = feed
        .unionAll(fp.filter(col("source") =!= "src19" &&
            col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("fp")))
        .unionAll(feed.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("fp")))
      val corpus = corpusFpIndex(s, d).withColumn("in_corpus", lit(1))
      val canon = batch.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("first_id"))
      val staged = stage(batch
        .join(corpus.hint("merge"), Seq("fp"), "left")
        .join(canon, Seq("fp"))
        .select(col("doc_id"),
          when(col("in_corpus").isNotNull, "exact_dup_corpus")
            .when(col("doc_id") > col("first_id"), "exact_dup_batch")
            .otherwise("new").as("st1")), "q595_stage1")
      val emb = t(s, d, "embeddings")
      val nEmb = emb.agg(count(lit(1)).as("n_emb"))
      val newDocs = staged.filter(col("st1") === "new")
        .crossJoin(broadcast(nEmb))
        .select(col("doc_id"),
          (col("doc_id") % col("n_emb")).as("vec_id"),
          (col("doc_id") % 7 === 0).as("planted"))
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("doc_id"),
          when(col("planted"), col("embedding"))
            .otherwise(transform(col("embedding"), x => -x)).as("e"))
      def bucketOf(e: Column): Column = (0 until SignBits).map(j =>
        when(e.getItem(j) >= lit(0f), lit(1 << j)).otherwise(lit(0)))
        .reduce(_ + _)
      val corpusB = emb
        .select(col("vec_id").as("c_id"), col("embedding").as("c_e"))
        .withColumn("bucket", bucketOf(col("c_e")))
      val sem = newDocs.withColumn("bucket", bucketOf(col("e")))
        .join(corpusB, Seq("bucket"))
        .filter(cosine_similarity(col("e"), col("c_e")) > lit(0.9))
        .select(col("doc_id")).distinct()
        .withColumn("sem", lit(1))
      staged.join(sem, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("st1") === "new" && col("sem").isNotNull,
            "semantic_dup")
            .when(col("st1") === "new", "kept")
            .otherwise(col("st1")).as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("status"))
    }),

    // Exact dedup: group by content hash, keep lowest doc_id
    // (hash-groupBy; at scale this is one shuffle on the md5 key).
    "q40_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
    }),

    // Near-dedup via n-gram Jaccard, LSH-pruned: per-doc verdict
    // (dup_of = smallest similar doc, else itself) — never empty output.
    "q41_dedup_ngram_jaccard" -> ((s, d) =>
      jaccardVerdictsOf(t(s, d, "documents"))),

    // MinHash+LSH candidate summary per doc: how many LSH candidates,
    // representative = min candidate (single-linkage step 1).
    "q42_dedup_minhash_lsh" -> ((s, d) => {
      // Shingles feed only the one-pass minhash here — no staging needed;
      // lshCandidates stages its own banded table for the pair branches.
      val sh = shingles(s, d)
      val cand = lshCandidates(minhashSignatures(sh))
      val neigh = cand.select(col("a_id").as("doc_id"),
          col("b_id").as("nb"))
        .unionAll(cand.select(col("b_id").as("doc_id"),
          col("a_id").as("nb")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_candidates"), min(col("nb")).as("min_nb"))
      t(s, d, "documents").select(col("doc_id"))
        .join(neigh, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          least(coalesce(col("min_nb"), col("doc_id")), col("doc_id"))
            .as("rep_id"))
    }),

    // Embedding-cosine near-dup: per-doc verdict (dup_of = smallest
    // vector above the similarity threshold, else itself). Exact
    // all-pairs on a bounded slice — the production scale path is the
    // IVF-bucketed variant (AnnIvf.scala q99), which prunes the pair
    // space to probed cells exactly like LSH prunes shingle space.
    "q44_dedup_embedding" -> ((s, d) => {
      import graft.functions.GraftFunctions.{dot_product, l2_norm}
      // Unit-normalize ONCE per vector (O(n)), so the O(n²) pair stage
      // computes only a dot product — cosine_similarity per pair would
      // recompute both norms 2n times each.
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 1000)
        .withColumn("nrm", l2_norm(col("embedding")))
        .select(col("vec_id"),
          transform(col("embedding"),
            x => x.cast("double") / col("nrm")).as("u"))
      val a = emb.select(col("vec_id").as("a_id"), col("u").as("a_u"))
      val b = emb.select(col("vec_id").as("b_id"), col("u").as("b_u"))
      val pairs = a.crossJoin(b)
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          dot_product(col("a_u"), col("b_u")).as("sim"))
        .filter(col("sim") > 0.3)
      val neigh = pairs.select(col("a_id").as("vec_id"),
          col("b_id").as("nb"))
        .unionAll(pairs.select(col("b_id").as("vec_id"),
          col("a_id").as("nb")))
        .groupBy(col("vec_id")).agg(min(col("nb")).as("min_nb"))
      emb.select(col("vec_id"))
        .join(neigh, Seq("vec_id"), "left")
        .select(col("vec_id"),
          least(coalesce(col("min_nb"), col("vec_id")), col("vec_id"))
            .as("dup_of"))
    }),

    // SimHash (Charikar): 60-bit signature from portable md5-prefix
    // token hashes (SimhashBits = 60, replayable bit-for-bit in DuckDB)
    // — one aggregation pass with 60 bit-vote sums, reassembled into a
    // long.
    "q43_dedup_simhash" -> ((s, d) =>
      simhashOf(t(s, d, "documents"))),

    // Planted-duplicate oracle for the hash-based dedup family: the
    // corpus is augmented IN-QUERY with re-keyed copies of 50 docs, so
    // the ground truth (every planted copy is a duplicate of its
    // original) is engine-independent even though the minhash/simhash
    // values themselves aren't. This converts q41-q43's rows-only status
    // into a hash-compared end-to-end signal (round-1 VERDICT gap).
    "q122_dedup_planted" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000)
      val corpus = docs.unionByName(planted)
      // SimHash: every planted copy must hash identically to its source.
      val sims = simhashOf(corpus)
      val simMatch = sims.filter(col("doc_id") >= 10000)
        .select((col("doc_id") - 10000).as("doc_id"),
          col("simhash").as("sim_copy"))
        .join(sims, "doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("simhash") === col("sim_copy"), 1L).otherwise(0L))
            .as("n_equal"))
      // Jaccard+LSH: every planted copy must be linked to a smaller doc.
      val verdicts = jaccardVerdictsOf(corpus)
      val linked = verdicts.filter(col("doc_id") >= 10000)
        .agg(count(lit(1)).as("n"),
          sum(when(col("dup_of") < col("doc_id"), 1L).otherwise(0L))
            .as("n_linked"))
      simMatch.crossJoin(linked.select(col("n").as("n2"),
          col("n_linked")))
        .select(col("n").as("n_planted"),
          (col("n_equal") === col("n")).as("simhash_ok"),
          (col("n_linked") === col("n2")).as("jaccard_ok"))
    }),

    // Dedup groups end-to-end (planted-oracle gated like q122): 50
    // first-generation copies (+10000) AND 50 second-generation copies
    // of the copies (+20000) must land in their original's component —
    // the transitive closure the per-pair verdicts can't express — and
    // no copy may be canonical (the canonical id is the component min,
    // always the original).
    "q165_dedup_groups" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val gen1 = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000)
      val gen2 = gen1.withColumn("doc_id", col("doc_id") + 10000)
      val corpus = docs.unionByName(gen1).unionByName(gen2)
      val groups = dedupGroupsOf(corpus)
      val origGroups = groups.filter(col("doc_id") < 50)
        .select(col("doc_id").as("orig_id"),
          col("group_id").as("orig_group"))
      val copies = groups.filter(col("doc_id") >= 10000)
        .withColumn("orig_id", col("doc_id") % 10000)
        .join(origGroups, "orig_id")
      copies.agg(
        count(lit(1)).as("n_copies"),
        (sum(when(col("group_id") === col("orig_group"), 1L)
          .otherwise(0L)) === count(lit(1))).as("all_in_orig_group"),
        (sum(when(col("is_canonical"), 1L).otherwise(0L)) === 0L)
          .as("no_copy_canonical"))
    }),

    // Decontamination end-to-end (planted-oracle gated): a 30-doc "test
    // benchmark" drawn verbatim from the corpus — every source train doc
    // must be flagged, each at jaccard exactly 1.0 (identical shingle
    // sets), regardless of whatever natural near-dups exist elsewhere.
    "q172_decontamination" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val test = docs.filter(col("doc_id") < 30)
        .withColumn("doc_id", col("doc_id") + 50000)
      decontaminationFlags(docs, test, 0.8)
        .filter(col("a_id") < 30)
        .agg(count(lit(1)).as("n_found"),
          (min(col("max_jaccard")) === 1.0).as("all_exact"))
    }),

    // SemDeDup-style SCALE PATH for embedding near-dup (q44 is the
    // bounded all-pairs baseline): bucket vectors by the SIGNS of their
    // first SignBits stored coordinates (multi-probe: a coordinate
    // within SignMargin of zero probes the flipped bucket too), pair
    // only within a bucket, then verify candidates with exact cosine.
    // Reading the sign of a STORED float involves zero arithmetic, so
    // both engines derive identical buckets — the oracle replays the
    // whole pruned pipeline bit-for-bit (a kmeans coarse quantizer, as
    // in q99, could not be replayed in SQL). At 100 TB: bucket
    // assignment is a pure projection over the scan, candidate pairs
    // form only inside a bucket (sub-quadratic, same argument as LSH
    // banding), and the exact-cosine verify touches candidates only.
    // Scale knobs: SignBits grows with the corpus (buckets = 2^bits;
    // pick bits ~ log2(n / target_bucket_size)), and a skewed corpus
    // takes the same HOT_BUCKET_CAP star-pairing as lshCandidates
    // above — the fixture measures flat (max bucket 16 vs mean 8.9 at
    // sf0.1), so the cap stays out of the gated query.
    "q192_semdedup_signbuckets" -> ((s, d) => {
      import graft.functions.GraftFunctions.cosine_similarity
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val b0 = (0 until SignBits).map(j =>
        when(col("embedding").getItem(j) >= lit(0f), lit(1 << j))
          .otherwise(lit(0))).reduce(_ + _)
      // Probe set per vector: primary bucket + one flip per
      // near-zero coordinate (null entries filtered out).
      val flips = (0 until SignBits).map(j =>
        when(abs(col("embedding").getItem(j)) < lit(SignMargin),
          col("b0").bitwiseXOR(lit(1 << j))))
      val probes = emb.withColumn("b0", b0)
        .select(col("vec_id"), explode(array_distinct(filter(
          array(col("b0") +: flips: _*), x => x.isNotNull))).as("bucket"))
      // Candidates: distinct within-bucket pairs; staged — both the
      // per-vec candidate count and the cosine verify read it.
      val cand = stage(probes.select(col("bucket"), col("vec_id").as("a_id"))
        .join(probes.select(col("bucket"), col("vec_id").as("b_id")),
          Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id")).distinct(), "sign_cand")
      val candN = cand.select(col("a_id").as("vec_id"))
        .unionAll(cand.select(col("b_id").as("vec_id")))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_cand"))
      val verified = cand
        .join(emb.select(col("vec_id").as("a_id"),
          col("embedding").as("a_e")), "a_id")
        .join(emb.select(col("vec_id").as("b_id"),
          col("embedding").as("b_e")), "b_id")
        .filter(cosine_similarity(col("a_e"), col("b_e")) > 0.3)
        .select(col("a_id"), col("b_id"))
      emb.select(col("vec_id"))
        .join(candN, Seq("vec_id"), "left")
        .join(verified.select(col("a_id").as("vec_id"),
            col("b_id").as("nb"))
          .unionAll(verified.select(col("b_id").as("vec_id"),
            col("a_id").as("nb")))
          .groupBy(col("vec_id")).agg(min(col("nb")).as("min_nb")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          least(coalesce(col("min_nb"), col("vec_id")), col("vec_id"))
            .as("dup_of"))
    }),

    // LSH recall AUDIT — the dedup chain as an EVALUATED system: on a
    // bounded slice, compute (a) exact ground truth (inverted-index
    // all-pairs jaccard >= 0.5 — only pairs sharing a shingle can
    // qualify, so this is the shingle join, not n²), (b) the LSH
    // chain's verified pairs. Precision is 1.0 by construction (found
    // pairs are exact-jaccard-verified), so the audited number is
    // RECALL — banding theory puts per-pair find probability at
    // 1-(1-j^4)^8 (K=32, 8 bands), ~0.40 at j=0.5 and ->1 as j->1,
    // and the hash-based chain makes the realized value deterministic
    // and replayable. candidate_frac pins the efficiency side: the
    // fraction of all possible pairs LSH actually surfaced.
    "q209_lsh_recall_audit" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 1000)
      val sh = stage(shinglesOf(docs), "q209_sh")
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      def jacc(pairs: DataFrame): DataFrame = pairs
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")),
          "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")),
          "b_id")
        .filter(col("c").cast("double") /
          (col("na") + col("nb") - col("c")) >= 0.5)
        .select(col("a_id"), col("b_id"))
      val cand = stage(lshCandidates(minhashSignatures(sh)), "q209_cand")
      val found = jacc(cand
        .join(sh.select(col("doc_id").as("a_id"), col("sh")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("sh")),
          Seq("b_id", "sh"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("c")))
      val truth = jacc(sh.select(col("doc_id").as("a_id"), col("sh"))
        .join(sh.select(col("doc_id").as("b_id"), col("sh")), "sh")
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("c")))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        .select(col("n_docs"), col("n_truth"), col("n_candidates"),
          col("n_found"),
          round(col("n_found").cast("double") /
            nullif(col("n_truth"), lit(0)), 6).as("recall"),
          round(col("n_candidates").cast("double") /
            (col("n_docs") * (col("n_docs") - 1) / lit(2)), 6)
            .as("candidate_frac"))
    }),

    // The FIX for q212's finding: key the train/val/test hash on the
    // dedup-CANONICAL id (each doc's q41 verdict dup_of) instead of the
    // doc id, so a duplicate inherits its canonical's split and direct
    // dup pairs can no longer straddle the boundary. One row contrasts
    // doc-level vs canonical-level leakage on the same edge set
    // (canonical-level can stay nonzero only along multi-hop chains —
    // the fully transitive grouping is q165; the fixture's pairs are
    // planted copies, so here it drops to zero).
    "q213_group_split_fix" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 1000)
      def splitOf(id: Column): Column = {
        val h = (id.bitwiseAND(lit(2147483647L)) *
          lit(2654435761L)) % lit(4294967296L)
        when(h % 100 < 80, "train").when(h % 100 < 90, "val")
          .otherwise("test")
      }
      // ONE chain build: pairs are staged, verdicts derive from them
      // (jaccardVerdictsOf would rebuild the whole shingle→LSH chain).
      val pairs = stage(jaccardPairsOf(docs)
        .select(col("a_id"), col("b_id")), "q213_pairs")
      val verdicts = docs.select(col("doc_id"))
        .join(pairs.select(col("a_id").as("doc_id"), col("b_id").as("nb"))
          .unionAll(pairs.select(col("b_id").as("doc_id"),
            col("a_id").as("nb")))
          .groupBy(col("doc_id")).agg(min(col("nb")).as("min_nb")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(coalesce(col("min_nb"), col("doc_id")), col("doc_id"))
            .as("dup_of"))
      val keyed = pairs
        .join(verdicts.select(col("doc_id").as("a_id"),
          col("dup_of").as("a_can")), "a_id")
        .join(verdicts.select(col("doc_id").as("b_id"),
          col("dup_of").as("b_can")), "b_id")
      keyed.agg(count(lit(1)).as("n_dup_pairs"),
          count(when(splitOf(col("a_id")) =!= splitOf(col("b_id")), 1))
            .as("doc_level_leaks"),
          count(when(splitOf(col("a_can")) =!= splitOf(col("b_can")), 1))
            .as("canonical_level_leaks"))
    }),

    // MULTI-HOP closure of q213: q213 keys the split on the DIRECT-pair
    // canonical, and its own docs note that multi-hop chains need q165's
    // transitive groups. This plants a 3-generation near-dup chain per
    // base doc — A = first 70% of the tokens, B = all of them, C = last
    // 70% — so J(A,B) ≈ J(B,C) ≈ 0.7 (chain edges) while J(A,C) ≈ 0.4
    // sits BELOW the 0.5 verify threshold (no direct A-C pair). Under
    // direct-pair keying C inherits B's id while B inherits A's, so a
    // B-C pair is keyed (A, B) and leaks whenever A and B hash to
    // different splits; under the q165 CC canonical all three key to A
    // and a leak is structurally impossible (both endpoints of any
    // surviving pair share a component). One staged pair chain feeds
    // the verdicts, the CC labels, and every count (q213's reuse
    // lesson); the oracle replays the whole pipeline differentially,
    // with CC as unrolled min-label rounds (planted components have
    // diameter ≤ a few hops).
    "q236_transitive_split_fix" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val norm = split(regexp_replace(trim(lower(col("text"))),
        "[^a-z0-9 ]", ""), " +")
      val base = docs.filter(col("doc_id") < 40)
        .select(col("doc_id"), norm.as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("n7", (col("n") * 7 / 10).cast("int"))
      val gA = base.select((col("doc_id") + 10000).as("doc_id"),
        concat_ws(" ", slice(col("toks"), lit(1), col("n7"))).as("text"))
      val gB = base.select((col("doc_id") + 20000).as("doc_id"),
        concat_ws(" ", col("toks")).as("text"))
      val gC = base.select((col("doc_id") + 30000).as("doc_id"),
        concat_ws(" ", slice(col("toks"), col("n") - col("n7") + 1,
          col("n7"))).as("text"))
      // Bases 0..39 are EXCLUDED from the corpus: the full-copy B must
      // not short-circuit the chain by linking back to its original.
      val corpus = docs.filter(col("doc_id") >= 40 && col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
        .unionByName(gA).unionByName(gB).unionByName(gC)
      val pairs = stage(jaccardPairsOf(corpus)
        .select(col("a_id"), col("b_id")), "q236_pairs")
      val pp = pairs.filter(col("a_id") >= 10000 && col("b_id") >= 10000)
      val pnodes = corpus.filter(col("doc_id") >= 10000)
        .select(col("doc_id"))
      // Direct-pair canonicals (q213 keying) over the planted subgraph.
      val verd = pnodes
        .join(pp.select(col("a_id").as("doc_id"), col("b_id").as("nb"))
          .unionAll(pp.select(col("b_id").as("doc_id"),
            col("a_id").as("nb")))
          .groupBy(col("doc_id")).agg(min(col("nb")).as("min_nb")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(coalesce(col("min_nb"), col("doc_id")), col("doc_id"))
            .as("dup_of"))
      // Transitive canonicals (q165 keying) over the SAME staged edges.
      val cc = ConnectedComponents.run(
        pnodes.select(col("doc_id").as("id")),
        pp.unionAll(pp.select(col("b_id").as("a_id"),
          col("a_id").as("b_id"))))
        .select(col("id").as("doc_id"), col("label").as("cc_can"))
      def splitOf(id: Column): Column = {
        val h = (id.bitwiseAND(lit(2147483647L)) *
          lit(2654435761L)) % lit(4294967296L)
        when(h % 100 < 80, "train").when(h % 100 < 90, "val")
          .otherwise("test")
      }
      val keyed = pp
        .join(verd.select(col("doc_id").as("a_id"),
          col("dup_of").as("a_dir")), "a_id")
        .join(verd.select(col("doc_id").as("b_id"),
          col("dup_of").as("b_dir")), "b_id")
        .join(cc.select(col("doc_id").as("a_id"),
          col("cc_can").as("a_cc")), "a_id")
        .join(cc.select(col("doc_id").as("b_id"),
          col("cc_can").as("b_cc")), "b_id")
      val pairAgg = keyed.agg(
        count(lit(1)).as("n_planted_pairs"),
        count(when(col("a_id") < 20000 &&
          col("b_id") === col("a_id") + 10000, 1)).as("n_ab_edges"),
        count(when(col("a_id") >= 20000 && col("a_id") < 30000 &&
          col("b_id") === col("a_id") + 10000, 1)).as("n_bc_edges"),
        count(when(splitOf(col("a_dir")) =!= splitOf(col("b_dir")), 1))
          .as("direct_leaks"),
        count(when(splitOf(col("a_cc")) =!= splitOf(col("b_cc")), 1))
          .as("transitive_leaks"))
      val mh = verd.join(cc, "doc_id")
        .agg(count(when(col("dup_of") =!= col("cc_can"), 1))
          .as("n_multihop_docs"))
      pairAgg.crossJoin(broadcast(mh))
    }),

    // Canonical-representative selection after normalize-dedup (the
    // C4/RefinedWeb "keep the best copy" step): documents are clustered
    // by their NORMALIZED text (lowercase, non-alphanumerics → space,
    // whitespace collapsed — catches trivially re-formatted copies q40's
    // byte-exact hash misses), and each multi-member cluster keeps one
    // canonical doc by (longest raw text, then smallest doc_id). One
    // hash-partition shuffle on the normalized hash; the per-cluster
    // window is partitioned (cluster-sized, never corpus-global).
    "q335_dedup_canonical" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
      // Planted re-formatted copies (uppercased + punctuation suffix):
      // byte-distinct from their source — q40's exact hash misses them —
      // but identical after normalization, so every planted pair forms a
      // cluster whose canonical is the longer (planted) copy.
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val planted = docs
        .filter(col("doc_id") % 7 === 0 && col("doc_id") < 200)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(upper(col("text")), lit(" *** ")).as("text"))
      val base = docs.unionByName(planted)
        .select(col("doc_id"), length(col("text")).as("len"),
          md5(norm).as("nh"))
      val wSel = Window.partitionBy(col("nh"))
        .orderBy(col("len").desc, col("doc_id").asc)
      base
        .withColumn("grp_n",
          count(lit(1)).over(Window.partitionBy(col("nh"))))
        .withColumn("rk", row_number().over(wSel))
        .filter(col("rk") === 1 && col("grp_n") > 1)
        .select(col("nh"), col("doc_id").as("canonical_id"),
          col("grp_n"), col("len").as("canon_len"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    // q595: the cascade replayed set-algebraically — stage 1 against
    // the corpus fingerprint set, stage 2's sign-bucket + cosine
    // verify only over stage-1 'new' survivors.
    "q595_dedup_cascade" ->
      """WITH fp AS (
           SELECT doc_id, source,
                  md5(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS fp
           FROM documents),
         corpus0 AS (SELECT DISTINCT fp FROM fp WHERE source <> 'src19'),
         feed AS (SELECT doc_id, fp FROM fp WHERE source = 'src19'),
         batch AS (
           SELECT doc_id, fp FROM feed
           UNION ALL
           SELECT doc_id + 1000000, fp FROM fp
           WHERE source <> 'src19' AND doc_id % 25 = 0
           UNION ALL
           SELECT doc_id + 2000000, fp FROM feed WHERE doc_id % 3 = 0),
         canon AS (
           SELECT fp, min(doc_id) AS first_id FROM batch GROUP BY fp),
         s1 AS (
           SELECT b.doc_id,
                  CASE WHEN c.fp IS NOT NULL THEN 'exact_dup_corpus'
                       WHEN b.doc_id > k.first_id THEN 'exact_dup_batch'
                       ELSE 'new' END AS st1
           FROM batch b
           LEFT JOIN corpus0 c ON c.fp = b.fp
           JOIN canon k ON k.fp = b.fp),
         nemb AS (SELECT count(*) AS n FROM embeddings),
         newd AS (
           SELECT s.doc_id,
                  CASE WHEN s.doc_id % 7 = 0 THEN e.embedding
                       ELSE list_transform(e.embedding, x -> -x)
                  END AS e
           FROM s1 s CROSS JOIN nemb n
           JOIN embeddings e ON e.vec_id = s.doc_id % n.n
           WHERE s.st1 = 'new'),
         newb AS (
           SELECT doc_id, e,
                  list_sum(list_transform([0,1,2,3,4,5,6,7], j ->
                    CASE WHEN e[j+1] >= 0 THEN 1<<j ELSE 0 END))
                    ::INT AS bucket
           FROM newd),
         corpb AS (
           SELECT vec_id, embedding,
                  list_sum(list_transform([0,1,2,3,4,5,6,7], j ->
                    CASE WHEN embedding[j+1] >= 0 THEN 1<<j ELSE 0 END))
                    ::INT AS bucket
           FROM embeddings),
         sem AS (
           SELECT DISTINCT nb.doc_id
           FROM newb nb JOIN corpb cb ON cb.bucket = nb.bucket
           WHERE list_cosine_similarity(nb.e::DOUBLE[],
                   cb.embedding::DOUBLE[]) > 0.9),
         final AS (
           SELECT s.doc_id,
                  CASE WHEN s.st1 = 'new' AND m.doc_id IS NOT NULL
                         THEN 'semantic_dup'
                       WHEN s.st1 = 'new' THEN 'kept'
                       ELSE s.st1 END AS status
           FROM s1 s LEFT JOIN sem m ON m.doc_id = s.doc_id)
         SELECT status, count(*)::BIGINT AS n_docs,
                sum(doc_id)::BIGINT AS id_sum
         FROM final GROUP BY status ORDER BY status""",
    "q40_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id,
                count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",
    "q44_dedup_embedding" ->
      """WITH emb AS (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000),
         pairs AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM emb a JOIN emb b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                   b.embedding::DOUBLE[]) > 0.3),
         neigh AS (
           SELECT vec_id, min(nb) AS min_nb FROM (
             SELECT a_id AS vec_id, b_id AS nb FROM pairs
             UNION ALL
             SELECT b_id AS vec_id, a_id AS nb FROM pairs)
           GROUP BY vec_id)
         SELECT e.vec_id,
                least(coalesce(n.min_nb, e.vec_id), e.vec_id) AS dup_of
         FROM emb e LEFT JOIN neigh n ON n.vec_id = e.vec_id""",
    // The planted ground truth is engine-independent even though the
    // hash values aren't: 50 re-keyed copies MUST simhash-match and
    // jaccard-link to their originals.
    "q122_dedup_planted" ->
      """SELECT 50::BIGINT AS n_planted, true AS simhash_ok,
                true AS jaccard_ok""",
    "q165_dedup_groups" ->
      """SELECT 100::BIGINT AS n_copies, true AS all_in_orig_group,
                true AS no_copy_canonical""",
    "q172_decontamination" ->
      """SELECT 30::BIGINT AS n_found, true AS all_exact""",
    // Full differential oracle: bucket ids come from STORED float signs
    // (no arithmetic → bit-identical across engines), so DuckDB replays
    // the multi-probe bucketing, candidate pairing, and cosine verify.
    "q192_semdedup_signbuckets" ->
      """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
         bkt AS MATERIALIZED (
           SELECT vec_id, embedding,
                  list_sum(list_transform([0,1,2,3,4,5,6,7], j ->
                    CASE WHEN embedding[j+1] >= 0 THEN 1<<j ELSE 0 END))
                    ::INT AS b0
           FROM emb),
         probes AS MATERIALIZED (
           SELECT DISTINCT vec_id, bucket FROM (
             SELECT vec_id, b0 AS bucket FROM bkt
             UNION ALL
             SELECT vec_id, xor(b0::BIGINT, (1::BIGINT << j))::INT
               AS bucket
             FROM bkt, range(0, 8) t(j)
             WHERE abs(embedding[j+1]) < 0.02)),
         cand AS MATERIALIZED (
           SELECT DISTINCT p1.vec_id AS a_id, p2.vec_id AS b_id
           FROM probes p1 JOIN probes p2
             ON p1.bucket = p2.bucket AND p1.vec_id < p2.vec_id),
         candn AS (
           SELECT vec_id, count(*)::BIGINT AS n_cand FROM (
             SELECT a_id AS vec_id FROM cand
             UNION ALL SELECT b_id FROM cand) GROUP BY vec_id),
         ver AS (
           SELECT c.a_id, c.b_id
           FROM cand c
           JOIN emb a ON a.vec_id = c.a_id
           JOIN emb b ON b.vec_id = c.b_id
           WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                   b.embedding::DOUBLE[]) > 0.3),
         neigh AS (
           SELECT vec_id, min(nb) AS min_nb FROM (
             SELECT a_id AS vec_id, b_id AS nb FROM ver
             UNION ALL SELECT b_id, a_id FROM ver) GROUP BY vec_id)
         SELECT e.vec_id,
                coalesce(cn.n_cand, 0)::BIGINT AS n_cand,
                least(coalesce(n.min_nb, e.vec_id), e.vec_id) AS dup_of
         FROM emb e
         LEFT JOIN candn cn ON cn.vec_id = e.vec_id
         LEFT JOIN neigh n ON n.vec_id = e.vec_id""",
    // Full differential oracles for the signature queries: every hash in
    // the chain is the portable 60-bit md5 prefix, so DuckDB replays the
    // exact signatures, bands, candidate pairs, and verdicts.
    "q41_dedup_ngram_jaccard" -> (lshCtePrefix +
      s""",
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.a_id, p.b_id, count(*) AS n_inter
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.a_id
           JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
           GROUP BY p.a_id, p.b_id),
         jac AS (
           SELECT i.a_id, i.b_id,
                  i.n_inter::DOUBLE / (za.n_sh + zb.n_sh - i.n_inter)
                    AS jaccard
           FROM inter i
           JOIN sizes za ON za.doc_id = i.a_id
           JOIN sizes zb ON zb.doc_id = i.b_id),
         neigh AS (
           SELECT doc_id, min(nb) AS min_nb FROM (
             SELECT a_id AS doc_id, b_id AS nb FROM jac WHERE jaccard >= 0.5
             UNION ALL
             SELECT b_id, a_id FROM jac WHERE jaccard >= 0.5)
           GROUP BY doc_id)
         SELECT d.doc_id,
                least(coalesce(n.min_nb, d.doc_id), d.doc_id) AS dup_of
         FROM documents d LEFT JOIN neigh n USING (doc_id)"""),
    "q42_dedup_minhash_lsh" -> (lshCtePrefix +
      s""",
         neigh AS (
           SELECT doc_id, count(*) AS n_candidates, min(nb) AS min_nb
           FROM (
             SELECT a_id AS doc_id, b_id AS nb FROM pairs
             UNION ALL
             SELECT b_id, a_id FROM pairs)
           GROUP BY doc_id)
         SELECT d.doc_id,
                coalesce(n.n_candidates, 0)::BIGINT AS n_candidates,
                least(coalesce(n.min_nb, d.doc_id), d.doc_id) AS rep_id
         FROM documents d LEFT JOIN neigh n USING (doc_id)"""),
    // Slice-bounded replay of the whole LSH chain PLUS the exact
    // inverted-index ground truth, rolled into the audit row.
    "q209_lsh_recall_audit" -> (lshCtePrefix
      .replace("FROM documents", "FROM documents WHERE doc_id < 1000") +
      s""",
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         cinter AS (
           SELECT p.a_id, p.b_id, count(*) AS c
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.a_id
           JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
           GROUP BY 1, 2),
         found AS (
           SELECT i.a_id, i.b_id
           FROM cinter i JOIN sizes na ON na.doc_id = i.a_id
           JOIN sizes nb ON nb.doc_id = i.b_id
           WHERE i.c::DOUBLE / (na.n + nb.n - i.c) >= 0.5),
         tinter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         truth AS (
           SELECT i.a_id, i.b_id
           FROM tinter i JOIN sizes na ON na.doc_id = i.a_id
           JOIN sizes nb ON nb.doc_id = i.b_id
           WHERE i.c::DOUBLE / (na.n + nb.n - i.c) >= 0.5),
         nd AS (SELECT count(*)::BIGINT AS n_docs
                FROM documents WHERE doc_id < 1000)
         SELECT nd.n_docs,
                (SELECT count(*) FROM truth)::BIGINT AS n_truth,
                (SELECT count(*) FROM pairs)::BIGINT AS n_candidates,
                (SELECT count(*) FROM found)::BIGINT AS n_found,
                round((SELECT count(*) FROM found)::DOUBLE
                      / nullif((SELECT count(*) FROM truth), 0), 6)
                  AS recall,
                round((SELECT count(*) FROM pairs)::DOUBLE
                      / (nd.n_docs * (nd.n_docs - 1) / 2), 6)
                  AS candidate_frac
         FROM nd"""),
    "q213_group_split_fix" -> (lshCtePrefix
      .replace("FROM documents", "FROM documents WHERE doc_id < 1000") +
      s""",
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.a_id, p.b_id, count(*) AS c
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.a_id
           JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
           GROUP BY 1, 2),
         jac AS MATERIALIZED (
           SELECT i.a_id, i.b_id
           FROM inter i JOIN sizes na ON na.doc_id = i.a_id
           JOIN sizes nb ON nb.doc_id = i.b_id
           WHERE i.c::DOUBLE / (na.n + nb.n - i.c) >= 0.5),
         neigh AS (
           SELECT doc_id, min(nb) AS min_nb FROM (
             SELECT a_id AS doc_id, b_id AS nb FROM jac
             UNION ALL
             SELECT b_id, a_id FROM jac)
           GROUP BY doc_id),
         verd AS MATERIALIZED (
           SELECT d.doc_id,
                  least(coalesce(n.min_nb, d.doc_id), d.doc_id) AS dup_of
           FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
           LEFT JOIN neigh n USING (doc_id)),
         keyed AS (
           SELECT j.a_id, j.b_id, va.dup_of AS a_can, vb.dup_of AS b_can
           FROM jac j
           JOIN verd va ON va.doc_id = j.a_id
           JOIN verd vb ON vb.doc_id = j.b_id)
         SELECT count(*)::BIGINT AS n_dup_pairs,
                count(CASE WHEN
                  CASE WHEN ((a_id & 2147483647) * 2654435761)
                            % 4294967296 % 100 < 80 THEN 0
                       WHEN ((a_id & 2147483647) * 2654435761)
                            % 4294967296 % 100 < 90 THEN 1 ELSE 2 END
                  <> CASE WHEN ((b_id & 2147483647) * 2654435761)
                               % 4294967296 % 100 < 80 THEN 0
                          WHEN ((b_id & 2147483647) * 2654435761)
                               % 4294967296 % 100 < 90 THEN 1 ELSE 2 END
                  THEN 1 END)::BIGINT AS doc_level_leaks,
                count(CASE WHEN
                  CASE WHEN ((a_can & 2147483647) * 2654435761)
                            % 4294967296 % 100 < 80 THEN 0
                       WHEN ((a_can & 2147483647) * 2654435761)
                            % 4294967296 % 100 < 90 THEN 1 ELSE 2 END
                  <> CASE WHEN ((b_can & 2147483647) * 2654435761)
                               % 4294967296 % 100 < 80 THEN 0
                          WHEN ((b_can & 2147483647) * 2654435761)
                               % 4294967296 % 100 < 90 THEN 1 ELSE 2 END
                  THEN 1 END)::BIGINT AS canonical_level_leaks
         FROM keyed"""),
    // Differential replay of the WHOLE q236 pipeline: planted-chain
    // corpus construction, LSH chain, jaccard verify, direct-pair
    // verdicts, and transitive CC labels as unrolled min-label rounds
    // (planted components are a few fused 3-node chains — diameter far
    // below the 8 unrolled rounds).
    "q236_transitive_split_fix" -> {
      def sqlSplit(c: String): String =
        s"""CASE WHEN (($c & 2147483647) * 2654435761)
                      % 4294967296 % 100 < 80 THEN 0
                 WHEN (($c & 2147483647) * 2654435761)
                      % 4294967296 % 100 < 90 THEN 1 ELSE 2 END"""
      val ccRounds = (1 to 8).map { r =>
        s""",
         lbl$r AS MATERIALIZED (
           SELECT l.id, least(l.lbl, coalesce(min(nb.lbl), l.lbl)) AS lbl
           FROM lbl${r - 1} l
           LEFT JOIN pe2 e ON e.a_id = l.id
           LEFT JOIN lbl${r - 1} nb ON nb.id = e.b_id
           GROUP BY l.id, l.lbl)"""
      }.mkString
      val corpusCte = """WITH chainbase AS (
           SELECT doc_id,
                  string_split_regex(regexp_replace(trim(lower(text)),
                    '[^a-z0-9 ]', '', 'g'), ' +') AS btoks
           FROM documents WHERE doc_id < 40),
         bsz AS (
           SELECT doc_id, btoks, len(btoks) AS n,
                  (len(btoks)*7)//10 AS n7
           FROM chainbase),
         corpus AS MATERIALIZED (
           SELECT doc_id, text FROM documents
           WHERE doc_id >= 40 AND doc_id < 1000
           UNION ALL
           SELECT doc_id + 10000,
                  array_to_string(list_slice(btoks, 1, n7), ' ')
           FROM bsz
           UNION ALL
           SELECT doc_id + 20000, array_to_string(btoks, ' ') FROM bsz
           UNION ALL
           SELECT doc_id + 30000,
                  array_to_string(list_slice(btoks, n - n7 + 1, n), ' ')
           FROM bsz)
"""
      corpusCte +
        lshCtePrefix.replace("WITH toks", ", toks")
          .replace("FROM documents)", "FROM corpus)") +
        s""",
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (
           SELECT p.a_id, p.b_id, count(*) AS c
           FROM pairs p
           JOIN sh sa ON sa.doc_id = p.a_id
           JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
           GROUP BY 1, 2),
         jac AS MATERIALIZED (
           SELECT i.a_id, i.b_id
           FROM inter i JOIN sizes na ON na.doc_id = i.a_id
           JOIN sizes nb ON nb.doc_id = i.b_id
           WHERE i.c::DOUBLE / (na.n + nb.n - i.c) >= 0.5),
         pp AS MATERIALIZED (
           SELECT a_id, b_id FROM jac
           WHERE a_id >= 10000 AND b_id >= 10000),
         pnodes AS (SELECT doc_id AS id FROM corpus WHERE doc_id >= 10000),
         pe2 AS MATERIALIZED (
           SELECT a_id, b_id FROM pp
           UNION ALL SELECT b_id, a_id FROM pp),
         pneigh AS (
           SELECT a_id AS id, min(b_id) AS min_nb FROM pe2 GROUP BY a_id),
         verd AS MATERIALIZED (
           SELECT p.id AS doc_id,
                  least(coalesce(n.min_nb, p.id), p.id) AS dup_of
           FROM pnodes p LEFT JOIN pneigh n ON n.id = p.id),
         lbl0 AS MATERIALIZED (SELECT id, id AS lbl FROM pnodes)$ccRounds,
         cc AS (SELECT id AS doc_id, lbl FROM lbl8),
         keyed AS (
           SELECT pp.a_id, pp.b_id, va.dup_of AS a_dir, vb.dup_of AS b_dir,
                  ca.lbl AS a_cc, cb.lbl AS b_cc
           FROM pp
           JOIN verd va ON va.doc_id = pp.a_id
           JOIN verd vb ON vb.doc_id = pp.b_id
           JOIN cc ca ON ca.doc_id = pp.a_id
           JOIN cc cb ON cb.doc_id = pp.b_id),
         mh AS (
           SELECT count(CASE WHEN v.dup_of <> c.lbl THEN 1 END)::BIGINT
                    AS n_multihop_docs
           FROM verd v JOIN cc c ON c.doc_id = v.doc_id)
         SELECT k.n_planted_pairs, k.n_ab_edges, k.n_bc_edges,
                k.direct_leaks, k.transitive_leaks, mh.n_multihop_docs
         FROM (
           SELECT count(*)::BIGINT AS n_planted_pairs,
                  count(CASE WHEN a_id < 20000 AND b_id = a_id + 10000
                    THEN 1 END)::BIGINT AS n_ab_edges,
                  count(CASE WHEN a_id >= 20000 AND a_id < 30000
                    AND b_id = a_id + 10000 THEN 1 END)::BIGINT
                    AS n_bc_edges,
                  count(CASE WHEN ${sqlSplit("a_dir")} <>
                    ${sqlSplit("b_dir")} THEN 1 END)::BIGINT
                    AS direct_leaks,
                  count(CASE WHEN ${sqlSplit("a_cc")} <>
                    ${sqlSplit("b_cc")} THEN 1 END)::BIGINT
                    AS transitive_leaks
           FROM keyed) k CROSS JOIN mh"""
    },
    "q43_dedup_simhash" -> {
      val votes = (0 until SimhashBits).map(j =>
        s"sum(CASE WHEN (th >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j")
        .mkString(",\n                  ")
      val bits = (0 until SimhashBits).map(j =>
        s"(CASE WHEN v$j > 0 THEN 1::BIGINT << $j ELSE 0::BIGINT END)")
        .mkString(" +\n                ")
      s"""WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(regexp_replace(trim(lower(text)),
                    '[^a-z0-9 ]', '', 'g'), ' +')) AS tok
           FROM documents),
         h AS (
           SELECT doc_id,
                  ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th
           FROM toks),
         v AS (
           SELECT doc_id,
                  $votes
           FROM h GROUP BY doc_id)
         SELECT doc_id,
                ($bits)::BIGINT AS simhash
         FROM v"""
    },
    "q335_dedup_canonical" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 20000, upper(text) || ' *** '
           FROM documents WHERE doc_id % 7 = 0 AND doc_id < 200),
         base AS (
           SELECT doc_id, length(text)::INT AS len,
                  md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nh
           FROM corpus),
         g AS (
           SELECT nh, count(*)::BIGINT AS grp_n FROM base
           GROUP BY nh HAVING count(*) > 1),
         r AS (
           SELECT b.nh, b.doc_id, b.len, g.grp_n,
                  row_number() OVER (PARTITION BY b.nh
                    ORDER BY b.len DESC, b.doc_id ASC) AS rk
           FROM base b JOIN g USING (nh))
         SELECT nh, doc_id AS canonical_id, grp_n, len AS canon_len
         FROM r WHERE rk = 1"""
  )

  /** Shared DuckDB CTE chain replaying shingling → 60-bit base hash →
    * affine minhash permutations → LSH bands → candidate pairs with the
    * hot-bucket star cap — step-for-step the Spark pipeline above, with
    * the SAME PermA/PermB/PermC constants interpolated.
    */
  private[operators] def lshCtePrefix: String = {
    val sigAggs = (0 until K).map(i =>
      s"min((${PermA(i)}*lo + ${PermB(i)}*hi + ${PermC(i)}) % $M61) AS h$i")
      .mkString(",\n                  ")
    val bandSelects = (0 until BANDS).map { b =>
      val cols = (0 until K / BANDS)
        .map(r => s"h${b * (K / BANDS) + r}").mkString(", ")
      s"""SELECT doc_id, $b AS band,
              ('0x' || substr(md5(concat_ws(':', $cols)), 1, 15))::BIGINT
                AS bucket FROM sig"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH toks AS (
           SELECT doc_id,
                  string_split_regex(regexp_replace(trim(lower(text)),
                    '[^a-z0-9 ]', '', 'g'), ' +') AS toks
           FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
                    unnest(CASE WHEN len(toks) < 3
                      THEN [array_to_string(toks, ' ')]
                      ELSE list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                             toks[i+2])
                      END) AS sh
             FROM toks)),
         halves AS (
           SELECT doc_id,
                  ('0x' || substr(md5(sh), 1, 15))::BIGINT & 1073741823
                    AS lo,
                  ('0x' || substr(md5(sh), 1, 15))::BIGINT >> 30 AS hi
           FROM sh),
         sig AS (
           SELECT doc_id,
                  $sigAggs
           FROM halves GROUP BY doc_id),
         banded AS (
           $bandSelects),
         stats AS (
           SELECT doc_id, band, bucket,
                  count(*) OVER (PARTITION BY band, bucket) AS m,
                  min(doc_id) OVER (PARTITION BY band, bucket) AS rep
           FROM banded),
         pairs AS (
           SELECT DISTINCT a_id, b_id FROM (
             SELECT a.doc_id AS a_id, b.doc_id AS b_id
             FROM (SELECT * FROM stats WHERE m <= $HOT_BUCKET_CAP) a
             JOIN (SELECT * FROM stats WHERE m <= $HOT_BUCKET_CAP) b
               USING (band, bucket)
             WHERE a.doc_id < b.doc_id
             UNION ALL
             SELECT rep, doc_id FROM stats
             WHERE m > $HOT_BUCKET_CAP AND doc_id <> rep))"""
  }
}
