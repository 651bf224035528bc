package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB shape of IVF search (q99's scale path): embeddings are
  * written ONCE, partitioned by their coarse-quantizer cell id; a probe
  * touching nprobe cells must physically read ONLY those partitions.
  * This spec pins the partition-pruning contract on the bucket-by-cell
  * parquet layout — the property that makes probe cost O(nprobe/K of
  * corpus) instead of a full scan.
  */
class IvfLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucket-by-cell layout reads only the probed cell partitions") {
    import spark.implicits._
    val k = 8
    // deterministic fake assignment: cell = id % k
    val assigned = spark.range(0, 4000)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(k)).as("cid"))
    val dir = Stage.scratchDir("ivf_layout")
    assigned.write.mode("overwrite").partitionBy("cid").parquet(dir)

    val probed = spark.read.parquet(dir)
      .filter(col("cid").isin(2, 5))
    // partition pruning must reach the physical scan: only cid=2 and
    // cid=5 directories may survive in the pruned file selection
    // (Dataset.inputFiles reports the PRE-pruning index, so the pinned
    // property reads the executed plan's selection instead)
    val files =
      org.apache.spark.sql.graftbridge.ScanIntrospect.prunedFiles(probed)
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("cid=2") || f.contains("cid=5")),
      files.take(3).mkString(", "))
    val all = spark.read.parquet(dir).inputFiles
    assert(all.exists(f => !f.contains("cid=2") && !f.contains("cid=5")))
    // and the data contract holds
    assert(probed.count() == 1000)
    assert(probed.select(countDistinct(col("cid"))).as[Long].head() == 2L)
  }

  test("q591 standing index: day-2 rows are appended in place and the " +
      "probe scan prunes to the probed cell directories") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val dir = operators.AnnIvf.vectorIndexDir(spark, sf)
    val idx = spark.read.parquet(dir)
    // the index holds day-0 corpus ∪ day-2 batch — the append made the
    // batch visible without any rebuild
    val nAll = spark.read.parquet(sf + "/embeddings.parquet").count()
    assert(idx.count() == nAll)
    assert(idx.filter(col("vec_id") % 10 === 0).count() > 0,
      "day-2 batch rows missing from the standing index")
    // partition pruning on the REAL index layout: pick two cells that
    // exist and pin that the pruned file selection contains only them
    val cids = idx.select(col("cid")).distinct().orderBy(col("cid"))
      .limit(2).as[Int].collect()
    assert(cids.length == 2)
    val probed = idx.filter(col("cid").isin(cids.toSeq: _*))
    val files =
      org.apache.spark.sql.graftbridge.ScanIntrospect.prunedFiles(probed)
    assert(files.nonEmpty)
    assert(files.forall(f => cids.exists(c => f.contains(s"cid=$c"))),
      files.take(3).mkString(", "))
    val all = spark.read.parquet(dir).inputFiles
    assert(all.exists(f => !cids.exists(c => f.contains(s"cid=$c"))),
      "fixture degenerate: fewer than 3 populated cells")
  }
}
