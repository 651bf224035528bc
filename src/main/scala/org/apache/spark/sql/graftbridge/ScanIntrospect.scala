package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Read the PRUNED partition selection off a physical parquet scan
  * (`Dataset.inputFiles` reports the pre-pruning file index). Used by
  * tests that pin partition-pruning contracts (e.g. the IVF
  * bucket-by-cell layout).
  */
object ScanIntrospect {
  /** Files the executed plan's first file scan will actually read,
    * after partition pruning.
    */
  def prunedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.toSeq
          .map(_.urlEncodedPath)
    }.flatten
}
