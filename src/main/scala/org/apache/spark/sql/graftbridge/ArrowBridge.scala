package org.apache.spark.sql.graftbridge

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Arrow IPC result path for Spark 4 (the `private[sql]` converters are
  * reached from an `org.apache.spark.sql` subpackage, like ColumnBridge).
  *
  * Mirrors the reference's `sql_execute_df` Arrow surface
  * (`QueryEngine/ArrowResultSetConverter.cpp`, `ArrowResultSet.h:319`
  * `convertToArrow` in /root/reference): results serialize to Arrow
  * record batches ON THE EXECUTORS (one IPC byte stream per partition —
  * the distributed analog of the reference's per-device conversion), and
  * the driver or a downstream consumer deserializes without per-value
  * conversion cost.
  */
object ArrowBridge {

  /** Serialize a DataFrame to Arrow IPC batch bytes, partition-parallel. */
  def toArrowBatches(df: DataFrame, maxRecordsPerBatch: Int)
      : Array[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchIterator(it, schema, maxRecordsPerBatch.toLong,
        tz, true, false, TaskContext.get())
    }.collect()
  }

  /** Deserialize Arrow IPC batch bytes back into a DataFrame. */
  def fromArrowBatches(spark: SparkSession, batches: Array[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowConverters.toDataFrame(batches.iterator, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
