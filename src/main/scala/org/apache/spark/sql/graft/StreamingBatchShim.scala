package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset => PublicDataset}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** `private[sql]` access shim (this package sits under
  * `org.apache.spark.sql`, the same technique Delta's own Spark
  * integration uses): re-wrap a STREAMING micro-batch DataFrame's
  * executed RDD as a batch plan so a committing batch writer can run
  * over it — byte-for-byte the move Spark's ForeachBatchSink makes
  * before handing the frame to user code. No data moves; the
  * InternalRow RDD is reused as-is. */
object StreamingBatchShim {
  def asBatch(data: PublicDataset[_]): DataFrame = {
    val d = data.asInstanceOf[Dataset[_]]
    Dataset.ofRows(d.sparkSession,
      LogicalRDD.fromDataset(d.queryExecution.toRdd, d, isStreaming = false))
  }
}
