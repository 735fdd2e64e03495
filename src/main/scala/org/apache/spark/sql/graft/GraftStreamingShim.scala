package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/**
 * A V1 streaming `Source.getBatch` must return a DataFrame whose logical
 * plan carries `isStreaming = true` — `MicroBatchExecution` asserts it
 * ("DataFrame returned by getBatch ... did not have isStreaming=true").
 * The only way to stamp that flag onto an already-planned DataFrame is
 * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true)`,
 * which is `private[sql]` — hence this one-object shim inside the
 * `org.apache.spark.sql` namespace, the standard pattern for V1 connectors
 * whose batches are computed with full Catalyst plans rather than raw RDDs.
 * Nothing else may live in this package.
 */
object GraftStreamingShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse stamp, for a V1 `Sink.addBatch`: re-plan the incremental
    * micro-batch frame as an ordinary batch DataFrame so a multi-job
    * consumer (the merge runs stats + resolve + write) may execute it more
    * than once — a streaming-tagged plan is single-execution by contract. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
