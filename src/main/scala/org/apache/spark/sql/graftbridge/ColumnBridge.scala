package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion (Spark 4
  * removed the public `new Column(expr)` constructor when Column became
  * ColumnNode-backed). Lives under `org.apache.spark.sql` solely to satisfy
  * the `private[sql]` qualifier; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` (the type of `ExpectsInputTypes.inputTypes` elements) is
  * `private[sql]`; this alias lets graft expressions declare analysis-time
  * input types without living inside Spark's package.
  */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}

/** Bridge into `SparkSession.internalCreateDataFrame` (`private[sql]`): a v1
  * streaming `Source.getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming = true` (MicroBatchExecution asserts it), and the
  * only way to re-flag a batch-planned DataFrame is this internal
  * constructor — exactly how Spark's own FileStreamSource builds its
  * batches. No Spark internals are modified.
  */
object StreamBridge {
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for v1 streaming SINKS: `Sink.addBatch` hands over a
    * Dataset still tied to the incremental streaming plan, which ordinary
    * `df.write` refuses; rebasing its physical RDD into a batch-flagged
    * frame is how Spark's own ForeachBatchSink exposes the micro-batch.
    */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
