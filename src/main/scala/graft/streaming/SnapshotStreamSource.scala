package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.Snapshots

/** Structured-Streaming SOURCE over a [[graft.operators.Snapshots]] table —
  * the Delta-streaming-source twin, closing the loop with the foreachBatch
  * snapshot SINK (StreamingSpec's micro-batch-per-version ingest): a
  * downstream job tails the versioned table exactly-once instead of
  * re-reading it.
  *
  * The offset IS the snapshot version. Each micro-batch is the file-set
  * difference between two manifests ([[Snapshots.readChanges]]), so a batch
  * reads ONLY the files appended in `(start, end]` — never the table — and
  * the engine's checkpointed offsets + deterministic immutable manifests
  * give exactly-once delivery across restarts for free. A REPLACE commit
  * inside the tailed range rewrites history and fails the stream loudly
  * (the consumer must resync from a full snapshot), the same contract as
  * the batch `readChanges`.
  *
  * Options: `path` (the table directory, required) and `startingVersion`
  * (default 0 = deliver the whole table as the first batch; version N =
  * deliver only commits after N — "changes only", Delta's
  * `startingVersion`).
  *
  * {{{
  *   spark.readStream
  *     .format(classOf[SnapshotStreamSource].getName) // or "snapshots"
  *     .option("path", dir)
  *     .load()
  * }}}
  *
  * At 100 TB offset resolution and batch planning stay driver-side metadata
  * reads (two manifest lists + a set difference); data moves only through
  * the executor parquet scan of the appended files.
  */
class SnapshotStreamSource extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "snapshots"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshots source requires option(\"path\", <snapshot table dir>)"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val dir = dirOf(parameters)
    val st = schema.getOrElse {
      val spark = sqlContext.sparkSession
      require(Snapshots.currentVersion(spark, dir).nonEmpty,
        s"$dir: empty snapshot table — pass .schema(...) to start a stream " +
          "before the first commit")
      Snapshots.read(spark, dir).schema
    }
    (shortName(), st)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    val starting = parameters.getOrElse("startingVersion", "0").toInt
    val st = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new SnapshotSource(sqlContext, dir, starting, st)
  }
}

private[streaming] class SnapshotSource(sqlContext: SQLContext, dir: String,
    startingVersion: Int, override val schema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  private def versionOf(o: OffsetV1): Int = o match {
    case LongOffset(v) => v.toInt
    case so: SerializedOffset => LongOffset(so).offset.toInt
    case other => throw new IllegalStateException(
      s"snapshots source got a foreign offset $other")
  }

  /** Latest published version, or None while nothing past `startingVersion`
    * exists — the engine idles instead of planning empty batches. */
  override def getOffset: Option[OffsetV1] =
    Snapshots.currentVersion(spark, dir).filter(_ > startingVersion)
      .map(v => LongOffset(v.toLong))

  /** Rows committed in `(start, end]`. `start = None` is the stream's very
    * first batch: everything up to `end` when startingVersion = 0 (the
    * initial-snapshot delivery), else the tail after `startingVersion`.
    */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    val batch =
      if (from == 0) Snapshots.read(spark, dir, Some(to))
      else Snapshots.readChanges(spark, dir, from, to)
    StreamBridge.asStreaming(batch)
  }

  override def stop(): Unit = ()
}
