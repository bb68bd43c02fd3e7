package org.apache.spark.sql.graftx

import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[graft.sources.VersionedTable]] —
  * the read half of the table's streaming story (the exactly-once SINK
  * is `commitStreamBatch`):
  *
  * {{{
  * spark.readStream
  *   .format("org.apache.spark.sql.graftx.VersionedTableStreamProvider")
  *   .option("path", table).load()
  * }}}
  *
  * Offsets ARE manifest versions: the engine checkpoints a version
  * number, and a micro-batch is exactly the files the manifests between
  * two versions added. Data files are immutable and the manifest file
  * lists are deterministic, so a replayed batch re-reads byte-identical
  * data — the engine's offset log + this determinism give end-to-end
  * exactly-once with a transactional sink. The first batch is the full
  * snapshot at the stream's start version (the Delta semantic).
  *
  * APPEND-ONLY contract, enforced: each consumed version's manifest
  * action must be `create*`, `append*`, or `stream:*`. An overwrite /
  * CDC / compaction commit between offsets is an ERROR (its rewritten
  * files would double-read and its removed files would silently vanish
  * from the stream) — row-level change consumption is `changesSince` /
  * `changeFeed`, not this source. Same rule Delta's streaming source
  * applies to non-append commits.
  *
  * This sits in the graftx bridge package because the V1 Source trait
  * and `internalCreateDataFrame` (the FileStreamSource mechanism for
  * marking a batch-read DataFrame isStreaming=true) are private[sql];
  * the logic is graft code. */
class VersionedTableStreamProvider extends StreamSourceProvider {

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "VersionedTableStreamProvider: option 'path' is required"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val inferred = schema.getOrElse(
      VersionedTable.read(sqlContext.sparkSession, path).schema)
    ("graft-table", inferred)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new VersionedTableSource(sqlContext, pathOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
}

private[graftx] class VersionedTableSource(sqlContext: SQLContext,
    path: String, override val schema: StructType) extends Source {

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] =
    VersionedTable.latestVersion(path).map(LongOffset.apply)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = versionOf(end)
    val from = start.map(versionOf)
    // append-only contract: every consumed version must only add files
    from.foreach { f =>
      ((f + 1) to to).foreach { v =>
        val a = VersionedTable.actionAt(path, v)
        require(a.startsWith("create") || a.startsWith("append") ||
            a.startsWith("stream:"),
          s"VersionedTableSource: version $v is '$a' — the streaming source " +
            "is append-only; consume rewrites via changesSince/changeFeed")
      }
    }
    val newFiles = from match {
      case None => VersionedTable.filesAt(path, to) // initial snapshot
      case Some(f) =>
        val old = VersionedTable.filesAt(path, f).toSet
        VersionedTable.filesAt(path, to).filterNot(old)
    }
    val batch =
      if (newFiles.isEmpty)
        VersionedTable.readVersion(spark, path, to)
          .where(org.apache.spark.sql.functions.lit(false))
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      else
        spark.read
          .option("basePath", java.nio.file.Paths.get(path, "data").toString)
          .parquet(newFiles.sorted: _*)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    // FileStreamSource's mechanism: re-tag the batch plan as streaming so
    // MicroBatchExecution accepts it in place of the streaming relation
    spark.internalCreateDataFrame(
      batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
