package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import org.apache.spark.sql.types.{LongType, StringType, StructField}

import graft.catalog.{Snapshots, TableMeta}

/** Structured Streaming source that TAILS a snapshot table's manifest log
  * (r15, r14 VERDICT ask #7) — "subscribe to the table", the primitive a
  * training-data pipeline wants instead of rescanning 100 TB:
  *
  * {{{
  * spark.readStream
  *   .format("graft.streaming.SnapshotTailProvider")
  *   .option("path", "/warehouse/docs")    // a snapshots='true' table dir
  *   .load()
  * }}}
  *
  * OFFSETS ARE MANIFEST VERSIONS. Each micro-batch serves
  * `Snapshots.addedBetween(start, end)` — the units added between the two
  * committed snapshots — so for append-only tables the stream is exactly
  * the inserted rows, one micro-batch per commit (getOffset advances ONE
  * parseable version per trigger once the stream is caught up; the very
  * first batch serves the whole snapshot current at start). Exactly-once
  * falls out of the engine's offset checkpointing: a replayed batch
  * re-reads the same immutable units.
  *
  * Honest semantics, stated exactly: for a REPLACED partition the feed
  * returns the partition's full new contents (the unit is the replacement
  * grain — use `Snapshots.changesBetween` on a `changelog='true'` table
  * for the row-level feed), and a restart whose checkpointed version has
  * been pruned by retention REFUSES loudly (`graft.history` bounds how far
  * behind a consumer may fall) rather than silently serving a gap.
  *
  * Scale shape: getOffset is one directory listing; each batch plans a
  * normal pruned parquet scan over only the ADDED units — driver work is
  * proportional to the commit rate, never the table.
  */
class SnapshotTailProvider extends StreamSourceProvider {

  private def tableDir(parameters: Map[String, String]): Path =
    new Path(parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft snapshot tail source requires option 'path' (a snapshot table dir)")))

  /** `feed=changes` (opt-in): serve the row-level CHANGE feed instead of
    * added rows — each micro-batch is `Snapshots.changesBetween` for its
    * version range (recorded row-level ops, synthesized appends/removals),
    * with `_change_op`/`_change_version` columns appended. The very first
    * batch serves the whole current snapshot as 'I' rows (initial load).
    */
  private def changesMode(parameters: Map[String, String]): Boolean =
    parameters.get("feed").exists(_.equalsIgnoreCase("changes"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val dir = tableDir(parameters)
    val fs = dir.getFileSystem(sqlContext.sparkSession.sessionState.newHadoopConf())
    val meta = TableMeta.read(fs, dir).getOrElse(throw new IllegalArgumentException(
      s"$dir is not a graft table (no ${TableMeta.FileName})"))
    require(meta.snapshots, s"$dir is not a snapshot table — the tail source " +
      "rides manifest versions; create with TBLPROPERTIES ('snapshots'='true')")
    val base = schema.getOrElse(meta.schema)
    val served =
      if (!changesMode(parameters)) base
      else StructType(base.fields :+ StructField("_change_op", StringType) :+
        StructField("_change_version", LongType))
    ("graft-snapshot-tail", served)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotTailSource(sqlContext, tableDir(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      changesMode(parameters))
}

class SnapshotTailSource(sqlContext: SQLContext, tableDir: Path,
    override val schema: StructType, changesFeed: Boolean = false)
    extends Source {

  private def spark = sqlContext.sparkSession
  private def fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())

  /** The newest version this source has OFFERED or seen committed — the
    * pacing cursor: once set, getOffset advances one parseable version per
    * trigger, so each commit lands as its own micro-batch.
    */
  @volatile private var cursor: Option[Long] = None

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val vs = Snapshots.versions(fs, tableDir)
      .filter(v => Snapshots.read(fs, tableDir, v).isDefined)
    if (vs.isEmpty) return cursor.map(LongOffset(_))
    val next = cursor match {
      case Some(last) => vs.find(_ > last).getOrElse(last)
      case None => vs.max // first look: one batch for the current snapshot
    }
    cursor = Some(next)
    Some(LongOffset(next))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toV = versionOf(end)
    val fromV = start.map(versionOf).getOrElse(0L)
    // recovery: a restarted query's checkpoint is the authoritative cursor
    cursor = Some(math.max(toV, cursor.getOrElse(0L)))
    val batch =
      if (!changesFeed) Snapshots.addedBetween(spark, tableDir, fromV, toV)
      else if (fromV <= 0L) {
        // initial load: the whole snapshot at toV, as inserts
        import org.apache.spark.sql.functions.lit
        Snapshots.addedBetween(spark, tableDir, 0L, toV)
          .withColumn("_change_op", lit("I"))
          .withColumn("_change_version", lit(toV))
      } else Snapshots.changesBetween(spark, tableDir, fromV, toV)
    // v1 Source contract: the returned frame must be flagged streaming —
    // wrap the batch plan's rows (lazily) under this source's schema
    org.apache.spark.sql.GraftSqlShims.streamingDataFrame(spark,
      batch.selectExpr(schema.fieldNames.map(n => s"`$n`").toIndexedSeq: _*)
        .queryExecution.toRdd,
      schema)
  }

  override def commit(end: Offset): Unit =
    cursor = Some(math.max(versionOf(end), cursor.getOrElse(0L)))

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotTail[$tableDir]"
}
