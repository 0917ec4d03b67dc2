package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-scoped copy-on-write MERGE / UPDATE / DELETE (the write half of
  * `SupportsRowLevelOperations`). The GROUP — the replacement unit — is a
  * hive `k=v` partition directory for partitioned tables and the whole
  * table otherwise, and two invariants hold everywhere:
  *
  *  1. The scan reads EVERY row of every candidate group. Spark pushes the
  *     command condition into the row-level scan expecting it to prune
  *     GROUPS only; handing it to the parquet reader as a data filter
  *     would skip row-groups whose rows must be COPIED into the
  *     replacement (they don't match the condition — that is exactly why
  *     they must survive), silently losing them. [[GroupScopedScanBuilder]]
  *     is the firewall: partition-column conjuncts pass through (directory
  *     pruning IS group pruning), every other filter is refused and stays
  *     engine-side.
  *  2. The write replaces exactly the groups the scan served. The affected
  *     set is derived from the scan's own pruned file listing — static
  *     partition predicates and Spark's runtime group filtering (the
  *     dynamic subquery that finds partitions containing matched rows,
  *     delivered through `SupportsRuntimeV2Filtering`) both narrow it; no
  *     pruning means every partition is affected, degenerating to the
  *     whole-table swap.
  *
  * Scale shape: a sparse MERGE into a date-partitioned 100 TB table reads
  * and rewrites ONLY the partitions containing matched keys (one dynamic
  * subquery finds them), instead of rewriting the table. The rewrite
  * itself is staged — both stagings are fully materialized before the
  * first live mutation — and applied per partition directory with the
  * DynamicOverwrite rename discipline: each partition is wholly old or
  * wholly new; cross-partition atomicity is deliberately not promised.
  */
private[catalog] class GraftRowLevelOperation(delegate: ParquetTable,
    livePath: String, onWrite: () => Unit, partCols: Seq[String],
    info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  import org.apache.spark.sql.connector.write.RowLevelOperation.Command

  @volatile private var trackedScan: Option[GroupScopedScan] = None

  override def command(): Command = info.command()
  override def description(): String =
    s"graft-cow-${info.command()}(${delegate.name})"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GroupScopedScanBuilder(
      delegate.newScanBuilder(options).asInstanceOf[ParquetScanBuilder],
      partCols, s => trackedScan = Some(s))

  /** The rows ReplaceDataExec delivers are `__row_operation`-prefixed (the
    * MergeRows / rewrite output) and, with no metadata attributes declared,
    * arrive UNPROJECTED (Spark's plain DataWritingSparkTask only strips the
    * prefix on the metadata-projection path). [[OpPrefixedWrite]] adapts:
    * DELETE-op rows are dropped, WRITE ops are projected to the data
    * columns (`info.schema()` is already the data schema) and forwarded to
    * the staged writer — whole-table [[SwapOverwrite]] for unpartitioned
    * tables, [[PartitionScopedReplaceWrite]] for partitioned ones.
    */
  override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val inner =
          if (partCols.isEmpty)
            new SwapOverwrite(delegate.name, livePath, winfo, onWrite).write()
          else
            new PartitionScopedReplaceWrite(delegate.name, livePath, partCols,
              winfo, () => trackedScan.flatMap(_.affectedRelDirs()), onWrite).write()
        new OpPrefixedWrite(inner, winfo.schema())
      }
    }

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty
}

/** Pushdown firewall for group-based row-level scans: conjuncts whose
  * references are all partition columns reach the delegate (they prune
  * `k=v` directories — whole groups), every other filter is REFUSED so the
  * scan returns all rows of every candidate group. Column pruning is
  * forwarded untouched; aggregate pushdown is deliberately absent.
  */
private[catalog] class GroupScopedScanBuilder(delegate: ParquetScanBuilder,
    partCols: Seq[String], onBuild: GroupScopedScan => Unit)
    extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns {

  private val partNames = partCols.map(_.toLowerCase).toSet

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val (partOnly, residual) = filters.partition { f =>
      f.references.nonEmpty &&
        f.references.forall(a => partNames(a.name.toLowerCase)) &&
        f.deterministic
    }
    residual ++ delegate.pushFilters(partOnly)
  }
  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  override def build(): Scan = {
    val scan = new GroupScopedScan(delegate.build().asInstanceOf[ParquetScan])
    onBuild(scan)
    scan
  }
}

/** Runtime-group-filtered view of the row-level scan. Spark's
  * `RowLevelOperationRuntimeGroupFiltering` plans a dynamic subquery over
  * the partition columns (the filter attributes) and delivers the matched
  * values here as IN predicates — applied as partition filters (directory
  * pruning, never row filtering) exactly like [[GraftStatsScan]] does for
  * DPP. [[affectedRelDirs]] then reports the `k=v` directories the
  * EFFECTIVE scan served, which is the replacement write's affected set —
  * derived from the same file index and the same filters, so scan and
  * write can never disagree about group membership.
  */
private[catalog] class GroupScopedScan(val delegate: ParquetScan)
    extends Scan with SupportsRuntimeV2Filtering {

  @volatile private var current: ParquetScan = delegate

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = current.toBatch
  override def description(): String = delegate.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    delegate.reportDriverMetrics()

  override def filterAttributes(): Array[NamedReference] =
    delegate.fileIndex.partitionSchema.fieldNames
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def equals(other: Any): Boolean = other match {
    case o: GroupScopedScan => delegate == o.delegate
    case _ => false
  }
  override def hashCode(): Int = delegate.hashCode()

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    current = delegate
    val partSchema = delegate.fileIndex.partitionSchema
    def attr(name: String): Option[AttributeReference] =
      partSchema.fields.find(_.name.equalsIgnoreCase(name))
        .map(f => AttributeReference(f.name, f.dataType)())
    val converted: Seq[Expression] = predicates.toSeq
      .flatMap(p => org.apache.spark.sql.GraftSqlShims.predicateToV1(p))
      .flatMap {
        case sources.In(name, values) => attr(name).map(a =>
          In(a, values.toSeq.map(v => Literal.create(v, a.dataType))))
        case sources.EqualTo(name, v) => attr(name).map(a =>
          EqualTo(a, Literal.create(v, a.dataType)))
        case _ => None
      }
    if (converted.nonEmpty)
      current = delegate.copy(
        partitionFilters = delegate.partitionFilters ++ converted)
  }

  /** The `k=v` directory chains (relative to the table root) the effective
    * scan serves — None when no partition pruning applied (every partition
    * is a candidate group).
    */
  def affectedRelDirs(): Option[Set[String]] = {
    if (current.partitionFilters.isEmpty) return None
    val rootPath = current.fileIndex.rootPaths.head
    val fs = rootPath.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    val rootUri = fs.makeQualified(rootPath).toUri.getPath.stripSuffix("/")
    val rels = current.fileIndex.listFiles(current.partitionFilters, Nil)
      .flatMap(_.files.map { f =>
        fs.makeQualified(f.getPath.getParent).toUri.getPath
      })
      .filter(_.startsWith(rootUri + "/"))
      .map(_.stripPrefix(rootUri + "/"))
      .toSet
    Some(rels)
  }
}

/** Staged partition-scoped replacement: the group-based write for
  * partitioned tables.
  *
  * Phase 1 (executors): the replacement rows — every surviving row of
  * every affected group, post-merge — land as flat parquet (partition
  * columns still data columns) in `.rlflat-<table>-<uuid>`.
  * Phase 2 (driver commit): one distributed job rewrites the flat staging
  * into a hive layout at `.rlpart-<table>-<uuid>`, REBALANCED on the
  * partition columns (a hot partition fans out across tasks — the
  * Writers.partitionedParquet skew discipline). Then pure metadata:
  *  - staged partition ∈ affected  → rename-swap it over the live one
  *  - staged partition ∉ affected  → rows MOVED IN by the merge (an
  *    INSERT action, or an UPDATE changing a partition value): its files
  *    are appended under fresh names, never replacing rows that were not
  *    part of any candidate group
  *  - affected partition with no staged counterpart → every row was
  *    deleted: the directory is dropped
  *
  * Phase 1+2 cost is proportional to the AFFECTED partitions (read once,
  * written twice — flat then hive); at 100 TB that beats the whole-table
  * rewrite by the selectivity of the merge. A crash before the first
  * rename leaves the table untouched (dot-prefixed debris only, swept by
  * DROP); each partition swap is the two-rename aside discipline of
  * [[DynamicOverwrite.backfill]].
  */
private[catalog] class PartitionScopedReplaceWrite(tableName: String,
    livePath: String, partCols: Seq[String], winfo: LogicalWriteInfo,
    affected: () => Option[Set[String]], onWrite: () => Unit) {

  private val spark = SparkSession.active
  private val live = new Path(livePath)
  private val uuid = java.util.UUID.randomUUID().toString.take(8)
  private val flat = new Path(live.getParent, s".rlflat-${live.getName}-$uuid")
  private val hive = new Path(live.getParent, s".rlpart-${live.getName}-$uuid")
  private def fs = live.getFileSystem(spark.sessionState.newHadoopConf())

  def write(): Write = {
    val staged = ParquetTable(tableName, spark,
      CaseInsensitiveStringMap.empty(), Seq(flat.toString),
      Some(winfo.schema()), classOf[ParquetFileFormat])
    val inner = staged.newWriteBuilder(winfo).build()
    new Write {
      override def description(): String = s"graft-cow-partitioned($tableName)"
      override def toBatch: BatchWrite = new BatchWrite {
        private val innerBatch = inner.toBatch
        override def createBatchWriterFactory(p: PhysicalWriteInfo) =
          innerBatch.createBatchWriterFactory(p)
        override def useCommitCoordinator(): Boolean =
          innerBatch.useCommitCoordinator()
        override def onDataWriterCommit(message: WriterCommitMessage): Unit =
          innerBatch.onDataWriterCommit(message)
        override def commit(messages: Array[WriterCommitMessage]): Unit = {
          innerBatch.commit(messages)
          val filesystem = fs
          try {
            if (!filesystem.exists(flat)) filesystem.mkdirs(flat)
            // phase 2: hive layout over only the replacement rows
            spark.read.schema(winfo.schema()).parquet(flat.toString)
              .hint("rebalance", partCols.map(col): _*)
              .write.partitionBy(partCols: _*).mode("overwrite")
              .parquet(hive.toString)
            val stagedRels = PartitionDirs.kvLeaves(filesystem, hive)
            val stagedSet = stagedRels.map(_.mkString("/")).toSet
            val affectedSet: Set[String] = affected().getOrElse(
              PartitionDirs.kvLeaves(filesystem, live).map(_.mkString("/")).toSet)
            stagedRels.foreach { rel =>
              val src = rel.foldLeft(hive)((p, n) => new Path(p, n))
              val dst = rel.foldLeft(live)((p, n) => new Path(p, n))
              filesystem.mkdirs(dst.getParent)
              if (affectedSet(rel.mkString("/")) && filesystem.exists(dst)) {
                // replace the affected partition: two-rename aside swap
                val aside = new Path(dst.getParent,
                  s".old-${dst.getName}-$uuid")
                if (!filesystem.rename(dst, aside))
                  throw new java.io.IOException(s"cow: cannot move $dst aside")
                if (!filesystem.rename(src, dst)) {
                  filesystem.rename(aside, dst) // roll back — old partition lives
                  throw new java.io.IOException(s"cow: cannot swap $src in")
                }
                filesystem.delete(aside, true)
              } else if (!filesystem.exists(dst)) {
                if (!filesystem.rename(src, dst))
                  throw new java.io.IOException(s"cow: cannot move $src in")
              } else {
                // rows moved into an UNAFFECTED partition (merge insert /
                // partition-changing update): append its files under fresh
                // names — the partition's existing rows were not candidates
                // and must survive
                filesystem.listStatus(src).toSeq
                  .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
                  .zipWithIndex.foreach { case (st, i) =>
                    val dstFile = new Path(dst,
                      s"part-rl-$uuid-$i-${st.getPath.getName}")
                    if (!filesystem.rename(st.getPath, dstFile))
                      throw new java.io.IOException(
                        s"cow: cannot append ${st.getPath} into $dst")
                  }
              }
            }
            // affected partitions with no staged counterpart: fully deleted
            (affectedSet -- stagedSet).foreach { relStr =>
              val dir = relStr.split("/").foldLeft(live)((p, n) => new Path(p, n))
              PartitionDirs.deleteLeafAndEmptyParents(filesystem, live, dir)
            }
          } finally {
            fs.delete(flat, true)
            fs.delete(hive, true)
            onWrite()
          }
        }
        override def abort(messages: Array[WriterCommitMessage]): Unit = {
          innerBatch.abort(messages)
          fs.delete(flat, true)
          fs.delete(hive, true)
        }
      }
    }
  }
}
