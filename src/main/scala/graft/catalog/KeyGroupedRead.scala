package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned reads (SPJ): when
  * `spark.sql.sources.v2.bucketing.enabled` is on, catalog scans over
  * hive-partitioned tables report `KeyGroupedPartitioning` over the
  * partition columns and plan ONE input partition per partition VALUE
  * (each carrying its `HasPartitionKey`). Two tables partitioned the same
  * way then join WITHOUT A SHUFFLE — Spark's `KeyGroupedShuffleSpec` sees
  * both sides clustered on the join keys and drops the exchanges — and a
  * `GROUP BY` on the partition columns aggregates shuffle-free for the
  * same reason.
  *
  * At 100 TB this is the co-located-join primitive: a fact and a dimension
  * both partitioned by `day` (or a pre-bucketed join key) never pay the
  * dominant shuffle of the join. The trade-off is task granularity — one
  * task per partition value (the bucketed-table contract; AQE cannot split
  * inside a value) — which is why the behavior is OPT-IN behind Spark's
  * own v2-bucketing flag and the default read path keeps size-balanced
  * bin-packing.
  */
object KeyGroupedRead {

  /** One input partition per distinct partition value, re-grouped from the
    * delegate's size-packed FilePartitions. Deterministic ordering (sorted
    * by the rendered key) keeps partition ids stable across identical
    * plans.
    */
  def keyedPartitions(scan: ParquetScan): Array[InputPartition] = {
    // PartitionedFile.partitionValues rows are projected to the scan's
    // READ partition schema (callers guarantee it is the full one here)
    val ps = scan.readPartitionSchema
    val files: Array[PartitionedFile] = scan.toBatch.planInputPartitions()
      .collect { case fp: FilePartition => fp.files }.flatten
    files
      .groupBy(f => f.partitionValues.toSeq(ps).map {
        case u: UTF8String => u.toString
        case other => other
      })
      .toSeq.sortBy(_._1.mkString(""))
      .zipWithIndex
      .map { case ((_, fs), i) =>
        new KeyedFilePartition(i, fs, fs.head.partitionValues.copy())
      }.toArray
  }

  /** Batch view over the grouped partitions; the reader factory is the
    * stock vectorized parquet one — only the split planning changes.
    */
  class KeyedBatch(scan: ParquetScan) extends Batch {
    override def planInputPartitions(): Array[InputPartition] =
      keyedPartitions(scan)
    override def createReaderFactory(): PartitionReaderFactory =
      scan.toBatch.createReaderFactory()
  }
}

/** A FilePartition whose files all share one partition value, keyed for
  * Spark's key-grouped (storage-partitioned) execution.
  */
class KeyedFilePartition(idx: Int, fileSeq: Array[PartitionedFile],
    key: InternalRow)
    extends FilePartition(idx, fileSeq) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}
