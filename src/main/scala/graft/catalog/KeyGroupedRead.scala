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
  * dominant shuffle of the join. The trade-off is task granularity — by
  * default one task per partition value (the bucketed-table contract; AQE
  * cannot split inside a value, though Spark's partially-clustered mode
  * can exploit the within-value splits below) — which is why the behavior
  * is DOUBLE opt-in (`graft.spj` + Spark's v2-bucketing flag) and the
  * default read path keeps size-balanced bin-packing.
  */
object KeyGroupedRead {

  /** Keyed input partitions, re-grouped from the delegate's size-packed
    * FilePartitions: every partition holds files of ONE partition value,
    * but a value whose bytes exceed `maxPartitionBytes` is SPLIT into
    * several same-key partitions — Spark's key-grouped execution merges
    * same-key partitions into one task by default, and under
    * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution` it
    * can instead keep the splits and replicate the other join side, which
    * is the skew escape hatch a hot partition value needs. Deterministic
    * ordering (sorted by the rendered key) keeps partition ids stable
    * across identical plans.
    */
  def keyedPartitions(scan: ParquetScan): Array[InputPartition] = {
    // PartitionedFile.partitionValues rows are projected to the scan's
    // READ partition schema (callers guarantee it is the full one here)
    val ps = scan.readPartitionSchema
    val maxBytes =
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val files: Array[PartitionedFile] = scan.toBatch.planInputPartitions()
      .collect { case fp: FilePartition => fp.files }.flatten
    val groups = files
      .groupBy(f => f.partitionValues.toSeq(ps).map {
        case u: UTF8String => u.toString
        case other => other
      })
      // NUL-joined sort key: a bare concat is ambiguous for multi-column
      // keys (("1","23") vs ("12","3")), which would let such groups fall
      // back to unordered-map iteration order (r13 ADVICE)
      .toSeq.sortBy(_._1.map(String.valueOf).mkString("\u0000"))
    val out = Seq.newBuilder[InputPartition]
    var idx = 0
    groups.foreach { case (_, fs) =>
      val key = fs.head.partitionValues.copy()
      var pack = Vector.empty[PartitionedFile]
      var packBytes = 0L
      def flush(): Unit = if (pack.nonEmpty) {
        out += new KeyedFilePartition(idx, pack.toArray, key)
        idx += 1; pack = Vector.empty; packBytes = 0L
      }
      fs.sortBy(-_.length).foreach { f =>
        if (packBytes > 0 && packBytes + f.length > maxBytes) flush()
        pack :+= f; packBytes += f.length
      }
      flush()
    }
    out.result().toArray
  }

  /** Distinct partition-value count of the effective scan — what
    * `KeyGroupedPartitioning.numPartitions` reports (the clustering
    * cardinality; the physical exec re-derives its own grouped count).
    */
  def groupCount(scan: ParquetScan): Int =
    scan.fileIndex.listFiles(scan.partitionFilters, scan.dataFilters).size

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
