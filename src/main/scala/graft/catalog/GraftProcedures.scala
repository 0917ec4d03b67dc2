package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance procedures under `CALL <catalog>.system.<proc>(...)` (r15)
  * — the SQL surface for the operations that were previously Scala-API
  * only. A warehouse user should never need the library's internals for
  * day-two maintenance:
  *
  *  - `compact('ns.table')` — rewrite fragmented / vectored units of a
  *    snapshot table (one atomic manifest commit; see
  *    [[Snapshots.compact]]); returns the rewritten-unit count.
  *  - `expire_snapshots('ns.table', keep)` — retire all but the newest
  *    `keep` superseded manifests NOW, sweeping the units/segments/dv
  *    dirs only they referenced; returns the expired-manifest count.
  *  - `rollback('ns.table', version)` — restore a retained snapshot as a
  *    NEW manifest version (the history between stays readable); returns
  *    (restored_version, new_version).
  *
  * Data-producing feeds (addedBetween/changesBetween) stay DataFrame APIs
  * — their schema is the table's, which a fixed procedure signature
  * cannot declare.
  */
object GraftProcedures {

  val Namespace = "system"
  val names: Seq[String] =
    Seq("compact", "expire_snapshots", "rollback", "history",
      "create_tag", "drop_tag", "vacuum")

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "compact" => Some(new CompactProc(catalog))
      case "expire_snapshots" => Some(new ExpireProc(catalog))
      case "rollback" => Some(new RollbackProc(catalog))
      case "history" => Some(new HistoryProc(catalog))
      case "create_tag" => Some(new CreateTagProc(catalog))
      case "drop_tag" => Some(new DropTagProc(catalog))
      case "vacuum" => Some(new VacuumProc(catalog))
      case _ => None
    }

  private case class ResultScan(schema: StructType, data: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
  }

  private def result(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      ResultScan(schema, Array(new GenericInternalRow(values.toArray)))
        : Scan).iterator()

  private abstract class GraftProc(catalog: GraftCatalog)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def tableArg(input: InternalRow): (Identifier, Path) =
      catalog.resolveTableRef(input.getUTF8String(0).toString)
    protected def spark: SparkSession = SparkSession.active
  }

  private class CompactProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite fragmented/vectored units of a snapshot table (one atomic manifest commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table reference, e.g. 'main.events'").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (ident, dir) = tableArg(input)
      val n = Snapshots.compact(spark, dir)
      catalog.invalidateTable(ident)
      result(StructType(Seq(StructField("rewritten_units", IntegerType))), n)
    }
  }

  private class ExpireProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "expire_snapshots"
    override def description(): String =
      "retire all but the newest `keep` superseded manifests now; sweep what only they referenced"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("keep", IntegerType)
        .comment("superseded manifests to keep readable").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (ident, dir) = tableArg(input)
      val keep = input.getInt(1)
      require(keep >= 0, s"keep must be >= 0, got $keep")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val n = Snapshots.expire(fs, dir, keep)
      catalog.invalidateTable(ident)
      result(StructType(Seq(StructField("expired_manifests", IntegerType))), n)
    }
  }

  private class HistoryProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "history"
    override def description(): String =
      "the retained manifest versions of a snapshot table, newest first"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())
    private val schema = StructType(Seq(
      StructField("version", LongType),
      StructField("committed_at", TimestampType),
      StructField("kind", StringType),
      StructField("units", IntegerType),
      StructField("live_rows", LongType, nullable = true),
      StructField("dv_files", IntegerType),
      StructField("has_changelog", BooleanType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (_, dir) = tableArg(input)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val rows = Snapshots.versions(fs, dir).reverse
        .flatMap(v => Snapshots.read(fs, dir, v))
        .map { sn =>
          new GenericInternalRow(Array[Any](
            sn.version, sn.stampMillis * 1000L,
            UTF8String.fromString(sn.kind), sn.relDirs.length,
            sn.totalRows.map(Long.box).orNull, sn.dvs.size,
            sn.changes.isDefined)): InternalRow
        }.toArray
      java.util.Collections.singletonList(
        ResultScan(schema, rows): Scan).iterator()
    }
  }

  private class VacuumProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "vacuum"
    override def description(): String =
      "sweep a crashed writer's staging/aside/lock debris older than the age " +
        "gate, then run a retention pass (snapshot tables)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("older_than_ms", LongType)
        .defaultValue("3600000")
        .comment("age gate; an in-flight writer's staging is always younger").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (ident, dir) = tableArg(input)
      val olderThan = input.getLong(1)
      require(olderThan >= 0, s"older_than_ms must be >= 0, got $olderThan")
      val n = catalog.vacuumTable(ident, dir, olderThan)
      catalog.invalidateTable(ident)
      result(StructType(Seq(StructField("removed_paths", IntegerType))), n)
    }
  }

  private class CreateTagProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "create_tag"
    override def description(): String =
      "pin a retained snapshot version under a name; `VERSION AS OF '<tag>'` reads it " +
        "and retention never sweeps it until the tag drops"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("tag", StringType).build(),
      ProcedureParameter.in("version", LongType)
        .defaultValue("-1").comment("retained version; default = current").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (_, dir) = tableArg(input)
      val tag = input.getUTF8String(1).toString
      val version = input.getLong(2)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val v = Snapshots.createTag(fs, dir, tag, version)
      result(StructType(Seq(
        StructField("tag", StringType),
        StructField("pinned_version", LongType))), UTF8String.fromString(tag), v)
    }
  }

  private class DropTagProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "drop_tag"
    override def description(): String =
      "drop a tag; the next retention pass may sweep what only it pinned"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("tag", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (_, dir) = tableArg(input)
      val tag = input.getUTF8String(1).toString
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val existed = Snapshots.dropTag(fs, dir, tag)
      result(StructType(Seq(StructField("dropped", BooleanType))), existed)
    }
  }

  private class RollbackProc(catalog: GraftCatalog) extends GraftProc(catalog) {
    override def name(): String = "rollback"
    override def description(): String =
      "restore a retained snapshot version as a NEW manifest (history in between stays readable)"
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("version", LongType)
        .comment("retained manifest version to restore").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (ident, dir) = tableArg(input)
      val version = input.getLong(1)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val snap = Snapshots.rollback(fs, dir, version)
      catalog.invalidateTable(ident)
      result(StructType(Seq(
        StructField("restored_version", LongType),
        StructField("new_version", LongType))), version, snap.version)
    }
  }
}
