package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL-visible metadata tables (r15): `SELECT * FROM <cat>.<ns>.<table>.
  * <meta>` — the inspection surface open table formats expose, resolved
  * through the normal DSv2 multipart-name path (the trailing part lands
  * as the Identifier NAME with the real table as the last namespace
  * element; [[GraftCatalog.loadTable]] routes it here when that namespace
  * level is a table, so no real namespace is ever shadowed).
  *
  *  - `history`: retained manifest versions, newest first (version,
  *    committed_at, kind, units, live_rows, dv_files, has_changelog).
  *  - `files`: the CURRENT snapshot's data files — `rows` is the file's
  *    PHYSICAL footer count (from the immutable per-generation stats
  *    sidecar) with `dv_deleted` alongside (live = rows - dv_deleted); NO
  *    data file is opened. Plain (non-snapshot) tables list the directory
  *    (bytes only; row counts would cost one footer read per file —
  *    deliberately not paid here).
  *  - `partitions`: one row per partition (kv chain; unpartitioned
  *    file-entry tables roll up under '') — `rows` is the LIVE count
  *    (manifest accounting, deletion vectors already subtracted — the
  *    same number `history.live_rows` totals).
  *
  * All three are DRIVER-resident listings, same O(entries) memory shape
  * as the manifest itself; a 100 TB table's `files` output is the
  * manifest entry set, not the data. Governed tables refuse (a row count
  * per file leaks the very information a row filter hides).
  */
object MetaTables {

  val names: Set[String] = Set("history", "files", "partitions")

  def isMetaName(name: String): Boolean = names(name.toLowerCase)

  private def str(s: String) = UTF8String.fromString(s)

  private class MetaTable(metaName: String, tblSchema: StructType,
      rows: () => Array[InternalRow]) extends Table with SupportsRead {
    override def name(): String = metaName
    override def schema(): StructType = tblSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def rows(): Array[InternalRow] = MetaTable.this.rows()
          override def readSchema(): StructType = tblSchema
        }
      }
  }

  /** Resolve `<table>.<meta>` for an existing table at `root`; refuses for
    * governed tables (metadata must not out-leak policy).
    */
  def load(spark: SparkSession, ident: Identifier, tableIdent: Identifier,
      root: Path, metaName: String): Table = {
    val user = graft.plans.Users.current(spark)
    val qualified = (tableIdent.namespace :+ tableIdent.name).mkString(".")
    val governed = graft.plans.GovernancePolicies.getFor(user, qualified)
      .orElse(graft.plans.GovernancePolicies.getFor(user, tableIdent.name))
    if (governed.isDefined)
      throw new UnsupportedOperationException(
        s"metadata table '$qualified.$metaName' is not allowed: a governance " +
          "policy applies to the current user, and per-file row counts leak " +
          "what the policy hides")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    metaName.toLowerCase match {
      case "history" => history(fs, root, qualified)
      case "files" => files(fs, root)
      case "partitions" => partitions(fs, root)
      case other => throw new IllegalArgumentException(
        s"unknown metadata table $other (have: ${names.toSeq.sorted.mkString(", ")})")
    }
  }

  private def history(fs: FileSystem, root: Path, qualified: String): Table = {
    val schema = StructType(Seq(
      StructField("version", LongType),
      StructField("committed_at", TimestampType),
      StructField("kind", StringType),
      StructField("units", IntegerType),
      StructField("live_rows", LongType, nullable = true),
      StructField("dv_files", IntegerType),
      StructField("has_changelog", BooleanType)))
    new MetaTable("history", schema, () => {
      if (Snapshots.current(fs, root).isEmpty)
        throw new UnsupportedOperationException(
          s"$qualified.history: not a snapshot table — create with " +
            "TBLPROPERTIES ('snapshots'='true') to record history")
      Snapshots.versions(fs, root).reverse
        .flatMap(v => Snapshots.read(fs, root, v))
        .map { sn =>
          new GenericInternalRow(Array[Any](
            sn.version, sn.stampMillis * 1000L, str(sn.kind),
            sn.relDirs.length, sn.totalRows.map(Long.box).orNull,
            sn.dvs.size, sn.changes.isDefined)): InternalRow
        }.toArray
    })
  }

  private def files(fs: FileSystem, root: Path): Table = {
    val schema = StructType(Seq(
      StructField("file", StringType),
      StructField("partition", StringType),
      StructField("bytes", LongType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("dv_deleted", LongType),
      StructField("has_dv", BooleanType)))
    new MetaTable("files", schema, () => {
      Snapshots.current(fs, root) match {
        case Some(snap) =>
          snap.relDirs.flatMap { unit =>
            val kv = Snapshots.entryKeyOf(unit + "/x") match {
              case k if unit.contains("=") => k
              case _ => ""
            }
            val unitDir = new Path(root, unit)
            val isFileEntry = !unit.contains("=") && unit.contains("/")
            val stats = Snapshots.unitStats(fs, root, unit)
            val lens: Map[String, Long] =
              try {
                val st = fs.getFileStatus(unitDir)
                if (st.isFile) Map(unit -> st.getLen)
                else fs.listStatus(unitDir).toSeq
                  .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
                    !s.getPath.getName.startsWith("."))
                  .map(s => s"$unit/${s.getPath.getName}" -> s.getLen).toMap
              } catch { case _: Exception => Map.empty }
            val rels =
              if (isFileEntry) Seq(unit)
              else if (stats.isDefined) stats.get.keys.toSeq.sorted
              else lens.keys.toSeq.sorted
            rels.map { rel =>
              new GenericInternalRow(Array[Any](
                str(rel), str(kv), lens.get(rel).map(Long.box).orNull,
                stats.flatMap(_.get(rel)).map(r => Long.box(r.rows)).orNull,
                snap.dvRows.getOrElse(rel, 0L),
                snap.dvs.contains(rel))): InternalRow
            }
          }.toArray
        case None =>
          // plain table: directory listing, bytes only (row counts would
          // cost one footer read per file — not paid by a listing)
          def walk(p: Path): Seq[(String, Long)] =
            fs.listStatus(p).toSeq.flatMap { st =>
              val n = st.getPath.getName
              if (n.startsWith("_") || n.startsWith(".")) Nil
              else if (st.isDirectory) walk(st.getPath)
              else Seq(st.getPath.toString.stripPrefix(
                fs.makeQualified(root).toString + "/") -> st.getLen)
            }
          val rootQ = fs.makeQualified(root)
          val entries =
            if (fs.getFileStatus(root).isFile) Seq(root.getName -> fs.getFileStatus(root).getLen)
            else walk(rootQ)
          entries.sortBy(_._1).map { case (rel, len) =>
            val kv = if (rel.contains("=")) Snapshots.entryKeyOf(rel) else ""
            new GenericInternalRow(Array[Any](
              str(rel), str(kv), Long.box(len), null, 0L, false)): InternalRow
          }.toArray
      }
    })
  }

  private def partitions(fs: FileSystem, root: Path): Table = {
    val schema = StructType(Seq(
      StructField("partition", StringType),
      StructField("units", IntegerType),
      StructField("files", IntegerType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("dv_deleted", LongType)))
    new MetaTable("partitions", schema, () => {
      Snapshots.current(fs, root) match {
        case Some(snap) =>
          val byKey = snap.entries.toSeq.sortBy(_._1)
          byKey.map { case (key, units) =>
            val kv = if (key.contains("=")) key else ""
            val unitRels =
              if (key.contains("=")) units.map(g => s"$key/$g")
              else if (key.isEmpty) units else Seq(key)
            val rowsOpt =
              if (unitRels.forall(snap.rows.contains))
                Some(unitRels.map(snap.rows).sum)
              else None
            val fileCount = unitRels.map { u =>
              Snapshots.unitStats(fs, root, u).map(_.size).getOrElse(
                if (!u.contains("=") && u.contains("/")) 1
                else try fs.listStatus(new Path(root, u))
                  .count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
                    !s.getPath.getName.startsWith("."))
                catch { case _: Exception => 0 })
            }.sum
            val dvDel = snap.dvRows.collect {
              case (f, n) if Snapshots.entryKeyOf(f) == key => n
            }.sum
            (kv, key, units.length, fileCount, rowsOpt, dvDel)
          }.groupBy(_._1).toSeq.sortBy(_._1).map { case (kv, group) =>
            new GenericInternalRow(Array[Any](
              str(kv),
              group.map(t => if (t._2.contains("=")) t._3 else 1).sum,
              group.map(_._4).sum,
              if (group.forall(_._5.isDefined))
                Long.box(group.flatMap(_._5).sum) else null,
              group.map(_._6).sum)): InternalRow
          }.toArray
        case None =>
          PartitionDirs.kvLeaves(fs, root).map { rel =>
            val kv = rel.mkString("/")
            val dir = rel.foldLeft(root)((p, n) => new Path(p, n))
            val nFiles =
              try fs.listStatus(dir).count(s => s.isFile &&
                !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith("."))
              catch { case _: Exception => 0 }
            new GenericInternalRow(Array[Any](
              str(kv), 1, nFiles, null, 0L)): InternalRow
          }.toArray
      }
    })
  }
}
