package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.GovernancePolicies

/** DSv2 TableCatalog + SupportsNamespaces over a directory of parquet tables — the
  * Spark-native analog of the reference's connector metadata layer
  * (trino/RecordServiceMetadata.java): catalog → namespaces → tables with
  * externally-owned schemas. Reads mirror the reference; the WRITE surface
  * (CREATE/CTAS/INSERT/DROP/RENAME, atomic CTAS via StagingTableCatalog)
  * deliberately exceeds it — the reference connector is read-only
  * (trino/RecordServiceTransactionHandle.java:17-19) because Okera fronts
  * someone else's warehouse, but a Spark-native engine owns its outputs and
  * wants them governed by the same catalog that serves reads.
  *
  * Register with:
  *   spark.sql.catalog.graft     = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.dir = /path/with/parquet/tables
  * Then `SELECT ... FROM graft.main.lineitem` resolves here.
  *
  * All filesystem access goes through Hadoop `FileSystem`, so the same catalog
  * works on local disk, HDFS, or s3a:// at the 100 TB deployment — never
  * java.io.File. A table is either a single `<name>.parquet` file or a `<name>`
  * directory of parquet part-files.
  *
  * Table IO is delegated to Spark's ParquetTable (FileTable machinery), which
  * brings the DSv2 pushdown surface for free — column pruning (P1), filter
  * pushdown (P2-P8), aggregate pushdown (S7 count(*) fast path,
  * trino/RecordServicePageSource.java:79-84), vectorized columnar decode (S2)
  * with row fallback for nested types (S3), and file-split planning with
  * locality (S4). On top of that, `GraftTable` adds footer-exact row-count
  * statistics for the CBO (M9, trino/RecordServiceMetadata.java:504-537).
  *
  * Governance: no-access columns are removed from the reported schema at load
  * time, mirroring the reference's silent column drop for hasAccess == false
  * (trino/RecordServiceMetadata.java:803-804). Masks and row filters are injected
  * by the analyzer rule (graft.plans.GovernanceRule).
  *
  * Loaded tables are cached with a TTL, mirroring the reference's metadata cache
  * (okera.metadata.cache-ttl-ms, trino/RecordServiceConfig.java:201-206); per-query
  * snapshot consistency comes from DSv2 capturing the Table at resolution time.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var dir: String = _
  private var ttlMs: Long = 60000L
  private val cache = new ConcurrentHashMap[String, (Long, Table)]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dir = Option(options.get("dir")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'dir'"))
    ttlMs = Option(options.get("cache-ttl-ms")).map(_.toLong).getOrElse(60000L)
  }

  override def name(): String = catalogName

  private def defaultNs = Array("main")

  private def hadoopConf = SparkSession.active.sessionState.newHadoopConf()

  private def fs = new Path(dir).getFileSystem(hadoopConf)

  /** Resolve a table name to its storage path: `<dir>/<name>.parquet` (single
    * file) or `<dir>/<name>` (directory of part files).
    */
  private def tablePath(name: String): Option[Path] = {
    val f = new Path(dir, s"$name.parquet")
    val d = new Path(dir, name)
    val filesystem = fs
    if (filesystem.exists(f)) Some(f)
    else if (filesystem.exists(d) && filesystem.getFileStatus(d).isDirectory) Some(d)
    else None
  }

  override def listNamespaces(): Array[Array[String]] = Array(defaultNs)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(defaultNs) else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(defaultNs)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      namespace.toSeq)

  override def createNamespace(ns: Array[String], meta: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val filesystem = fs
    val root = new Path(dir)
    if (!filesystem.exists(root)) return Array.empty
    filesystem.listStatus(root).flatMap { st =>
      val n = st.getPath.getName
      if (st.isFile && n.endsWith(".parquet"))
        Some(Identifier.of(namespace, n.stripSuffix(".parquet")))
      else if (st.isDirectory && !n.startsWith("_") && !n.startsWith("."))
        Some(Identifier.of(namespace, n))
      else None
    }
  }

  override def tableExists(ident: Identifier): Boolean = tablePath(ident.name).isDefined

  /** Crash recovery for the rename-swap commits (commitStaged /
    * SwapOverwrite): a kill between "move live aside" and "move staging in"
    * leaves the table absent from its canonical path with the pre-swap data
    * intact under `.old-<name>-<uuid>`. On a load MISS with exactly ONE
    * matching aside, restore it — the swap never happened, so the aside IS
    * the table. Zero asides = nothing to recover; several = ambiguous
    * (concurrent replaces), refuse and leave them for manual inspection.
    * Only load consults asides, and DROP/RENAME clean them up, so a stale
    * aside can never resurrect a deliberately dropped table.
    */
  private def recoverAside(name: String): Option[Path] = {
    val filesystem = fs
    val root = new Path(dir)
    if (!filesystem.exists(root)) return None
    val re = ("\\.old-" + java.util.regex.Pattern.quote(name) + "-[0-9a-f]{8}").r
    val asides = filesystem.listStatus(root).map(_.getPath)
      .filter(p => re.pattern.matcher(p.getName).matches())
    if (asides.length != 1) return None
    val target = new Path(dir, name)
    if (filesystem.rename(asides.head, target)) Some(target) else None
  }

  private def dropAsides(name: String): Unit = {
    val filesystem = fs
    val root = new Path(dir)
    if (!filesystem.exists(root)) return
    val re = ("\\.old-" + java.util.regex.Pattern.quote(name) + "-[0-9a-f]{8}").r
    filesystem.listStatus(root).map(_.getPath)
      .filter(p => re.pattern.matcher(p.getName).matches())
      .foreach(p => filesystem.delete(p, true))
  }

  override def loadTable(ident: Identifier): Table = {
    // governance is part of the cache key: a policy or user change must not be
    // masked by a stale cached schema
    val user = graft.plans.Users.current(SparkSession.active)
    val dropped = GovernancePolicies.getFor(user, ident.name)
      .map(_.dropColumns.map(_.toLowerCase).toSet).getOrElse(Set.empty)
    val key = ident.toString + "|" + dropped.toSeq.sorted.mkString(",")
    val now = System.currentTimeMillis()
    val cached = cache.get(key)
    if (cached != null && now - cached._1 < ttlMs) return cached._2
    val path = tablePath(ident.name).orElse(recoverAside(ident.name)).getOrElse {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace.toSeq :+ ident.name)
    }
    val spark = SparkSession.active
    def parquetTable(userSchema: Option[StructType]) = ParquetTable(
      ident.name,
      spark,
      CaseInsensitiveStringMap.empty(),
      Seq(path.toString),
      userSchema,
      classOf[ParquetFileFormat])

    // metadata sidecar (partitioned / evolved tables): its schema is
    // authoritative — wider than old footers after ADD COLUMN, and the only
    // schema source for an empty partitioned table
    val isDir = fs.getFileStatus(path).isDirectory
    val meta = if (isDir) TableMeta.read(fs, path) else None

    // schema-level governance: no-access columns never appear (reference
    // trino/RecordServiceMetadata.java:803-804)
    val declared = meta.map(_.schema)
    val base = declared.map(s => parquetTable(Some(s))).getOrElse(parquetTable(None))
    val table =
      if (dropped.isEmpty) base
      else {
        // a PARTITION column cannot be schema-dropped on a hive layout:
        // the file index re-infers it from the k=v directory names, so the
        // pruned userSchema would silently grow it back — and the values
        // are readable off the PATHS regardless. Refuse loudly instead of
        // leaking (row-filter or re-layout are the real fixes).
        val partNames = meta.map(_.partitionCols)
          .getOrElse(base.partitioning().flatMap(_.references())
            .flatMap(_.fieldNames()).toSeq)
        val leaked = partNames.filter(p => dropped(p.toLowerCase))
        if (leaked.nonEmpty)
          throw new UnsupportedOperationException(
            s"governance: cannot drop partition column(s) ${leaked.mkString(", ")} " +
              s"of ${ident.name} — a hive layout exposes partition values in " +
              "directory names; use a row filter or re-layout the table")
        val pruned = StructType(base.schema.fields.filterNot(f => dropped(f.name.toLowerCase)))
        parquetTable(Some(pruned))
      }

    val conf = hadoopConf
    lazy val rows = ParquetFooters.rowCount(path, conf)
    // directory tables are INSERT targets; single-file `<name>.parquet`
    // tables stay read-only (appending part files under a file path is not
    // a meaningful layout)
    val writable = if (isDir) Some(path.toString) else None
    val wrapped: Table = new GraftTable(table, () => rows, writable,
      onWrite = () => invalidateTable(ident),
      partCols = meta.map(_.partitionCols).getOrElse(Nil))
    cache.put(key, (now, wrapped))
    wrapped
  }

  override def invalidateTable(ident: Identifier): Unit = {
    val prefix = ident.toString + "|"
    cache.keySet.asScala.filter(_.startsWith(prefix))
      .foreach(cache.remove)
  }

  /** Namespace gate shared by every name-addressed mutation: DROP/RENAME
    * resolve tables by NAME, so without this check
    * `DROP TABLE cat.bogus_ns.nation` would delete main's directory
    * (r11 ADVICE).
    */
  private def requireKnownNamespace(ident: Identifier): Unit =
    if (!ident.namespace.sameElements(defaultNs))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        ident.namespace.toSeq)

  /** Validate a write target and resolve its partitioning: only IDENTITY
    * `PARTITIONED BY (col, ...)` transforms are supported (they map 1:1 to
    * the hive `k=v` directory layout the read path already prunes with
    * DPP); bucket/temporal transforms have no directory analog here.
    */
  private def requireWritableTarget(ident: Identifier,
      partitions: Array[Transform]): Seq[String] = {
    requireKnownNamespace(ident)
    partitions.toSeq.map { t =>
      val refs = t.references()
      if (t.name() != "identity" || refs.length != 1 ||
          refs.head.fieldNames().length != 1)
        throw new UnsupportedOperationException(
          s"graft catalog supports only identity PARTITIONED BY columns, got: $t")
      refs.head.fieldNames().head
    }
  }

  /** Canonical on-disk column order: data columns first (declared order),
    * partition columns last — the order a hive-layout read reports
    * (FileTable appends the partition schema), so the declared schema and
    * the read-back schema agree.
    */
  private def canonicalSchema(schema: StructType, partCols: Seq[String]): StructType = {
    if (partCols.isEmpty) return schema
    val missing = partCols.filterNot(p => schema.fieldNames.exists(_.equalsIgnoreCase(p)))
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"PARTITIONED BY columns not in schema: ${missing.mkString(", ")}")
    val (part, data) = schema.fields.partition(f =>
      partCols.exists(_.equalsIgnoreCase(f.name)))
    StructType(data ++ part)
  }

  /** Materialize an empty, schema-carrying table: one zero-row parquet part
    * file, so the created table is immediately loadable (schema inference
    * needs at least one footer) and insertable.
    */
  private def writeEmpty(schema: StructType, path: Path): Unit = {
    val spark = SparkSession.active
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("append").parquet(path.toString)
  }

  /** CREATE TABLE — the write surface the read-only reference lacks
    * (trino/RecordServiceTransactionHandle.java:17-19); deliberately
    * exceeded here per SURVEY §2.1 S10: a Spark-native engine owns its
    * outputs, so CTAS/INSERT go through the same governed catalog that
    * serves reads (policies apply to the written table by name like any
    * other).
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val partCols = requireWritableTarget(ident, partitions)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace.toSeq :+ ident.name)
    val target = new Path(dir, ident.name)
    if (partCols.nonEmpty) {
      // partitioned: the sidecar IS the schema source (an empty table has
      // no `k=v` dirs or footers to infer from); no seed file — a root
      // part file would break the hive layout
      fs.mkdirs(target)
      TableMeta.write(fs, target,
        TableMeta(canonicalSchema(schema, partCols), partCols))
    } else writeEmpty(schema, target)
    invalidateTable(ident)
    loadTable(ident)
  }

  /** ALTER TABLE — the ADD COLUMN subset (r11 VERDICT ask #3), over
    * directory tables: the evolved schema lands in the `_graft_table.json`
    * sidecar (created from the live layout on first ALTER), reads serve it
    * with parquet null-filling the column for pre-evolution files, and
    * subsequent INSERTs write the wider rows. Other changes (drop/rename/
    * retype) would silently corrupt positional readers of existing files —
    * refused loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    requireKnownNamespace(ident)
    val path = tablePath(ident.name).getOrElse {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace.toSeq :+ ident.name)
    }
    if (!fs.getFileStatus(path).isDirectory)
      throw new UnsupportedOperationException(
        s"table ${ident.name} is a single-file table — read-only")
    val current = TableMeta.read(fs, path).getOrElse {
      val spark = SparkSession.active
      TableMeta(spark.read.parquet(path.toString).schema, partitionColsOf(path))
    }
    val updated = changes.foldLeft(current) { (m, ch) =>
      ch match {
        case add: TableChange.AddColumn =>
          if (add.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              "graft catalog: nested ADD COLUMN is not supported")
          val colName = add.fieldNames().head
          if (!add.isNullable)
            throw new UnsupportedOperationException(
              s"added column $colName must be nullable: existing files lack it")
          if (m.schema.fieldNames.exists(_.equalsIgnoreCase(colName)))
            throw new IllegalArgumentException(s"column $colName already exists")
          var field = org.apache.spark.sql.types.StructField(
            colName, add.dataType(), nullable = true)
          if (add.comment() != null) field = field.withComment(add.comment())
          // keep partition columns last (the canonical read-back order)
          val (part, data) = m.schema.fields.partition(f =>
            m.partitionCols.exists(_.equalsIgnoreCase(f.name)))
          TableMeta(StructType((data :+ field) ++ part), m.partitionCols)
        case other =>
          throw new UnsupportedOperationException(
            s"graft catalog: ALTER ${other.getClass.getSimpleName} is not supported " +
              "(only ADD COLUMN evolves a directory table safely)")
      }
    }
    TableMeta.write(fs, path, updated)
    invalidateTable(ident)
    loadTable(ident)
  }

  /** Partition columns of a live hive-layout directory (for tables
    * predating a metadata sidecar): the chain of `k=v` directory names.
    */
  private def partitionColsOf(path: Path): Seq[String] = {
    val filesystem = fs
    val b = Seq.newBuilder[String]
    var cur = path
    var descending = true
    while (descending) {
      val kv = filesystem.listStatus(cur)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (kv.isEmpty) descending = false
      else {
        b += kv.head.getPath.getName.split("=", 2)(0)
        cur = kv.head.getPath
      }
    }
    b.result()
  }

  override def dropTable(ident: Identifier): Boolean = {
    requireKnownNamespace(ident)
    invalidateTable(ident)
    // a lingering crash-aside must not resurrect a dropped table
    dropAsides(ident.name)
    tablePath(ident.name) match {
      case Some(p) => fs.delete(p, true)
      case None => false
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    requireKnownNamespace(oldIdent)
    requireKnownNamespace(newIdent)
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent.namespace.toSeq :+ oldIdent.name)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        newIdent.namespace.toSeq :+ newIdent.name)
    val from = tablePath(oldIdent.name).get
    val to = if (from.getName.endsWith(".parquet"))
      new Path(dir, s"${newIdent.name}.parquet") else new Path(dir, newIdent.name)
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"cannot rename $from to $to")
    dropAsides(oldIdent.name) // crash-asides don't follow a rename
    invalidateTable(oldIdent); invalidateTable(newIdent)
  }

  // ---- StagingTableCatalog: atomic CTAS via stage-write-then-rename (the
  // States/ivfPqCompact swap discipline — a failed CTAS leaves either no
  // table or the old table, never a half-written one) ----

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): StagedTable = {
    val partCols = requireWritableTarget(ident, partitions)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace.toSeq :+ ident.name)
    staged(ident, schema, partCols, replace = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): StagedTable = {
    val partCols = requireWritableTarget(ident, partitions)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace.toSeq :+ ident.name)
    staged(ident, schema, partCols, replace = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): StagedTable = {
    val partCols = requireWritableTarget(ident, partitions)
    staged(ident, schema, partCols, replace = true)
  }

  private def staged(ident: Identifier, schema: StructType,
      partCols: Seq[String], replace: Boolean): StagedTable = {
    val staging = new Path(dir,
      s".staging-${ident.name}-${java.util.UUID.randomUUID().toString.take(8)}")
    new GraftStagedTable(ident, canonicalSchema(schema, partCols), staging,
      new Path(dir, ident.name), replace, this, partCols)
  }

  /** Finalize a staged CTAS: ensure the staging dir carries at least one
    * schema-bearing part file (an empty SELECT writes none; a partitioned
    * table carries its schema in the metadata sidecar instead — a root
    * part file would break the hive layout), then rename-swap it into
    * place.
    */
  private[catalog] def commitStaged(ident: Identifier, schema: StructType,
      staging: Path, target: Path, replace: Boolean,
      partCols: Seq[String]): Unit = {
    val filesystem = fs
    if (!filesystem.exists(staging)) filesystem.mkdirs(staging)
    if (partCols.nonEmpty)
      TableMeta.write(filesystem, staging, TableMeta(schema, partCols))
    else {
      val hasData = filesystem.listStatus(staging)
        .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (!hasData) writeEmpty(schema, staging)
    }
    if (filesystem.exists(target)) {
      if (!replace)
        throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
          ident.namespace.toSeq :+ ident.name)
      // uuid-suffixed aside: concurrent REPLACEs of the same table cannot
      // collide on a fixed aside name (r11 ADVICE). Crash recovery: between
      // the two renames the table is briefly absent from its canonical path
      // — the pre-swap data survives under this dot-prefixed aside
      // (invisible to listing); restore it by renaming `.old-<name>-<uuid>`
      // back over `<name>`.
      val aside = new Path(dir,
        s".old-${ident.name}-${java.util.UUID.randomUUID().toString.take(8)}")
      if (!filesystem.rename(target, aside))
        throw new java.io.IOException(s"ctas: cannot move $target aside")
      if (!filesystem.rename(staging, target)) {
        filesystem.rename(aside, target) // roll back — the old table lives
        throw new java.io.IOException(s"ctas: cannot swap $staging in")
      }
      filesystem.delete(aside, true)
    } else if (!filesystem.rename(staging, target))
      throw new java.io.IOException(s"ctas: cannot move $staging into place")
    invalidateTable(ident)
  }

  private[catalog] def abortStaged(staging: Path): Unit =
    fs.delete(staging, true)
}

/** The staged side of an atomic CTAS: writes land in a hidden sibling
  * staging directory through the stock committer-protected parquet write;
  * `commitStagedChanges` rename-swaps the directory into the table's final
  * path (so a crash mid-CTAS leaves no half-table and a REPLACE keeps the
  * old table readable until the instant of the swap), `abortStagedChanges`
  * deletes the staging debris.
  */
private[catalog] class GraftStagedTable(ident: Identifier, tableSchema: StructType,
    staging: Path, target: Path, replace: Boolean, catalog: GraftCatalog,
    partCols: Seq[String] = Nil)
    extends StagedTable with SupportsWrite {

  private def delegate = ParquetTable(
    ident.name,
    SparkSession.active,
    CaseInsensitiveStringMap.empty(),
    Seq(staging.toString),
    Some(tableSchema),
    classOf[ParquetFileFormat])

  override def name(): String = ident.name
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    partCols.map(org.apache.spark.sql.connector.expressions.Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()
  // REPLACE writes arrive as OverwriteByExpression(true) on the staged
  // table (AtomicReplaceTableAsSelectExec.writeToTable overwrite=true), so
  // the staged table declares TRUNCATE — and since the staging directory
  // starts empty, truncate is trivially satisfied by the plain append write.
  // Partitioned staged tables write through the V1 fallback (Spark 4.1
  // plans staged CTAS as a regular AppendData, which supports V1Write):
  // one distributed `partitionBy` parquet job into the staging dir — the
  // DSv2 parquet BatchWrite has no partitioned layout path.
  override def capabilities(): java.util.Set[TableCapability] =
    if (partCols.isEmpty)
      java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    else
      java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
        this // staging dir is empty: truncate ≡ append into the fresh dir
      override def build(): org.apache.spark.sql.connector.write.Write =
        if (partCols.isEmpty) delegate.newWriteBuilder(info).build()
        else new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) =>
              // pre-write repartition by the partition columns (the
              // Writers.partitionedParquet discipline): one file per value
              // per non-empty shuffle partition, not tasks × values
              data.repartition(partCols.map(
                  org.apache.spark.sql.functions.col): _*)
                .write.partitionBy(partCols: _*).mode("append")
                .parquet(staging.toString)
        }
    }
  override def commitStagedChanges(): Unit =
    catalog.commitStaged(ident, tableSchema, staging, target, replace, partCols)
  override def abortStagedChanges(): Unit = catalog.abortStaged(staging)
}
