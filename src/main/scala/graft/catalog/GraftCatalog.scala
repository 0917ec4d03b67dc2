package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 TableCatalog + SupportsNamespaces over a directory of parquet tables — the
  * Spark-native analog of the reference's connector metadata layer
  * (trino/RecordServiceMetadata.java): catalog → namespaces → tables with
  * externally-owned schemas, read-only (the reference has no write path,
  * trino/RecordServiceTransactionHandle.java:17-19).
  *
  * Register with:
  *   spark.sql.catalog.graft     = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.dir = /path/with/parquet/tables
  * Then `SELECT ... FROM graft.main.lineitem` resolves here.
  *
  * Table IO is delegated to Spark's ParquetTable (FileTable machinery), which brings
  * the whole DSv2 pushdown surface for free — column pruning
  * (SupportsPushDownRequiredColumns ≈ reference P1), filter pushdown
  * (SupportsPushDownFilters ≈ P2-P8), limit, aggregate pushdown (count(*) fast path
  * ≈ S7, trino/RecordServicePageSource.java:79-84), vectorized columnar decode
  * (≈ S2) with row fallback for nested types (≈ S3), and file-split planning with
  * locality (≈ S4).
  *
  * Loaded tables are cached with a TTL, mirroring the reference's metadata cache
  * (okera.metadata.cache-ttl-ms, trino/RecordServiceConfig.java:201-206); per-query
  * snapshot consistency comes from DSv2 capturing the Table at resolution time.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

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

  override def listNamespaces(): Array[Array[String]] = Array(defaultNs)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(defaultNs) else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(defaultNs)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      namespace.mkString("."))

  override def createNamespace(ns: Array[String], meta: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
    files.filter(f => f.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getName.stripSuffix(".parquet")))
  }

  override def tableExists(ident: Identifier): Boolean =
    new java.io.File(s"$dir/${ident.name}.parquet").exists()

  override def loadTable(ident: Identifier): Table = {
    val key = ident.toString
    val now = System.currentTimeMillis()
    val cached = cache.get(key)
    if (cached != null && now - cached._1 < ttlMs) return cached._2
    val path = s"$dir/${ident.name}.parquet"
    if (!new java.io.File(path).exists()) {
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.toString)
    }
    val table = ParquetTable(
      ident.name,
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(path),
      None,
      classOf[ParquetFileFormat])
    cache.put(key, (now, table))
    table
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
