package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** File-level min/max pruning for FILE-granularity row-level operations
  * (r13 VERDICT ask #2): a point DELETE/UPDATE on an unpartitioned table
  * should rewrite only the files that might contain matching rows, not the
  * table.
  *
  * Why this cannot ride the parquet reader's own predicate pushdown: the
  * copy-on-write group is a whole FILE — every row of a candidate file
  * must be read so the non-matching rows survive into the replacement.
  * Pushing the condition into the reader would prune row groups WITHIN a
  * candidate file and silently drop the rows that were supposed to be
  * copied (exactly the r13 wave-2 data-loss class). So candidacy is
  * decided here, from footer statistics alone, and the scan itself stays
  * unpushed: a file is EXCLUDED only when its stats PROVE no row can
  * match, and anything unknown keeps the file a candidate.
  *
  * Driver-side cost: one footer read per data file — the same metadata
  * pass GraftStats already makes for row counts. (At true 100 TB scale the
  * stats would live in a manifest rather than be re-read per command;
  * footer reads keep this correct and dependency-free at the current
  * deployment shape.)
  */
object FileStats {

  /** Aggregated per-file column stats, externalized to the same value
    * families V1 `sources.Filter` literals carry. None fields = unknown
    * (unsupported type, missing stats) — always conservative.
    */
  case class ColStats(min: Option[Any], max: Option[Any],
      hasNulls: Boolean, allNull: Boolean)

  /** Read one file's footer into per-column stats (top-level primitive
    * columns of supported types only; everything else stays unknown).
    */
  def read(conf: Configuration, file: Path,
      schema: StructType): Map[String, ColStats] = readWithRows(conf, file, schema)._2

  /** Like [[read]] but also returns the footer row count — a zero-row file
    * (the schema-carrying CREATE seed) can never be a candidate.
    */
  def readWithRows(conf: Configuration, file: Path,
      schema: StructType): (Long, Map[String, ColStats]) = {
    val fields = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      var totalRows = 0L
      val acc = scala.collection.mutable.Map.empty[String, ColStats]
      r.getFooter.getBlocks.forEach { block =>
        totalRows += block.getRowCount
        block.getColumns.forEach { chunk =>
          val pathParts = chunk.getPath.toArray
          if (pathParts.length == 1) {
            val name = pathParts(0).toLowerCase
            fields.get(name).foreach { dt =>
              val st = chunk.getStatistics
              val rows = block.getRowCount
              val (mn, mx, nulls, allN) =
                if (st == null) (None, None, true, false)
                else {
                  val numNulls = if (st.isNumNullsSet) st.getNumNulls else -1L
                  val hasN = numNulls != 0L // unknown (-1) counts as "maybe"
                  val allN = numNulls >= 0 && numNulls == rows
                  if (st.hasNonNullValue)
                    (external(dt, st.genericGetMin),
                      external(dt, st.genericGetMax), hasN, allN)
                  else (None, None, hasN, allN)
                }
              val prev = acc.getOrElse(name, ColStats(None, None, false, true))
              acc(name) = ColStats(
                merge(prev.min, mn, keepMax = false),
                merge(prev.max, mx, keepMax = true),
                prev.hasNulls || nulls,
                prev.allNull && allN)
            }
          }
        }
      }
      (totalRows, acc.toMap)
    } finally r.close()
  }

  /** Merge block-level bounds; None (unknown) poisons the bound. A column
    * absent from a block is impossible here (parquet files carry every
    * schema column), so per-block merging is sound.
    */
  private def merge(a: Option[Any], b: Option[Any], keepMax: Boolean): Option[Any] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        val c = try PartitionDirs.compareExternal(x, y)
        catch { case _: Exception => return None }
        Some(if ((c >= 0) == keepMax) x else y)
      case (None, y) => y // first block
      case _ => None
    }

  /** Parquet's physical stat value → the external family
    * [[PartitionDirs.compareExternal]] understands for this Spark type.
    * None = not comparable (prune nothing on this column).
    */
  private def external(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (ByteType | ShortType | IntegerType, i: java.lang.Integer) => Some(i)
    case (LongType, l: java.lang.Long) => Some(l)
    case (FloatType, f: java.lang.Float) => Some(f)
    case (DoubleType, d: java.lang.Double) => Some(d)
    case (BooleanType, b: java.lang.Boolean) => Some(b)
    case (DateType, i: java.lang.Integer) =>
      Some(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (StringType, b: org.apache.parquet.io.api.Binary) =>
      Some(b.toStringUsingUTF8)
    case _ => None
  }

  /** Could ANY row of a file with these stats satisfy `f`? Unknown → true.
    * Candidates are the files where every pushed conjunct answers true.
    */
  def mightMatch(f: sources.Filter, cols: Map[String, ColStats]): Boolean = {
    def stats(c: String): Option[ColStats] = cols.get(c.toLowerCase)
    def cmp(a: Any, b: Any): Option[Int] =
      try Some(PartitionDirs.compareExternal(a, b))
      catch { case _: Exception => None }
    // v could equal some value in [min, max]?
    def inRange(c: String, v: Any): Boolean = stats(c) match {
      case Some(ColStats(Some(mn), Some(mx), _, _)) if v != null =>
        (cmp(v, mn), cmp(v, mx)) match {
          case (Some(a), Some(b)) => a >= 0 && b <= 0
          case _ => true
        }
      case Some(ColStats(_, _, _, true)) => false // all null: no value matches
      case _ => true
    }
    def maxAbove(c: String, v: Any, strict: Boolean): Boolean = stats(c) match {
      case Some(ColStats(_, Some(mx), _, _)) if v != null =>
        cmp(mx, v).forall(x => if (strict) x > 0 else x >= 0)
      case Some(ColStats(_, _, _, true)) => false
      case _ => true
    }
    def minBelow(c: String, v: Any, strict: Boolean): Boolean = stats(c) match {
      case Some(ColStats(Some(mn), _, _, _)) if v != null =>
        cmp(mn, v).forall(x => if (strict) x < 0 else x <= 0)
      case Some(ColStats(_, _, _, true)) => false
      case _ => true
    }
    f match {
      case sources.AlwaysTrue() => true
      case sources.AlwaysFalse() => false
      case sources.EqualTo(c, v) => if (v == null) false else inRange(c, v)
      case sources.EqualNullSafe(c, v) =>
        if (v == null) stats(c).forall(_.hasNulls) else inRange(c, v)
      case sources.In(c, vs) =>
        vs != null && vs.filter(_ != null).exists(v => inRange(c, v))
      case sources.GreaterThan(c, v) => maxAbove(c, v, strict = true)
      case sources.GreaterThanOrEqual(c, v) => maxAbove(c, v, strict = false)
      case sources.LessThan(c, v) => minBelow(c, v, strict = true)
      case sources.LessThanOrEqual(c, v) => minBelow(c, v, strict = false)
      case sources.IsNull(c) => stats(c).forall(_.hasNulls)
      case sources.IsNotNull(c) => stats(c).forall(!_.allNull)
      case sources.Not(sources.IsNull(c)) => mightMatch(sources.IsNotNull(c), cols)
      case sources.Not(sources.IsNotNull(c)) => mightMatch(sources.IsNull(c), cols)
      case sources.And(l, r) => mightMatch(l, cols) && mightMatch(r, cols)
      case sources.Or(l, r) => mightMatch(l, cols) || mightMatch(r, cols)
      case sources.StringStartsWith(c, p) if p != null =>
        // s startsWith p  ⟺  p <= s < successor(p)
        stats(c) match {
          case Some(ColStats(Some(mn: String), Some(mx: String), _, _)) =>
            mx >= p && successor(p).forall(up => mn < up)
          case Some(ColStats(_, _, _, true)) => false
          case _ => true
        }
      case _ => true // unknown shapes never prune
    }
  }

  /** Smallest string greater than every string with prefix `p` (last char
    * incremented); None when that's not expressible (trailing U+FFFF).
    */
  private def successor(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) == '\uffff') i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }
}
