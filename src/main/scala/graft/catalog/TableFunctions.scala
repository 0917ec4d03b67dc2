package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL table-valued functions over the snapshot layer (r15) — the
  * incremental-consumption surface without leaving SQL:
  *
  *  - `graft_table_changes('cat.ns.t', from, to)`: the row-level change
  *    feed between two retained versions (recorded changelog where
  *    present; exact synthesized D/I for appends, removals, dv deletes
  *    and merge-on-read updates; refuses for unrecorded replaces) — the
  *    TVF form of [[Snapshots.changesBetween]].
  *  - `graft_table_added('cat.ns.t', from, to)`: the TO-snapshot's live
  *    view of the units added since `from` — the batch tail-the-table
  *    primitive ([[Snapshots.addedBetween]]).
  *
  * Version arguments accept manifest version numbers or TAG names
  * (`graft_table_changes('g.main.t', 'baseline', 4)`). Governed tables
  * refuse: both feeds read generation files beneath policy.
  *
  * Registered through `SparkSessionExtensions.injectTableFunction` (the
  * session-function registry, so the names are catalog-less — the table
  * reference is the first argument instead).
  */
object TableFunctions {

  def register(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectTableFunction((FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo(getClass.getName, "graft_table_changes"),
      (args: Seq[Expression]) => build("graft_table_changes", args,
        (spark, dir, from, to) =>
          Snapshots.changesBetween(spark, dir, from, to))))
    e.injectTableFunction((FunctionIdentifier("graft_table_added"),
      new ExpressionInfo(getClass.getName, "graft_table_added"),
      (args: Seq[Expression]) => build("graft_table_added", args,
        (spark, dir, from, to) =>
          Snapshots.addedBetween(spark, dir, from, to))))
  }

  private def build(fn: String, args: Seq[Expression],
      feed: (SparkSession, Path, Long, Long) => org.apache.spark.sql.DataFrame)
      : LogicalPlan = {
    require(args.length == 3,
      s"$fn(table, from, to) takes 3 arguments, got ${args.length}")
    val spark = SparkSession.active
    def lit(e: Expression, what: String): Any = {
      require(e.foldable, s"$fn: $what must be a literal, got ${e.sql}")
      e.eval()
    }
    val ref = String.valueOf(lit(args(0), "table"))
    val (tableIdent, dir) = resolveRef(spark, fn, ref)
    // governance: the feed reads generation files beneath policy
    val user = graft.plans.Users.current(spark)
    val qualified = (tableIdent._1 :+ tableIdent._2).mkString(".")
    if (graft.plans.GovernancePolicies.getFor(user, qualified)
        .orElse(graft.plans.GovernancePolicies.getFor(user, tableIdent._2))
        .isDefined)
      throw new UnsupportedOperationException(
        s"$fn on governed table '$qualified' is not allowed: the change " +
          "feed reads table data beneath the governance policy")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def version(e: Expression, what: String): Long = lit(e, what) match {
      case n: Number => n.longValue()
      case s =>
        val name = String.valueOf(s)
        name.toLongOption
          .orElse(Snapshots.tags(fs, dir).get(name)).getOrElse(
            throw new IllegalArgumentException(
              s"$fn: $what '$name' is neither a version number nor a tag " +
                s"of ${dir.getName} (tags: " +
                s"${Snapshots.tags(fs, dir).keys.toSeq.sorted.mkString(", ")})"))
    }
    val from = version(args(1), "from")
    val to = version(args(2), "to")
    feed(spark, dir, from, to).queryExecution.analyzed
  }

  /** `'cat.ns.t'` / `'ns.t'` (current catalog) / `'t'` (current catalog,
    * main) — the first segment is a catalog when the session knows one by
    * that name and it is a graft catalog.
    */
  private def resolveRef(spark: SparkSession, fn: String,
      ref: String): ((Seq[String], String), Path) = {
    val cm = spark.sessionState.catalogManager
    val parts = ref.split("\\.").toSeq.filter(_.nonEmpty)
    require(parts.nonEmpty, s"$fn: empty table reference")
    val (cat, rest) =
      if (parts.length >= 2) {
        val asCatalog =
          try Some(cm.catalog(parts.head)) catch { case _: Exception => None }
        asCatalog match {
          case Some(g: GraftCatalog) => (g, parts.tail)
          case _ => (cm.currentCatalog, parts)
        }
      } else (cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog =>
        val (ident, p) = g.resolveTableRef(rest.mkString("."))
        ((ident.namespace.toSeq, ident.name), p)
      case other => throw new IllegalArgumentException(
        s"$fn: '$ref' does not resolve to a graft catalog table " +
          s"(current catalog: ${other.name()})")
    }
  }
}
