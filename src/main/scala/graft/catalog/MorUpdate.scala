package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UnaryNode, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Merge-on-read UPDATE for deletion-vector tables (r15): `UPDATE t SET
  * ... WHERE ...` on a `deletion_vectors='true'` table commits ONE tiny
  * position vector (the matched rows' old positions) plus ONE small
  * generation (the matched rows with assignments applied) — no candidate
  * data file is rewritten. The copy-on-write path's cost is ∝ candidate
  * FILE BYTES even with perfect candidacy (the matched file is copied
  * minus/plus the changed rows); this path is ∝ MATCHED ROWS, the same
  * write-volume shape the dv DELETE already has. An UPDATE that moves a
  * row across partitions works naturally: the old position is vectored
  * out of its file, the new row lands in its new partition's generation.
  *
  * WHY A STANDIN NODE: Spark's own `RewriteUpdateTable` runs in the SAME
  * analyzer batch as injected resolution rules but BEFORE them, so by the
  * time an injected rule sees a fully-resolved `UpdateTable` it has
  * already been rewritten into the group-based ReplaceData plan. The
  * hint-resolution batch runs EARLIER (it is where view DDL already
  * rewrites, see [[GraftViewDdlRule]]): [[GraftMorUpdateStandinRule]]
  * swaps `UpdateTable` for [[GraftMorUpdate]] there — but only when the
  * target name resolves to a dv-enabled graft snapshot table, so every
  * other UPDATE in the session is untouched. The standin is a plain
  * UnaryNode whose expressions the analyzer resolves generically;
  * [[GraftMorUpdateRule]] then either executes it as
  * [[GraftMorUpdateCommand]] or — for the shapes the command deliberately
  * does not serve (subqueries in SET/WHERE, nondeterministic expressions,
  * a target that turned out not to be mor-eligible) — converts it BACK to
  * `UpdateTable`, which the next fixed-point iteration hands to Spark's
  * copy-on-write rewrite unchanged.
  *
  * The reference engine is read-only (trino/RecordServiceTransactionHandle
  * .java:17-19); this mirrors the merge-on-read UPDATE of open table
  * formats, re-expressed over Spark DataFrame plans.
  */
case class GraftMorUpdate(table: LogicalPlan, assignments: Seq[Assignment],
    condition: Option[Expression]) extends UnaryNode {
  override def child: LogicalPlan = table
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = childrenResolved &&
    assignments.forall(a => a.key.resolved && a.value.resolved) &&
    condition.forall(_.resolved)
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftMorUpdate =
    copy(table = newChild)
}

/** Hint-batch rule: claim `UPDATE` statements whose (still unresolved)
  * target names a dv-enabled graft snapshot table, before the Resolution
  * batch's built-in `RewriteUpdateTable` can. Anything it cannot cheaply
  * prove eligible stays a plain `UpdateTable`.
  */
case class GraftMorUpdateStandinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def eligible(parts: Seq[String]): Boolean = {
    val cm = spark.sessionState.catalogManager
    val resolved: Option[(AnyRef, Array[String], String)] = parts match {
      case Seq(t) => Some((cm.currentCatalog, cm.currentNamespace, t))
      case _ =>
        val asCatalog =
          try Some(cm.catalog(parts.head)) catch { case _: Exception => None }
        asCatalog match {
          case Some(c) => Some((c, parts.tail.init.toArray, parts.last))
          case None => Some((cm.currentCatalog, parts.init.toArray, parts.last))
        }
    }
    resolved.exists {
      case (g: GraftCatalog, ns, name) => g.morEligible(ns, name)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UpdateTable(target, assignments, condition) =>
      val rel = target.collectFirst { case r: UnresolvedRelation => r }
      if (rel.exists(r => eligible(r.multipartIdentifier)))
        GraftMorUpdate(target, assignments, condition)
      else u
  }
}

/** Resolution-batch rule (runs after governance and the dv read rewrite):
  * a fully-resolved [[GraftMorUpdate]] becomes the runnable merge-on-read
  * command — or falls back to the stock `UpdateTable` for the shapes the
  * command does not serve. Governance's replacing-mutation refusal is
  * replicated here because the standin bypasses the `UpdateTable` match
  * in [[graft.plans.GovernanceRule]].
  */
case class GraftMorUpdateRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def refuseGoverned(rel: DataSourceV2Relation): Unit = {
    val user = graft.plans.Users.current(spark)
    val names = rel.identifier.map(i => (i.namespace() :+ i.name()).mkString("."))
      .toSeq ++ rel.identifier.map(_.name()).toSeq :+ rel.table.name()
    names.find(n => graft.plans.GovernancePolicies.getFor(user, n).isDefined)
      .foreach { name =>
        throw new UnsupportedOperationException(
          s"UPDATE on governed table '$name' is not allowed: a governance " +
            "policy applies to the current user, and a replacing mutation " +
            "through a policy-restricted view would silently destroy the " +
            "rows or values the policy hides. Run the mutation as an " +
            "unrestricted user, or lift the policy first.")
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case m: GraftMorUpdate if m.resolved =>
      val relOpt = m.table.collectFirst { case r: DataSourceV2Relation => r }
      val graftOpt = relOpt.flatMap(r => r.table match {
        case g: GraftTable if g.dvEnabled && g.snapshotted &&
            g.loadedSnap.isDefined && g.tableRoot.isDefined &&
            g.writablePath.isDefined => Some(g)
        case _ => None
      })
      val exprs = m.assignments.map(_.value) ++ m.condition
      val servable = graftOpt.isDefined &&
        !exprs.exists(_.exists(_.isInstanceOf[SubqueryExpression])) &&
        exprs.forall(_.deterministic)
      if (!servable) {
        // back to the stock path: the next fixed-point iteration hands it
        // to RewriteUpdateTable (copy-on-write, which refuses while
        // vectors are live — the resurrection firewall — naming compact
        // as the remedy)
        UpdateTable(m.table, m.assignments, m.condition)
      } else {
        val g = graftOpt.get
        relOpt.foreach(refuseGoverned)
        val fs = new Path(g.tableRoot.get)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val meta = TableMeta.read(fs, new Path(g.tableRoot.get)).getOrElse(
          throw new IllegalStateException(
            s"${g.name()}: dv table lost its metadata sidecar"))
        val sets = m.assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => other.sql
          }
          name.toLowerCase -> a.value
        }
        require(sets.map(_._1).distinct.length == sets.length,
          s"UPDATE ${g.name()}: duplicate assignment targets")
        GraftMorUpdateCommand(g.name(), g.tableRoot.get, meta,
          g.loadedSnap.get, sets, m.condition, g.onWrite)
      }
  }
}

/** The driver-side merge-on-read UPDATE: candidate files from manifest
  * stats (+ blooms), matched LIVE rows with their positions, one new
  * generation of updated rows, one dv union, one atomic manifest commit.
  * The OCC base is the SCAN-time snapshot the analyzer loaded (house
  * rule): a commit landing between load and this commit rebases when
  * disjoint and refuses when overlapping — never silently absorbed.
  */
case class GraftMorUpdateCommand(tableName: String, root: String,
    meta: TableMeta, snap: Snapshots.Snapshot,
    sets: Seq[(String, Expression)], condition: Option[Expression],
    onWrite: () => Unit)
    extends LeafRunnableCommand with PredicateHelper {

  override def run(spark: SparkSession): Seq[Row] = {
    def toCol(e: Expression): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftSqlShims.columnOf(e.transform {
        case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      })
    val v1 = condition.toSeq.flatMap(splitConjunctivePredicates).flatMap(e =>
      org.apache.spark.sql.GraftSqlShims.expressionToV1(e))
    val cond = condition.map(toCol)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val setCols = sets.map { case (n, e) => n -> toCol(e) }.toMap
    DeletionVectors.updateWhere(spark, new Path(root), meta, snap,
      v1, cond, setCols)
    onWrite()
    Seq.empty
  }
}
