package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.functions.{col, expr}

/** Row/column governance — the one genuinely novel analyzer piece (SURVEY.md §2.12
  * X4). The reference delegates policy to its planner: columns without access are
  * silently dropped from the schema (reference:
  * trino/RecordServiceMetadata.java:803-804) and row filters / masks are applied
  * server-side before data reaches the engine. Spark-native equivalent: rewrite the
  * logical plan at resolution time, so masks/filters sit BELOW every consumer and
  * Catalyst pushes the injected Filter into the scan like any other predicate.
  */
case class ColumnMask(column: String, maskSql: String)

case class TablePolicy(
    dropColumns: Seq[String] = Nil,
    masks: Seq[ColumnMask] = Nil,
    rowFilterSql: Option[String] = None)

/** Process-wide policy registry keyed by table/view name (lower-cased). */
object GovernancePolicies {
  private val policies = TrieMap.empty[String, TablePolicy]
  def register(table: String, p: TablePolicy): Unit = policies.put(table.toLowerCase, p)
  def clear(): Unit = policies.clear()
  def get(table: String): Option[TablePolicy] = policies.get(table.toLowerCase)
}

object Governance {
  /** DataFrame-level application (composition API — usable without extensions). */
  def secure(df: DataFrame, p: TablePolicy): DataFrame = {
    val filtered = p.rowFilterSql.map(df.filter).getOrElse(df)
    val dropped = p.dropColumns.map(_.toLowerCase).toSet
    val masks = p.masks.map(m => m.column.toLowerCase -> m.maskSql).toMap
    val cols = filtered.columns.filterNot(c => dropped(c.toLowerCase)).map { c =>
      masks.get(c.toLowerCase).map(m => expr(m).as(c)).getOrElse(col(c))
    }
    filtered.select(cols.toIndexedSeq: _*)
  }
}

/** Analyzer rule: rewrites any resolved SubqueryAlias whose name has a registered
  * policy into Project(masked cols, Filter(rowFilter, relation)). Runs in the
  * resolution batch (fixed point), so the unresolved mask/filter expressions we
  * inject are resolved by the normal analyzer rules right after. A TreeNodeTag
  * guards against re-application.
  */
case class GovernanceRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private val tag = TreeNodeTag[Boolean]("graft.governed")

  private def parse(sql: String): Expression =
    spark.sessionState.sqlParser.parseExpression(sql)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case sa: SubqueryAlias if sa.resolved &&
        sa.getTagValue(tag).isEmpty &&
        GovernancePolicies.get(sa.alias).isDefined =>
      sa.setTagValue(tag, true)
      val p = GovernancePolicies.get(sa.alias).get
      val filtered: LogicalPlan =
        p.rowFilterSql.map(f => Filter(parse(f), sa): LogicalPlan).getOrElse(sa)
      val dropped = p.dropColumns.map(_.toLowerCase).toSet
      val masks = p.masks.map(m => m.column.toLowerCase -> m.maskSql).toMap
      val projList = sa.output
        .filterNot(a => dropped(a.name.toLowerCase))
        .map { a =>
          masks.get(a.name.toLowerCase) match {
            case Some(m) => Alias(parse(m), a.name)()
            case None => a
          }
        }
      Project(projList, filtered)
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(GovernanceRule(_))
  }
}
