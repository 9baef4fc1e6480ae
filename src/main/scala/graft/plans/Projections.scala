package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

/** Projections (reference: src/Parsers/ASTProjectionDeclaration.h,
  * ASTProjectionSelectQuery.h): a table-declared pre-aggregated
  * alternate layout the engine reads INSTEAD of the base data when a
  * query's aggregate matches. ClickHouse keeps projections inside each
  * part and picks them at planning time; the Spark realization is a
  * materialized aggregate TABLE (written by ChDdl.insertSelect with
  * the base data, so they can't drift) plus this optimizer
  * Rule[LogicalPlan], injected through GraftExtensions, that rewrites
  * matching aggregates onto it.
  *
  * A rewrite fires only when it is EXACTLY answer-preserving:
  *  - the child is the bare base relation (attribute-only Projects are
  *    looked through; any Filter/Join/expression blocks the rewrite);
  *  - every grouping expression is a plain column ⊆ the projection's
  *    GROUP BY keys (a strict subset re-aggregates the rollup);
  *  - every aggregate is sum/min/max over a projected column or
  *    count(*), undistinct and unfiltered — re-aggregated as
  *    sum(__sum_c) / min(__min_c) / max(__max_c) / sum(__cnt), cast
  *    back to the original result type.
  * Output attributes keep the original names AND exprIds, so parent
  * operators are untouched. ALTER mutations invalidate the projection
  * (ChDdl.alter drops the registration) — same contract as the
  * reference, where mutations rebuild projections before the part is
  * usable.
  *
  * At 100 TB this is the difference between scanning a fact table and
  * scanning a keys-cardinality summary: the projection table is
  * partition-overwritten alongside the base by the same load, and
  * every matching dashboard-style aggregate never touches the facts.
  */
object ProjectionCatalog {
  /** `sums`/`mins`/`maxs` map base column → summary column (PROJECTION
    * declarations use the `__sum_c` scheme; materialized views carry
    * the user's own aliases). The summary may hold PARTIAL aggregates
    * (one row per insert block per key — the SummingMergeTree-parts
    * analog): the rewrite always re-aggregates, so both layouts serve. */
  final case class Proj(
      baseTable: String, projTable: String, keys: Seq[String],
      sums: Map[String, String], mins: Map[String, String],
      maxs: Map[String, String], countCol: Option[String],
      counts: Map[String, String] = Map.empty)

  private[graft] val byBase =
    scala.collection.concurrent.TrieMap[String, Vector[Proj]]()

  /** A table declares any number of projections (and MV-backed
    * summaries); registration replaces an entry with the same target. */
  def register(p: Proj): Unit = byBase.updateWith(p.baseTable.toLowerCase) {
    case Some(v) => Some(v.filterNot(_.projTable == p.projTable) :+ p)
    case None => Some(Vector(p))
  }
  def invalidate(baseTable: String): Unit = byBase.remove(baseTable.toLowerCase)
  def get(baseTable: String): Vector[Proj] =
    byBase.getOrElse(baseTable.toLowerCase, Vector.empty)
  /** Suspend every registration for a base while `body` runs — used by
    * refresh paths whose own query must read the base, not a summary. */
  def suspended[T](baseTable: String)(body: => T): T = {
    val saved = byBase.remove(baseTable.toLowerCase)
    try body finally saved.foreach(byBase.put(baseTable.toLowerCase, _))
  }
}

case class ProjectionRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      baseTableOf(child).map(ProjectionCatalog.get).getOrElse(Vector.empty)
        .iterator.flatMap(p => tryRewrite(agg, groupings, aggExprs, p))
        .nextOption().getOrElse(agg)
  }

  /** The catalog-table name beneath attribute-only projections, or
    * None if anything else (filter, join, computed column) intervenes. */
  private def baseTableOf(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => lr.catalogTable.map(_.identifier.table.toLowerCase)
    case SubqueryAlias(_, c) => baseTableOf(c)
    case Project(exprs, c) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      baseTableOf(c)
    case _ => None
  }

  private object NoRewrite extends scala.util.control.ControlThrowable

  private def tryRewrite(
      agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      p: ProjectionCatalog.Proj): Option[LogicalPlan] = try {
    // groupings: plain columns within the projection keys
    val groupAttrs = groupings.map {
      case a: AttributeReference if p.keys.contains(a.name) => a
      case _ => throw NoRewrite
    }
    // fresh relation (fresh exprIds per rewrite — no attr conflicts);
    // EliminateSubqueryAliases already ran for the main tree, so strip
    // the alias from the injected subtree too or planning fails on it
    val projPlan = org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
      spark.table(p.projTable).queryExecution.analyzed)
    def pa(name: String): AttributeReference =
      projPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw NoRewrite)

    def reAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(a: AttributeReference, _) if p.sums.contains(a.name) =>
        Some(Sum(pa(p.sums(a.name))).toAggregateExpression())
      case Min(a: AttributeReference) if p.mins.contains(a.name) =>
        Some(Min(pa(p.mins(a.name))).toAggregateExpression())
      case Max(a: AttributeReference) if p.maxs.contains(a.name) =>
        Some(Max(pa(p.maxs(a.name))).toAggregateExpression())
      case Count(Seq(Literal(1, _))) if p.countCol.nonEmpty =>
        Some(Cast(Sum(pa(p.countCol.get)).toAggregateExpression(), LongType))
      case Count(Seq(a: AttributeReference)) if p.counts.contains(a.name) =>
        Some(Cast(Sum(pa(p.counts(a.name))).toAggregateExpression(), LongType))
      // avg(a) = re-summed sum ÷ re-summed NON-NULL count — exact only
      // when the summary carries count(a) itself (count(*) would count
      // a's nulls). Decimal stays un-routed: replicating Average's
      // decimal precision/scale arithmetic post-analysis is not worth
      // a last-digit divergence.
      case Average(a: AttributeReference, _)
          if p.sums.contains(a.name) && p.counts.contains(a.name) &&
            !a.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        Some(Divide(
          Cast(Sum(pa(p.sums(a.name))).toAggregateExpression(),
            org.apache.spark.sql.types.DoubleType),
          Cast(Sum(pa(p.counts(a.name))).toAggregateExpression(),
            org.apache.spark.sql.types.DoubleType)))
      case _ => None
    }

    def rebuild(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.nonEmpty) throw NoRewrite
      reAgg(ae.aggregateFunction) match {
        case Some(re) => Cast(re, ae.dataType)
        case None => throw NoRewrite
      }
    }
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if p.keys.contains(a.name) =>
        Alias(pa(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        Alias(rebuild(ae), name)(exprId = al.exprId)
      // the ubiquitous sum(x).cast(T) shape: look through the cast
      case al @ Alias(c: Cast, name) if c.child.isInstanceOf[AggregateExpression] =>
        val re = rebuild(c.child.asInstanceOf[AggregateExpression])
        Alias(c.withNewChildren(Seq(re)), name)(exprId = al.exprId)
      case _ => throw NoRewrite
    }
    val newGroupings = groupAttrs.map(a => pa(a.name))
    Some(Aggregate(newGroupings, newAggExprs, projPlan))
  } catch {
    case NoRewrite => None
  }
}
