package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Materialized-view routing (SURVEY §4 O4, the optional stretch): a
  * Catalyst Rule that rewrites hourly-rollup-shaped aggregations over
  * the enriched fact table onto the (tiny) precomputed rollup table —
  * the Spark analog of ClickHouse queries hitting engagement_hourly_mv
  * instead of the base MergeTree
  * (/root/reference/sql/clickhouse-init.sql:26–38).
  *
  * Matches:
  *   Aggregate(
  *     grouping ⊆ { date_trunc('hour', event_ts), content_type, event_type },
  *     aggregates ⊆ { count(*), sum(engagement_score) },
  *     scan of `factPath`)
  * and rewrites to a re-aggregation over `rollupPath` (count(*) →
  * sum(cnt), sum(score) → sum(score_sum)) — re-aggregating rather than
  * projecting keeps the rewrite correct even when the MV holds partial
  * rows per group (SummingMergeTree-style), and coarser groupings
  * (e.g. by content_type only) still route.
  *
  * Output attribute ids are preserved so parent operators re-resolve
  * against the rewritten subtree untouched.
  *
  * Install per session:
  *   spark.experimental.extraOptimizations ++= Seq(MvRouting(spark, fact, mv))
  * or for a cluster, inject through SparkSessionExtensions.
  */
case class MvRouting(spark: SparkSession, factPath: String, rollupPath: String)
    extends Rule[LogicalPlan] {

  /** WHITELIST match: the aggregate's child must be the fact relation
    * reachable through ONLY Project/SubqueryAlias nodes. Anything else
    * between the Aggregate and the scan — Filter, Limit, Sample,
    * Generate/explode, Window, a join (even fact-to-fact) — changes the
    * row multiset the aggregate sees, which the collapsed MV cannot
    * answer; a blacklist of known-bad nodes would silently mis-route
    * every node type it forgot. */
  @scala.annotation.tailrec
  private def isFactScan(plan: LogicalPlan): Boolean = plan match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project => isFactScan(p.child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => isFactScan(s.child)
    case LogicalRelation(fsRel: HadoopFsRelation, _, _, _, _) => pathMatches(fsRel)
    case _ => false
  }

  /** Exact/child path equality against factPath (String.contains would
    * also match /data/fact_archive or /data/fact-copy). factPath is
    * qualified against its filesystem first, so a RELATIVE factPath
    * still matches the relation's absolute root paths instead of
    * silently never routing. */
  private def pathMatches(fsRel: HadoopFsRelation): Boolean = {
    val raw = new org.apache.hadoop.fs.Path(factPath)
    val target = raw
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(raw).toUri.getPath
    fsRel.location.rootPaths.exists { p =>
      val rp = p.toUri.getPath
      rp == target || rp.startsWith(target + "/")
    }
  }

  private def rollupPlan(): LogicalPlan =
    spark.read.parquet(rollupPath).queryExecution.analyzed

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).get

  /** Aliased expressions defined by child Projects (the optimizer pulls
    * grouping expressions like date_trunc into a Project below the
    * Aggregate as `_groupingexpression#N`) — resolve through them. */
  private def aliasMap(plan: LogicalPlan): Map[ExprId, Expression] = plan match {
    case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      p.projectList.collect { case a @ Alias(c, _) => a.exprId -> c }.toMap ++
        aliasMap(p.child)
    case _ if plan.children.length == 1 => aliasMap(plan.children.head)
    case _ => Map.empty
  }

  private def resolveThrough(e: Expression, m: Map[ExprId, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if m.contains(a.exprId) => resolveThrough(m(a.exprId), m)
    }

  /** Map a fact-side grouping expression to the rollup column. */
  private def mapGrouping(e: Expression, mv: LogicalPlan): Option[Expression] = e match {
    case TruncTimestamp(StringLiteral("hour"), ts: AttributeReference, _)
        if ts.name == "event_ts" => Some(attr(mv, "hour_ts"))
    case a: AttributeReference if a.name == "content_type" => Some(attr(mv, "content_type"))
    case a: AttributeReference if a.name == "event_type" => Some(attr(mv, "event_type"))
    case _ => None
  }

  /** Map a fact-side aggregate call to its rollup re-aggregation. */
  private def mapAggCall(ae: AggregateExpression, mv: LogicalPlan): Option[Expression] =
    ae.aggregateFunction match {
      case Count(Seq(Literal(1, IntegerType))) if !ae.isDistinct =>
        Some(ae.copy(aggregateFunction = Sum(attr(mv, "cnt"))))
      case Sum(e, _) if !ae.isDistinct && refersToScore(e) =>
        Some(ae.copy(aggregateFunction = Sum(attr(mv, "score_sum"))))
      case _ => None
    }

  private def refersToScore(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "engagement_score"
    case Cast(c, _, _, _) => refersToScore(c)
    case _ => false
  }

  /** Rewrite one named output expression, keeping name + exprId. */
  private def mapNamed(ne: NamedExpression, defs: Map[ExprId, Expression],
      mv: LogicalPlan): Option[NamedExpression] =
    ne match {
      case al @ Alias(child, name) =>
        mapScalar(child, defs, mv).map(m => Alias(m, name)(exprId = al.exprId))
      case a: AttributeReference =>
        mapGrouping(resolveThrough(a, defs), mv)
          .map(m => Alias(m, a.name)(exprId = a.exprId))
      case _ => None
    }

  /** Scalar mapping: grouping refs, aggregate calls, casts above them. */
  private def mapScalar(e: Expression, defs: Map[ExprId, Expression],
      mv: LogicalPlan): Option[Expression] = e match {
    case ae: AggregateExpression => mapAggCall(ae, mv)
    case c @ Cast(child, _, _, _) =>
      mapScalar(child, defs, mv).map(m => c.withNewChildren(Seq(m)))
    case other => mapGrouping(resolveThrough(other, defs), mv)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, hint)
        if isFactScan(child) && groupings.nonEmpty =>
      val mv = rollupPlan()
      val defs = aliasMap(child)
      val mappedG = groupings.map(g => mapGrouping(resolveThrough(g, defs), mv))
      val mappedA = aggExprs.map(a => mapNamed(a, defs, mv))
      if (mappedG.forall(_.isDefined) && mappedA.forall(_.isDefined)) {
        logInfo(s"MvRouting: rewriting hourly aggregate onto $rollupPath")
        Aggregate(mappedG.map(_.get), mappedA.map(_.get), mv, hint)
      } else agg
  }
}

/** Extractor for string literals (UTF8String-backed). */
private object StringLiteral {
  def unapply(e: Expression): Option[String] = e match {
    case Literal(s, StringType) if s != null => Some(s.toString)
    case _ => None
  }
}
