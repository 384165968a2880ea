package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Transparent COUNT(DISTINCT) acceleration — the optimizer-rule
  * rung of the bitmap family: when a session declares a dense-id
  * column (`spark.graft.bitmap.countDistinct=<fileSuffix>:<col>:
  * <maxId>`), every `COUNT(DISTINCT col)` aggregate over that
  * relation is rewritten at OPTIMIZATION time to the native
  * [[graft.functions.BitmapDistinctAgg]] — the query text does not
  * change, the ANSWER does not change (both are exact), but the
  * plan stops shuffling every distinct (group, id) pair and ships
  * one bitmap per (group, partition) instead. This is the
  * ClickHouse/Doris pattern of declaring a column `groupBitmap`-able
  * in the TABLE and letting every query benefit, expressed as a
  * `Rule[LogicalPlan]` (same splice discipline as [[SummaryRewrite]]:
  * exprIds preserved, parents never re-resolve).
  *
  * Safety: the rewrite changes the PLAN, never the contract — an id
  * outside the declared domain fails LOUDLY at runtime (the
  * aggregate's own check), so a mis-declared domain can never return
  * a silently wrong count. The relation gate (file suffix) keeps
  * same-named columns of other tables untouched.
  */
case class BitmapCountRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  val confKey = "spark.graft.bitmap.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = session.conf.getOption(confKey).filter(_.nonEmpty)
    if (conf.isEmpty) return plan
    val parts = conf.get.split(":")
    if (parts.length != 3) return plan
    val (suffix, colName, maxId) = (parts(0), parts(1), parts(2).toLong)
    plan.transform {
      case agg: Aggregate if relationMatches(agg.child, suffix) =>
        var changed = false
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case ae @ AggregateExpression(
                Count(Seq(a: AttributeReference)), _, true, _, _)
                if a.name == colName &&
                  (a.dataType == LongType || a.dataType == IntegerType) =>
              changed = true
              ae.copy(
                aggregateFunction =
                  graft.functions.BitmapDistinctAgg(a, Literal(maxId)),
                isDistinct = false)
          }.asInstanceOf[NamedExpression]
        }
        if (changed) agg.copy(aggregateExpressions = rewritten) else agg
    }
  }

  /** Walk through the Project/Filter stack the optimizer leaves
    * between the aggregate and its scan.
    */
  private def relationMatches(p: LogicalPlan, suffix: String): Boolean =
    p match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.exists(_.toString.endsWith(suffix))
      case Project(_, child) => relationMatches(child, suffix)
      case Filter(_, child) => relationMatches(child, suffix)
      case _ => false
    }
}
