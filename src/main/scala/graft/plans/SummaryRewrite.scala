package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, ExprId, IntegralDivide, Literal, MicrosToTimestamp, NamedExpression, TruncDate, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, DecimalType, StringType}

/** Materialized-view rewrite — the serving-layer trick that makes a
  * precomputed DWS table transparent: when a session registers a
  * summary (`spark.graft.mv.eventsDaily=<path>`), any plan containing
  * the canonical daily-traffic aggregate
  *
  *   events.groupBy(ts::date AS day, event_type)
  *         .agg(count(*) AS pv_ct, sum(value::decimal) AS value_sum)
  *
  * is rewritten at OPTIMIZATION time to scan the summary parquet
  * instead of the raw fact table. The match is structural and
  * optimizer-robust: it recognizes the aggregate after the
  * timestamp-conversion Project collapses in, after grouping
  * expressions hoist into `_groupingexpression` aliases, after a
  * parent cast folds into an aggregate output, and after column
  * pruning drops outputs the parent doesn't need — each surviving
  * output is verified against its EXACT canonical body (a same-named
  * but different expression never splices). Parents keep working
  * because the replacement Project aliases summary columns to the
  * original output exprIds.
  *
  * This is the minimal honest core of what Calcite/Doris do with
  * view containment. Residual-predicate containment (a grouping-key
  * filter pushed BELOW the aggregate changes the matched shape) and
  * roll-up containment (coarser grains served by re-aggregating the
  * summary) are the documented next steps and compose on top of the
  * same splice. At 100 TB this is the difference between a dashboard
  * hitting a day-grain table and re-scanning the event log.
  *
  * Safety: a wrong rewrite is a wrong ANSWER, so every check must
  * pass — including that each summary column carries the aggregate's
  * pre-cast type (schema drift vetoes the splice).
  */
case class SummaryRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  val confKey = "spark.graft.mv.eventsDaily"
  private val canonicalCols = Set("day", "event_type", "pv_ct", "value_sum")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val path = session.conf.getOption(confKey).filter(_.nonEmpty)
    if (path.isEmpty) return plan
    plan.transform {
      case agg: Aggregate if matchesCanonicalShape(agg) =>
        splice(path.get, agg).getOrElse(agg)
      case agg: Aggregate if matchesMonthlyShape(agg) =>
        spliceRollup(path.get, agg).getOrElse(agg)
    }
  }

  private def isEventsRelation(p: LogicalPlan): Boolean = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.exists(_.toString.endsWith("events.parquet"))
    case Project(_, child) => isEventsRelation(child)
    case _ => false
  }

  /** One-hop resolution through the child Project the optimizer
    * creates when it hoists grouping expressions / inlines the
    * timestamp conversion.
    */
  private def childResolver(agg: Aggregate): Expression => Expression = {
    val defs: Map[ExprId, Expression] = agg.child match {
      case Project(projList, _) =>
        projList.collect { case al: Alias => al.exprId -> al.child }.toMap
      case _ => Map.empty
    }
    (e: Expression) => e match {
      case a: AttributeReference => defs.getOrElse(a.exprId, a)
      case other => other
    }
  }

  /** Structural canonical-body checks. Reference-name scans are NOT
    * enough — `cast(ts + interval 1 day as date)` references only
    * `ts` and is DateType, but is a different query. Each body must
    * BE the canonical tree (modulo exprIds): the cast/trunc child is
    * the bare column attribute, nothing else.
    */
  private def isDayExpr(e: Expression): Boolean = e match {
    case Cast(t, DateType, _, _) => isTsExpr(t)
    case _ => false
  }

  /** The bare `ts` column under ANY of the loader's normalization
    * shapes ([[graft.sources.Tables.normalizeTs]]): the timestamp
    * attribute itself, the NTZ→session-zone cast (`cast(ts as
    * timestamp)` over a TIMESTAMP_NTZ scan — the session is pinned
    * UTC, so the instant and the extracted day are unchanged), or
    * the legacy epoch-nanos conversion
    * (`timestamp_micros(ts DIV 1000)`) after the conversion Project
    * collapses inline. Exactly these trees — any arithmetic on top
    * (`ts + interval 1 day`) is a different query.
    */
  private def isTsExpr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "ts"
    case Cast(a: AttributeReference,
        org.apache.spark.sql.types.TimestampType, _, _)
        if a.dataType == org.apache.spark.sql.types.TimestampNTZType =>
      a.name == "ts"
    case m: MicrosToTimestamp => m.child match {
      case d: IntegralDivide => (d.left match {
        case a: AttributeReference => a.name == "ts"
        case _ => false
      }) && (d.right match {
        case Literal(v, _) => v != null && v.toString == "1000"
        case _ => false
      })
      case _ => false
    }
    case _ => false
  }

  private def isEventTypeExpr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == "event_type"
    case _ => false
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, _, _, _) => inner
    case other => other
  }

  /** Canonical `count(*)` / `count(lit)`: a single non-null foldable
    * literal child, no DISTINCT, no FILTER. `count(null)` (always 0)
    * and `count(DISTINCT …)` must NOT be served from pv_ct.
    */
  private def isCanonicalCount(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case c: Count => c.children match {
        case Seq(Literal(v, _)) => v != null
        case _ => false
      }
      case _ => false
    })

  /** Canonical `sum(cast(value as decimal(12,2)))`: the Sum child —
    * resolved one hop through a hoisting child Project — must be
    * exactly that cast over the bare `value` attribute.
    * `sum(-cast(value …))` has the same references and result type
    * but is a different aggregate; structural match rejects it.
    */
  private def isCanonicalSum(resolve: Expression => Expression)(
      ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case sm: Sum => resolve(sm.child) match {
        case Cast(a: AttributeReference, d: DecimalType, _, _) =>
          a.name == "value" && d.precision == 12 && d.scale == 2
        case _ => false
      }
      case _ => false
    })

  /** Classify an aggregate output against its canonical definition:
    * returns the summary column it may be served from, or None.
    * One Cast wrapper is tolerated (a collapsed-in parent cast —
    * re-applied to the summary column at splice time).
    */
  private def roleOf(resolve: Expression => Expression)(
      o: NamedExpression): Option[String] = {
    val body = o match {
      case Alias(inner, _) => inner
      case a: AttributeReference => a
    }
    stripCast(body) match {
      case ae: AggregateExpression =>
        if (isCanonicalCount(ae) && o.name == "pv_ct") Some("pv_ct")
        else if (isCanonicalSum(resolve)(ae) && o.name == "value_sum")
          Some("value_sum")
        else None
      case other => resolve(other) match {
        case d if isDayExpr(d) && o.name == "day" => Some("day")
        case t if isEventTypeExpr(t) && o.name == "event_type" =>
          Some("event_type")
        case _ => None
      }
    }
  }

  /** The canonical GRAIN (judged from grouping expressions — column
    * pruning can drop outputs but never grouping keys) plus every
    * surviving output matching its canonical body.
    */
  private def matchesCanonicalShape(agg: Aggregate): Boolean = {
    if (!isEventsRelation(agg.child)) return false
    val resolve = childResolver(agg)
    val grouping = agg.groupingExpressions.map(resolve)
    agg.groupingExpressions.length == 2 &&
      grouping.exists(isDayExpr) && grouping.exists(isEventTypeExpr) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(o =>
        roleOf(resolve)(o).exists(canonicalCols.contains))
  }

  // ----- roll-up containment: monthly grain served by the daily MV

  /** month-of-ts: cast(date_trunc('month', ts) as date) — the trunc
    * operand must be the bare `ts` attribute (structural, see
    * [[isDayExpr]]).
    */
  private def isMonthExpr(e: Expression): Boolean = e match {
    case Cast(t: TruncTimestamp, DateType, _, _) =>
      (t.format match {
        case Literal(s, StringType) =>
          s != null && s.toString.equalsIgnoreCase("month")
        case _ => false
      }) && isTsExpr(t.timestamp)
    case _ => false
  }

  private def roleOfMonthly(resolve: Expression => Expression)(
      o: NamedExpression): Option[String] = {
    val body = o match {
      case Alias(inner, _) => inner
      case a: AttributeReference => a
    }
    stripCast(body) match {
      case ae: AggregateExpression =>
        if (isCanonicalCount(ae) && o.name == "pv_ct") Some("pv_ct")
        else if (isCanonicalSum(resolve)(ae) && o.name == "value_sum")
          Some("value_sum")
        else None
      case other => resolve(other) match {
        case m if isMonthExpr(m) && o.name == "month" => Some("month")
        case t if isEventTypeExpr(t) && o.name == "event_type" =>
          Some("event_type")
        case _ => None
      }
    }
  }

  /** The COARSER canonical grain: (month-of-ts, event_type) with the
    * same aggregate bodies — servable by RE-AGGREGATING the daily
    * summary because count and sum are decomposable (count rolls up
    * as sum of partial counts).
    */
  private def matchesMonthlyShape(agg: Aggregate): Boolean = {
    if (!isEventsRelation(agg.child)) return false
    val resolve = childResolver(agg)
    val grouping = agg.groupingExpressions.map(resolve)
    agg.groupingExpressions.length == 2 &&
      grouping.exists(isMonthExpr) && grouping.exists(isEventTypeExpr) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(o => roleOfMonthly(resolve)(o).isDefined)
  }

  /** Monthly splice: Aggregate(trunc(day,'month'), event_type) over
    * the summary, partial counts SUMMED, sums re-summed and cast back
    * to the original decimal type so parents see identical schema.
    */
  private def spliceRollup(path: String, agg: Aggregate)
      : Option[LogicalPlan] =
    try {
      val resolve = childResolver(agg)
      val summary = session.read.parquet(path).queryExecution.analyzed
      val byName = summary.output.map(a => a.name -> a).toMap
      if (!canonicalCols.forall(byName.contains)) return None
      val monthOfDay = TruncDate(byName("day"), Literal("month"))
      def reSum(src: Expression): Expression =
        AggregateExpression(Sum(src), Complete, isDistinct = false)
      val outs: Seq[NamedExpression] = agg.aggregateExpressions.map { o =>
        val role = roleOfMonthly(resolve)(o).getOrElse(return None)
        val preCast = o match {
          case Alias(Cast(inner, _, _, _), _) => inner.dataType
          case other => other.dataType
        }
        val body: Expression = role match {
          case "month" =>
            if (monthOfDay.dataType != preCast) return None
            monthOfDay
          case "event_type" =>
            if (byName("event_type").dataType != preCast) return None
            byName("event_type")
          case "pv_ct" =>
            val b = reSum(byName("pv_ct"))
            if (b.dataType != preCast) return None
            b
          case "value_sum" =>
            // Re-summing widens the decimal; cast back to the
            // original Sum result type so parents see identical
            // schema. Only a pure precision-narrowing at the SAME
            // scale is allowed: then overflow behavior is identical
            // to the un-rewritten plan — the original Sum nulls
            // (non-ANSI) / errors (ANSI) exactly when the true total
            // exceeds its result precision, and so does this cast.
            // Anything else (scale change, non-decimal) vetoes.
            val b = reSum(byName("value_sum"))
            (b.dataType, preCast) match {
              case (w: DecimalType, p: DecimalType)
                  if w.scale == p.scale && w.precision >= p.precision =>
                Cast(b, preCast)
              case _ => return None
            }
        }
        val cast = if (body.dataType == o.dataType) body
          else Cast(body, o.dataType)
        Alias(cast, o.name)(exprId = o.exprId)
      }
      logInfo(s"graft MV rewrite (roll-up): monthly aggregate -> $path")
      Some(Aggregate(Seq(monthOfDay, byName("event_type")), outs, summary))
    } catch { case _: Exception => None }

  /** Replace the aggregate with a Project over the summary relation,
    * aliased to the aggregate's own output exprIds (parents stay
    * resolved). None if the summary is unreadable or drifted.
    */
  private def splice(path: String, agg: Aggregate): Option[LogicalPlan] =
    try {
      val resolve = childResolver(agg)
      val summary = session.read.parquet(path).queryExecution.analyzed
      val byName = summary.output.map(a => a.name -> a).toMap
      if (!canonicalCols.forall(byName.contains)) return None
      val out = agg.aggregateExpressions.map { o =>
        val role = roleOf(resolve)(o).getOrElse(return None)
        val src = byName(role)
        val preCast = o match {
          case Alias(Cast(inner, _, _, _), _) => inner.dataType
          case other => other.dataType
        }
        if (src.dataType != preCast) return None
        val body = if (src.dataType == o.dataType) src
          else Cast(src, o.dataType)
        Alias(body, o.name)(exprId = o.exprId)
      }
      logInfo(s"graft MV rewrite: daily-traffic aggregate -> $path")
      Some(Project(out, summary))
    } catch { case _: Exception => None }
}
