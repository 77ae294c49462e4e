package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CreateStruct,
  Descending, EqualTo, Expression, GetStructField, LessThan, LessThanOrEqual,
  Literal, NamedExpression, PredicateHelper, RowNumber, SortOrder,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** The second justified piece of custom Catalyst work (SURVEY.md §4.3,
  * next to [[ApproxSimJoinRewrite]]): rewrite the universal
  * "latest row per key" idiom —
  *
  *   row_number() OVER (PARTITION BY k ORDER BY version DESC) AS latest_rn
  *   ... WHERE latest_rn = 1
  *
  * — into a `max_by(struct(payload), version)` hash aggregate. The window
  * form SORTS every partition (a full shuffle + per-partition sort, state
  * O(partition)); the aggregate form is partially aggregable map-side, so
  * at 100 TB each executor reduces its input to one row per key BEFORE
  * the shuffle — the difference between shuffling the corpus and
  * shuffling the distinct key set. This is the plan `agg_latest_by_version`
  * hand-writes; the rule packages it so the window spelling users
  * naturally write (and Spark's own InferWindowGroupLimit only bounds,
  * never collapses) gets the aggregate plan automatically.
  *
  * The rule fires ONLY when the row_number column is named `latest_rn`
  * (the documented marker, [[LatestByVersionRewrite.MarkerName]]) — the
  * same opt-in pattern as `cosine_sim_approx`: rewriting every rank-1
  * filter would also rewrite the queries that exist to demonstrate the
  * Window operator itself. Semantic guards, each required for exact
  * equivalence:
  *   - single DESC ordering key, and it is NON-NULLABLE: with an
  *     all-null ordering group, row_number still emits a row while
  *     max_by would emit null — nullable keys are left untouched;
  *   - ties: with a non-unique ordering key BOTH forms return an
  *     arbitrary row of the tie (Spark's sort is not stable), so the
  *     contract is unchanged;
  *   - extra filter conjuncts are re-applied above the aggregate —
  *     equivalent, because they were evaluated on the rank-1 row anyway.
  */
object LatestByVersionRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Marker alias for the row_number column that opts into the rewrite. */
  val MarkerName = "latest_rn"

  private def isRankOne(e: Expression, rn: Attribute): Boolean = e match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, _)) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(f, cond, w).getOrElse(f)
  }

  private def rewrite(f: Filter, cond: Expression,
      w: Window): Option[LogicalPlan] = w.windowExpressions match {
    case Seq(al @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(ps, Seq(SortOrder(orderKey, Descending, _, _)), _)),
        MarkerName)) =>
      val rn = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankConds, rest) = conjuncts.partition(isRankOne(_, rn))
      // InferWindowGroupLimit (a main-batch rule that runs before user
      // rules) may already have inserted its rank-1 pre-filter below the
      // window; it exists only to serve this window, and the aggregate
      // subsumes it — unwrap, or its per-partition SORT survives and
      // defeats the point of the rewrite
      val child = w.child match {
        case WindowGroupLimit(gps, gos, _, limit, inner)
            if limit >= 1 && gps == ps &&
              gos.headOption.exists(_.child.semanticEquals(orderKey)) => inner
        case c => c
      }
      val payload = child.output.filterNot(a => ps.exists(_.semanticEquals(a)))
      val groupKeys = ps.collect { case a: Attribute => a }
      if (rankConds.isEmpty || rest.exists(_.references.contains(rn)) ||
        orderKey.nullable || groupKeys.size != ps.size || ps.isEmpty ||
        payload.isEmpty || !orderKey.references.subsetOf(child.outputSet))
        return None
      val latest = Alias(
        MaxBy(CreateStruct(payload), orderKey).toAggregateExpression(),
        "graft_latest")()
      val agg = Aggregate(groupKeys, (groupKeys: Seq[NamedExpression]) :+ latest, child)
      // restore the window's exact output schema (ids and order), so
      // everything above the filter resolves unchanged; rn is the
      // constant 1 the surviving row had by construction
      val restored = Project(
        w.output.map { a =>
          if (a.semanticEquals(rn)) Alias(Literal(1), MarkerName)(exprId = a.exprId)
          else if (groupKeys.exists(_.semanticEquals(a))) a
          else Alias(GetStructField(latest.toAttribute, payload.indexWhere(_.semanticEquals(a)),
            Some(a.name)), a.name)(exprId = a.exprId)
        }, agg)
      Some(if (rest.isEmpty) restored
        else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And),
          restored))
    case _ => None
  }

  /** Idempotently install on a live session (same pattern as
    * [[ApproxSimJoinRewrite.install]]; production users register
    * [[GraftExtensions]] via `spark.sql.extensions`). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
