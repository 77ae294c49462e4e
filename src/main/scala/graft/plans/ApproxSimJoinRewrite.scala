package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, EqualTo, Expression,
  GetArrayItem, GreaterThan, GreaterThanOrEqual, If, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY.md §4.3's one justified piece of custom Catalyst work: an
  * optimizer rule that rewrites an EXPLICITLY APPROXIMATE similarity
  * self-join — written naively as a cross join filtered on
  * `cosine_sim_approx(a, b) >= t` — into the sign-bucket LSH equi-join
  * shape (bucket both sides on the sign pattern of the first
  * [[ApproxSimJoinRewrite.NumBits]] dimensions, hash-join on the bucket,
  * confirm with the exact cosine).
  *
  * The rule fires ONLY on the `cosine_sim_approx` marker. That marker's
  * documented contract is "approximate join predicate: the engine may
  * prune candidate pairs that no LSH bucket co-locates" — which is what
  * makes the rewrite legal. Exact `cosine_sim` predicates are never
  * touched: silently dropping candidates from an exact join would be a
  * wrong-results bug, not an optimization.
  *
  * Why this is worth a custom rule at all: the naive form is what users
  * naturally write, and at 100 TB the difference is a cartesian product
  * (O(n²) pairs materialized through a BroadcastNestedLoopJoin) versus a
  * shuffled hash join on a bucket key (candidates bounded by bucket
  * co-occupancy). The rewrite is the manual pattern used by
  * `llm_dedup_embed_cosine` / `llm_sim_lsh_topk`, packaged as a planner
  * concern so query authors don't have to know it.
  */
object ApproxSimJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Bucket width: sign bits of the first 8 dimensions (mirrors the
    * manual `signBucket` used by the LLM operators). */
  val NumBits = 8

  private val BucketCol = "graft_lsh_bucket"

  /** sum_j (v[j] > 0 ? 1 << j : 0) over the first NumBits dims. */
  private def bucket(v: Expression): Expression =
    (0 until NumBits).map { j =>
      If(GreaterThan(GetArrayItem(v, Literal(j)), Literal(0.0)),
        Literal(1 << j), Literal(0)): Expression
    }.reduce((a, b) => Add(a, b))

  /** The marker conjunct: cosine_sim_approx(a, b) >= t (or > t). */
  private def approxPred(e: Expression): Option[CosineSim] = e match {
    case GreaterThanOrEqual(c: CosineSim, Literal(_, _)) if c.approx => Some(c)
    case GreaterThan(c: CosineSim, Literal(_, _)) if c.approx => Some(c)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // after PushPredicateThroughJoin the naive filter usually lives in
    // the join condition itself…
    case j @ Join(l, r, Inner | Cross, Some(cond), _)
        if splitConjunctivePredicates(cond).exists(approxPred(_).isDefined) =>
      val c = splitConjunctivePredicates(cond).flatMap(approxPred).head
      rewrite(l, r, cond, c).getOrElse(j)
    // …but match the un-pushed Filter-over-cross-join shape too
    case f @ Filter(cond, Join(l, r, Inner | Cross, None, _))
        if splitConjunctivePredicates(cond).exists(approxPred(_).isDefined) =>
      val c = splitConjunctivePredicates(cond).flatMap(approxPred).head
      rewrite(l, r, cond, c).getOrElse(f)
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan, fullCond: Expression,
      c: CosineSim): Option[LogicalPlan] = {
    // re-entry guard: an already-rewritten join carries the bucket
    // column — rewriting again would stack bucket layers forever
    if ((l.output ++ r.output).exists(_.name == BucketCol)) return None
    // the vector args must separate cleanly across the two sides
    val (a, b) =
      if (c.left.references.subsetOf(l.outputSet) &&
          c.right.references.subsetOf(r.outputSet)) (c.left, c.right)
      else if (c.right.references.subsetOf(l.outputSet) &&
          c.left.references.subsetOf(r.outputSet)) (c.right, c.left)
      else return None
    val bl = Alias(bucket(a), BucketCol)()
    val br = Alias(bucket(b), BucketCol)()
    val joined = Join(
      Project(l.output :+ bl, l), Project(r.output :+ br, r),
      Inner, Some(EqualTo(bl.toAttribute, br.toAttribute)), JoinHint.NONE)
    // every original conjunct (incl. the exact-cosine confirm the marker
    // evaluates to) is re-checked above the candidate join; the final
    // Project restores the original inner-join schema (drops buckets)
    Some(Project(l.output ++ r.output, Filter(fullCond, joined)))
  }

  /** Idempotently install the rule + marker function on a live session
    * (the harness builds its sessions before extensions can be named in
    * conf; production users pass [[GraftExtensions]] via
    * `spark.sql.extensions` instead). */
  def install(spark: SparkSession): Unit = {
    graft.functions.VectorOps.register(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the production
  * registration path for the rewrite rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxSimJoinRewrite)
    e.injectOptimizerRule(_ => LatestByVersionRewrite)
  }
}
