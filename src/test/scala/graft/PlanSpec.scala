package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB design contract
  * (SURVEY.md §4): pushdown reaches the scan, small dims broadcast,
  * pairwise ops never plan an unblocked cartesian product.
  */
class PlanSpec extends SparkTestBase {

  private def physical(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("projection+filter pushdown reaches the parquet scan") {
    val plan = physical("scan_projection_pushdown")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"no pushed filter in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"scan reads more columns than projected:\n$plan")
  }

  test("small-dim join broadcasts") {
    val plan = physical("join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("brute-force topk broadcasts the query side, not the corpus") {
    val plan = physical("llm_sim_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unbounded cartesian:\n$plan")
  }

  test("LSH bucket join is an equi join (no cartesian, no nested loop)") {
    val plan = physical("llm_sim_lsh_topk")
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH path:\n$plan")
  }

  test("cosine_sim participates in whole-stage codegen") {
    import graft.functions.VectorOps
    VectorOps.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val df = e.select(expr("cosine_sim(v, v)").as("c")).filter(col("c") > 0.99)
    val plan = df.queryExecution.executedPlan.toString
    // Spark 4.1 renders codegen'd stages as "*(n)" operator prefixes in
    // executedPlan.toString (the literal "WholeStageCodegen" only appears
    // in the formatted explain), so assert on the prefix.
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen span:\n$plan")
    assert(df.count() > 0) // self-cosine == 1.0
  }

  test("interval self-join plans as an equi join on user with range residual") {
    val plan = physical("join_self_interval")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"range join lost its equi conjunct:\n$plan")
  }

  test("partitioned sink read-back prunes to the filtered partition") {
    val plan = physical("sink_partitioned_pruning")
    // attribute refs render with expr ids (event_type#1234 = purchase)
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*= purchase\\)".r.findFirstIn(plan).isDefined,
      s"scan did not prune partitions:\n$plan")
  }

  test("salted skew join stays a shuffle join on (key, salt)") {
    val plan = physical("join_skew_salted")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"salted join collapsed to broadcast — demo would be vacuous:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("bucketed co-located join has zero shuffle exchanges on its inputs") {
    val plan = physical("join_bucketed_colocated")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles an input:\n$plan")
  }

  test("IVF probe path joins on cell; only the 16-centroid dim is non-equi") {
    val plan = physical("llm_sim_ivf_topk")
    assert(!plan.contains("CartesianProduct"),
      s"unbounded cartesian in IVF path:\n$plan")
  }

  test("windowFunnel anchors join on user with range residuals, no cartesian") {
    val plan = physical("agg_window_funnel")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel chain lost its user_id equi conjunct:\n$plan")
  }

  test("aggregation is partial (map-side) before the shuffle") {
    val plan = physical("agg_hash_groupby")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"no partial aggregation:\n$plan")
  }
}
