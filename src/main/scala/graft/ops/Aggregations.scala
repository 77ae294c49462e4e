package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2, D4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType, LongType, StringType}

/** SURVEY.md §2.4 — aggregations.
  *
  * All money/quantity sums run in DECIMAL (exact, engine-portable); partial
  * (map-side) aggregation is automatic for every groupBy here. A8 is the
  * reference's core semantic: ReplacingMergeTree latest-row-wins collapse.
  */
object Aggregations {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1: TPC-H Q1-shaped hash aggregate.
    "agg_hash_groupby" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast(D2).cast(DoubleType).as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast(D2).cast(DoubleType).as("sum_price"),
          sum((dec2(col("l_extendedprice")) * (lit(1).cast(D2) - dec2(col("l_discount"))))
            .cast(D4)).cast(D4).cast(DoubleType).as("sum_disc_price"),
          min(dec2(col("l_quantity"))).cast(DoubleType).as("min_qty"),
          max(dec2(col("l_quantity"))).cast(DoubleType).as("max_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // A2: exact distinct counts (PK-uniqueness checks in the reference).
    "agg_count_distinct" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey")).as("nd_order"))
        .orderBy(col("l_returnflag"))),

    // A3: HLL approximate distinct — non-oracle (approximate); the spec
    // asserts relative error vs exact instead.
    "agg_approx_distinct" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))),

    // A4: grouping sets (SQL form; sentinel-coalesced for a total order).
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                  coalesce(l_linestatus, 'ALL') AS ls,
                  count(*) AS n,
                  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                       AS DOUBLE) AS sum_qty
           FROM gs_lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
           ORDER BY rf, ls""")
    }),

    // A5: rollup region -> nation over the dim hierarchy.
    "agg_rollup" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer")
      val n = Tables.t(s, dir, "nation")
      val r = Tables.t(s, dir, "region")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(dec2(col("c_acctbal"))).cast(D2).cast(DoubleType).as("bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("bal"))
        .orderBy(col("region"), col("nation"))
    }),

    // A6: cube over two lineitem dimensions.
    "agg_cube" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
        .orderBy(col("rf"), col("ls"))),

    // A7: deterministic collect_list / collect_set (sorted). Arrays are
    // projected to comma-joined strings: the driver's comparator cannot
    // sort rows containing array cells, and the string form hashes fine.
    "agg_collect_sorted" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .groupBy(col("o_custkey"))
        .agg(
          sort_array(collect_list(col("o_orderkey"))).as("ok_arr"),
          sort_array(collect_set(col("o_orderstatus"))).as("st_arr"))
        .select(col("o_custkey"),
          expr("concat_ws(',', transform(ok_arr, x -> CAST(x AS STRING)))")
            .as("order_keys"),
          concat_ws(",", col("st_arr")).as("statuses"))
        .orderBy(col("o_custkey"))),

    // A8: THE core CDC collapse — latest row per key by strictly-monotone
    // seq, deletes dropped (ReplacingMergeTree emulation).
    "agg_latest_by_version" -> ((s, dir) => {
      val log = Tables.cdcLog(s, dir)
      log.groupBy(col("okey"))
        .agg(max_by(struct(col("op"), col("price"), col("status"), col("ts")),
          col("seq")).as("last"))
        .select(col("okey"), col("last.op").as("op"), col("last.price").as("price"),
          col("last.status").as("status"), col("last.ts").as("ts"))
        .filter(col("op") =!= "D")
        .orderBy(col("okey"))
    }),

    // A9: conditional/filtered aggregation.
    "agg_filtered_conditional" -> ((s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("user_bucket"))
        .agg(
          count_if(col("value") > 10).as("n_high"),
          sum(when(col("event_type") === "purchase", dec2(col("value")))
            .otherwise(lit(0).cast(D2))).cast(D2).cast(DoubleType).as("purchase_value"),
          count(when(col("event_type") === "error", lit(1))).as("n_error"))
        .orderBy(col("user_bucket"))),

    // A11: CollapsingMergeTree sign-collapse (SURVEY §1.1/§3.1): each change
    // becomes ±1 sign rows — an Update/Delete emits -1 for the row it
    // replaces (the lag() before-image), Insert/Update emits +1 for the new
    // row. Grouping by (key, value columns) and summing the sign cancels
    // every superseded version; surviving sign_sum=+1 rows ARE the latest
    // state (deleted keys cancel to nothing). Scale shape: one window over
    // the per-key log + one hash aggregate — both shuffle on okey only.
    "agg_sign_collapse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("okey")).orderBy(asc("seq"))
      val log = Tables.cdcLog(s, dir)
        .withColumn("prev_price", lag(col("price"), 1).over(w))
        .withColumn("prev_status", lag(col("status"), 1).over(w))
        .withColumn("has_prev", lag(col("op"), 1).over(w).isNotNull)
      // ONE windowed pass, both signs exploded from it (optimization
      // round 21, guide §2.4): the original union of two filtered
      // branches evaluated the whole scan + window shuffle + sort
      // TWICE — Spark does not share a subtree across union arms. Each
      // event emits its +1 row (I/U) and its −1 row for the image it
      // displaces (U/D with a predecessor) from the same windowed row;
      // identical multiset of (okey, price, status, sign), same oracle.
      log.select(explode(array(
          when(col("op").isin("I", "U"), struct(
            col("okey"), col("price"), col("status"),
            lit(1L).as("sign"))),
          when(col("op").isin("U", "D") && col("has_prev"), struct(
            col("okey"), col("prev_price").as("price"),
            col("prev_status").as("status"),
            lit(-1L).as("sign"))))).as("se"))
        .filter(col("se").isNotNull)
        .select(col("se.*"))
        .groupBy(col("okey"), col("price"), col("status"))
        .agg(sum(col("sign")).as("sign_sum"))
        .filter(col("sign_sum") =!= 0)
        .orderBy(col("okey"), col("price"), col("status"))
    }),

    // A12: DDL/schema evolution — SURVEY §1.1 calls QueryEvent DDL "the
    // classic weak spot of this tool class". Mid-stream, the source table
    // gains a column (ALTER TABLE ADD channel): pre-DDL events carry the
    // v1 envelope, post-DDL events the v2 envelope. The union aligns by
    // NAME with nulls for the missing column (unionByName
    // allowMissingColumns — Spark's mergeSchema semantic), then the usual
    // A8 latest-wins collapse runs over the evolved envelope. Keys whose
    // last change predates the DDL surface channel=NULL; keys touched
    // after it carry the new value. Scale shape: same single-shuffle
    // collapse as A8 — schema evolution adds no extra exchange.
    "cdc_schema_evolution" -> ((s, dir) => {
      val log = Tables.cdcLog(s, dir)
      val v1 = log.filter(col("seq") === 1)
      val v2 = log.filter(col("seq") >= 2)
        .withColumn("channel",
          when(col("op") === "D", lit(null).cast("string"))
            .otherwise(concat(lit("ch"), (col("okey") % 4).cast("string"))))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("okey"))
        .agg(max_by(struct(col("op"), col("price"), col("status"), col("ts"),
          col("channel")), col("seq")).as("l"))
        .select(col("okey"), col("l.op").as("op"), col("l.price").as("price"),
          col("l.status").as("status"), col("l.ts").as("ts"),
          col("l.channel").as("channel"))
        .filter(col("op") =!= "D")
        .orderBy(col("okey"))
    }),

    // A13: ClickHouse windowFunnel semantics — per user, the deepest
    // view -> click -> purchase prefix reached in order inside a 7-day
    // window. Faithful to the reference function: EVERY view anchors a
    // candidate chain (anchoring only the first view underreports depth —
    // 16% of users on this fixture), equal timestamps chain (default
    // mode, not strict_increase), and users with events but no view
    // report level 0 instead of vanishing. Step times are
    // earliest-qualifying minimums per anchor; user depth is the max over
    // anchors. Shape: per-user equi-joins with range residuals — the
    // pair count per user is bounded by per-user activity, and every
    // shuffle is on user_id.
    "agg_window_funnel" -> ((s, dir) => {
      // per-user truncated history: every user is this active on the full
      // fixture, so an unsliced funnel saturates at depth 3 for everyone
      // and the window/guard logic would be dead in the differential
      // check — the slice produces depths 0-3
      val ev = Tables.t(s, dir, "events")
        .filter(dayofmonth(col("ts")) <= (col("user_id") % 28) + 1)
        .select(col("user_id"), col("event_type"), col("ts"))
      val win = expr("INTERVAL 7 DAYS")
      val anchors = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("t1")).distinct()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
      val a2 = anchors.join(clicks,
          col("user_id") === col("cu") &&
            col("cts") >= col("t1") && col("cts") <= col("t1") + win, "left")
        .groupBy(col("user_id"), col("t1")).agg(min(col("cts")).as("t2"))
      val a3 = a2.join(purchases,
          col("user_id") === col("pu") && col("t2").isNotNull &&
            col("pts") >= col("t2") && col("pts") <= col("t1") + win, "left")
        .groupBy(col("user_id"), col("t1"), col("t2")).agg(min(col("pts")).as("t3"))
      val depths = a3.select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2).otherwise(1).as("d"))
        .groupBy(col("user_id")).agg(max(col("d")).as("vd"))
      ev.select(col("user_id")).distinct()
        .join(depths, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("vd"), lit(0)).as("funnel_depth"))
        .orderBy(col("user_id"))
    }),

    // A14: ClickHouse `retention` semantics — per user, did the first-week
    // condition hold, and did the user return in each later week; summed
    // into the cohort retention curve. Two hash aggregates, both keyed —
    // the per-user flag table shuffles on user_id, the curve is a single
    // partial-aggregated rollup.
    "agg_retention" -> ((s, dir) => {
      def wk(lo: Int, hi: Int) =
        max(when(dayofmonth(col("ts")).between(lo, hi), 1).otherwise(0))
      // per-user truncated history (see agg_window_funnel): unsliced,
      // every user is active every week and the curve degenerates to N,N,N,N
      Tables.t(s, dir, "events")
        .filter(dayofmonth(col("ts")) <= (col("user_id") % 28) + 1)
        .groupBy(col("user_id"))
        .agg(wk(1, 7).as("w1"), wk(8, 14).as("w2"),
          wk(15, 21).as("w3"), wk(22, 28).as("w4"))
        .agg(sum(col("w1")).as("r1"),
          sum(col("w1") * col("w2")).as("r2"),
          sum(col("w1") * col("w3")).as("r3"),
          sum(col("w1") * col("w4")).as("r4"))
    }),

    // A15: ClickHouse sequenceMatch('(?1).*(?2)') semantics — per user,
    // does any view precede (or share a timestamp with, matching the
    // funnel's default chaining) any purchase. One keyed hash aggregate:
    // earliest view vs latest purchase decides the pattern for the whole
    // history without materializing event sequences.
    "agg_sequence_match" -> ((s, dir) =>
      // per-user truncated history (see agg_window_funnel): unsliced,
      // matched is uniformly true and the pattern logic is dead
      Tables.t(s, dir, "events")
        .filter(dayofmonth(col("ts")) <= (col("user_id") % 28) + 1)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
        .select(col("user_id"),
          (col("first_view").isNotNull && col("last_purchase").isNotNull &&
            col("first_view") <= col("last_purchase")).as("matched"))
        .orderBy(col("user_id"))),

    // A18: exact quantiles — ClickHouse quantileExact semantics (the
    // value AT rank ceil(q·n), no interpolation). Two-pass bucketed-count
    // plan: pass 1 is a full-table hash aggregate (map-side partial) down
    // to (group, value, count); pass 2 runs the cumulative-count window
    // over that distinct-value table only — the value at rank r is the
    // smallest value whose running count reaches r, so per-row ranking is
    // never needed. The naive alternative (rank window partitioned by the
    // 3-value l_returnflag) sorts the whole table in 3 tasks — fine at
    // sf0.1, a straggler factory at 100 TB; here the window input is
    // |groups|·|distinct values| rows regardless of table size.
    "agg_quantiles_exact" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
      val wAll = Window.partitionBy(col("l_returnflag"))
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("cnt", sum(col("c")).over(wAll))
        .groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") >= ceil(col("cnt") * 0.25), col("l_quantity")))
            .as("q25"),
          min(when(col("cum") >= ceil(col("cnt") * 0.5), col("l_quantity")))
            .as("median"),
          min(when(col("cum") >= ceil(col("cnt") * 0.75), col("l_quantity")))
            .as("q75"),
          max(col("cnt")).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // A17: fixed-width histogram — the ClickHouse histogram() workload in
    // its deterministic form (fixed bucket width, not adaptive bins):
    // floor(price / width) buckets, one hash aggregate, scan-local.
    "agg_histogram" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .withColumn("bucket",
          floor(col("l_extendedprice") / 10000).cast(LongType))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice"))).cast(D2).cast(DoubleType).as("total"))
        .orderBy(col("bucket"))),

    // A21: sumMap — the ClickHouse map-valued aggregate: within each
    // group, sum values per map key and emit the aligned (sorted-keys,
    // sums) arrays. Key space here is the per-event user segment; sums
    // run exact in DECIMAL(18,2) and ship as integer cents (the CSV-
    // string array rendering from A7, engine-portable with no float
    // formatting in play). Two hash aggregates; the second runs on the
    // |groups|·|keys| distinct table, never on |rows| — scan-dominated
    // at any scale.
    "agg_sum_map" -> ((s, dir) => {
      val per = Tables.t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(5)).as("seg"),
          dec2(col("value")).as("v"))
        .groupBy(col("event_type"), col("seg"))
        .agg((sum(col("v")).cast(D2) * 100).cast(LongType).as("cents"))
      per.groupBy(col("event_type"))
        .agg(
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("seg"), col("cents")))),
            x => x.getField("seg").cast(StringType))).as("seg_keys"),
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("seg"), col("cents")))),
            x => x.getField("cents").cast(StringType))).as("seg_sum_cents"))
        .orderBy(col("event_type"))
    }),

    // A16: argMin/argMax — the ClickHouse carrier-value aggregates. Bare
    // arg_max ties are engine-arbitrary, so the deterministic form is the
    // lexicographic max/min of struct(value, carrier): the carrier itself
    // breaks value ties identically in both engines. Same single hash
    // aggregate, no extra pass.
    "agg_arg_minmax" -> ((s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          max(struct(col("value"), col("user_id"))).getField("user_id")
            .as("top_user"),
          min(struct(col("value"), col("user_id"))).getField("user_id")
            .as("bottom_user"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"))
        .orderBy(col("event_type"))),

    // A19: topK — ClickHouse's most-frequent-values aggregate, in its
    // exact deterministic form: count per (group, value), rank by
    // frequency (value breaks ties), keep 3, assemble the rank-ordered
    // array per group. Two hash aggregates + one tiny window over the
    // distinct-value table — the distinct table is |groups|·|values|,
    // never |rows|, so the shape is scan-dominated at any scale.
    "agg_topk_frequent" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.t(s, dir, "lineitem")
        .withColumn("qty", col("l_quantity").cast(LongType))
        .groupBy(col("l_returnflag"), col("qty"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("qty"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .groupBy(col("l_returnflag"))
        .agg(
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("rk"), col("qty")))),
            x => x.getField("qty").cast(StringType))).as("top_qtys"),
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("rk"), col("cnt")))),
            x => x.getField("cnt").cast(StringType))).as("top_counts"))
        .orderBy(col("l_returnflag"))
    }),

    // A20: simpleLinearRegression — ClickHouse's least-squares aggregate
    // (slope, intercept, r²) of price on quantity per group. The five
    // moment sums run EXACT (quantity is integral, price is 2dp decimal
    // scaled to an integer y100 = 100·price; Σy² needs >63 bits so it
    // sums in DECIMAL(38,0)); slope/intercept/r² are then a handful of
    // identical double ops on identically-rounded casts of those exact
    // integers, rounded to 6dp as a belt-and-braces against a last-ulp
    // cast divergence. One hash aggregate — the canonical map-side
    // partial-aggregation shape at any scale.
    "agg_linreg" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      Tables.t(s, dir, "lineitem")
        .withColumn("x", col("l_quantity").cast(LongType))
        .withColumn("y100", (dec2(col("l_extendedprice")) * lit(100))
          .cast(LongType))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y100")).as("sy"),
          sum(col("x") * col("y100")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y100").cast(D38) * col("y100")).as("syy"))
        .withColumn("num",
          col("n").cast(D38) * col("sxy") - col("sx").cast(D38) * col("sy"))
        .withColumn("den_x", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("den_y",
          col("n").cast(D38) * col("syy") - col("sy").cast(D38) * col("sy"))
        .withColumn("slope",
          col("num").cast(DoubleType) / col("den_x").cast(DoubleType) / lit(100.0))
        .select(
          col("l_returnflag"), col("n"),
          round(col("slope"), 6).as("slope"),
          round((col("sy").cast(DoubleType) / lit(100.0) -
            col("slope") * col("sx").cast(DoubleType)) / col("n").cast(DoubleType), 6)
            .as("intercept"),
          round(col("num").cast(DoubleType) * col("num").cast(DoubleType) /
            (col("den_x").cast(DoubleType) * col("den_y").cast(DoubleType)), 6)
            .as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    // A10: statistical aggregates — genuinely floating, so rounded to a
    // fixed scale on both sides (see Tables determinism policy).
    "agg_stats" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75_qty"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
        .orderBy(col("l_returnflag"))),

    // A16: audience-overlap set aggregates — ClickHouse's groupBitmapAnd/
    // groupBitmapOr/Jaccard segment-intersection idiom. Deliberately NOT
    // collect_set-based: at 100 TB a per-group user set does not fit in
    // one array, so intersections are computed as a distributed self-join
    // on the deduplicated (event_type, user_id) table — the dedup is one
    // hash aggregate, the pair join shuffles on user_id, and the output is
    // bounded by n_event_types² rows. Same results as bitmaps, no big
    // state anywhere.
    "agg_bitmap_overlap" -> ((s, dir) => {
      val d = Tables.t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val sizes = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      d.as("a").join(d.as("b"), "user_id")
        .filter(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("et_a"), col("b.event_type").as("et_b"))
        .agg(count(lit(1)).as("n_both"))
        .join(sizes.select(col("event_type").as("et_a"), col("n").as("n_a")), "et_a")
        .join(sizes.select(col("event_type").as("et_b"), col("n").as("n_b")), "et_b")
        .select(
          col("et_a"), col("et_b"), col("n_a"), col("n_b"), col("n_both"),
          (col("n_a") + col("n_b") - col("n_both")).as("n_either"),
          round(col("n_both").cast(DoubleType) /
            (col("n_a") + col("n_b") - col("n_both")).cast(DoubleType), 6)
            .as("jaccard"))
        .orderBy(col("et_a"), col("et_b"))
    }),

    // A17: trailing moving aggregates — ClickHouse's groupArrayMovingSum/
    // groupArrayMovingAvg in relational form: per-priority daily order
    // revenue with a 7-row trailing sum and average-order-value. One
    // shuffle to the daily grain, then a single window pass; the window
    // state at scale is one 7-row frame per partition, never the series.
    "agg_moving_sum" -> ((s, dir) => {
      val daily = Tables.t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          col("o_orderdate").cast(DateType).as("day"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).as("rev"))
      val w = Window.partitionBy(col("prio")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      daily.select(
        col("prio"), col("day"), col("n_orders"),
        sum(col("n_orders")).over(w).as("mov_n7"),
        // exact decimal window sum, surfaced as double (the engine-portable
        // decimal policy — see fn_math / Tables determinism note)
        sum(col("rev")).over(w).cast(D2).cast(DoubleType).as("mov_rev7"),
        (sum(col("rev")).over(w).cast(DoubleType) /
          sum(col("n_orders")).over(w).cast(DoubleType)).as("mov_avg_order"))
        .orderBy(col("prio"), col("day"))
    }),

    // A26: approximate quantiles — ClickHouse quantileTDigest: the
    // sketch-based percentile for when A18's exact rank pass is too
    // expensive (exact needs a per-group total order; the sketch is one
    // mergeable pass). Non-oracle by design like A3 (sketch internals
    // aren't SQL); OperatorSpec bounds the estimates against A10's exact
    // percentiles within the declared accuracy.
    "agg_quantiles_approx" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50"),
          percentile_approx(col("l_quantity"), lit(0.95), lit(1000)).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // A25: MySQL GROUP_CONCAT / ClickHouse arrayStringConcat(groupArray):
    // per-group ordered string concatenation with separator. Sorted
    // before joining so both engines agree; same bounded-group caveat as
    // A7 (the group's values materialize in one row — dimension-grain
    // groups only at scale, never per-user event lists).
    "agg_group_concat" -> ((s, dir) =>
      Tables.t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))),

    // A24: mergeable distinct-count states — ClickHouse uniqState /
    // uniqMerge: the per-group HLL sketch IS the stored partial state
    // (an AggregateFunction column), and rollups are served by MERGING
    // states — never by rescanning rows. Here: per-event-type sketches,
    // plus the <all> row folded from those very sketches with
    // hll_union_agg. Non-oracle by design (sketch binaries aren't SQL);
    // OperatorSpec asserts merge-of-parts == direct global sketch
    // (associativity, bit-exact estimate) and estimates within rsd of
    // exact. At scale each sketch is a few KB however many rows fold in.
    "agg_uniq_sketch_merge" -> ((s, dir) => {
      val perType = Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("state"),
          count(lit(1)).as("n_rows"))
      val global = perType
        .agg(hll_sketch_estimate(hll_union_agg(col("state"))).as("uniq_users"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit("<all>").as("event_type"), col("uniq_users"), col("n_rows"))
      perType
        .select(col("event_type"),
          hll_sketch_estimate(col("state")).as("uniq_users"), col("n_rows"))
        .unionByName(global)
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_sum_map" ->
      """WITH g AS (SELECT event_type, user_id % 5 AS seg,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                    * 100 AS BIGINT) AS cents
             FROM events GROUP BY event_type, user_id % 5)
         SELECT event_type,
           array_to_string(list(CAST(seg AS VARCHAR) ORDER BY seg), ',')
             AS seg_keys,
           array_to_string(list(CAST(cents AS VARCHAR) ORDER BY seg), ',')
             AS seg_sum_cents
         FROM g GROUP BY event_type ORDER BY event_type""",

    "agg_quantiles_exact" ->
      """WITH r AS (SELECT l_returnflag, l_quantity,
                      row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS cnt
                    FROM lineitem)
         SELECT l_returnflag,
           max(CASE WHEN rn = ceil(cnt * 0.25) THEN l_quantity END) AS q25,
           max(CASE WHEN rn = ceil(cnt * 0.5) THEN l_quantity END) AS median,
           max(CASE WHEN rn = ceil(cnt * 0.75) THEN l_quantity END) AS q75,
           CAST(max(cnt) AS BIGINT) AS n_rows
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM lineitem GROUP BY 1 ORDER BY bucket""",

    "agg_arg_minmax" ->
      """SELECT event_type,
           (max(struct_pack(value := value, user_id := user_id))).user_id
             AS top_user,
           (min(struct_pack(value := value, user_id := user_id))).user_id
             AS bottom_user,
           max(value) AS max_value, min(value) AS min_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_topk_frequent" ->
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
                      count(*) AS cnt
                    FROM lineitem GROUP BY 1, 2),
              r AS (SELECT l_returnflag, qty, cnt,
                      row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY cnt DESC, qty) AS rk
                    FROM c QUALIFY rk <= 3)
         SELECT l_returnflag,
           array_to_string(list(CAST(qty AS VARCHAR) ORDER BY rk), ',')
             AS top_qtys,
           array_to_string(list(CAST(cnt AS VARCHAR) ORDER BY rk), ',')
             AS top_counts
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_linreg" ->
      """WITH b AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS x,
                      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) AS y100
                    FROM lineitem),
              m AS (SELECT l_returnflag, count(*) AS n,
                      sum(x) AS sx, sum(y100) AS sy,
                      sum(x * y100) AS sxy, sum(x * x) AS sxx,
                      sum(CAST(y100 AS HUGEINT) * y100) AS syy
                    FROM b GROUP BY l_returnflag),
              d AS (SELECT l_returnflag, n, sx, sy,
                      CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
                      n * sxx - sx * sx AS den_x,
                      CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den_y
                    FROM m),
              sl AS (SELECT *, CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE)
                       / 100.0 AS slope FROM d)
         SELECT l_returnflag, n,
           round(slope, 6) AS slope,
           round((CAST(sy AS DOUBLE) / 100.0 - slope * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                 / (CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)), 6) AS r2
         FROM sl ORDER BY l_returnflag""",

    "agg_hash_groupby" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_price,
           CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
           CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "agg_count_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS nd_part,
           count(DISTINCT l_suppkey) AS nd_supp,
           count(DISTINCT l_orderkey) AS nd_order
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                count(*) AS n,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                     AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY rf, ls""",

    "agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
                coalesce(n_name, 'ALL') AS nation,
                count(*) AS n_cust,
                CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
                     AS DOUBLE) AS bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY region, nation""",

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                coalesce(l_linestatus, 'ALL') AS ls,
                count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "agg_collect_sorted" ->
      """SELECT o_custkey,
           array_to_string(list_transform(list_sort(list(o_orderkey)),
             x -> CAST(x AS VARCHAR)), ',') AS order_keys,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
         FROM orders WHERE o_custkey < 100
         GROUP BY o_custkey ORDER BY o_custkey""",

    "agg_latest_by_version" ->
      s"""WITH cdc_log AS (${Tables.cdcLogSql}),
            ranked AS (SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) rn
                       FROM cdc_log)
         SELECT okey, op, price, status, ts FROM ranked
         WHERE rn = 1 AND op <> 'D' ORDER BY okey""",

    "agg_filtered_conditional" ->
      """SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE value > 10) AS n_high,
           CAST(CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE)
             AS purchase_value,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
         FROM events GROUP BY 1 ORDER BY user_bucket""",

    "agg_sign_collapse" ->
      s"""WITH cdc_log AS (${Tables.cdcLogSql}),
            lagged AS (
              SELECT okey, op, price, status,
                     lag(price) OVER w AS prev_price,
                     lag(status) OVER w AS prev_status,
                     lag(op) OVER w IS NOT NULL AS has_prev
              FROM cdc_log WINDOW w AS (PARTITION BY okey ORDER BY seq ASC)),
            signed AS (
              SELECT okey, price, status, CAST(1 AS BIGINT) AS sign
              FROM lagged WHERE op IN ('I', 'U')
              UNION ALL
              SELECT okey, prev_price, prev_status, CAST(-1 AS BIGINT)
              FROM lagged WHERE op IN ('U', 'D') AND has_prev)
         SELECT okey, price, status, CAST(sum(sign) AS BIGINT) AS sign_sum
         FROM signed GROUP BY okey, price, status
         HAVING sum(sign) <> 0
         ORDER BY okey, price, status""",

    "cdc_schema_evolution" ->
      s"""WITH cdc_log AS (${Tables.cdcLogSql}),
            evolved AS (
              SELECT op, seq, ts, okey, price, status
              FROM cdc_log WHERE seq = 1
              UNION ALL BY NAME
              SELECT op, seq, ts, okey, price, status,
                     CASE WHEN op = 'D' THEN NULL
                          ELSE 'ch' || CAST(okey % 4 AS VARCHAR) END AS channel
              FROM cdc_log WHERE seq >= 2),
            ranked AS (SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) rn
                       FROM evolved)
         SELECT okey, op, price, status, ts, channel FROM ranked
         WHERE rn = 1 AND op <> 'D' ORDER BY okey""",

    "agg_window_funnel" ->
      """WITH sliced AS (SELECT * FROM events
                         WHERE day(ts) <= (user_id % 28) + 1),
            anchors AS (SELECT DISTINCT user_id, ts AS t1 FROM sliced
                        WHERE event_type = 'view'),
            a2 AS (SELECT a.user_id, a.t1, min(c.ts) AS t2
                   FROM anchors a LEFT JOIN sliced c
                     ON c.user_id = a.user_id AND c.event_type = 'click'
                    AND c.ts >= a.t1 AND c.ts <= a.t1 + INTERVAL 7 DAY
                   GROUP BY a.user_id, a.t1),
            a3 AS (SELECT a.user_id, a.t1, a.t2, min(p.ts) AS t3
                   FROM a2 a LEFT JOIN sliced p
                     ON p.user_id = a.user_id AND p.event_type = 'purchase'
                    AND a.t2 IS NOT NULL
                    AND p.ts >= a.t2 AND p.ts <= a.t1 + INTERVAL 7 DAY
                   GROUP BY a.user_id, a.t1, a.t2),
            depths AS (SELECT user_id, max(CASE WHEN t3 IS NOT NULL THEN 3
                                                WHEN t2 IS NOT NULL THEN 2
                                                ELSE 1 END) AS vd
                       FROM a3 GROUP BY user_id)
         SELECT u.user_id, coalesce(d.vd, 0) AS funnel_depth
         FROM (SELECT DISTINCT user_id FROM sliced) u
         LEFT JOIN depths d ON u.user_id = d.user_id
         ORDER BY u.user_id""",

    "agg_retention" ->
      """WITH f AS (SELECT user_id,
             max(CASE WHEN day(ts) BETWEEN 1 AND 7 THEN 1 ELSE 0 END) AS w1,
             max(CASE WHEN day(ts) BETWEEN 8 AND 14 THEN 1 ELSE 0 END) AS w2,
             max(CASE WHEN day(ts) BETWEEN 15 AND 21 THEN 1 ELSE 0 END) AS w3,
             max(CASE WHEN day(ts) BETWEEN 22 AND 28 THEN 1 ELSE 0 END) AS w4
           FROM events WHERE day(ts) <= (user_id % 28) + 1 GROUP BY user_id)
         SELECT CAST(sum(w1) AS BIGINT) AS r1,
                CAST(sum(w1 * w2) AS BIGINT) AS r2,
                CAST(sum(w1 * w3) AS BIGINT) AS r3,
                CAST(sum(w1 * w4) AS BIGINT) AS r4
         FROM f""",

    "agg_sequence_match" ->
      """SELECT user_id,
           (first_view IS NOT NULL AND last_purchase IS NOT NULL
            AND first_view <= last_purchase) AS matched
         FROM (SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                 max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
               FROM events WHERE day(ts) <= (user_id % 28) + 1
               GROUP BY user_id)
         ORDER BY user_id""",

    "agg_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty,
           round(avg(l_quantity), 4) AS avg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_group_concat" ->
      """SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           count(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "agg_bitmap_overlap" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         sz AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type),
         b AS (SELECT a.event_type AS et_a, bb.event_type AS et_b,
                 count(*) AS n_both
               FROM d a JOIN d bb USING (user_id)
               WHERE a.event_type < bb.event_type
               GROUP BY 1, 2)
         SELECT et_a, et_b, sa.n AS n_a, sb.n AS n_b, n_both,
           sa.n + sb.n - n_both AS n_either,
           round(CAST(n_both AS DOUBLE) /
                 CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
         FROM b
         JOIN sz sa ON b.et_a = sa.event_type
         JOIN sz sb ON b.et_b = sb.event_type
         ORDER BY et_a, et_b""",

    "agg_moving_sum" ->
      """WITH daily AS (
           SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1, 2)
         SELECT prio, day, n_orders,
           CAST(sum(n_orders) OVER w AS BIGINT) AS mov_n7,
           CAST(CAST(sum(rev) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS mov_rev7,
           CAST(sum(rev) OVER w AS DOUBLE) /
             CAST(sum(n_orders) OVER w AS DOUBLE) AS mov_avg_order
         FROM daily
         WINDOW w AS (PARTITION BY prio ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY prio, day"""
  )
}
