package graft.ops

import graft.Tables
import graft.Tables.dec2
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY.md §2.6 — sort / limit / top-k / set operations. */
object SortSetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // O1: multi-key sort with explicit null placement (nulls manufactured).
    "sort_multi_key" -> ((s, dir) =>
      Tables.t(s, dir, "events")
        .select(col("event_id"),
          nullif(col("event_type"), lit("view")).as("etype"),
          dec2(col("value")).cast(DoubleType).as("val"))
        .orderBy(asc_nulls_first("etype"), desc_nulls_last("val"), asc("event_id"))),

    // O2: global top-k -> TakeOrderedAndProject (no full sort at scale).
    "topk_limit" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), dec2(col("o_totalprice")).cast(DoubleType).as("total"))
        .orderBy(desc("total"), asc("o_orderkey"))
        .limit(100)),

    // O3: top-3 orders per market segment via ranked window.
    "topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.t(s, dir, "orders")
      val c = Tables.t(s, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          dec2(col("o_totalprice")).cast(DoubleType).as("total"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),

    // O4a: bag union — snapshot ∪ delta is the CDC merge shape.
    "set_union_all" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionByName(b)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // O4b: set union (distinct).
    "set_union_distinct" -> ((s, dir) => {
      val o = Tables.t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val b = o.filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
      a.union(b).distinct().orderBy(col("o_orderkey"))
    }),

    // O7: ORDER BY ... WITH FILL (ClickHouse gap filling) — a sparse
    // daily series joined onto an explicit 45-day calendar spine (the
    // WITH FILL FROM/TO form): missing days surface as zero rows instead
    // of silently vanishing from the time series. The spine derives from
    // a 1-row aggregate (min date) exploded to 45 rows — broadcast-tiny
    // no matter the fact scale; the series side is already per-day
    // aggregates. Days beyond the one-month fixture guarantee filled
    // rows at every SF; in-month gaps appear at small SFs.
    "sort_with_fill" -> ((s, dir) => {
      val ev = Tables.t(s, dir, "events")
      val series = ev
        .filter(col("event_type") === "error" && col("value") > 90)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast(Tables.D2).cast(DoubleType).as("total"))
      val spine = ev.agg(min(to_date(col("ts"))).as("d0"))
        .select(explode(expr(
          "sequence(d0, date_add(d0, 44), interval 1 day)")).as("d"))
      spine.join(series, Seq("d"), "left")
        .select(col("d"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0d)).as("total"))
        .orderBy(col("d"))
    }),

    // O8: ORDER BY … WITH FILL INTERPOLATE — O7's calendar spine, but
    // gap days CARRY the last observed value forward (LOCF) instead of
    // zero-filling: ClickHouse's INTERPOLATE clause / the standard
    // time-series repair. The carried value via last_value(…, ignoreNulls)
    // over a running frame — one window pass on the spine-joined series
    // (spine length per key, bounded). Day counts stay zero-filled so the
    // filled rows stay distinguishable.
    "sort_fill_interpolate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.t(s, dir, "events")
      val series = ev
        .filter(col("event_type") === "error" && col("value") > 90)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast(Tables.D2).cast(DoubleType).as("total"))
      val spine = ev.agg(min(to_date(col("ts"))).as("d0"))
        .select(explode(expr(
          "sequence(d0, date_add(d0, 44), interval 1 day)")).as("d"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(series, Seq("d"), "left")
        .select(col("d"), coalesce(col("n"), lit(0L)).as("n"),
          last(col("total"), ignoreNulls = true).over(w).as("carried"))
        .orderBy(col("d"))
    }),

    // O5: intersection — consistency diff between two key sets.
    "set_intersect" -> ((s, dir) => {
      val withOrders = Tables.t(s, dir, "orders").select(col("o_custkey").as("k"))
      val rich = Tables.t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      withOrders.intersect(rich).orderBy(col("k"))
    }),

    // O6: difference — missing-row detection (dest keys not in source).
    // The subtrahend is restricted to urgent orders so the difference is
    // non-empty at every fixture SF (all-orders would diff empty-to-empty
    // — a vacuous check that can't catch an EXCEPT engine divergence).
    "set_except" -> ((s, dir) => {
      val all = Tables.t(s, dir, "customer").select(col("c_custkey").as("k"))
      val withUrgent = Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
      all.except(withUrgent).orderBy(col("k"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sort_multi_key" ->
      """SELECT event_id, nullif(event_type, 'view') AS etype,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS val
         FROM events
         ORDER BY etype ASC NULLS FIRST, val DESC NULLS LAST, event_id ASC""",

    "topk_limit" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
         FROM orders ORDER BY total DESC, o_orderkey ASC LIMIT 100""",

    "topk_per_group" ->
      """SELECT c_mktsegment, rk, o_orderkey, total FROM (
           SELECT c_mktsegment, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rk <= 3 ORDER BY c_mktsegment, rk""",

    "set_union_all" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
           UNION ALL
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 300000)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "set_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         UNION
         SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
         ORDER BY o_orderkey""",

    "sort_with_fill" ->
      """WITH series AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS DOUBLE) AS total
            FROM events WHERE event_type = 'error' AND value > 90 GROUP BY 1),
          bounds AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
          spine AS (SELECT CAST(unnest(generate_series(d0,
                      d0 + INTERVAL 44 DAY, INTERVAL 1 DAY)) AS DATE) AS d
                    FROM bounds)
         SELECT s.d, CAST(coalesce(r.n, 0) AS BIGINT) AS n,
                coalesce(r.total, 0.0) AS total
         FROM spine s LEFT JOIN series r ON s.d = r.d
         ORDER BY s.d""",

    "sort_fill_interpolate" ->
      """WITH series AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n,
              CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS DOUBLE) AS total
            FROM events WHERE event_type = 'error' AND value > 90 GROUP BY 1),
          bounds AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events),
          spine AS (SELECT CAST(unnest(generate_series(d0,
                      d0 + INTERVAL 44 DAY, INTERVAL 1 DAY)) AS DATE) AS d
                    FROM bounds)
         SELECT d, n, last_value(total IGNORE NULLS) OVER
             (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS carried
         FROM (SELECT s.d, CAST(coalesce(r.n, 0) AS BIGINT) AS n, r.total
               FROM spine s LEFT JOIN series r ON s.d = r.d)
         ORDER BY d""",

    "set_intersect" ->
      """SELECT o_custkey AS k FROM orders
         INTERSECT
         SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
         ORDER BY k""",

    "set_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY k"""
  )
}
