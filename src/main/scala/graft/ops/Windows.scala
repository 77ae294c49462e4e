package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY.md §2.5 — window functions.
  *
  * Every window here partitions by a key (user / status / CDC key) so state
  * shards across executors at scale; none uses a global (unpartitioned)
  * window, which would serialize on one task.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // W7: batch sessionization — the gaps-and-islands form of ST4's
    // session windows, fully oracle-able (no watermark arrival-order
    // dependence): a new session starts where the per-user gap exceeds
    // 1h; session id is the running count of session starts. Gap
    // arithmetic in exact epoch MICROS (DuckDB's epoch() is a fractional
    // double — epoch_us is the integer both engines agree on). Keyed
    // windows only — shards by user at scale.
    "win_sessionize" -> ((s, dir) => {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.t(s, dir, "events")
        .withColumn("prev_us",
          lag(unix_micros(col("ts")), 1).over(wUser))
        .withColumn("new_sess", when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 3600L * 1000000L, 1L)
          .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          wUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("sess_id"))
    }),

    // W1: latest-wins dedup in window form (same semantics as A8).
    "win_row_number_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("okey")).orderBy(desc("seq"))
      Tables.cdcLog(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("okey"), col("op"), col("price"), col("status"), col("ts"))
        .orderBy(col("okey"))
    }),

    // W8: W1's window spelling submitted through the
    // LatestByVersionRewrite optimizer rule (§4.3): the `latest_rn`
    // marker opts in, and the sort-the-partition Window plan is rewritten
    // to a partially-aggregable max_by hash aggregate — at scale,
    // map-side collapse BEFORE the shuffle instead of shuffling every
    // version of every key into a sort. PlanSpec asserts the Window (and
    // its sort) is gone from the physical plan; the oracle is the SAME
    // window SQL as W1 — proving result equivalence, not just shape.
    "win_dedup_rewrite" -> ((s, dir) => {
      graft.plans.LatestByVersionRewrite.install(s)
      val w = Window.partitionBy(col("okey")).orderBy(desc("seq"))
      Tables.cdcLog(s, dir)
        .withColumn("latest_rn", row_number().over(w))
        .filter(col("latest_rn") === 1 && col("op") =!= "D")
        .select(col("okey"), col("op"), col("price"), col("status"), col("ts"))
        .orderBy(col("okey"))
    }),

    // W2: ranking family over orders per status.
    "win_rank_dense" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("total"), asc("o_orderkey"))
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec2(col("o_totalprice")).cast(DoubleType).as("total"))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .withColumn("nt", ntile(4).over(w))
        // (rank-1)/(n-1): one IEEE division of small ints — bit-identical
        // across engines, no rounding needed.
        .withColumn("prk", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .orderBy(col("o_orderstatus"), col("rk"), col("o_orderkey"))
    }),

    // W3: lag/lead change detection per user.
    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
      Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          dec2(col("value")).as("val"))
        .withColumn("prev_val", lag(col("val"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("delta", (col("val") - coalesce(col("prev_val"), lit(0).cast(D2))).cast(D2))
        .withColumn("val", col("val").cast(DoubleType))
        .withColumn("prev_val", col("prev_val").cast(DoubleType))
        .withColumn("delta", col("delta").cast(DoubleType))
        .orderBy(col("event_id"))
    }),

    // W4: running (cumulative) sum per user — ROWS frame.
    "win_running_frame_rows" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), dec2(col("value")).as("val"))
        .withColumn("running", sum(col("val")).over(w).cast(D2).cast(DoubleType))
        .withColumn("n_so_far", count(lit(1)).over(w))
        .withColumn("val", col("val").cast(DoubleType))
        .orderBy(col("event_id"))
    }),

    // W5: value-range frame — orders within 1000.00 below current price.
    "win_range_frame" -> ((s, dir) => {
      Tables.t(s, dir, "orders").createOrReplaceTempView("rf_orders")
      s.sql(
        """SELECT o_orderkey, o_orderstatus,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
                  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near
           FROM rf_orders
           ORDER BY o_orderkey""")
    }),

    // W6: first/last value with explicit full-partition frame.
    "win_first_last_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .withColumn("first_type", first(col("event_type")).over(w))
        .withColumn("last_type", last(col("event_type")).over(w))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "win_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
                      lag(epoch_us(ts)) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev_us
                    FROM events),
            s AS (SELECT *, CASE WHEN prev_us IS NULL
                    OR epoch_us(ts) - prev_us > CAST(3600 AS BIGINT) * 1000000 THEN 1
                    ELSE 0 END AS new_sess
                  FROM e),
            x AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
                  FROM s)
         SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
                min(ts) AS sess_start, max(ts) AS sess_end,
                count(*) AS n_events
         FROM x GROUP BY user_id, sess_id ORDER BY user_id, sess_id""",

    "win_row_number_dedup" ->
      s"""WITH cdc_log AS (${Tables.cdcLogSql})
         SELECT okey, op, price, status, ts FROM (
           SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) rn
           FROM cdc_log)
         WHERE rn = 1 AND op <> 'D' ORDER BY okey""",

    "win_dedup_rewrite" ->
      s"""WITH cdc_log AS (${Tables.cdcLogSql})
         SELECT okey, op, price, status, ts FROM (
           SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) rn
           FROM cdc_log)
         WHERE rn = 1 AND op <> 'D' ORDER BY okey""",

    "win_rank_dense" ->
      """SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
           rank() OVER w AS rk, dense_rank() OVER w AS drk, ntile(4) OVER w AS nt,
           percent_rank() OVER w AS prk, cume_dist() OVER w AS cd
         FROM orders WHERE o_orderkey % 100 = 0
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_orderstatus, rk, o_orderkey""",

    "win_lag_lead" ->
      """SELECT event_id, user_id, ts, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS val,
           CAST(lag(CAST(value AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_val,
           lead(event_type, 1) OVER w AS next_type,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) -
                coalesce(lag(CAST(value AS DECIMAL(18,2)), 1) OVER w,
                         CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         ORDER BY event_id""",

    "win_running_frame_rows" ->
      """SELECT event_id, user_id, ts,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS val,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2))
                AS DOUBLE) AS running,
           count(*) OVER w AS n_so_far
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near
         FROM orders
         ORDER BY o_orderkey""",

    "win_first_last_value" ->
      """SELECT event_id, user_id, ts, event_type,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY event_id"""
  )
}
