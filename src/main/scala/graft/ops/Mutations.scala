package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Destination-table maintenance semantics (SURVEY.md §1.1/§3.1): the
  * ClickHouse-side operations a reference user runs against the replicated
  * table, beyond reads — ALTER TABLE DELETE/UPDATE mutations,
  * SummingMergeTree part merges, TTL expiry, and hash-keyed SAMPLE reads.
  *
  * Mutations are modeled the way ClickHouse executes them: not an in-place
  * edit but a REWRITE into a new part version (read current parts, apply
  * the predicate/assignment, publish new parts, retire the old). The
  * queries below run that mechanic through the real writer path — write
  * state v0, rewrite to v1, serve v1 — so the declared result exercises
  * the same read-modify-publish topology a 100 TB mutation would, where
  * each partition rewrites independently (embarrassingly parallel, no
  * shuffle beyond the initial collapse).
  */
object Mutations {
  type Q = (SparkSession, String) => DataFrame

  /** One mutation workspace per JVM (rewritten in place per run),
    * deleted on exit via the shared TmpDirs registry. */
  private lazy val mutDir: String = graft.TmpDirs.create("graft_mut")

  /** The replicated destination table: A8 latest-wins collapse of the CDC
    * log, tombstones dropped (what ClickHouse would serve post-merge). */
  private def latestState(s: SparkSession, dir: String): DataFrame =
    Tables.cdcLog(s, dir)
      .groupBy(col("okey"))
      .agg(max_by(struct(col("op"), col("price"), col("status"), col("ts")),
        col("seq")).as("l"))
      .select(col("okey"), col("l.op").as("op"), col("l.price").as("price"),
        col("l.status").as("status"), col("l.ts").as("ts"))
      .filter(col("op") =!= "D")

  /** DuckDB CTE for [[latestState]] as a table named `latest`. */
  private val latestSql: String =
    s"""WITH cdc_log AS (${Tables.cdcLogSql}),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) rn
                     FROM cdc_log),
          latest AS (SELECT okey, op, price, status, ts FROM ranked
                     WHERE rn = 1 AND op <> 'D')"""

  val queries: Map[String, Q] = Map(
    // M1: ALTER TABLE ... DELETE WHERE status = 'F' — the reference class
    // emulates upstream deletes either with sign/version columns (A11/A8)
    // or with exactly this mutation. v0 = current parts, v1 = rewritten
    // parts without the matching rows; the query serves v1 through the
    // real parquet writer/reader path.
    "mutation_delete" -> ((s, dir) => {
      val p = s"$mutDir/delete"
      latestState(s, dir).write.mode("overwrite").parquet(s"$p/v0")
      s.read.parquet(s"$p/v0")
        .filter(col("status") =!= "F")
        .write.mode("overwrite").parquet(s"$p/v1")
      s.read.parquet(s"$p/v1").orderBy(col("okey"))
    }),

    // M2: ALTER TABLE ... UPDATE price = price * 1.05 WHERE status = 'O'
    // — same new-part rewrite mechanic, assignment instead of filter.
    // One IEEE double multiply by the same literal on both engines.
    "mutation_update" -> ((s, dir) => {
      val p = s"$mutDir/update"
      latestState(s, dir).write.mode("overwrite").parquet(s"$p/v0")
      s.read.parquet(s"$p/v0")
        .withColumn("price",
          when(col("status") === "O", col("price") * lit(1.05d))
            .otherwise(col("price")))
        .write.mode("overwrite").parquet(s"$p/v1")
      s.read.parquet(s"$p/v1").orderBy(col("okey"))
    }),

    // M3: SummingMergeTree part merge — rows with equal key collapse by
    // SUMMING the measures. Modeled as the real mechanic: two "parts"
    // (disjoint inserts) are pre-aggregated independently, then the merge
    // re-sums the partial states. Result must equal the direct aggregate
    // (sum is associative — the property the engine's background merge
    // relies on). Scale shape: both parts partial-aggregate map-side;
    // the merge is one keyed hash aggregate on l_suppkey.
    "agg_summing_merge" -> ((s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
      def part(pred: org.apache.spark.sql.Column) =
        li.filter(pred)
          .groupBy(col("l_suppkey"))
          .agg(sum(dec2(col("l_quantity"))).as("q"),
            sum(dec2(col("l_extendedprice"))).as("p"),
            count(lit(1)).as("n"))
      part(col("l_orderkey") % 2 === 0)
        .unionByName(part(col("l_orderkey") % 2 =!= 0))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("q")).cast(D2).cast(DoubleType).as("sum_qty"),
          sum(col("p")).cast(D2).cast(DoubleType).as("sum_price"),
          sum(col("n")).as("n_rows"))
        .orderBy(col("l_suppkey"))
    }),

    // M4: TTL expiry — TTL ts + INTERVAL 14 DAY relative to the newest
    // event (the deterministic "now"). The cutoff is a broadcast scalar
    // (one tiny aggregate joined to every row — no shuffle on the fact
    // side), the filter runs in the scan stage.
    "ttl_expiry" -> ((s, dir) => {
      val ev = Tables.t(s, dir, "events")
      val cutoff = ev.agg(max(col("ts")).as("mx"))
        .select((col("mx") - expr("INTERVAL 14 DAYS")).as("cutoff"))
      ev.join(broadcast(cutoff))
        .filter(col("ts") >= col("cutoff"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("first_kept"),
          sum(dec2(col("value"))).cast(D2).cast(DoubleType).as("total"))
        .orderBy(col("event_type"))
    }),

    // M5: SAMPLE 1/10 with sampling key user_id — deterministic hash
    // sampling, all rows of a sampled user kept together (the ClickHouse
    // sampling-key contract, which keeps per-entity analyses unbiased).
    // The bucket hash is the first 8 hex digits of md5(user_id) — chosen
    // because BOTH engines compute it identically, so the oracle selects
    // the exact same users. Scan-local: no shuffle, filter in codegen.
    "sample_hash_bucket" -> ((s, dir) => {
      val bucket = pmod(
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(10L))
      Tables.t(s, dir, "events")
        .filter(bucket === 0)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast(D2).cast(DoubleType).as("total"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "mutation_delete" ->
      s"""$latestSql
         SELECT okey, op, price, status, ts FROM latest
         WHERE NOT (status = 'F') ORDER BY okey""",

    "mutation_update" ->
      s"""$latestSql
         SELECT okey, op,
                CASE WHEN status = 'O' THEN price * CAST(1.05 AS DOUBLE)
                     ELSE price END AS price,
                status, ts
         FROM latest ORDER BY okey""",

    "agg_summing_merge" ->
      """SELECT l_suppkey,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_price,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",

    "ttl_expiry" ->
      """SELECT event_type, count(*) AS n, min(ts) AS first_kept,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
             AS total
         FROM events
         WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 14 DAY
         GROUP BY event_type ORDER BY event_type""",

    "sample_hash_bucket" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
             AS total
         FROM events
         WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 10 = 0
         GROUP BY event_type ORDER BY event_type"""
  )
}
