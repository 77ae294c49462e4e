package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 — scans / sources / sinks. S3 (JDBC) lives in
  * [[graft.sources.JdbcSource]]; S4 (parquet sink) is the declared
  * round-trip query below; S5 (idempotent foreachBatch sink) lives in
  * [[graft.streaming.StreamingOps]].
  */
object Scans {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1: full-table scan; Catalyst prunes nothing — the point is the scan.
    "scan_parquet" -> ((s, dir) =>
      Tables.t(s, dir, "nation")
        .orderBy(col("n_nationkey"))),

    // S2: projection narrowed to 3 columns — the parquet reader must show
    // ReadSchema with only these (verified via explain in ScanSpec).
    "scan_projection_pushdown" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .filter(col("l_quantity") > 45)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // S6: the synthesized ordered change-event log (binlog analogue).
    "scan_cdc_event_log" -> ((s, dir) =>
      Tables.cdcLog(s, dir)
        .orderBy(col("okey"), col("seq"))),

    // S4: parquet sink round-trip — write through the production writer
    // path (snappy parquet), read the files back; the result must equal
    // the source table bit for bit.
    "sink_parquet" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
      Tables.t(s, dir, "supplier").write.mode("overwrite").parquet(s"$tmp/supplier")
      s.read.parquet(s"$tmp/supplier").orderBy(col("s_suppkey"))
    }),

    // S3: snapshot through the pluggable TableSource abstraction — the
    // JDBC backend (graft.sources.JdbcSource) is the production path; the
    // harness exercises the same trait over parquet.
    "scan_jdbc" -> ((s, dir) =>
      new graft.sources.ParquetSource(dir).snapshot(s, "customer")
        .orderBy(col("c_custkey")))
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "scan_projection_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""",

    "scan_cdc_event_log" ->
      s"WITH cdc_log AS (${Tables.cdcLogSql}) SELECT * FROM cdc_log ORDER BY okey, seq",

    "sink_parquet" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",

    "scan_jdbc" ->
      "SELECT * FROM customer ORDER BY c_custkey"
  )
}
