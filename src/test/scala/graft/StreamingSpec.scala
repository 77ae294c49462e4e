package graft

import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence (SURVEY.md §5.2.4) — the verification
  * story for the non-oracle streaming operators.
  */
class StreamingSpec extends SparkTestBase {

  test("stream CDC apply == batch latest-wins collapse") {
    val stream = q("stream_cdc_apply").collect()
    val batch = q("agg_latest_by_version").collect()
    assert(stream.length == batch.length)
    assert(stream.map(_.toSeq).toSet == batch.map(_.toSeq).toSet)
  }

  test("idempotent sink: duplicated final wave changes nothing") {
    val once = q("stream_cdc_apply").collect().map(_.toSeq).toSet
    val replayed = q("sink_foreachbatch_idempotent").collect().map(_.toSeq).toSet
    assert(once == replayed)
  }

  test("session windows (streaming, append) are a subset of batch sessions") {
    val streamed = q("stream_window_session").collect().map(_.toSeq).toSet
    val ev = Tables.t(spark, sf, "events")
    val batch = ev.groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("w.end").as("we"), col("user_id"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(streamed.subsetOf(batch),
      s"streaming emitted a session batch doesn't have: ${streamed -- batch}")
    assert(streamed.nonEmpty)
  }

  test("late data beyond watermark is dropped") {
    val out = q("stream_late_data")
    val ev = Tables.t(spark, sf, "events")
    val held = ev.filter(col("event_id") % 10 === 0 && dayofmonth(col("ts")) <= 2)
    // the day-1/day-2 windows must NOT count the held-back (late) rows
    val d1 = out.filter(col("ws") === lit("2024-01-01").cast("timestamp")).collect()
    if (d1.nonEmpty) {
      val onTimeD1 = ev.filter(dayofmonth(col("ts")) === 1 &&
        !(col("event_id") % 10 === 0)).count()
      assert(d1(0).getLong(1) == onTimeD1,
        s"day-1 window counted late rows: ${d1(0).getLong(1)} vs $onTimeD1")
    }
    assert(held.count() > 0, "fixture must hold back some rows")
  }

  test("checkpoint resume processes every row exactly once") {
    val out = q("stream_checkpoint_resume").collect()
    val ev = Tables.t(spark, sf, "events")
    val batch = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec2(col("value"))).cast(Tables.D2).cast("double").as("total"))
      .orderBy(col("event_type")).collect()
    assert(out.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("cdc apply survives kill + resume mid-stream (state on disk, not memory)") {
    import graft.streaming.StreamingOps
    val log = Tables.cdcLog(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val in = s"$tmp/in"
    StreamingOps.writeWave(log.filter(col("seq") === 1), in, 0)
    StreamingOps.writeWave(log.filter(col("seq") === 2), in, 1)
    StreamingOps.runCdcPass(spark, log.schema, in, s"$tmp/ckpt", s"$tmp/state")
    // first query stopped ("crash"); more data arrives; a NEW query resumes
    // from the same checkpoint — state must come from disk, not driver memory
    StreamingOps.writeWave(log.filter(col("seq") === 3), in, 2)
    StreamingOps.runCdcPass(spark, log.schema, in, s"$tmp/ckpt", s"$tmp/state")
    val resumed = StreamingOps.readLatestState(spark, s"$tmp/state")
      .collect().map(_.toSeq).toSet
    val batch = q("agg_latest_by_version").collect().map(_.toSeq).toSet
    assert(resumed == batch)
  }

  test("watermark dedup returns exactly the original events") {
    assert(q("stream_dedup_watermark").count() ==
      Tables.t(spark, sf, "events").count())
  }
}
