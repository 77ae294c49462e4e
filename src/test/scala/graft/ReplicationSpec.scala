package graft

import org.apache.spark.sql.functions._

/** End-to-end lifecycle of the [[Replication]] facade — the reference's
  * `--full` / `--increment` / consistency-check surface (SURVEY.md §3.1).
  */
class ReplicationSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_repl").toString

  test("full sync snapshots admitted tables; include/exclude filters apply") {
    val dest = tmp()
    val src = new graft.sources.ParquetSource(sf)
    val counts = Replication.fullSync(spark, src,
      Seq("nation", "region", "customer"), dest,
      Replication.TableFilter(exclude = Set("customer")))
    assert(counts.keySet == Set("nation", "region"))
    assert(counts("nation") == Tables.t(spark, sf, "nation").count())
    assert(!new java.io.File(s"$dest/customer").exists())
  }

  test("incremental sync applies waves; applied state == batch collapse") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf)
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    val prog = Replication.incrementalSync(spark, log.schema, s"$base/in",
      s"$base/ckpt", s"$base/state")
    val applied = Replication.appliedState(spark, s"$base/state")
      .collect().map(_.toSeq).toSet
    val batch = q("agg_latest_by_version").collect().map(_.toSeq).toSet
    assert(applied == batch)
    // progress metrics match the applied pass: every log row flowed
    // through, one epoch per wave, position = the log's newest seq
    assert(prog.rowsApplied == log.count())
    assert(prog.epochs == 3)
    assert(prog.lastSeq.contains(3L))
  }

  test("multi-table sync: one stream fans out to per-table state dirs") {
    val base = tmp()
    // one binlog carrying two tables' events, interleaved in every wave
    val log = Tables.cdcLog(spark, sf).withColumn("table",
      when(col("okey") % 2 === 0, "orders_eu").otherwise("orders_us"))
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    val dirs = Map("orders_eu" -> s"$base/state_eu",
      "orders_us" -> s"$base/state_us")
    val prog = Replication.incrementalSyncMulti(spark, log.schema,
      s"$base/in", s"$base/ckpt", dirs)
    // per-table applied state == the batch collapse restricted to that
    // table's keys, via the same consistencyCheck a user would run
    val batch = q("agg_latest_by_version")
    for ((t, dir) <- dirs) {
      val expect = batch.filter(
        if (t == "orders_eu") col("okey") % 2 === 0 else col("okey") % 2 =!= 0)
      val rep = Replication.consistencyCheck(
        expect, Replication.appliedState(spark, dir), "okey")
      assert(rep.consistent, s"$t: $rep")
    }
    // both tables were present in all 3 waves; counts partition the log
    assert(prog.values.map(_.rowsApplied).sum == log.count())
    prog.values.foreach { p =>
      assert(p.epochs == 3)
      assert(p.lastSeq.contains(3L))
    }
    // a table not in the map is skipped, not synced
    assert(!new java.io.File(s"$base/state_other").exists())
  }

  test("configured sync applies include/exclude and rename mapping in one pass") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf).withColumn("table",
      when(col("okey") % 2 === 0, "orders_eu").otherwise("orders_us"))
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    // the reference's config block: skip orders_us, publish orders_eu
    // under its destination-side name
    val cfg = Replication.SyncConfig(
      filter = Replication.TableFilter(exclude = Set("orders_us")),
      remap = Map("orders_eu" -> "orders_eu_replica"))
    val prog = Replication.incrementalSyncConfigured(spark, log.schema,
      s"$base/in", s"$base/ckpt", s"$base/dest",
      Seq("orders_eu", "orders_us"), cfg)
    // progress is keyed by destination name; the excluded table never syncs
    assert(prog.keySet == Set("orders_eu_replica"))
    assert(new java.io.File(s"$base/dest/orders_eu_replica").exists())
    assert(!new java.io.File(s"$base/dest/orders_us").exists())
    assert(!new java.io.File(s"$base/dest/orders_eu").exists())
    val expect = q("agg_latest_by_version").filter(col("okey") % 2 === 0)
    assert(Replication.consistencyCheck(expect,
      Replication.appliedState(spark, s"$base/dest/orders_eu_replica"),
      "okey").consistent)
    assert(prog("orders_eu_replica").lastSeq.contains(3L))
  }

  test("incremental sync from an explicit position skips already-applied events") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf)
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    // the reference's --position: the seq-1 snapshot inserts are already
    // in the destination elsewhere; apply only the tail (seq > 1)
    val prog = Replication.incrementalSync(spark, log.schema, s"$base/in",
      s"$base/ckpt", s"$base/state", fromSeq = Some(1L))
    val applied = Replication.appliedState(spark, s"$base/state")
      .collect().map(_.toSeq).toSet
    // expected: latest-wins over ONLY the tail events, tombstones dropped
    val expect = log.filter(col("seq") > 1)
      .groupBy(col("okey"))
      .agg(max_by(struct(col("op"), col("price"), col("status"), col("ts"),
        col("seq")), col("seq")).as("l"))
      .filter(col("l.op") =!= "D")
      .select(col("okey"), col("l.op"), col("l.price"), col("l.status"),
        col("l.ts"))
      .collect().map(_.toSeq).toSet
    assert(applied == expect)
    assert(applied.nonEmpty, "tail-only state should not be empty")
    // consumption metrics still cover the whole log; position only gates state
    assert(prog.rowsApplied == log.count())
    assert(prog.lastSeq.contains(3L))
    // the wave at or below the position wrote NO delta: epochs counts
    // deltas written, not batches consumed
    assert(prog.epochs == 2, s"epochs=${prog.epochs}")
  }

  test("configured sync rejects rename mappings that collide on a destination") {
    val log = Tables.cdcLog(spark, sf).withColumn("table", lit("a"))
    val cfg = Replication.SyncConfig(
      remap = Map("shard_a" -> "t", "shard_b" -> "t"))
    val e = intercept[IllegalArgumentException] {
      Replication.incrementalSyncConfigured(spark, log.schema, tmp(), tmp(),
        tmp(), Seq("shard_a", "shard_b"), cfg)
    }
    assert(e.getMessage.contains("collides"))
  }

  test("multi-table sync: duplicate wave delivery is a no-op per table") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf).withColumn("table",
      when(col("okey") % 2 === 0, "d_a").otherwise("d_b"))
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    val dirs = Map("d_a" -> s"$base/sa", "d_b" -> s"$base/sb")
    Replication.incrementalSyncMulti(spark, log.schema, s"$base/in",
      s"$base/ckpt", dirs)
    val before = dirs.map { case (t, d) =>
      t -> Replication.appliedState(spark, d).collect().map(_.toSeq).toSet }
    // the last wave arrives AGAIN (at-least-once delivery): the staged
    // partitioned write + delete-then-rename must absorb the replay
    graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === 3), s"$base/in", 3)
    val p2 = Replication.incrementalSyncMulti(spark, log.schema, s"$base/in",
      s"$base/ckpt", dirs)
    for ((t, d) <- dirs) {
      assert(Replication.appliedState(spark, d).collect().map(_.toSeq).toSet
        == before(t), s"$t state changed under duplicate delivery")
      assert(p2(t).lastSeq.contains(3L))
    }
  }

  test("idle incremental pass applies nothing and reports zero progress") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf)
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    Replication.incrementalSync(spark, log.schema, s"$base/in",
      s"$base/ckpt", s"$base/state")
    val before = Replication.appliedState(spark, s"$base/state").count()
    // the cron-idle case: no new binlog since the last pass
    val p2 = Replication.incrementalSync(spark, log.schema, s"$base/in",
      s"$base/ckpt", s"$base/state")
    assert(p2.rowsApplied == 0 && p2.epochs == 0 && p2.lastSeq.isEmpty)
    assert(Replication.appliedState(spark, s"$base/state").count() == before)
  }

  test("multi-table sync handles a table absent from some waves") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf).withColumn("table",
      when(col("okey") % 2 === 0, "t_a").otherwise("t_b"))
    // t_b's inserts arrive a wave late: wave 0 is t_a-only
    graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === 1 && col("table") === "t_a"), s"$base/in", 0)
    graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === 1 && col("table") === "t_b" ||
        col("seq") === 2), s"$base/in", 1)
    graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === 3), s"$base/in", 2)
    val dirs = Map("t_a" -> s"$base/sa", "t_b" -> s"$base/sb")
    val prog = Replication.incrementalSyncMulti(spark, log.schema,
      s"$base/in", s"$base/ckpt", dirs)
    assert(prog("t_a").epochs == 3 && prog("t_b").epochs == 2)
    val batch = q("agg_latest_by_version")
    for ((t, dir) <- dirs) {
      val expect = batch.filter(
        if (t == "t_a") col("okey") % 2 === 0 else col("okey") % 2 =!= 0)
      assert(Replication.consistencyCheck(
        expect, Replication.appliedState(spark, dir), "okey").consistent)
    }
  }

  test("incremental sync compacts once epochs exceed the threshold") {
    val base = tmp()
    val log = Tables.cdcLog(spark, sf)
    (1 to 3).foreach(w => graft.streaming.StreamingOps.writeWave(
      log.filter(col("seq") === w), s"$base/in", w - 1))
    Replication.incrementalSync(spark, log.schema, s"$base/in",
      s"$base/ckpt", s"$base/state", compactEvery = 1)
    val epochs = new java.io.File(s"$base/state").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(epochs == 1, s"expected compaction to one epoch, got $epochs")
    val applied = Replication.appliedState(spark, s"$base/state")
      .collect().map(_.toSeq).toSet
    val batch = q("agg_latest_by_version").collect().map(_.toSeq).toSet
    assert(applied == batch)
  }

  test("consistency check: clean copy passes; mutation and loss are caught") {
    val src = Tables.t(spark, sf, "nation")
    assert(Replication.consistencyCheck(src, src, "n_nationkey").consistent)

    val mutated = src.withColumn("n_name",
      when(col("n_nationkey") === 0, lit("XX")).otherwise(col("n_name")))
    val m = Replication.consistencyCheck(src, mutated, "n_nationkey")
    assert(!m.checksumsMatch && m.nSrc == m.nDst)

    val lossy = src.filter(col("n_nationkey") =!= 3)
    val l = Replication.consistencyCheck(src, lossy, "n_nationkey")
    assert(l.missingInDst == 1 && l.extraInDst == 0 && !l.consistent)

    // schema drift: a destination missing a whole column must NOT pass
    // just because every shared value matches
    val drifted = src.drop("n_name")
    val d = Replication.consistencyCheck(src, drifted, "n_nationkey")
    assert(!d.schemaMatches && !d.consistent)
  }
}
