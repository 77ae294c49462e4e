package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based CDC semantics (SURVEY.md §5.2.3): for random I/U/D
  * sequences, the distributed latest-wins collapse must equal a
  * sequential replay; collapse must be idempotent and replay-safe.
  * (Raw scalacheck Gens with fixed seeds — the scalatest/scalacheck
  * bridge artifact is not in the offline dependency set.)
  */
class CdcPropertySpec extends SparkTestBase {

  case class Op(op: String, seq: Long, key: Long, v: Long)

  case class POp(op: String, seq: Long, key: Long, price: java.lang.Double,
    status: String, changed: Seq[String])

  case class SOp(op: String, seq: Long, key: Long, price: java.lang.Double,
    status: String, before: java.lang.Double)

  private val genOps: Gen[List[Op]] = for {
    nKeys <- Gen.choose(1, 8)
    n <- Gen.choose(1, 60)
    ops <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, nKeys.toLong)
      o <- Gen.oneOf("I", "U", "D")
      v <- Gen.choose(0L, 1000L)
    } yield (k, o, v))
  } yield ops.zipWithIndex.map { case ((k, o, v), i) => Op(o, i.toLong, k, v) }

  private def samples(n: Int): Seq[List[Op]] =
    (0 until n).flatMap(i =>
      genOps.apply(Gen.Parameters.default, Seed(42L + i)))

  /** reference semantics: sequential replay into a key->row map. */
  private def replay(ops: List[Op]): Map[Long, (String, Long)] =
    ops.sortBy(_.seq).foldLeft(Map.empty[Long, (String, Long)]) {
      case (m, Op(op, _, k, v)) => m.updated(k, (op, v))
    }.filter(_._2._1 != "D")

  /** the engine's collapse (same shape as A8/ST1). */
  private def collapse(ops: List[Op]): Map[Long, (String, Long)] = {
    import spark.implicits._
    val df = spark.createDataFrame(ops)
    df.groupBy($"key")
      .agg(max_by(struct($"op", $"v"), $"seq").as("l"))
      .select($"key", $"l.op", $"l.v")
      .filter($"l.op" =!= "D")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
  }

  test("distributed collapse == sequential replay (15 random logs)") {
    samples(15).foreach { ops =>
      assert(collapse(ops) == replay(ops), s"log: $ops")
    }
  }

  test("collapse is replay-idempotent (at-least-once delivery)") {
    samples(10).foreach { ops =>
      val tail = ops.takeRight(math.max(1, ops.length / 3))
      assert(collapse(ops ++ tail) == collapse(ops), s"log: $ops")
    }
  }

  test("schema evolution: evolved union keeps pre-DDL rows null, post-DDL typed") {
    val out = SparkEntry.queries("cdc_schema_evolution")(spark, sf).collect()
    val base = SparkEntry.queries("agg_latest_by_version")(spark, sf).collect()
    // the evolved collapse covers exactly the same surviving keys…
    assert(out.map(_.getLong(0)).toSet == base.map(_.getLong(0)).toSet)
    // …and the added column is null iff the key was last touched pre-DDL
    out.foreach { r =>
      val okey = r.getLong(0)
      val op = r.getString(1)
      val ch = if (r.isNullAt(5)) null else r.getString(5)
      if (op == "U") assert(ch == s"ch${okey % 4}",
        s"post-DDL key $okey lost its evolved column: $ch")
      else assert(ch == null, s"pre-DDL key $okey has a phantom value: $ch")
    }
  }

  /** engine collapse WITH tombstones kept — the per-epoch delta shape
    * (deletes must keep cancelling older epochs until the final read). */
  private def collapseKeepTombstones(ops: List[Op]): List[Op] = {
    import spark.implicits._
    spark.createDataFrame(ops)
      .groupBy($"key")
      .agg(max_by(struct($"op", $"seq", $"v"), $"seq").as("l"))
      .select($"key", $"l.op", $"l.seq", $"l.v")
      .collect()
      .map(r => Op(r.getString(1), r.getLong(2), r.getLong(0), r.getLong(3)))
      .toList
  }

  test("epoch-split deltas compose: collapse(∪ collapse(epoch_i)) == collapse(all)") {
    // the algebra readLatestState + compactState stand on: any contiguous
    // epoch split of the log, collapsed per epoch with tombstones KEPT,
    // must fold back to the full-log collapse
    samples(8).filter(_.length > 3).foreach { ops =>
      val sorted = ops.sortBy(_.seq)
      val chunks = sorted.grouped(math.max(1, sorted.length / 3)).toList
      val folded = collapse(chunks.flatMap(collapseKeepTombstones))
      assert(folded == collapse(ops), s"log: $ops")
    }
  }

  test("tombstone GC property: purge + any epoch re-delivery never changes the collapse") {
    import graft.streaming.StreamingOps
    // random logs, epoch-split into 3 delta dirs built directly (batch
    // only — the streaming pass is covered elsewhere); after a purging
    // compaction, re-delivering ANY subset of the folded epochs
    // (including all of them — the crashed-deletion window) must leave
    // the served collapse unchanged, and a strictly-newer delta must
    // still apply on top
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val chunks = sorted.grouped(math.max(1, sorted.length / 3)).toList
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_gcprop$si").toString
      def toDf(chunk: List[Op]) = {
        import spark.implicits._
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      }
      chunks.zipWithIndex.foreach { case (c, i) =>
        toDf(c).write.parquet(s"$state/epoch=$i") }
      val before = StreamingOps.readLatestState(spark, state)
        .collect().map(_.toSeq).toSet
      StreamingOps.compactState(spark, state, tombstoneHorizon = Some(0))
      assert(spark.read.parquet(state).filter(col("op") === "D").count() == 0,
        s"tombstones survived zero-horizon purge: $ops")
      // re-deliver every folded epoch (superset of any prefix/subset)
      chunks.zipWithIndex.foreach { case (c, i) =>
        toDf(c).write.mode("overwrite").parquet(s"$state/epoch=$i") }
      val replayed = StreamingOps.readLatestState(spark, state)
        .collect().map(_.toSeq).toSet
      assert(replayed == before, s"replay changed the collapse: $ops")
      // a strictly newer delta still applies through the floor gate
      val maxSeq = sorted.last.seq
      val newKey = 999L
      toDf(List(Op("I", maxSeq + 1, newKey, 7L)))
        .write.parquet(s"$state/epoch=${chunks.size}")
      val latest = StreamingOps.readLatestState(spark, state)
        .collect().map(_.toSeq).toSet
      assert(latest.size == before.size + 1, s"post-GC delta lost: $ops")
    }
  }

  test("TRUNCATE property: any log, any position — served == collapse of the tail") {
    import graft.streaming.{StateFs, StreamingOps}
    // random logs split into epoch dirs; a truncate floor at a random
    // mid-log position P must serve exactly the collapse of events with
    // seq > P — before AND after compaction (the floor gates folded
    // baselines too, and compaction physically reclaims the dead rows)
    // — and a post-truncate delta still applies.
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val chunks = sorted.grouped(math.max(1, sorted.length / 3)).toList
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_truncprop$si").toString
      def toDf(chunk: List[Op]) = {
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      }
      chunks.zipWithIndex.foreach { case (c, i) =>
        toDf(c).write.parquet(s"$state/epoch=$i") }
      val p = sorted(sorted.length / 2).seq
      StateFs.writeAtomic(s"$state/_trunc_floor", p.toString)
      def served() = StreamingOps.readLatestState(spark, state)
        .select(col("okey"), col("op"), col("price")).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      val want = replay(sorted.filter(_.seq > p))
        .map { case (k, (o, v)) => k -> (o, v.toDouble) }
      assert(served() == want, s"pre-compaction truncate diverged: $ops, p=$p")
      StreamingOps.compactState(spark, state)
      assert(served() == want, s"post-compaction truncate diverged: $ops, p=$p")
      assert(spark.read.option("mergeSchema", "true").parquet(state)
        .filter(col("seq") <= p).count() == 0,
        s"compaction kept truncate-dead rows: $ops, p=$p")
      // a strictly newer delta still applies above the floor
      val maxSeq = sorted.last.seq
      toDf(List(Op("I", maxSeq + 1, 999L, 7L)))
        .write.parquet(s"$state/epoch=${chunks.size}")
      assert(served().get(999L).contains(("I", 7.0)),
        s"post-truncate delta lost: $ops")
    }
  }

  test("DEFAULT property: any log, any DDL position — default iff the winner predates it") {
    import graft.streaming.{StateFs, StreamingOps}
    // random logs split at a random DDL position (a DDL lands at a batch
    // boundary): the pre-DDL epoch lacks the column, the post-DDL epoch
    // writes a value for even seqs and an EXPLICIT NULL for odd seqs.
    // Served channel must be the declared default exactly when the key's
    // winner predates the DDL; a post-DDL explicit NULL must stay NULL.
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val p = sorted(sorted.length / 2).seq
      val (pre, post) = sorted.partition(_.seq <= p)
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_defprop$si").toString
      def baseDf(chunk: List[Op]) =
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      if (pre.nonEmpty) baseDf(pre).write.parquet(s"$state/epoch=0")
      if (post.nonEmpty)
        baseDf(post).withColumn("channel",
          when(col("seq") % 2 === 0, concat(lit("v"), col("seq")))
            .otherwise(lit(null).cast("string")))
          .write.parquet(s"$state/epoch=1")
      StateFs.writeAtomic(s"$state/_defaults", s"channel\t$p\t'dflt'")
      val served = StreamingOps.readLatestState(spark, state)
        .select(col("okey"), col("channel")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val winners = sorted.foldLeft(Map.empty[Long, Op]) {
        (m, o) => m.updated(o.key, o) }
        .filter(_._2.op != "D")
      val want = winners.map { case (k, w) =>
        k -> (if (w.seq <= p) Some("dflt")
              else if (w.seq % 2 == 0) Some(s"v${w.seq}") else None)
      }
      assert(served == want, s"log: $ops, p=$p")
    }
  }

  test("DROP+RE-ADD property: any log, any drop/re-add positions — stale values never resurface") {
    import graft.streaming.{StateFs, StreamingOps}
    // random logs split at a drop position D and a later re-add position
    // A: era 1 (seq <= D) carries the column, era 2 (D < seq <= A) lacks
    // it, era 3 (seq > A) writes a value for even seqs and an EXPLICIT
    // NULL for odd seqs. Served channel: 'rd' (the re-add default) for
    // every winner at or below A — a pre-drop value surviving would be
    // the resurrection bug — and era-3 winners serve what they wrote.
    samples(6).filter(_.length > 5).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val d = sorted(sorted.length / 3).seq
      val a = sorted(2 * sorted.length / 3).seq max (d + 1)
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_dropprop$si").toString
      def baseDf(chunk: List[Op]) =
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      val era1 = sorted.filter(_.seq <= d)
      val era2 = sorted.filter(o => o.seq > d && o.seq <= a)
      val era3 = sorted.filter(_.seq > a)
      if (era1.nonEmpty)
        baseDf(era1).withColumn("channel", concat(lit("old"), col("seq")))
          .write.parquet(s"$state/epoch=0")
      if (era2.nonEmpty) baseDf(era2).write.parquet(s"$state/epoch=1")
      if (era3.nonEmpty)
        baseDf(era3).withColumn("channel",
          when(col("seq") % 2 === 0, concat(lit("new"), col("seq")))
            .otherwise(lit(null).cast("string")))
          .write.parquet(s"$state/epoch=2")
      StateFs.writeAtomic(s"$state/_drops", s"channel\t$d")
      StateFs.writeAtomic(s"$state/_defaults", s"channel\t$a\t'rd'")
      val served = StreamingOps.readLatestState(spark, state)
        .select(col("okey"), col("channel")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val winners = sorted.foldLeft(Map.empty[Long, Op]) {
        (m, o) => m.updated(o.key, o) }
        .filter(_._2.op != "D")
      val want = winners.map { case (k, w) =>
        k -> (if (w.seq <= a) Some("rd")
              else if (w.seq % 2 == 0) Some(s"new${w.seq}") else None)
      }
      assert(served == want, s"log: $ops, d=$d, a=$a")
    }
  }

  test("CHANGES-BETWEEN property: any log, any (from, to] window — the " +
      "audit export == per-key latest in-window event, tombstones included") {
    import graft.streaming.{StateFs, StreamingOps}
    // random history-retaining state dirs (events land verbatim, the
    // keepHistory layout) probed with random incident windows: the
    // bounded export must equal the sequential reference — for each key
    // changed in (from, to], its latest in-window event, deletes
    // surfacing as tombstone rows with their image carried.
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_cbprop$si").toString
      def toDf(chunk: List[Op]) =
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      sorted.grouped(math.max(1, sorted.length / 3)).zipWithIndex
        .foreach { case (c, i) => toDf(c).write.parquet(s"$state/epoch=$i") }
      StateFs.writeAtomic(s"$state/_history", "true")
      val seqs = sorted.map(_.seq)
      val rnd = new scala.util.Random(77 + si)
      val mid = seqs(seqs.length / 2)
      val (a, b) = (seqs(rnd.nextInt(seqs.length)),
        seqs(rnd.nextInt(seqs.length)))
      val windows = Seq(
        (seqs.head - 1, mid), // from the very start
        (mid, seqs.last), // to the very end
        (math.min(a, b) - 1, math.max(a, b))) // arbitrary interior
      windows.filter { case (f, t) => t > f }.foreach { case (from, to) =>
        val got = StreamingOps.readStateChanges(spark, state, from,
          untilSeq = Some(to))
          .select(col("okey"), col("op"), col("price"), col("seq"))
          .collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2),
            r.getLong(3))).toMap
        val want = sorted.filter(o => o.seq > from && o.seq <= to)
          .groupBy(_.key).map { case (k, es) =>
            val w = es.maxBy(_.seq)
            k -> (w.op, w.v.toDouble, w.seq)
          }
        assert(got == want, s"log: $ops window=($from,$to]")
      }
    }
  }

  test("TIME TRAVEL property: any log, any position — as-of == replay of the prefix") {
    import graft.streaming.{StateFs, StreamingOps}
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_ttprop$si").toString
      spark.createDataFrame(sorted)
        .select(col("op"), col("seq"),
          timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
          col("key").as("okey"), col("v").cast("double").as("price"),
          lit("S").as("status"))
        .write.parquet(s"$state/epoch=0")
      StateFs.writeAtomic(s"$state/_history", "true")
      Seq(sorted.head.seq, sorted(sorted.length / 2).seq,
          sorted.last.seq).distinct.foreach { p =>
        val served = StreamingOps.readLatestState(spark, state, Some(p))
          .select(col("okey"), col("price")).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val want = replay(sorted.filter(_.seq <= p))
          .map { case (k, (_, v)) => k -> v.toDouble }
        assert(served == want, s"log: $ops, asOf=$p")
      }
    }
  }

  test("bucket-probe read == full read restricted to those buckets (random logs)") {
    import graft.streaming.StreamingOps
    // the layout contract behind the touched-key probes: over random
    // logs, with a MIXED physical layout (a bucketed compaction baseline
    // under an unbucketed hand-written delta — the worst case the gate
    // must survive), a bucket-set read serves EXACTLY the full read's
    // rows for keys hashing into those buckets — pruning is IO-only
    samples(5).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val (first, rest) = sorted.splitAt(sorted.length / 2)
      val state = java.nio.file.Files
        .createTempDirectory(s"graft_bktprop$si").toString
      def toDf(chunk: List[Op]) = {
        import spark.implicits._
        spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"))
      }
      toDf(first).write.parquet(s"$state/epoch=0")
      StreamingOps.compactState(spark, state) // noop at 1 epoch...
      toDf(rest).write.parquet(s"$state/epoch=1")
      StreamingOps.compactState(spark, state) // ...bucketed baseline here
      toDf(List(Op("U", sorted.last.seq + 1, sorted.head.key, 777L)))
        .write.parquet(s"$state/epoch=2") // unbucketed tail delta
      val full = StreamingOps.readLatestState(spark, state)
        .withColumn("_b", pmod(xxhash64(col("okey")), lit(64L)))
        .collect()
      val present = full.map(_.getAs[Long]("_b")).distinct.toSeq
      // probe a strict subset when possible, the full set otherwise
      val probed = present.sorted.take(math.max(1, present.length / 2))
      // THE contract (the scaladoc's "callers only consult keys whose
      // buckets they asked for"): every probed key serves EXACTLY its
      // full-read row — completeness AND exactness; keys outside the
      // probe may surface via NULL-bucket (unbucketed-epoch) rows and
      // are contractually unconsulted, but even those must never be
      // rows the full read does not serve... with one carve-out: an
      // unprobed key whose history SPANS bucketed and unbucketed epochs
      // legitimately serves a partial view (its bucketed rows were
      // pruned). So: exact on probed keys; no phantom KEYS anywhere.
      val bucketOfKey: Map[Any, Long] =
        full.map(r => (r.toSeq.head, r.getAs[Long]("_b"))).toMap
      val want = full.filter(r => probed.contains(r.getAs[Long]("_b")))
        .map(_.toSeq.dropRight(1)).toSet
      val got = StreamingOps.readLatestState(spark, state,
          buckets = Some(probed))
        .collect().map(_.toSeq).toSet
      assert(got.filter(r => bucketOfKey.get(r.head).exists(probed.contains))
          == want,
        s"probed keys must serve exactly their full-read rows; " +
          s"log: $ops, probed: $probed")
      assert(got.map(_.head).subsetOf(bucketOfKey.keySet),
        s"probe invented keys; log: $ops, probed: $probed")
    }
  }

  test("snapshot ∪ delta == full-log collapse") {
    samples(10).filter(_.length > 2).foreach { ops =>
      val sorted = ops.sortBy(_.seq)
      val (snapshotOps, delta) = sorted.splitAt(ops.length / 2)
      val snapshot = replay(snapshotOps).map { case (k, (_, v)) =>
        Op("I", snapshotOps.filter(_.key == k).map(_.seq).max, k, v)
      }.toList
      // a snapshot materializes state as Inserts, erasing the op label of
      // the last source op — the invariant is over key->value state, not
      // over op labels
      val got = collapse(snapshot ++ delta).map { case (k, (_, v)) => k -> v }
      val want = replay(ops).map { case (k, (_, v)) => k -> v }
      assert(got == want, s"log: $ops")
    }
  }

  test("PARTIAL-IMAGE property: any log, any wave split — served == per-column fold") {
    import graft.streaming.StreamingOps
    // random MINIMAL-row-image logs (inserts full, updates carrying a
    // random changed subset — explicit NULL sets included — deletes,
    // updates of absent keys), split into waves at random batch
    // boundaries: the apply-time completion composed across batches
    // must equal a sequential per-column fold. The fold's rules ARE the
    // contract: changed column → event value (NULL included); unchanged
    // → prior image's value; prior absent or tombstoned → NULL.
    val gen: Gen[List[POp]] = for {
      nKeys <- Gen.choose(1, 6)
      n <- Gen.choose(4, 50)
      evs <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, nKeys.toLong)
        o <- Gen.oneOf("I", "U", "D")
        pv <- Gen.choose(0, 999).map(_.toDouble)
        sv <- Gen.oneOf(Option("A"), Option("B"), Option.empty[String])
        ch <- Gen.oneOf(Seq("price"), Seq("status"), Seq("price", "status"))
      } yield (k, o, pv, sv, ch))
    } yield evs.zipWithIndex.map { case ((k, o, pv, sv, ch), i) =>
      o match {
        case "I" => POp("I", i.toLong, k, pv, sv.orNull, null)
        case "U" => POp("U", i.toLong, k,
          if (ch.contains("price")) pv else null,
          if (ch.contains("status")) sv.orNull else null, ch)
        case _ => POp("D", i.toLong, k, null, null, null)
      }
    }
    def fold(evs: Seq[POp]): Map[Long, (Option[Double], Option[String])] =
      evs.sortBy(_.seq)
        .foldLeft(Map.empty[Long, Option[(Option[Double], Option[String])]]) {
          (m, e) => e.op match {
            case "I" => m.updated(e.key,
              Some((Option(e.price).map(_.doubleValue), Option(e.status))))
            case "D" => m.updated(e.key, None)
            case _ =>
              val prev = m.getOrElse(e.key, None)
                .getOrElse((Option.empty[Double], Option.empty[String]))
              m.updated(e.key, Some((
                if (e.changed.contains("price"))
                  Option(e.price).map(_.doubleValue) else prev._1,
                if (e.changed.contains("status"))
                  Option(e.status) else prev._2)))
          }
        }.collect { case (k, Some(img)) => k -> img }
    val logs = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)))
    logs.zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val waves = sorted.grouped(
        math.max(1, sorted.length / (1 + si % 3))).toList
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_partprop$si").toString
      waves.zipWithIndex.foreach { case (w, i) =>
        val df = spark.createDataFrame(w)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("price"), col("status"),
            col("changed"))
        StreamingOps.writeWave(df, s"$base/in", i)
        StreamingOps.runCdcPass(spark, df.schema, s"$base/in",
          s"$base/ckpt", s"$base/state",
          partialImageCol = Some("changed"))
      }
      val served = StreamingOps.readLatestState(spark, s"$base/state")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(2)).map(_.toString.toDouble),
            Option(r.getString(3))))).toMap
      assert(served == fold(sorted),
        s"partial fold diverged (log $si, ${waves.size} waves): $ops")
    }
  }

  test("STRICT-BEFORE property: any log, any wave split — served state " +
      "and DLQ == the sequential chain fold") {
    import graft.streaming.StreamingOps
    // random FULL-row-image logs where a random subset of updates LIE
    // about their before image, split into waves at random boundaries:
    // the gate's verdicts composed across batches must equal a
    // sequential fold whose rules ARE the contract — an update's
    // expected before is its in-batch predecessor's declared after
    // (chain), or the pre-batch applied state for the key's first batch
    // event; a mismatch quarantines the key's remaining batch events;
    // the next batch verdicts against the actual applied state again.
    case class Raw(key: Long, op: String, v: Double, st: String,
      lie: Boolean)
    val gen: Gen[List[Raw]] = for {
      nKeys <- Gen.choose(1, 6)
      n <- Gen.choose(4, 50)
      evs <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, nKeys.toLong)
        o <- Gen.frequency((3, "I"), (4, "U"), (2, "D"))
        v <- Gen.choose(0, 999).map(_.toDouble)
        st <- Gen.oneOf("A", "B")
        lie <- Gen.frequency((3, false), (1, true))
      } yield Raw(k, o, v, st, lie))
    } yield evs
    val logs = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(4242L + i)))
    logs.zipWithIndex.foreach { case (raws, si) =>
      val seqd = raws.zipWithIndex.map { case (r, i) => (r, i.toLong) }
      val waves = seqd.grouped(
        math.max(1, seqd.length / (1 + si % 3))).toList
      // the reference fold ASSIGNS each update's declared before (true
      // chain value, or a deterministic lie) and verdicts sequentially
      var state = Map.empty[Long, (Double, String)]
      val events = scala.collection.mutable.ListBuffer.empty[SOp]
      val dlqModel = scala.collection.mutable.Set.empty[Long]
      waves.foreach { w =>
        val quarantined = scala.collection.mutable.Set.empty[Long]
        val chainAfter =
          scala.collection.mutable.Map.empty[Long, Option[Double]]
        w.foreach { case (r, seq) =>
          val expected: Option[Double] =
            chainAfter.getOrElse(r.key, state.get(r.key).map(_._1))
          val before: java.lang.Double =
            if (r.op != "U") null
            else if (!r.lie) expected.map(Double.box).orNull
            else expected match {
              case None => Double.box(123456.0)
              case Some(e) =>
                if (seq % 2 == 0) null else Double.box(e + 777.0)
            }
          events += SOp(r.op, seq, r.key,
            if (r.op == "D") null else Double.box(r.v),
            if (r.op == "D") null else r.st, before)
          if (quarantined(r.key)) dlqModel += seq
          else r.op match {
            case "I" => state += r.key -> ((r.v, r.st))
            case "D" => state -= r.key
            case _ =>
              val ok = (Option(before).map(_.doubleValue), expected) match {
                case (None, None) => true
                case (Some(b), Some(e)) => b == e
                case _ => false
              }
              if (ok) state += r.key -> ((r.v, r.st))
              else { dlqModel += seq; quarantined += r.key }
          }
          chainAfter(r.key) = if (r.op == "D") None else Some(r.v)
        }
      }
      // drive the impl over the SAME waves
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_strictprop$si").toString
      val evList = events.toList
      val evWaves = evList.grouped(
        math.max(1, seqd.length / (1 + si % 3))).toList
      evWaves.zipWithIndex.foreach { case (w, i) =>
        val df = spark.createDataFrame(w)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("price"), col("status"),
            col("before"))
        StreamingOps.writeWave(df, s"$base/in", i)
        StreamingOps.runCdcPass(spark, df.schema, s"$base/in",
          s"$base/ckpt", s"$base/state",
          strictBefore = Some(("price", "before")),
          conflictDlq = Some(s"$base/dlq"))
      }
      val served = StreamingOps.readLatestState(spark, s"$base/state")
        .collect().map(r => r.getLong(0) ->
          ((r.get(2).toString.toDouble, r.getString(3)))).toMap
      assert(served == state,
        s"strict fold diverged (log $si, ${evWaves.size} waves): $evList")
      // a conflict-free run never creates the DLQ dir (the gate skips
      // empty epoch writes) — absent reads as the empty verdict set
      val dlqImpl =
        if (!graft.streaming.StateFs.exists(s"$base/dlq")) Set.empty[Long]
        else spark.read.parquet(s"$base/dlq")
          .select(col("seq")).collect().map(_.getLong(0)).toSet
      assert(dlqImpl == dlqModel.toSet,
        s"DLQ diverged (log $si, ${evWaves.size} waves): $evList")
    }
  }

  test("WIDEN property: any log, any widen point — narrow epochs serve exactly under the wide type") {
    import graft.streaming.StreamingOps
    // random logs split at a random wave boundary: waves before the
    // boundary carry `qty` as INT, waves after as BIGINT with values
    // above 2^31 — the served state must equal the sequential replay
    // with every qty exact, pre-widening values included (the parquet
    // INT32 physical encoding read natively under the published LONG)
    samples(6).filter(_.length > 3).zipWithIndex.foreach { case (ops, si) =>
      val sorted = ops.sortBy(_.seq)
      val cut = sorted(sorted.length / 2).seq
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_widenprop$si").toString
      def toDf(chunk: List[Op], wide: Boolean) = {
        val d = spark.createDataFrame(chunk)
          .select(col("op"), col("seq"),
            timestamp_seconds(lit(1700000000L) + col("seq")).as("ts"),
            col("key").as("okey"), col("v").cast("double").as("price"),
            lit("S").as("status"),
            when(col("op") === "D", lit(null)).otherwise(
              if (wide) col("v") + lit(3000000000L) else col("v"))
              .as("qty"))
        d.withColumn("qty",
          col("qty").cast(if (wide) "bigint" else "int"))
      }
      val narrow = sorted.filter(_.seq <= cut)
      val wide = sorted.filter(_.seq > cut)
      var w = 0
      if (narrow.nonEmpty) {
        StreamingOps.writeWave(toDf(narrow, wide = false), s"$base/in", w)
        StreamingOps.runCdcPass(spark,
          toDf(narrow, wide = false).schema, s"$base/in", s"$base/ckpt",
          s"$base/state")
        w += 1
      }
      if (wide.nonEmpty) {
        StreamingOps.writeWave(toDf(wide, wide = true), s"$base/in", w)
        StreamingOps.runCdcPass(spark, toDf(wide, wide = true).schema,
          s"$base/in", s"$base/ckpt", s"$base/state")
      }
      val served = StreamingOps.readLatestState(spark, s"$base/state")
        .select(col("okey"), col("qty")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = replay(sorted).map { case (k, (_, v)) =>
        k -> (if (sorted.filter(_.key == k).filter(_.op != "D")
          .maxBy(_.seq).seq > cut) v + 3000000000L else v)
      }
      assert(served == want,
        s"widen diverged (log $si, cut $cut): $ops")
    }
  }
}
