package graft

import org.apache.spark.sql.functions._

/** LLM-operator semantics that the SQL oracle cannot cover
  * (MinHash/SimHash use Spark-internal xxhash64): planted near-dups
  * must surface, random pairs must not.
  */
class LlmSpec extends SparkTestBase {

  test("MinHash-LSH surfaces every planted near-dup pair") {
    val out = q("llm_dedup_minhash").collect()
    val planted = out.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    val docs = Tables.t(spark, sf, "documents")
    val nPlanted = docs.filter(col("doc_id") % 5 === 0).count()
    // dropping the first word keeps Jaccard ~0.97 — all planted pairs must
    // survive 4x4 banding with overwhelming probability
    assert(planted.length >= (nPlanted * 0.9).toInt,
      s"found ${planted.length} of $nPlanted planted pairs")
    planted.foreach(r => assert(r.getDouble(2) > 0.6))
  }

  test("MinHash-LSH output ⊆ exact ground truth, recall >= 90%") {
    // At sf0.001 the corpus genuinely contains non-planted pairs with
    // Jaccard >= 0.6 (tiny bag-of-words docs share shingles), so a
    // "planted-only" false-positive bound is the wrong property. The right
    // one: against brute-force all-pairs exact Jaccard (feasible only at
    // test scale), the LSH path must emit no pair outside the ground truth
    // and must recover >= 90% of it.
    val out = q("llm_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = Tables.t(spark, sf, "documents")
    val nd = d.select(col("doc_id"), col("text")).unionByName(
      d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 100000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1, length(text))").as("text")))
    val sh = nd.select(col("doc_id"), expr(graft.ops.Llm.shingleExpr).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .withColumn("j",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double"))
      .filter(col("j") >= 0.6)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((out -- truth).isEmpty, s"false positives: ${out -- truth}")
    val recall = if (truth.isEmpty) 1.0
      else out.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("dedup clusters: labels are the true component minima of the pair graph") {
    val pairs = q("llm_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = q("llm_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(out.keySet == nodes.toSet)
    // component label = min id over the component, per the union-find truth
    val want = nodes.map(n => n -> nodes.filter(m => find(m) == find(n)).min).toMap
    assert(out == want)
    // planted near-dups always cluster with their original
    pairs.collect { case (a, b) if b == a + 100000 => assert(out(b) == out(a)) }
  }

  test("SimHash: planted near-dups at small hamming distance") {
    val out = q("llm_dedup_simhash")
    val avgPlanted = out.agg(avg(col("hamming"))).collect()(0).getDouble(0)
    assert(avgPlanted < 4.0, s"avg hamming of planted pairs = $avgPlanted")
  }

  test("exact dedup collapses exactly the planted duplicates") {
    val docs = Tables.t(spark, sf, "documents")
    val nDocs = docs.count()
    val nPlanted = docs.filter(col("doc_id") % 5 === 0).count()
    val out = q("llm_dedup_exact")
    assert(out.count() == nDocs) // one group per distinct text
    assert(out.filter(col("n_copies") === 2).count() == nPlanted)
    // kept id is always the original, never the planted copy
    assert(out.filter(col("keep_id") >= 100000).count() == 0)
  }

  test("brute-force topk: self excluded, k rows per query, cos in [-1,1]") {
    val out = q("llm_sim_topk")
    assert(out.filter(col("q_id") === col("n_id")).count() == 0)
    assert(out.filter(col("cos") > 1.0 || col("cos") < -1.0).count() == 0)
    val perQ = out.groupBy("q_id").count().collect()
    perQ.foreach(r => assert(r.getLong(1) == 5))
  }

  test("LSH topk is a subset-ranking of brute force per query") {
    val bf = q("llm_sim_topk").select(col("q_id"), col("n_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = q("llm_sim_lsh_topk").filter(col("q_id") < 20).collect()
    // every LSH hit's cosine must equal the brute-force cosine when present
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      bf.get(k).foreach(c => assert(c == r.getDouble(3), s"cos mismatch at $k"))
    }
  }

  test("fingerprint: identical text => identical fp, mutated => different") {
    val out = q("llm_fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet.size > out.size / 2) // fingerprints discriminate
  }

  test("incremental dedup over successive batches composes to the full recompute") {
    // split the near-dup corpus into snapshot + two arriving batches;
    // each ingest sees only the index (snapshot artifacts + every PRIOR
    // batch's appended artifacts), never the corpus text. The union of
    // per-ingest pairs plus the snapshot's own pairs must equal the full
    // recompute — no pair lost at a batch boundary, none double-emitted.
    val full = q("llm_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val snapPairs = full.filter(p => p._1 < 100000 && p._2 < 100000)
    val d = Tables.t(spark, sf, "documents")
    val snapshot = d.select(col("doc_id"), col("text"))
    val arriving = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1, length(text))").as("text"))
    val idx = s"${TmpDirs.create("graft_incr_idx")}/idx"
    ops.Llm.dedupIndexSeed(spark, snapshot, idx)
    val b1 = ops.Llm.dedupIncremental(spark,
      arriving.filter(col("doc_id") % 2 === 0), idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // index maintenance between ingests: fold the appended small files;
    // the second ingest must see the IDENTICAL index
    ops.Llm.dedupIndexCompact(spark, idx, targetFiles = 2)
    assert(new java.io.File(s"$idx/bands").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 2,
      "compaction must bound the index file count")
    val b2 = ops.Llm.dedupIncremental(spark,
      arriving.filter(col("doc_id") % 2 =!= 0), idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert((b1 & b2).isEmpty, "a pair emitted by two different ingests")
    assert((b1 & snapPairs).isEmpty && (b2 & snapPairs).isEmpty,
      "an ingest re-emitted a snapshot-only pair")
    assert((snapPairs | b1 | b2) == full,
      s"composition diverged: missing ${(full -- snapPairs -- b1 -- b2).take(5)}, " +
        s"extra ${((snapPairs | b1 | b2) -- full).take(5)}")
  }

  test("ANN ingest: a later batch's queries can find an earlier batch's vectors") {
    // the index must ADVANCE between ingests: B2 vectors planted next to
    // B1 vectors (tiny perturbation of the same embedding) must rank them
    // as neighbors, which is only possible if B1's assignments appended.
    val all = Tables.t(spark, sf, "embeddings").select(
      col("vec_id"), functions.VectorOps.toDouble(col("embedding")).as("v"))
    val idx = s"${TmpDirs.create("graft_ann_spec")}/idx"
    ops.Llm.annIndexSeed(spark, all.filter(col("vec_id") % 10 =!= 0), idx)
    // B1: planted copies of snapshot vectors (ids 200000+)
    val b1 = all.filter(col("vec_id") % 10 === 0 && col("vec_id") < 250)
      .select((col("vec_id") + 200000).as("vec_id"), col("v"))
    ops.Llm.annIngest(spark, b1, idx)
    // assignment-table maintenance between ingests — B2 must still see
    // B1's vectors through the compacted index
    ops.Llm.annIndexCompact(spark, idx, targetFiles = 2)
    // B2: exact twins of B1's vectors under fresh ids — cosine 1.0 with
    // their B1 counterpart and nothing else
    val b2 = b1.select((col("vec_id") + 100000).as("vec_id"), col("v"))
    val res = ops.Llm.annIngest(spark, b2, idx).collect()
    val top1 = res.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every B2 query's top-1 must be its B1 twin — visible only because
    // the first ingest appended its assignments
    val hits = top1.count { case (q, n) => n == q - 100000 }
    assert(hits == top1.size,
      s"only $hits/${top1.size} B2 queries found their B1 twin — " +
        "the index did not advance between ingests")
  }

  test("ANN reseed: centroids refresh from the accumulated index; no vector lost, recall holds") {
    val all = Tables.t(spark, sf, "embeddings").select(
      col("vec_id"), functions.VectorOps.toDouble(col("embedding")).as("v"))
    val idx = s"${TmpDirs.create("graft_annrs")}/idx"
    // seed on a MINORITY slice so the accumulated ingests genuinely move
    // the distribution the seed-time centroids were trained on
    ops.Llm.annIndexSeed(spark, all.filter(col("vec_id") % 10 === 0), idx)
    val rest = all.filter(col("vec_id") % 10 =!= 0)
    (0 until 3).foreach(i =>
      ops.Llm.annIngest(spark, rest.filter(col("vec_id") % 3 === i), idx))
    val beforeIds = spark.read.parquet(s"$idx/assigned")
      .select(col("n_id")).collect().map(_.getLong(0)).toSet
    ops.Llm.annReseed(spark, idx)
    // no vector lost or duplicated by the double swap
    val afterIds = spark.read.parquet(s"$idx/assigned")
      .select(col("n_id")).collect().map(_.getLong(0)).toSet
    assert(afterIds == beforeIds, "reseed must preserve the indexed vector set")
    assert(spark.read.parquet(s"$idx/assigned").count() == beforeIds.size.toLong)
    // centroids genuinely refreshed: trained on the accumulated index,
    // not the stale seed snapshot (16 refreshed cells still published)
    assert(spark.read.parquet(s"$idx/centroids").count() == 16L)
    // later queries still find EVERY earlier vector: exact twins of a
    // pre-reseed sample must come back as top-1 at cosine ~1.0
    val probesSrc = rest.filter(col("vec_id") < 300)
    val twins = probesSrc.select((col("vec_id") + 700000).as("vec_id"), col("v"))
    val res = ops.Llm.annIngest(spark, twins, idx).collect()
    val top1 = res.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = top1.count { case (q, n) => n == q - 700000 }
    assert(hits == top1.size && top1.nonEmpty,
      s"only $hits/${top1.size} twin probes found their pre-reseed vector")
    // recall vs brute force must NOT degrade: for a non-planted probe
    // batch, post-reseed IVF top-1 matches brute-force top-1 at least as
    // often as the pre-reseed index shape guarantees (>= 60%, the
    // llm_sim_ivf_topk property bound)
    val probeB = probesSrc.select((col("vec_id") + 800000).as("vec_id"),
      expr("transform(v, x -> x + 0.01)").as("v"))
    val ivfTop = ops.Llm.annIngest(spark, probeB, idx).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute-force truth over the same candidate universe (index ∪ probes,
    // minus each probe itself)
    graft.functions.VectorOps.register(spark)
    val cand = spark.read.parquet(s"$idx/assigned")
      .select(col("n_id"), col("n_v"))
    val truth = probeB.select(col("vec_id").as("q_id"), col("v").as("q_v"))
      .crossJoin(cand)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", expr("cosine_sim(q_v, n_v)"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("n_id"))))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = ivfTop.count { case (q, n) => truth.get(q).contains(n) }
    assert(agree.toDouble / truth.size >= 0.6,
      s"post-reseed recall ${agree.toDouble / truth.size} < 0.6")
  }

  test("incremental clusters over successive batches equal the full recompute") {
    // labels maintained by contraction across TWO ingests (the second
    // contracts against labels the first already updated, so batch-2
    // pairs meet both snapshot-era supernodes and batch-1 members) must
    // land on exactly the one-shot CC fixpoint.
    val full = q("llm_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = Tables.t(spark, sf, "documents")
    val snapshot = d.select(col("doc_id"), col("text"))
    val arriving = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1, length(text))").as("text"))
    val idx = s"${TmpDirs.create("graft_ci_idx")}/idx"
    ops.Llm.dedupClustersSeed(spark, snapshot, idx)
    // a QUIET batch first (novel reversed-text docs, no near-dups): the
    // labels must come back unchanged via the skip-rewrite path
    val quiet = ops.Llm.dedupClustersIngest(spark,
      d.filter(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 500000).as("doc_id"),
          reverse(col("text")).as("text")), idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeded = spark.read.parquet(s"$idx/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(quiet == seeded, "a quiet batch must leave the labels untouched")
    ops.Llm.dedupClustersIngest(spark,
      arriving.filter(col("doc_id") % 2 === 0), idx)
    val labels = ops.Llm.dedupClustersIngest(spark,
      arriving.filter(col("doc_id") % 2 =!= 0), idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == full,
      s"incremental labels diverged: missing ${(full.toSet -- labels.toSet).take(3)}, " +
        s"extra ${(labels.toSet -- full.toSet).take(3)}")
  }

  test("index compaction auto-heals a crashed swap") {
    val d = Tables.t(spark, sf, "documents").limit(50)
      .select(col("doc_id"), col("text"))
    val idx = s"${TmpDirs.create("graft_heal_idx")}/idx"
    ops.Llm.dedupIndexSeed(spark, d, idx)
    val before = spark.read.parquet(s"$idx/bands").count()
    // simulate a crash BETWEEN the two swap moves: live renamed to
    // trash, the staged rewrite never moved in
    graft.streaming.StateFs.moveDir(s"$idx/bands", s"$idx/bands_old")
    ops.Llm.dedupIndexCompact(spark, idx, targetFiles = 1)
    assert(spark.read.parquet(s"$idx/bands").count() == before,
      "the healed index must hold every pre-crash row")
    assert(!graft.streaming.StateFs.exists(s"$idx/bands_old"))
  }

  test("stratified split: exact per-stratum fractions, total, deterministic") {
    import org.apache.spark.sql.functions._
    val split = ops.Llm.queries("llm_stratified_split")(spark, sf)
    val docs = Tables.t(spark, sf, "documents")
    // every document assigned exactly once
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())
    // EXACT fractions per stratum: train = ⌊0.8n⌋, val = ⌊0.1n⌋, rest test
    val bySrc = split.groupBy(col("source"))
      .pivot(col("split"), Seq("train", "val", "test"))
      .agg(count(lit(1))).collect()
    bySrc.foreach { r =>
      def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      val (tr, va, te) = (g(1), g(2), g(3))
      val n = tr + va + te
      assert(tr == math.floor(n * 0.8).toLong,
        s"${r.getString(0)}: train $tr of $n")
      assert(va == math.floor(n * 0.1).toLong,
        s"${r.getString(0)}: val $va of $n")
    }
    // content-stable: a re-run reproduces the assignment bit for bit
    val again = ops.Llm.queries("llm_stratified_split")(spark, sf)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("global shuffle: a permutation, deterministic, salt-sensitive") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType}
    val sh = ops.Llm.queries("llm_global_shuffle")(spark, sf)
    val docs = Tables.t(spark, sf, "documents")
    // every document appears exactly once, positions are per-shard
    // contiguous 1..n (a true permutation, not a sample)
    assert(sh.count() == docs.count())
    assert(sh.select("doc_id").distinct().count() == docs.count())
    val perShard = sh.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
        max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"))
      .collect()
    perShard.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == r.getLong(1) &&
        r.getLong(4) == r.getLong(1), s"shard ${r.getLong(0)} not contiguous")
    }
    // deterministic: bit-identical on a re-run
    val again = ops.Llm.queries("llm_global_shuffle")(spark, sf)
    assert(sh.exceptAll(again).isEmpty)
    // a different salt is a different permutation of the SAME docs —
    // the epoch-reshuffle story (order changes, membership doesn't)
    import org.apache.spark.sql.expressions.Window
    val salted = Tables.t(spark, sf, "documents").select(col("doc_id"),
      md5(concat(lit("epoch1:"), col("doc_id").cast(StringType))).as("h"))
      .withColumn("shard",
        expr("CAST(instr('0123456789abcdef', substring(h, 1, 1)) - 1 AS BIGINT)"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
        .cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"))
    assert(salted.count() == docs.count())
    val moved = sh.join(salted, "doc_id")
      .filter(sh("shard") =!= salted("shard") || sh("pos") =!= salted("pos"))
    assert(moved.count() > docs.count() / 2,
      "a salt change must re-deal most positions")
  }

  test("retired docs stop claiming dedup victories; compaction reclaims, invariantly") {
    val d = Tables.t(spark, sf, "documents")
    val snapshot = d.select(col("doc_id"), col("text"))
    val idx = s"${TmpDirs.create("graft_retire")}/idx"
    ops.Llm.dedupIndexSeed(spark, snapshot, idx)
    val nearDup = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        expr("substring(text, instr(text, ' ') + 1, length(text))").as("text"))
    val origIds = nearDup.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSeq
    def ingest(offset: Long): Set[(Long, Long)] =
      ops.Llm.dedupIncremental(spark,
        nearDup.select((col("doc_id") + offset).as("doc_id"), col("text")),
        idx).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // baseline: the arriving near-dups confirm against their originals
    val b1 = ingest(100000)
    assert(b1.exists { case (a, b) => origIds.contains(a) && b == a + 100000 },
      "fixture lost its teeth: no near-dup confirmed against its original")
    // the originals are deleted from the corpus → retired from the index;
    // a re-ingested near-dup must no longer be claimed by a ghost...
    ops.Llm.dedupRetire(spark, idx, origIds)
    val b2 = ingest(200000)
    assert(!b2.exists { case (a, b) =>
        origIds.contains(a) || origIds.contains(b) },
      s"retired docs still claim victories: ${b2.filter(p =>
        origIds.contains(p._1)).take(3)}")
    // ...while LIVE index docs (the first arrivals) still confirm — the
    // +200000 texts are exact twins of the +100000 ones
    assert(b2.exists { case (a, b) => a >= 100000 && b >= 200000 },
      "retirement must not silence live index docs")
    // compaction physically reclaims the retired rows and clears the
    // list; behavior afterwards is unchanged (the ghost stays gone,
    // untouched docs unaffected)
    ops.Llm.dedupIndexCompact(spark, idx)
    assert(spark.read.parquet(s"$idx/bands")
      .filter(col("doc_id").isin(origIds: _*)).count() == 0,
      "compaction must reclaim retired band rows")
    assert(!new java.io.File(s"$idx/retired").exists(),
      "a completed compaction clears the retired list")
    val b3 = ingest(300000)
    assert(!b3.exists { case (a, b) =>
      origIds.contains(a) || origIds.contains(b) })
    assert(b3.exists { case (a, b) => a >= 100000 && b >= 300000 })
  }

  test("retired vectors stop surfacing as ANN neighbors; compaction reclaims") {
    val all = Tables.t(spark, sf, "embeddings").select(
      col("vec_id"), functions.VectorOps.toDouble(col("embedding")).as("v"))
    val idx = s"${TmpDirs.create("graft_annret")}/idx"
    ops.Llm.annIndexSeed(spark, all, idx)
    val retired = all.filter(col("vec_id") % 10 === 0 && col("vec_id") < 250)
    val retiredIds = retired.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSeq
    // exact twins of the retired vectors under fresh ids: without
    // retirement each twin's top-1 is its original at cosine 1.0
    val twins = retired.select((col("vec_id") + 500000).as("vec_id"), col("v"))
    ops.Llm.annRetire(spark, idx, retiredIds)
    val res = ops.Llm.annIngest(spark, twins, idx).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(!res.exists { case (_, n) => retiredIds.contains(n) },
      s"retired vectors still neighbors: ${res.filter(p =>
        retiredIds.contains(p._2)).take(3)}")
    ops.Llm.annIndexCompact(spark, idx)
    assert(spark.read.parquet(s"$idx/assigned")
      .filter(col("n_id").isin(retiredIds: _*)).count() == 0,
      "compaction must reclaim retired assignments")
    assert(!new java.io.File(s"$idx/retired").exists())
  }

  test("retired hashes readmit the next duplicate through the exact index") {
    val d = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    val idx = s"${TmpDirs.create("graft_exret")}/idx"
    ops.Llm.exactIndexSeed(spark, d, idx)
    // duplicates of indexed docs arrive → all dropped (hashes known)
    val dups = d.filter(col("doc_id") % 7 === 0)
    val b1 = ops.Llm.exactIngestApply(spark,
      dups.select((col("doc_id") + 100000).as("doc_id"), col("text")), idx)
    assert(b1.count() == 0, "known hashes must drop their duplicates")
    // those docs are deleted from the corpus → their hashes retire; the
    // SAME texts re-arriving are now fresh content and must ship
    ops.Llm.exactRetire(spark, idx, dups)
    val b2 = ops.Llm.exactIngestApply(spark,
      dups.select((col("doc_id") + 200000).as("doc_id"), col("text")), idx)
    assert(b2.count() == dups.count(),
      "retired hashes must readmit re-arriving content")
    // a shipped hash is live again IMMEDIATELY (the ingest un-retires
    // it): the next duplicate drops even before any compaction — the
    // hash is the identity here, so retirement must not outlive it
    val b3 = ops.Llm.exactIngestApply(spark,
      dups.select((col("doc_id") + 300000).as("doc_id"), col("text")), idx)
    assert(b3.count() == 0,
      "the readmitted content's own hashes must dedup the next arrival")
    // compaction reclaims whatever is still retired and clears the list
    ops.Llm.exactIndexCompact(spark, idx)
    assert(!new java.io.File(s"$idx/retired_hashes").exists())
    val b4 = ops.Llm.exactIngestApply(spark,
      dups.select((col("doc_id") + 400000).as("doc_id"), col("text")), idx)
    assert(b4.count() == 0, "compaction must not resurrect retirement")
  }

  test("exact-index compaction restores bucket clustering; ingest invariant") {
    // per-ingest appends land unclustered files that dilute the probe's
    // bucket pruning; exactIndexCompact re-clusters the hash index and
    // must be INVISIBLE to the next ingest's result
    val d = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    val idx = s"${TmpDirs.create("graft_exact_compact")}/idx"
    ops.Llm.exactIndexSeed(spark, d.filter(col("doc_id") % 3 =!= 0), idx)
    // batch 1: a mix of dup (existing text) and novel (reversed) docs
    val b1 = d.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 7 === 0).limit(20)
        .select((col("doc_id") + 600000).as("doc_id"),
          reverse(col("text")).as("text")))
    ops.Llm.exactIngestApply(spark, b1, idx)
    ops.Llm.exactIndexCompact(spark, idx, targetFiles = 2)
    assert(new java.io.File(s"$idx/hashes").listFiles()
      .count(_.getName.endsWith(".parquet")) <= 2,
      "compaction must bound the index file count")
    // post-compaction, a small-batch probe still prunes: the pushed
    // bucket filter survives the rewrite
    val b2 = d.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
      .limit(3)
      .select((col("doc_id") + 700000).as("doc_id"), col("text"))
      .localCheckpoint()
    val plan = ops.Llm.exactIngestFrame(spark, b2, idx)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(_bucket"),
      s"bucket pruning lost after compaction:\n$plan")
    // and the ingest result over the compacted index is the dup verdict
    // the uncompacted index would give: every b2 doc's text already
    // exists in the seeded corpus (doc_id % 3 != 0 covers % 2 != 0 ids'
    // duplicates only when texts repeat) — so compare against a fresh
    // uncompacted control index built the same way
    val idx2 = s"${TmpDirs.create("graft_exact_ctl")}/idx"
    ops.Llm.exactIndexSeed(spark, d.filter(col("doc_id") % 3 =!= 0), idx2)
    ops.Llm.exactIngestApply(spark, b1, idx2)
    val got = ops.Llm.exactIngestApply(spark, b2, idx)
      .collect().map(_.getLong(1)).toSet
    val want = ops.Llm.exactIngestApply(spark, b2, idx2)
      .collect().map(_.getLong(1)).toSet
    assert(got == want, "compaction changed an ingest verdict")
  }
}
