package graft

import graft.streaming.StateFs

/** The local filesystem under a second scheme name — registered ONLY in
  * the test session's hadoop conf, so resolving it proves StateFs
  * consults the session (and never a cached bare `new Configuration()`,
  * which has no idea the scheme exists). */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

/** Contract tests for the state layer's filesystem surface (StateFs) —
  * the semantics every state-dir invariant rests on: epoch discovery,
  * atomic control-file publication, metadata directory moves.
  */
class StateFsSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_statefs").toString

  test("epochIds lists only epoch= dirs; an absent root is empty, not an error") {
    val base = tmp()
    assert(StateFs.epochIds(s"$base/nope") == Seq.empty)
    StateFs.mkdirs(s"$base/epoch=0")
    StateFs.mkdirs(s"$base/epoch=7")
    StateFs.mkdirs(s"$base/epoch=-3") // compaction baseline
    StateFs.mkdirs(s"$base/_pending") // non-epoch dirs are invisible
    StateFs.mkdirs(s"$base/_compacting")
    assert(StateFs.epochIds(base).sorted == Seq(-3L, 0L, 7L))
  }

  test("writeAtomic publishes over an existing file; readSmall round-trips") {
    val base = tmp()
    val p = s"$base/_purge_floor"
    assert(StateFs.readSmall(p).isEmpty)
    StateFs.writeAtomic(p, "41")
    assert(StateFs.readSmall(p).contains("41"))
    StateFs.writeAtomic(p, "42") // the OVERWRITE path
    assert(StateFs.readSmall(p).contains("42"))
    // no .tmp residue: the publish is rename-based, not copy-based
    assert(!StateFs.exists(p + ".tmp"))
  }

  test("moveDir relocates a directory tree and refuses a missing source") {
    val base = tmp()
    StateFs.mkdirs(s"$base/src/inner")
    StateFs.writeAtomic(s"$base/src/inner/part-0", "data")
    StateFs.moveDir(s"$base/src", s"$base/dst/epoch=3")
    assert(!StateFs.exists(s"$base/src"))
    assert(StateFs.readSmall(s"$base/dst/epoch=3/inner/part-0").contains("data"))
    val e = intercept[IllegalArgumentException] {
      StateFs.moveDir(s"$base/absent", s"$base/dst2")
    }
    assert(e.getMessage.contains("staged dir missing"))
  }

  test("per-URI conf: a scheme registered only in the session's hadoop conf resolves") {
    // two schemes over one directory: the default (schemeless → local)
    // and mockfs, which exists ONLY in the session conf — each gets its
    // own cached Configuration, so neither can contaminate the other
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val base = tmp()
    StateFs.mkdirs(s"mockfs:$base/epoch=5")
    assert(StateFs.exists(s"mockfs:$base/epoch=5"))
    assert(StateFs.epochIds(s"mockfs:$base") == Seq(5L))
    // it IS the local filesystem underneath — the schemeless view of the
    // same directory agrees, through its separately-cached conf
    assert(StateFs.epochIds(base) == Seq(5L))
    StateFs.writeAtomic(s"$base/epoch=5/_marker", "42")
    assert(StateFs.readSmall(s"mockfs:$base/epoch=5/_marker").contains("42"))
    StateFs.deleteRecursive(s"mockfs:$base/epoch=5")
    assert(!StateFs.exists(s"$base/epoch=5"))
  }

  test("writeAtomic over a checksum-sidecarred file drops the stale .crc") {
    // copyDir routes through the checksummed LocalFileSystem, which
    // writes a `.<name>.crc` sidecar per file; writeAtomic's local nio
    // fast path bypasses ChecksumFileSystem, so without the sidecar
    // cleanup the next fs.open (readSmall) would throw ChecksumException
    // on the stale sidecar (r21 ADVICE).
    val base = tmp()
    StateFs.mkdirs(s"$base/src")
    StateFs.writeAtomic(s"$base/src/_lag", "1\t2")
    StateFs.copyDir(s"$base/src", s"$base/dst")
    assert(new java.io.File(s"$base/dst/._lag.crc").exists,
      "precondition: the checksummed copy must leave a .crc sidecar")
    StateFs.writeAtomic(s"$base/dst/_lag", "3\t4") // same length: a stale
    // sidecar would fail on CONTENT, not length, making the repro exact
    assert(StateFs.readSmall(s"$base/dst/_lag").contains("3\t4"))
    assert(!new java.io.File(s"$base/dst/._lag.crc").exists)
  }

  test("deleteRecursive is idempotent and total") {
    val base = tmp()
    StateFs.mkdirs(s"$base/a/b/c")
    StateFs.writeAtomic(s"$base/a/b/f", "x")
    StateFs.deleteRecursive(s"$base/a")
    assert(!StateFs.exists(s"$base/a"))
    StateFs.deleteRecursive(s"$base/a") // absent -> no-op
  }
}
