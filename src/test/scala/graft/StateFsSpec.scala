package graft

import graft.streaming.StateFs

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

  test("deleteRecursive is idempotent and total") {
    val base = tmp()
    StateFs.mkdirs(s"$base/a/b/c")
    StateFs.writeAtomic(s"$base/a/b/f", "x")
    StateFs.deleteRecursive(s"$base/a")
    assert(!StateFs.exists(s"$base/a"))
    StateFs.deleteRecursive(s"$base/a") // absent -> no-op
  }
}
