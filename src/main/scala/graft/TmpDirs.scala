package graft

/** JVM-wide registry of harness temp dirs, deleted on exit. Every
  * temp-dir creation site (streaming waves/checkpoints/state, bucket
  * tables, sink round-trips, bench warmup) routes through [[create]] so
  * repeated Verify/Bench/spec invocations cannot accrete orphaned
  * full-table copies under /tmp — one registry, one shutdown hook.
  */
object TmpDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  sys.addShutdownHook {
    dirs.forEach(d => rmr(new java.io.File(d)))
  }

  private[graft] def rmr(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr)
    f.delete(); ()
  }

  /** Create a fresh temp dir registered for deletion on JVM exit. */
  def create(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs.add(d)
    d
  }
}
