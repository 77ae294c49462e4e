package graft

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted INSIDE lazy query builders (minhash
  * shingle table, substring fingerprint windows, IVF assignment +
  * centroids). A builder returns a lazy DataFrame, so no scope inside the
  * query can know when the caller's terminal action has run — without a
  * release point the caches accrete for the driver session's lifetime
  * (145 queries in one Verify/Bench JVM) until LRU eviction. The drivers
  * (Verify, Bench) call [[releaseAll]] after each query's terminal
  * action; specs and ad-hoc sessions may ignore it (JVM exit cleans up).
  */
object CacheRegistry {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a just-persisted DataFrame for deferred release. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked DataFrame (async — eviction needs no
    * barrier) and clear the registry. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }
}
