package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic A/B (optimization round, guide §1): the watermark/window/
  * dedup/stream-join scenarios run on the default HDFSBackedStateStore;
  * this main times them under BOTH providers (alternating, min-of-2) so
  * the choice is measured, not assumed. Never invoked by the driver.
  */
object AbStateStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = Seq("stream_window_tumbling", "stream_window_sliding",
      "stream_window_session", "stream_dedup_watermark",
      "stream_late_data", "stream_stream_join")
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val providers = Seq("hdfs" -> None, "rocks" -> Some(rocks))
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (round <- 1 to 2; (tag, prov) <- providers) {
      prov match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          spark.conf.set("spark.sql.streaming.stateStore.rocksdb" +
            ".changelogCheckpointing.enabled", "true")
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      for (n <- names) {
        val fn = SparkEntry.queries(n)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val el = (System.nanoTime() - t0) / 1e9
        CacheRegistry.releaseAll()
        val k = (n, tag)
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), el)
        println(f"AB round=$round prov=$tag $n $el%.3f")
      }
    }
    println("== min-of-2 ==")
    for (n <- names) {
      val h = best((n, "hdfs")); val r = best((n, "rocks"))
      println(f"AB-MIN $n hdfs=$h%.3f rocks=$r%.3f rocks/hdfs=${r / h}%.2f")
    }
    spark.stop()
  }
}
