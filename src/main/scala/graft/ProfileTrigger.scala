package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-trigger fixed-cost microbenchmark (diagnostic, guide §1): a
  * minimal maxFilesPerTrigger=1 file stream over N tiny waves into a
  * foreachBatch that writes one parquet delta per epoch — the skeleton
  * every CDC scenario shares — timed per phase so the per-trigger
  * constant is measurable in isolation from real data volume.
  */
object ProfileTrigger {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm the streaming machinery once
    def onePass(nWaves: Int, rows: Int, label: String): Unit = {
      val tmp = TmpDirs.create("trig")
      val df = spark.range(rows.toLong)
        .select(col("id").as("okey"), lit("I").as("op"),
          (col("id") % 7).as("seq"))
      (0 until nWaves).foreach { w =>
        graft.streaming.StreamingOps.writeWave(df, s"$tmp/in", w)
      }
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema("okey BIGINT, op STRING, seq BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/in")
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.groupBy(col("okey")).agg(max(col("seq")).as("seq"))
            .write.mode("overwrite").parquet(s"$tmp/state/epoch=$id")
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"TRIG $label nWaves=$nWaves rows=$rows total=$el%.2fs per-trigger=${el / nWaves}%.3fs")
    }
    onePass(3, 100, "warm")
    onePass(3, 100, "tiny")
    onePass(6, 100, "tiny6")
    onePass(3, 200000, "200k")
    spark.stop()
  }
}
