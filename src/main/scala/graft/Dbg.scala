package graft
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.t(s, dir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("dbg").toString
    val in = s"$tmp/in"
    val held = col("event_id") % 10 === 0 && dayofmonth(col("ts")) <= 2
    graft.streaming.StreamingOps.writeWave(
      ev.filter(dayofmonth(col("ts")) <= 10 && !held), in, 0)
    graft.streaming.StreamingOps.writeWave(
      ev.filter(dayofmonth(col("ts")) <= 10 && held), in, 1)
    new java.io.File(in).listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified)
      .foreach(f => println(s"FILE ${f.getName} mod=${f.lastModified}"))
    val st = s.readStream.schema(ev.schema).option("maxFilesPerTrigger","1").parquet(in)
    val agg = st.withWatermark("ts","2 days").groupBy(window(col("ts"),"1 day").as("w")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("dbg6").start()
    q.processAllAvailable()
    q.recentProgress.foreach(p => println(s"BATCH ${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}"))
    q.stop()
    s.table("dbg6").select(col("w.start").as("ws"), col("n")).orderBy("ws").show(12, false)
    s.stop()
  }
}
