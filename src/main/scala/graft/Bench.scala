package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM (codegen, parquet reader, shuffle machinery) before
    // timing: otherwise whichever query happens to run first absorbs ~5s
    // of one-time session initialization and benches as a false hot spot.
    // A warmup failure must not abort the bench — per-query timings are
    // still meaningful (just with init billed to the first queries).
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      // …and the streaming machinery (state store, IncrementalExecution),
      // which otherwise bills ~3s of one-time init to whichever streaming
      // query happens to run first.
      val wtmp = TmpDirs.create("bench_warm")
      spark.range(100).selectExpr("timestamp_micros(id) AS ts", "id")
        .write.parquet(s"$wtmp/in")
      val q = spark.readStream.schema("ts TIMESTAMP, id BIGINT")
        .parquet(s"$wtmp/in")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 minute"))
        .count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("bench_warmup").start()
      q.processAllAvailable()
      q.stop()
      spark.catalog.dropTempView("bench_warmup")
    } catch {
      case e: Throwable =>
        System.err.println(
          s"BENCH WARMUP FAIL: ${e.getClass.getName}: ${e.getMessage}")
    }
    // optional substring filter (local iteration); the driver passes no args
    val filt = args.headOption.getOrElse("")
    val results = SparkEntry.queries
      .filter { case (name, _) => filt.isEmpty || name.contains(filt) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(
            s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
