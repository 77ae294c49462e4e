package graft
import org.apache.spark.sql.functions._

/** Scratch timing/debug main — contents change per investigation. */
object Dbg {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val log = Tables.cdcLog(s, dir)
    val staged = log
      .withColumn("wavep", (col("seq") - 1).cast(org.apache.spark.sql.types.IntegerType))
      .filter(col("wavep").between(0, 2))
    staged.groupBy(col("wavep")).count().orderBy(col("wavep")).show()
    val tmp = java.nio.file.Files.createTempDirectory("dbg_stage").toString
    staged.repartition(3, col("wavep"))
      .sortWithinPartitions(col("wavep"), col("okey"))
      .write.mode("overwrite").partitionBy("wavep").parquet(tmp)
    def walk(f: java.io.File, ind: String = ""): Unit = {
      println(s"$ind${f.getName}")
      Option(f.listFiles()).getOrElse(Array.empty).foreach(walk(_, ind + "  "))
    }
    walk(new java.io.File(tmp))
    s.stop()
  }
}
