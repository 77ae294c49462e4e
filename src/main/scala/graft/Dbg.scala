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
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("agg_bitmap_overlap", "agg_moving_sum", "fn_tz",
        "agg_group_concat", "sort_fill_interpolate", "join_null_safe_equi",
        "scan_parquet_schema_merge")) {
      println(s"===== $name =====")
      val p = SparkEntry.queries(name)(s, dir).queryExecution.executedPlan.toString
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate") ||
        l.contains("Window") || l.contains("Scan") || l.contains("Generate"))
        .map(_.take(150)).mkString("\n"))
    }
    s.stop()
  }
}
