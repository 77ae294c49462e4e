package graft
import org.apache.spark.sql.functions._

/** Scratch timing/debug main — contents change per investigation. */
object Dbg {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // warm
    s.range(1000000L).selectExpr("sum(id)").collect()
    s.read.parquet(s"$dir/embeddings.parquet").count()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    graft.functions.VectorOps.register(s)
    val all = Tables.t(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
    val cents0 = time("cents0") {
      all.filter(col("vec_id") < 16).select(col("vec_id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    }
    import org.apache.spark.sql.Column
    def centArray(cents: Seq[(Long, Seq[Double])]): Column =
      array(cents.sortBy(_._1).map { case (id, v) =>
        struct(lit(id).as("c_id"), typedLit(v).as("c_v")) }: _*)
    def nearest(centsLit: Column): Column = {
      val cosArr = transform(centsLit, c =>
        call_function("cosine_sim", col("v"), c.getField("c_v")))
      element_at(centsLit,
        array_position(cosArr, array_max(cosArr)).cast(org.apache.spark.sql.types.IntegerType))
        .getField("c_id")
    }
    val dim = cents0.head._2.length
    val sums = (0 until dim).map(i =>
      sum(element_at(col("v"), i + 1).cast(org.apache.spark.sql.types.DecimalType(38, 18))))
    time("assign_only") {
      all.select(nearest(centArray(cents0)).as("cell")).groupBy(col("cell")).count().collect()
    }
    time("refine_agg_64col") {
      all.select(nearest(centArray(cents0)).as("cell"), col("v"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n"), sums: _*).collect()
    }
    time("refine_agg_explode") {
      all.select(nearest(centArray(cents0)).as("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 18))).as("sx"),
          count(lit(1)).as("n"))
        .collect()
    }
    time("refine_agg_explode2") {
      all.select(nearest(centArray(cents0)).as("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 18))).as("sx"),
          count(lit(1)).as("n"))
        .collect()
    }
    time("assign_again") {
      all.select(nearest(centArray(cents0)).as("cell")).groupBy(col("cell")).count().collect()
    }
    s.stop()
  }
}
