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
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // stage-by-stage timing of the ngram-jaccard pipeline
    val d = Tables.t(s, dir, "documents")
    val nd = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1, length(text))").as("text")))
    val shingles =
      """CASE WHEN size(words) >= 3 THEN
           array_distinct(transform(sequence(1, size(words) - 2),
             i -> concat_ws(' ', words[i-1], words[i], words[i+1])))
         ELSE array() END"""
    val base = nd.select(col("doc_id"), split(col("text"), " ").as("words"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inv = base
      .withColumn("sh", expr(shingles))
      .select(col("doc_id"), explode(col("sh")).as("g"))
    time("inv count")(println(inv.count()))
    time("inv count again")(println(inv.count()))
    val rare = inv.groupBy(col("g")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= 100).select(col("g"))
    time("rare count")(println(rare.count()))
    val keyed = inv.join(rare, Seq("g"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("keyed count")(println(keyed.count()))
    val pairs = keyed.select(col("doc_id").as("a_id"), col("g"))
      .join(keyed.select(col("doc_id").as("b_id"), col("g")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_common"))
    time("pairs count")(println(pairs.count()))
    val sizes = keyed.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val fin = pairs
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"))
      .withColumn("jaccard",
        col("n_common").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_union").cast(org.apache.spark.sql.types.DoubleType))
      .filter(col("jaccard") > 0.5)
      .orderBy(col("a_id"), col("b_id"))
    time("final count")(println(fin.count()))
    time("final count again")(println(fin.count()))
    s.stop()
  }
}
