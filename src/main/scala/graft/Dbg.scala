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
    val d = Tables.t(s, dir, "documents")
    val nd = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1, length(text))").as("text")))
    val P = 1000000007L
    def wordHash60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast(org.apache.spark.sql.types.LongType)
    val hashedSh =
      s"""array_distinct(CASE WHEN size(wh) >= 3 THEN
            transform(sequence(1, size(wh) - 2),
              i -> (wh[i-1] * 1000003L + wh[i] * 999983L + wh[i+1] * 999979L) % ${P}L)
          ELSE CAST(array() AS ARRAY<BIGINT>) END)"""
    // current minhash formulation: words -> wh -> sh in one projection chain
    val v1 = nd.withColumn("words", split(col("text"), " "))
      .withColumn("wh", transform(col("words"), w => wordHash60(w) % P))
      .withColumn("sh", expr(hashedSh))
      .select(col("doc_id"), col("sh"))
    time("chained sh build")(println(v1.agg(sum(size(col("sh")))).collect()(0)))
    time("chained sh build 2")(println(v1.agg(sum(size(col("sh")))).collect()(0)))
    // barrier variant: pin wh first
    val wh = nd.withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), transform(col("words"), w => wordHash60(w) % P).as("wh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v2 = wh.withColumn("sh", expr(hashedSh)).select(col("doc_id"), col("sh"))
    time("pinned-wh sh build")(println(v2.agg(sum(size(col("sh")))).collect()(0)))
    time("pinned-wh sh build 2")(println(v2.agg(sum(size(col("sh")))).collect()(0)))
    s.stop()
  }
}
