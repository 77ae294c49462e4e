package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guard for the round-11 incident: `events.ts` has shipped in
  * THREE physical encodings across driver testdata generations —
  * TIMESTAMP(MICROS), TIMESTAMP(NANOS) (surfacing as BIGINT nanos under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which every session here
  * sets), and TIMESTAMP_NTZ. A generation flip once took down every
  * events-dependent query (33 of them) in one round. [[Tables.t]]
  * dispatches on the SURFACED type; this spec synthesizes all three
  * shapes and asserts they serve the identical instants.
  */
class TablesEncodingSpec extends SparkTestBase {

  private def dir(): String =
    java.nio.file.Files.createTempDirectory("graft_enc").toString

  test("Tables.t serves identical instants across ts physical encodings") {
    // micros base: sub-second precision to catch truncation bugs
    val micros = Seq(1700000000123456L, 1700000001000001L, 1700000002999999L)
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(micros.zipWithIndex.map { case (us, i) =>
        org.apache.spark.sql.Row(i.toLong, us)
      }), StructType(Seq(StructField("event_id", LongType),
        StructField("us", LongType))))

    val dMicros = dir()
    base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$dMicros/events.parquet")

    // nanos generation: the legacy conf surfaces TIMESTAMP(NANOS) as
    // BIGINT nanos-since-epoch — synthesized directly as the surfaced
    // shape (Spark cannot write a NANOS parquet itself). Trailing
    // sub-microsecond digits must TRUNCATE, exactly like DuckDB reading
    // the same file.
    val dNanos = dir()
    base.select(col("event_id"),
        (col("us") * 1000L + lit(789L)).as("ts"))
      .write.parquet(s"$dNanos/events.parquet")

    // NTZ generation: naive micros; sessions pin UTC so the cast lands
    // on the same instant
    val dNtz = dir()
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dNtz/events.parquet")

    def served(d: String): Map[Long, java.sql.Timestamp] =
      Tables.t(spark, d, "events").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap

    val m = served(dMicros)
    assert(served(dNanos) == m, "nanos generation must truncate to micros")
    assert(served(dNtz) == m, "NTZ generation must serve the same instants")
    // and the micros path is exact
    assert(m.values.map(_.getTime).toSeq.sorted ==
      micros.map(_ / 1000L).sorted)
  }

  test("Tables.t fails loudly on an unexpected ts physical type") {
    val d = dir()
    spark.range(3).select(col("id").as("event_id"),
        col("id").cast(StringType).as("ts"))
      .write.parquet(s"$d/events.parquet")
    val e = intercept[IllegalStateException] {
      Tables.t(spark, d, "events").collect()
    }
    assert(e.getMessage.contains("unexpected physical type"))
  }
}
