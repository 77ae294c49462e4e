package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source abstraction (SURVEY.md §2.1 S3): the reference snapshots MySQL
  * tables over a DB socket; we snapshot through a pluggable Source so the
  * JDBC path exists while the harness (no live MySQL) runs on parquet.
  */
trait TableSource {
  def snapshot(spark: SparkSession, table: String): DataFrame
}

/** Harness backend: one parquet file per table under a scale-factor dir. */
final class ParquetSource(sfDir: String) extends TableSource {
  override def snapshot(spark: SparkSession, table: String): DataFrame =
    graft.Tables.t(spark, sfDir, table)
}

/** Production backend: MySQL/any-JDBC snapshot reads, chunked by a numeric
  * PK so a 100 TB snapshot parallelizes across executors instead of
  * funneling through one connection.
  */
final class JdbcSource(url: String, user: String, password: String,
    numPartitions: Int = 32) extends TableSource {
  override def snapshot(spark: SparkSession, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", 10000)
      .load()

  /** PK-chunked parallel snapshot — the scale path. */
  def snapshotPartitioned(spark: SparkSession, table: String, pkCol: String,
      lower: Long, upper: Long): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("partitionColumn", pkCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 10000)
      .load()
}

/** Sink abstraction (SURVEY.md §2.1 S4/S5): the reference batches INSERTs
  * into ClickHouse with a flush size/interval; the Spark-native analogue is
  * an epoch-keyed idempotent writer used from foreachBatch — replaying an
  * epoch overwrites the same location instead of duplicating rows.
  */
trait BatchSink {
  def write(df: DataFrame, epochId: Long): Unit
}

/** Harness backend: parquet, one overwritten dir per epoch (replay-safe). */
final class EpochParquetSink(baseDir: String) extends BatchSink {
  override def write(df: DataFrame, epochId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/epoch=$epochId")
}

/** Production backend: JDBC (e.g. ClickHouse) batched INSERTs. Idempotence
  * at the DB side comes from ReplacingMergeTree keyed on (pk, version) —
  * replayed epochs collapse at merge time, mirroring the reference.
  */
final class JdbcBatchSink(url: String, table: String, user: String,
    password: String) extends BatchSink {
  override def write(df: DataFrame, epochId: Long): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", 10000)
      .mode("append")
      .save()
}
