package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming-ingest abstraction (SURVEY.md §1.2): the reference tails a
  * MySQL binlog (prod: Kafka+Debezium); the harness plays parquet waves
  * through a file stream. Every `runCdcPass*` topology consumes its
  * change events through this trait, so swapping the transport — file,
  * in-memory test stream, Kafka — is a constructor argument, not a
  * rewrite of the apply machinery. Mirrors the batch side's
  * [[TableSource]].
  */
trait CdcSource {
  /** The envelope schema the stream declares (drives the state dir's
    * published `_schema` and the DDL guardrails at pass start). */
  def schema: StructType

  /** Open the streaming DataFrame. Each unit of arrival (file, memory
    * block, Kafka batch) becomes one micro-batch under the pass's
    * trigger policy. */
  def open(spark: SparkSession): DataFrame
}

/** Harness/default backend: parquet files under `path` played one file
  * per trigger — mtime order makes wave arrival deterministic (see
  * StreamingOps.writeWave). */
final case class FileCdcSource(schema: StructType, path: String)
    extends CdcSource {
  override def open(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(path)
}

/** Test/embedded backend over an already-constructed streaming DataFrame
  * (e.g. a MemoryStream's `toDF` — StreamingSpec proves the pass runs
  * unchanged over it). `schema` is taken from the DataFrame itself. */
final class WrappedCdcSource(df: DataFrame) extends CdcSource {
  override def schema: StructType = df.schema
  override def open(spark: SparkSession): DataFrame = df
}
