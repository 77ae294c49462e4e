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

/** DESTINATION BOOTSTRAP DDL (SURVEY.md §2.1 S17): generate the ClickHouse
  * `CREATE TABLE` a replica needs before the first sync — the auto-create
  * step every tool in this class ships (the reference's analogue of
  * `--create-table-sql`). Columns map from the SOURCE schema through a
  * fixed type table; the engine is ReplacingMergeTree over two appended
  * bookkeeping columns (`_version` = binlog seq, `_is_deleted` = the
  * soft-delete flag), which is exactly the destination shape the sync
  * passes maintain (latest-wins by version, tombstones flagged not
  * dropped). Pure metadata work: schemas are KBs at any data scale, so
  * this is driver-side by design.
  */
object DestinationDdl {
  import org.apache.spark.sql.types._

  /** Spark → ClickHouse type map. Timestamps (tz'd or naive) land on
    * DateTime64(6) — MySQL DATETIME is microsecond-precision and naive,
    * and the sync layer pins UTC. Binary lands on String (CH strings are
    * byte-safe). Arrays map element-wise; CH forbids Nullable(Array),
    * so arrays never wrap. */
  def chType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case StringType => "String"
    case BinaryType => "String"
    case BooleanType => "UInt8"
    case DateType => "Date32"
    case _: TimestampType => "DateTime64(6)"
    case TimestampNTZType => "DateTime64(6)"
    case ArrayType(elem, _) => s"Array(${chType(elem)})"
    case other => throw new IllegalArgumentException(
      s"no ClickHouse mapping for ${other.simpleString} — map it explicitly")
  }

  /** One canonical CREATE TABLE line. Non-key nullable columns wrap in
    * Nullable(…) (parquet OPTIONAL ⇔ StructField.nullable); key columns
    * never wrap — ClickHouse ORDER BY keys must be non-Nullable, and a
    * PRIMARY KEY is NOT NULL at the MySQL source by definition. */
  def createTable(table: String, schema: StructType,
      keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"key column(s) absent from $table's schema: " +
        keyCols.filterNot(schema.fieldNames.contains).mkString(", "))
    val decls = schema.fields.map { f =>
      val base = chType(f.dataType)
      val wrapped =
        if (f.nullable && !keyCols.contains(f.name) &&
            !f.dataType.isInstanceOf[ArrayType]) s"Nullable($base)"
        else base
      s"`${f.name}` $wrapped"
    }
    s"CREATE TABLE dest.`$table` (${decls.mkString(", ")}, " +
      "`_version` UInt64, `_is_deleted` UInt8) " +
      "ENGINE = ReplacingMergeTree(_version, _is_deleted) " +
      s"ORDER BY (${keyCols.map(k => s"`$k`").mkString(", ")})"
  }
}
