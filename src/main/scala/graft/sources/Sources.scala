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

/** Decoders for the MYSQL TYPES whose binlog encoding is not a clean
  * 1:1 Spark type (SURVEY §2.7 F2's exotic tail) — the apply-time
  * column transforms a replica applies to the raw envelope before the
  * CDC pass streams it. All scan-local codegen'd expressions: no UDF,
  * no shuffle, valid at any scale.
  *
  *  - SET('a','b',…): the binlog ships the member BITMASK (one bit per
  *    member in declaration order); MySQL's own string form is the
  *    comma-joined members — [[decodeSet]] reproduces it exactly,
  *    including the empty-set `''` and NULL for NULL.
  *  - Zero dates: `0000-00-00` / `0000-00-00 00:00:00` are storable in
  *    MySQL (sql_mode permitting) but invalid in every destination
  *    engine this class targets — the standard replica behavior is
  *    CONVERT_TO_NULL (the MySQL Connector/J `zeroDateTimeBehavior`
  *    default for this tool class). [[zeroDateToNull]] /
  *    [[zeroDateTimeToNull]] apply that rule explicitly, so the policy
  *    is in the code, not an accident of a cast's overflow behavior.
  *  - YEAR and BIT(n) need no decode: YEAR replicates as a small int
  *    (Int16 at the destination), BIT(n≤64) as its integer value
  *    (Int64) — they ride the envelope as-is.
  */
object MySqlTypes {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** MySQL SET bitmask → the comma-joined member string MySQL itself
    * renders (`members` in declaration order, bit i ⇔ members(i)).
    * NULL mask → NULL; zero mask → `''` (the empty SET). */
  def decodeSet(mask: Column, members: Seq[String]): Column = {
    require(members.nonEmpty && members.size <= 64,
      s"MySQL SET carries 1..64 members, got ${members.size}")
    when(mask.isNull, lit(null).cast("string")).otherwise(
      concat_ws(",", members.zipWithIndex.map { case (m, i) =>
        when(mask.bitwiseAND(lit(1L << i)) =!= 0L, lit(m))
      }: _*))
  }

  /** Raw text-column BYTES in the source column's charset → a UTF-8
    * String — the transcode a replica owes every non-utf8mb4 MySQL
    * column (latin1 is still the accumulated-schema default in the
    * wild): applying binlog bytes verbatim serves mojibake at the
    * destination. `charset` is the Java canonical name the MySQL
    * charset maps to (latin1 → ISO-8859-1, ujis → EUC-JP, …); an
    * unmappable byte surfaces as the codec's replacement char rather
    * than corrupting neighbors. NULL stays NULL. */
  def decodeText(raw: Column, charset: String): Column =
    decode(raw, charset)

  /** Raw DATE text → DateType, `0000-00-00` (and the zero-month /
    * zero-day variants MySQL also stores) → NULL. */
  def zeroDateToNull(raw: Column): Column =
    when(raw.isNull || raw.startsWith("0000-") ||
      raw.substr(6, 5).startsWith("00-") || raw.endsWith("-00"),
      lit(null).cast("date")).otherwise(to_date(raw, "yyyy-MM-dd"))

  /** Raw DATETIME text → TimestampNTZType (MySQL DATETIME is a wall
    * clock — NTZ, never an instant), zero dates → NULL. The date part
    * alone decides zero-ness: `0000-00-00 00:00:00` is the zero value,
    * a genuine midnight on a real date is not. */
  def zeroDateTimeToNull(raw: Column): Column =
    when(raw.isNull || raw.startsWith("0000-") ||
      raw.substr(6, 5).startsWith("00-") || raw.substr(9, 3).startsWith("00 "),
      lit(null).cast("timestamp_ntz"))
      .otherwise(to_timestamp_ntz(raw, lit("yyyy-MM-dd HH:mm:ss")))
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

  /** Write a SERVED-STATE frame in the destination-table shape the
    * bootstrap DDL declares — the default frame for this sink (the
    * S17↔S5 loop): `_version`/`_is_deleted` are what make the
    * append-mode replay contract sound, because the destination's
    * ReplacingMergeTree collapses duplicates on (key, version) at merge
    * time. See [[DestinationDdl.stateToDestination]]. */
  def writeState(df: DataFrame, keyCols: Seq[String], epochId: Long): Unit =
    write(DestinationDdl.stateToDestination(df, keyCols), epochId)
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

  /** Project a served-state frame into the destination-table ROW shape
    * [[createTable]] declares — the S17↔S5 closure: payload columns in
    * frame order, then `_version` = the row's binlog `seq`
    * (ReplacingMergeTree's version — latest wins at merge time) and
    * `_is_deleted` = 1 for tombstone winners (the engine drops flagged
    * rows at FINAL collapse). The input must carry the envelope
    * bookkeeping (`op`, `seq`) alongside the payload — i.e. the state
    * collapse WITH tombstones (the changes-export shape), never the
    * tombstone-dropped serving view: a destination that is never told
    * about a delete strands the row forever. Scan-local projection —
    * no shuffle at any scale. */
  def stateToDestination(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val missing = (keyCols :+ "op" :+ "seq").filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"state frame lacks column(s): ${missing.mkString(", ")} — the " +
        "destination projection needs the key plus the op/seq envelope " +
        "bookkeeping (export the collapse WITH tombstones)")
    val payload = df.columns.toSeq.filterNot(Seq("op", "seq").contains)
    df.select(payload.map(col) :+
      col("seq").as("_version") :+
      (col("op") === "D").cast(org.apache.spark.sql.types.ShortType)
        .as("_is_deleted"): _*)
  }
}
