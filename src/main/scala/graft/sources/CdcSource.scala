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

/** BINLOG-TEXT transport as a first-class streaming source: TAIL a
  * `mysqlbinlog --verbose` dump directory and decode each binlog
  * ROTATION file as it lands — one file per micro-batch, which is
  * exactly how a binlog tail advances (a rotation is the source's
  * natural arrival unit; blocks are self-positioned so arrival order
  * never matters). The decode is [[BinlogText.parse]]'s, unchanged —
  * `cols` is the TABLE_MAP column list, `beforeCols`/`changedCol` the
  * FULL/MINIMAL image surfaces — so every `runCdcPass*` topology
  * consumes dump bytes through the same trait plug as parquet waves,
  * MemoryStream, or Kafka: the transport is a constructor argument,
  * not a rewrite. */
final case class BinlogTextCdcSource(dir: String,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)],
    beforeCols: Seq[String] = Nil,
    changedCol: Option[String] = None,
    /** Torn-rotation gate: every tailed file must END with the
      * `# End of log file` footer mysqlbinlog writes when it finishes
      * — a partial snapshot of an in-flight rotation would otherwise
      * decode truncated bytes as final and the file source would never
      * re-read the rest. Disable ONLY for a writer that provably
      * stages rotations atomically (write elsewhere + rename in). */
    requireTerminator: Boolean = true) extends CdcSource {
  private val sd = BinlogText.singleEnvelope(cols, beforeCols, changedCol)
  override def schema: StructType = sd._1
  override def open(spark: SparkSession): DataFrame =
    BinlogText.streamDecode(spark, dir, sd._1, sd._2, requireTerminator)
}

/** [[BinlogTextCdcSource]] for a MULTI-TABLE dump: one tailed dir
  * carries N tables' interleaved row events (the reference's actual
  * topology), each block dispatching on its verb line's table under
  * [[BinlogText.parseMulti]]'s rules — the natural feed for
  * `runCdcPassMultiSource`'s per-table fan-out. */
final case class BinlogTextMultiCdcSource(dir: String,
    colsByTable: Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]],
    ignoreTables: Set[String] = Set.empty,
    changedCol: Option[String] = None,
    /** See [[BinlogTextCdcSource.requireTerminator]]. */
    requireTerminator: Boolean = true) extends CdcSource {
  // the table column is PINNED to "table": runCdcPassMulti* dispatches
  // on exactly that name (groupBy/partitionBy/filters), so a
  // configurable name here would either break analysis or — if a
  // payload column happened to be named 'table' — silently mis-dispatch
  // every row; the pinned name also activates multiEnvelope's collision
  // check against payload columns named 'table'
  private val sd = BinlogText.multiEnvelope(colsByTable,
    tableCol = "table", ignoreTables, changedCol)
  override def schema: StructType = sd._1
  override def open(spark: SparkSession): DataFrame =
    BinlogText.streamDecode(spark, dir, sd._1, sd._2, requireTerminator)
}

/** Test/embedded backend over an already-constructed streaming DataFrame
  * (e.g. a MemoryStream's `toDF` — StreamingSpec proves the pass runs
  * unchanged over it). `schema` is taken from the DataFrame itself. */
final class WrappedCdcSource(df: DataFrame) extends CdcSource {
  override def schema: StructType = df.schema
  override def open(spark: SparkSession): DataFrame = df
}

/** PRODUCTION transport: Kafka carrying Debezium-style JSON envelopes —
  * the ingest path this tool class actually deploys behind (MySQL →
  * Debezium → Kafka → here). The sandbox ships no broker and no
  * `spark-sql-kafka` jar, so this class is compile-proven wiring (the
  * `format("kafka")` lookup is string-based and resolves at stream
  * start); the projection below is the full value→envelope mapping and
  * runs unchanged the moment the connector jar is on the classpath.
  *
  * Ordering contract (how topic/partition/offset become the engine's
  * `seq`): the engine requires `seq` STRICTLY MONOTONE PER KEY, not
  * globally. Debezium keys each record by the row's primary key, so a
  * key's events all land in ONE partition, where the Kafka offset is
  * strictly increasing — `seq = offset * maxPartitions + partition` is
  * therefore per-key monotone (and collision-free across partitions)
  * for any topic with ≤ `maxPartitions` partitions. A single-partition
  * topic (Debezium's per-table default) degenerates to `seq = offset`,
  * which is globally monotone and also supports the transaction gate
  * (`txnCol` needs commit markers totally ordered against their
  * transaction's events — only guaranteed within one partition).
  *
  * The Debezium `op` dialect (`c`/`r` create-read, `u` update, `d`
  * delete) maps onto the engine's `I`/`U`/`D`; payload columns project
  * from the `after` image (`before` for deletes, matching the
  * before-image delete fixture Tables.cdcLogBeforeImage models). */
final case class KafkaCdcSource(schema: StructType,
    bootstrapServers: String, topic: String,
    startingOffsets: String = "earliest",
    maxPartitions: Int = 1024,
    maxOffsetsPerTrigger: Option[Long] = None) extends CdcSource {
  import org.apache.spark.sql.functions._

  override def open(spark: SparkSession): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      // a replayed/compacted topic can reference aborted offsets;
      // failing the stream on data loss is the engine's at-least-once
      // posture (the epoch-keyed sink absorbs re-delivery, not gaps)
      .option("failOnDataLoss", "true")
    val raw = maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
      .load()
    projectEnvelope(raw)
  }

  /** Decode this source's native POSITION tokens (`"partition:offset"`,
    * e.g. `"3:1017"`) into the engine's monotone seq — the SAME
    * arithmetic [[projectEnvelope]] stamps on every record, so a resume
    * by token lands exactly where the named record's seq does. Owned by
    * the source because only it knows `maxPartitions`; a pass records
    * the token it was driven with via `PositionCatalog` and a later
    * operator resumes with either this codec (connector present) or the
    * catalog (offline). Throws on garbage and on a partition at or above
    * `maxPartitions` — the same bound the projection enforces, because a
    * token outside it decodes to a seq that collides with another
    * partition's range. */
  def positionCodec: graft.Replication.PositionCodec =
    new graft.Replication.PositionCodec {
      override def toSeq(token: String): Long = {
        val t = token.trim
        val i = t.indexOf(':')
        val parsed = for {
          p <- if (i <= 0) None else t.substring(0, i).toLongOption
          o <- t.substring(i + 1).toLongOption
        } yield (p, o)
        val (p, o) = parsed.getOrElse(throw new IllegalArgumentException(
          s"not a Kafka 'partition:offset' position token: '$token'"))
        require(p >= 0 && p < maxPartitions && o >= 0,
          s"position token '$token' outside this source's bounds " +
            s"(partition in [0, $maxPartitions), offset >= 0)")
        o * maxPartitions + p
      }
    }

  /** The value→envelope projection, split from the broker wiring so the
    * mapping is EXECUTED in spec over record-shaped batch frames (the
    * sandbox ships no broker; the stream and a batch frame share this
    * exact plan). `raw` must carry Kafka's (value, partition, offset). */
  private[graft] def projectEnvelope(raw: DataFrame): DataFrame = {
    // payload columns = the declared envelope minus the bookkeeping the
    // transport itself supplies
    val payloadFields = StructType(schema.fields.filterNot(f =>
      Seq("op", "seq").contains(f.name)))
    val dbz = StructType(Seq(
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("before", payloadFields),
      org.apache.spark.sql.types.StructField("after", payloadFields)))
    val e = raw.select(
      from_json(col("value").cast("string"), dbz).as("e"),
      col("partition").cast("long").as("_p"),
      col("offset").as("_o"))
      // Kafka-level TOMBSTONES (null-value records Debezium appends
      // after every delete for log compaction, at a HIGHER offset than
      // the delete event) parse to a null struct; letting one through
      // would emit an op-NULL all-NULL row that WINS the key's
      // latest-wins collapse — the destination would serve a phantom
      // null image instead of the flagged delete. Same gate for op
      // codes outside the DML dialect (truncate 't', message 'm'):
      // they carry no row image and must not reach the collapse.
      .filter(col("e").isNotNull &&
        col("e.op").isin("c", "r", "u", "d"))
    val img = when(col("e.op") === "d", col("e.before"))
      .otherwise(col("e.after"))
    // the ordering contract stands on partition < maxPartitions: a topic
    // whose partition count outgrew the configured bound would silently
    // interleave seq ranges across partitions (offset 1 of p1024 ==
    // offset 2 of p0), breaking per-key monotonicity — fail the record
    // loudly instead of emitting a colliding position
    val seqCol = when(col("_p") < maxPartitions,
        col("_o") * maxPartitions + col("_p"))
      .otherwise(raise_error(concat(
        lit(s"Kafka partition "), col("_p").cast("string"),
        lit(s" is at or above the configured maxPartitions=$maxPartitions" +
          " — seq values would collide across partitions; raise" +
          " maxPartitions (constant for the topic's lifetime)"))))
    e.select(
      when(col("e.op").isin("c", "r"), "I")
        .when(col("e.op") === "u", "U")
        .when(col("e.op") === "d", "D").as("op") +:
      seqCol.as("seq") +:
      payloadFields.fieldNames.toSeq.map(f => img.getField(f).as(f)): _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }
}
