package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table readers and determinism helpers.
  *
  * Determinism policy (the DuckDB oracle hash-compares values):
  *  - every raw `double` money/quantity column in the testdata carries at
  *    most 2 decimal digits (verified against the parquet files), so casting
  *    to DECIMAL(18,2) *before* any arithmetic is exact; all downstream
  *    decimal arithmetic is then bit-identical between Spark and DuckDB;
  *  - DECIMAL never appears in a FINAL output schema: the driver reads our
  *    parquet via pyarrow (decimal128 -> Python Decimal) but the oracle via
  *    DuckDB (-> float64), so a decimal output column can never hash-match.
  *    Arithmetic stays decimal internally; the last projection casts to
  *    DOUBLE, and the oracle SQL carries the matching CAST(... AS DOUBLE).
  *    The decimal->double cast is correctly rounded in both engines and all
  *    unscaled values sit far below 2^53, so the doubles are bit-identical;
  *  - every query ends in a total ORDER BY with explicit null placement;
  *  - genuinely floating results (stddev, percentile) are rounded to a fixed
  *    scale on both sides.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` set AT SESSION BUILD —
    * Verify / Bench / SparkTestBase all set it, and the file then surfaces
    * as BIGINT nanos) and plain TIMESTAMP(MICROS). Dispatch on the surfaced
    * type: BIGINT nanos are truncated to µs — exactly what DuckDB does on
    * reading a nanos file, so the oracle agrees by construction — while a
    * native timestamp passes through untouched (DuckDB reads it
    * identically). The nanos conf is deliberately NOT set here: a reader
    * mutating shared session state is surprising to every other user of
    * that session. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) surfaced as nanos-since-epoch
          raw.withColumn("ts",
            expr("timestamp_micros(CAST(ts div 1000 AS BIGINT))"))
        case _: TimestampType => raw
        case TimestampNTZType =>
          // naive micros; sessions here pin spark.sql.session.timeZone=UTC,
          // so this cast lands on the same instant the nanos path produced
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case other => throw new IllegalStateException(
          s"events.ts: unexpected physical type $other (want BIGINT nanos " +
            "under spark.sql.legacy.parquet.nanosAsLong=true, or TIMESTAMP)")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)
  val D6: DecimalType = DecimalType(18, 6)

  /** Exact decimalization of a <=2-decimal-digit double column. */
  def dec2(c: Column): Column = c.cast(D2)

  /** Single-pass I/U/D event synthesis: ONE scan of `base` explodes a
    * per-row array of (keep, event) variants and drops the rows whose
    * variant predicate failed. The three-union alternative executes the
    * base once PER BRANCH (for the composite log that is the same
    * 600k-row groupBy shuffled three times; for the orders logs, three
    * scans), which every consumer of the log then pays per read. Spark
    * resolves the array elements to their least common type exactly as
    * unionByName would, so the emitted schema is branch-for-branch
    * identical to the union form the oracle SQL still uses — including
    * NULLABILITY: the keep flag (not a NULL element) is what encodes a
    * failed predicate, so a column non-nullable in every branch (op,
    * seq) stays non-nullable, which downstream plan rewrites key on
    * (LatestByVersionRewrite refuses a nullable ordering key). */
  private def explodeEvents(base: DataFrame, cols: Seq[String],
      variants: Seq[(Column, Column)]): DataFrame =
    base.select(explode(array(variants.map { case (keep, e) =>
        struct(keep.as("keep"), e.as("e")) }: _*)).as("_v"))
      .filter(col("_v.keep"))
      .select(cols.map(c => col(s"_v.e.$c").as(c)): _*)

  /** Deterministic CDC change log derived from `orders` — the harness ships
    * no binlog, so the change stream is synthesized reproducibly:
    *   - every order emits an Insert at seq=1 (ts = o_orderdate);
    *   - orders with o_orderkey % 3 == 0 emit an Update at seq=2
    *     (price += 10.00, status -> 'P', ts += 1 day);
    *   - orders with o_orderkey % 7 == 0 emit a Delete at seq=3
    *     (ts += 2 days).
    * Envelope mirrors the Debezium-style (op, seq, ts, key, after-image)
    * shape described in SURVEY.md §1.2. `seq` is strictly monotone per key,
    * so latest-wins collapse is total and deterministic.
    *
    * `price` is DOUBLE end to end (no sums ever run on it; the only
    * arithmetic is one `+ 10.0`, the same single IEEE add in both engines),
    * which keeps every downstream output schema decimal-free.
    */
  def cdcLog(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    explodeEvents(o, Seq("op", "seq", "ts", "okey", "price", "status"), Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"),
        lit("P").as("status")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLog]] (a CTE body named `cdc_log`). */
  val cdcLogSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY, o_orderkey,
         CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P'
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY, o_orderkey,
         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** COMPOSITE-primary-key change log derived from `lineitem`, whose real
    * PK is `(l_orderkey, l_linenumber)` — the table shape MySQL composite
    * keys are routine for (order lines, ledger entries). Same synthesis
    * rules as [[cdcLog]] with the mod taken over the key SUM so update
    * and delete membership depend on both key columns:
    *   - every line emits an Insert at seq=1 (ts = l_shipdate);
    *   - lines with (l_orderkey + l_linenumber) % 3 == 0 emit an Update
    *     at seq=2 (price += 10.00, status -> 'P', ts += 1 day);
    *   - lines with (l_orderkey + l_linenumber) % 7 == 0 emit a Delete
    *     at seq=3 (ts += 2 days).
    * `line_no` rides as an extra envelope column (the envelope core is
    * fixed); a pass declaring `keyCols = Seq("okey", "line_no")` collapses
    * per full key tuple. `seq` is strictly monotone per (okey, line_no).
    *
    * The synthetic lineitem is NOT unique on its nominal PK (duplicate
    * (l_orderkey, l_linenumber) rows exist by generator construction), so
    * the base is first collapsed to one row per key with order-independent
    * max aggregates — identically in both engines — to keep (key, seq)
    * unique and the latest-wins collapse total. */
  def cdcLogComposite(spark: SparkSession, sfDir: String): DataFrame = {
    val l = t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"),
        col("l_linenumber").cast(LongType).as("line_no"))
      .agg(max(col("l_extendedprice")).cast(DoubleType).as("price"),
        max(col("l_returnflag")).as("status"),
        max(col("l_shipdate")).as("l_shipdate"))
    explodeEvents(l,
      Seq("op", "seq", "ts", "okey", "price", "status", "line_no"), Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("l_shipdate").as("ts"),
        col("okey"), col("price"), col("status"), col("line_no")),
      ((col("okey") + col("line_no")) % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("l_shipdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("okey"), (col("price") + lit(10.0d)).as("price"),
        lit("P").as("status"), col("line_no")),
      ((col("okey") + col("line_no")) % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("l_shipdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"), col("line_no"))))
  }

  /** [[cdcLog]] carrying the order's FOREIGN KEY (`custkey`) as an extra
    * envelope column — the fixture for JOIN-MV maintenance (ST32): the
    * fact table's change stream joined to static dimensions at apply
    * time. Deletes ship NULL extras like every tombstone here; alive
    * images always carry the FK. */
  def cdcLogDim(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"),
      col("o_custkey"))
    explodeEvents(o,
      Seq("op", "seq", "ts", "okey", "price", "status", "custkey"), Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        col("o_custkey").as("custkey")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"),
        lit("P").as("status"), col("o_custkey").as("custkey")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(LongType).as("custkey"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogDim]] (CTE body `cdc_log_dim`). */
  val cdcLogDimSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status, o_custkey AS custkey FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY, o_orderkey,
         CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P', o_custkey
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY, o_orderkey,
         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** [[cdcLog]] with BEFORE-IMAGE deletes — the shape the MySQL binlog
    * actually ships: a `DeleteRowsEvent` carries the deleted row's full
    * values (its before image), not NULLs. The delete's payload is the
    * key's state as of seq 2: the updated values where the update fired
    * (okey % 3 == 0), the insert values otherwise. This is the fixture
    * for SOFT-DELETE replication (ReplacingMergeTree(ver, is_deleted)
    * semantics): the destination keeps the deleted row's last payload
    * under a `_deleted` flag instead of dropping it. */
  def cdcLogBeforeImage(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    explodeEvents(o, Seq("op", "seq", "ts", "okey", "price", "status"), Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"),
        lit("P").as("status")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        when(col("o_orderkey") % 3 === 0, col("price") + lit(10.0d))
          .otherwise(col("price")).as("price"),
        when(col("o_orderkey") % 3 === 0, lit("P"))
          .otherwise(col("status")).as("status"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogBeforeImage]] (CTE body
    * `cdc_log_bi`). */
  val cdcLogBeforeImageSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY, o_orderkey,
         CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P'
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY, o_orderkey,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END,
         CASE WHEN o_orderkey % 3 = 0 THEN 'P' ELSE o_orderstatus END
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** [[cdcLog]] carrying the MYSQL TYPE SURFACE as extra payload columns
    * — the fixture for the type-map axis this tool class breaks on most
    * (SURVEY §2.7 F2 note): a DECIMAL(12,2) money column (`amount` —
    * MySQL DECIMAL must survive bit-exact, never through a float), an
    * unsigned-BIGINT-range id (`big_id`, carried as DECIMAL(20,0) — the
    * 2^64−1 end of MySQL BIGINT UNSIGNED does not fit a signed long;
    * parquet/Spark read UINT64 as exactly this type), an ENUM column
    * (`tier` — MySQL enums replicate as their string values), and a JSON
    * payload column (`attrs` — replicated as its serialized text,
    * queryable at the destination). Same event rules as [[cdcLog]];
    * updates move `amount` by an exact decimal +0.25, flip `tier` to
    * 'platinum', and rewrite `attrs`; deletes ship NULL extras. */
  def cdcLogTyped(spark: SparkSession, sfDir: String): DataFrame = {
    val D12 = DecimalType(12, 2)
    val D20 = DecimalType(20, 0)
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val amount0 = col("price").cast(D12)
    val bigId = (expr(s"CAST('18446744073709551615' AS DECIMAL(20,0))") -
      col("o_orderkey")).cast(D20)
    val tier0 = when(col("o_orderkey") % 3 === 0, "gold")
      .when(col("o_orderkey") % 3 === 1, "silver").otherwise("bronze")
    def attrsOf(src: String) = concat(lit("{\"k\":"),
      (col("o_orderkey") % 10).cast(StringType),
      lit(s""","src":"$src"}"""))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status",
      "amount", "big_id", "tier", "attrs")
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        amount0.as("amount"), bigId.as("big_id"), tier0.as("tier"),
        attrsOf("mysql").as("attrs")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"), lit("P").as("status"),
        (amount0 + expr("CAST(0.25 AS DECIMAL(3,2))")).cast(D12).as("amount"),
        bigId.as("big_id"), lit("platinum").as("tier"),
        attrsOf("binlog").as("attrs")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(D12).as("amount"), lit(null).cast(D20).as("big_id"),
        lit(null).cast(StringType).as("tier"),
        lit(null).cast(StringType).as("attrs"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogTyped]] (CTE body `cdc_typed`). */
  val cdcLogTypedSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS amount,
         CAST('18446744073709551615' AS DECIMAL(20,0)) - o_orderkey AS big_id,
         CASE o_orderkey % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver'
              ELSE 'bronze' END AS tier,
         '{"k":' || CAST(o_orderkey % 10 AS VARCHAR) || ',"src":"mysql"}'
           AS attrs
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY, o_orderkey,
         CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST(0.25 AS DECIMAL(3,2))
              AS DECIMAL(12,2)),
         CAST('18446744073709551615' AS DECIMAL(20,0)) - o_orderkey,
         'platinum',
         '{"k":' || CAST(o_orderkey % 10 AS VARCHAR) || ',"src":"binlog"}'
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY, o_orderkey,
         CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS DECIMAL(12,2)), CAST(NULL AS DECIMAL(20,0)),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** TEMPORAL/BINARY-typed change log — the other half of the MySQL type
    * map ([[cdcLogTyped]] covers numeric/enum/JSON): DATE (`d_date`),
    * DATETIME (`dt_local`, timestamp WITHOUT timezone — MySQL DATETIME
    * stores the wall-clock literally, so the replica must carry
    * TIMESTAMP_NTZ, never an instant a session-tz shift could move),
    * TIMESTAMP (`ts_utc`, a true instant — MySQL TIMESTAMP is UTC-stored),
    * TIME (`t_sec`, seconds-since-midnight under the Int32 mapping this
    * tool class uses — neither engine's TIME type round-trips parquet),
    * and a BLOB payload (`bin_tag`, raw bytes end to end). Same event
    * synthesis rules as [[cdcLog]]. */
  def cdcLogTemporal(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status",
      "d_date", "dt_local", "ts_utc", "t_sec", "bin_tag")
    val dDate0 = date_add(col("o_orderdate"),
      (col("o_orderkey") % 28).cast(IntegerType))
    val dtLocal0 = expr("""timestampadd(MINUTE, CAST(o_orderkey % 60 AS INT),
      timestampadd(HOUR, CAST(o_orderkey % 24 AS INT),
        CAST(o_orderdate AS TIMESTAMP_NTZ)))""")
    val tsUtc0 = expr("""timestampadd(SECOND, CAST(o_orderkey % 3600 AS INT),
      CAST(o_orderdate AS TIMESTAMP))""")
    val tSec0 = (col("o_orderkey") % 86400).cast(IntegerType)
    val binTag0 = encode(
      concat(lit("tag-"), (col("o_orderkey") % 97).cast(StringType)), "UTF-8")
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        dDate0.as("d_date"), dtLocal0.as("dt_local"), tsUtc0.as("ts_utc"),
        tSec0.as("t_sec"), binTag0.as("bin_tag")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"), lit("P").as("status"),
        date_add(dDate0, 1).as("d_date"),
        expr("timestampadd(HOUR, 1, " +
          """timestampadd(MINUTE, CAST(o_orderkey % 60 AS INT),
            timestampadd(HOUR, CAST(o_orderkey % 24 AS INT),
              CAST(o_orderdate AS TIMESTAMP_NTZ))))""").as("dt_local"),
        expr("timestampadd(SECOND, 90, " +
          """timestampadd(SECOND, CAST(o_orderkey % 3600 AS INT),
            CAST(o_orderdate AS TIMESTAMP)))""").as("ts_utc"),
        (((col("o_orderkey") % 86400) + 3600) % 86400)
          .cast(IntegerType).as("t_sec"),
        encode(concat(lit("tag2-"), (col("o_orderkey") % 97)
          .cast(StringType)), "UTF-8").as("bin_tag")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(DateType).as("d_date"),
        lit(null).cast(TimestampNTZType).as("dt_local"),
        lit(null).cast(TimestampType).as("ts_utc"),
        lit(null).cast(IntegerType).as("t_sec"),
        lit(null).cast(BinaryType).as("bin_tag"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogTemporal]] (CTE body
    * `cdc_temporal`). DuckDB's TIMESTAMP is NTZ, matching `dt_local`
    * natively; `ts_utc` is built as the same UTC wall-clock and compared
    * as epoch microseconds (both engines run UTC). */
  val cdcLogTemporalSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 28 AS INTEGER)
           AS d_date,
         CAST(o_orderdate AS TIMESTAMP) + to_hours(o_orderkey % 24)
           + to_minutes(o_orderkey % 60) AS dt_local,
         CAST(o_orderdate AS TIMESTAMP)
           + to_seconds(o_orderkey % 3600) AS ts_utc,
         CAST(o_orderkey % 86400 AS INTEGER) AS t_sec,
         encode('tag-' || CAST(o_orderkey % 97 AS VARCHAR)) AS bin_tag
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY,
         o_orderkey, CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 28 AS INTEGER) + 1,
         CAST(o_orderdate AS TIMESTAMP) + to_hours(o_orderkey % 24)
           + to_minutes(o_orderkey % 60) + to_hours(1),
         CAST(o_orderdate AS TIMESTAMP) + to_seconds(o_orderkey % 3600)
           + to_seconds(90),
         CAST((o_orderkey % 86400 + 3600) % 86400 AS INTEGER),
         encode('tag2-' || CAST(o_orderkey % 97 AS VARCHAR))
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY,
         o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP),
         CAST(NULL AS TIMESTAMP), CAST(NULL AS INTEGER),
         CAST(NULL AS BLOB)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** DuckDB-SQL equivalent of [[cdcLogComposite]] (CTE body
    * `cdc_log_comp`). */
  val cdcLogCompositeSql: String =
    """WITH li AS (SELECT l_orderkey AS okey,
                     CAST(l_linenumber AS BIGINT) AS line_no,
                     CAST(max(l_extendedprice) AS DOUBLE) AS price,
                     max(l_returnflag) AS status,
                     max(l_shipdate) AS l_shipdate
                   FROM lineitem GROUP BY 1, 2)
       SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, l_shipdate AS ts,
         okey, price, status, line_no FROM li
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), l_shipdate + INTERVAL 1 DAY,
         okey, price + CAST(10 AS DOUBLE), 'P', line_no
       FROM li WHERE (okey + line_no) % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), l_shipdate + INTERVAL 2 DAY,
         okey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), line_no
       FROM li WHERE (okey + line_no) % 7 = 0"""

  /** EXOTIC-typed change log — the tail of the MySQL type map
    * ([[cdcLogTyped]]: numeric/enum/JSON, [[cdcLogTemporal]]:
    * temporal/binary): SET (`flags_bits`, the raw member BITMASK the
    * binlog ships — the pipeline decodes it to MySQL's comma-joined
    * string form), YEAR (`yr`, Int16 range 1901..2155), BIT(20)
    * (`bits`, the integer value), and the ZERO-DATE landmine: `d_raw` /
    * `dt_raw` carry the RAW text a binlog decoder hands over, with
    * `0000-00-00` (storable in MySQL, invalid everywhere else) on a
    * deterministic subset of rows — inserts zero okey%5==0, updates
    * zero okey%5==1, so the latest event can flip a key real→zero AND
    * zero→real across the collapse. Same event rules as [[cdcLog]];
    * deletes ship NULL extras. */
  def cdcLogExotic(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status",
      "flags_bits", "yr", "bits", "d_raw", "dt_raw")
    val flags0 = (col("o_orderkey") % 16).cast(LongType)
    val yr0 = (lit(1901) + col("o_orderkey") % 200).cast(ShortType)
    val bits0 = (col("o_orderkey") % 1048576).cast(LongType)
    val dRaw0 = when(col("o_orderkey") % 5 === 0, lit("0000-00-00"))
      .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
    val dtRaw0 = when(col("o_orderkey") % 4 === 0,
      lit("0000-00-00 00:00:00"))
      .otherwise(concat(date_format(col("o_orderdate"), "yyyy-MM-dd"),
        lit(" 12:34:56")))
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        flags0.as("flags_bits"), yr0.as("yr"), bits0.as("bits"),
        dRaw0.as("d_raw"), dtRaw0.as("dt_raw")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"), lit("P").as("status"),
        flags0.bitwiseXOR(lit(5L)).as("flags_bits"),
        (yr0 + lit(1)).cast(ShortType).as("yr"),
        ((col("o_orderkey") + 77) % 1048576).cast(LongType).as("bits"),
        when(col("o_orderkey") % 5 === 1, lit("0000-00-00"))
          .otherwise(date_format(date_add(col("o_orderdate"), 1),
            "yyyy-MM-dd")).as("d_raw"),
        when(col("o_orderkey") % 4 === 1, lit("0000-00-00 00:00:00"))
          .otherwise(concat(
            date_format(date_add(col("o_orderdate"), 1), "yyyy-MM-dd"),
            lit(" 01:02:03"))).as("dt_raw")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(LongType).as("flags_bits"),
        lit(null).cast(ShortType).as("yr"),
        lit(null).cast(LongType).as("bits"),
        lit(null).cast(StringType).as("d_raw"),
        lit(null).cast(StringType).as("dt_raw"))))
  }

  /** CHARSET-typed change log — the text-encoding landmine of the MySQL
    * type map: a latin1 (ISO-8859-1) column's binlog bytes are NOT
    * UTF-8, and a replica that applies them verbatim serves mojibake.
    * `name_raw` carries the raw latin1-encoded BYTES a binlog decoder
    * hands over (accented names exercising the non-ASCII latin1 range);
    * the pipeline must transcode to UTF-8 at apply time
    * ([[graft.sources.MySqlTypes.decodeText]]). Same event rules as
    * [[cdcLog]]; updates re-spell the name, deletes ship NULL. */
  def cdcLogCharset(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status", "name_raw")
    def nm(names: Seq[String]) = concat(
      element_at(array(names.map(lit): _*),
        (col("o_orderkey") % 4 + 1).cast(IntegerType)),
      lit("-"), (col("o_orderkey") % 100).cast(StringType))
    val name0 = nm(Seq("Müller", "Ångström", "café", "niño"))
    // every character sits inside the ISO-8859-1 repertoire (ř would
    // not — an unmappable char turns into '?' at encode time and the
    // hash gate would rightly fail), hence Dvorák, not Dvořák
    val name1 = nm(Seq("Lindström", "Pérez", "Dvorák", "Çelik"))
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        encode(name0, "ISO-8859-1").as("name_raw")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"), lit("P").as("status"),
        encode(name1, "ISO-8859-1").as("name_raw")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(BinaryType).as("name_raw"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogCharset]] (CTE body `cdc_charset`)
    * — the oracle synthesizes the UTF-8 TEXT directly (DuckDB has no
    * latin1 codec), so the hashes meet iff the Spark side's
    * latin1-bytes round-trip is lossless (a decode under the wrong
    * charset — the classic mojibake — would mangle every accent). */
  val cdcLogCharsetSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status,
         (CASE o_orderkey % 4 WHEN 0 THEN 'Müller' WHEN 1 THEN 'Ångström'
               WHEN 2 THEN 'café' ELSE 'niño' END)
           || '-' || CAST(o_orderkey % 100 AS VARCHAR) AS name
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY,
         o_orderkey, CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         (CASE o_orderkey % 4 WHEN 0 THEN 'Lindström' WHEN 1 THEN 'Pérez'
               WHEN 2 THEN 'Dvorák' ELSE 'Çelik' END)
           || '-' || CAST(o_orderkey % 100 AS VARCHAR)
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY,
         o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS VARCHAR)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** DuckDB-SQL equivalent of [[cdcLogExotic]] (CTE body `cdc_exotic`). */
  val cdcLogExoticSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status,
         CAST(o_orderkey % 16 AS BIGINT) AS flags_bits,
         CAST(1901 + o_orderkey % 200 AS SMALLINT) AS yr,
         CAST(o_orderkey % 1048576 AS BIGINT) AS bits,
         CASE WHEN o_orderkey % 5 = 0 THEN '0000-00-00'
              ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS d_raw,
         CASE WHEN o_orderkey % 4 = 0 THEN '0000-00-00 00:00:00'
              ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
                || ' 12:34:56' END AS dt_raw
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY,
         o_orderkey, CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         CAST(xor(o_orderkey % 16, 5) AS BIGINT),
         CAST(1901 + o_orderkey % 200 + 1 AS SMALLINT),
         CAST((o_orderkey + 77) % 1048576 AS BIGINT),
         CASE WHEN o_orderkey % 5 = 1 THEN '0000-00-00'
              ELSE CAST(CAST(o_orderdate AS DATE) + 1 AS VARCHAR) END,
         CASE WHEN o_orderkey % 4 = 1 THEN '0000-00-00 00:00:00'
              ELSE CAST(CAST(o_orderdate AS DATE) + 1 AS VARCHAR)
                || ' 01:02:03' END
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY,
         o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS SMALLINT), CAST(NULL AS BIGINT),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** SMALL-NUMERIC change log — the narrow-integer/float head of the
    * MySQL type map ([[cdcLogTyped]] covers DECIMAL/unsigned/enum/JSON,
    * [[cdcLogTemporal]] temporal/binary, [[cdcLogExotic]] SET/YEAR/
    * BIT/zero-dates): TINYINT (`tny`, ByteType), SMALLINT (`sml`),
    * MEDIUMINT (`med` — the 3-byte type only MySQL has, ±8388607),
    * FLOAT (`flt`, built from exactly-representable quarters so both
    * engines agree bit for bit), and CHAR (`code` — the fixed-width
    * text type, wire type STRING). Same event rules as [[cdcLog]];
    * deletes ship NULL extras. */
  def cdcLogNumeric(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status", "tny",
      "sml", "med", "flt", "code")
    val tny0 = (col("o_orderkey") % 200 - 100).cast(ByteType)
    val sml0 = (col("o_orderkey") % 60000 - 30000).cast(ShortType)
    val med0 = (col("o_orderkey") % 16000000 - 8000000).cast(IntegerType)
    val flt0 = ((col("o_orderkey") % 1000).cast(DoubleType) / lit(4.0d))
      .cast(FloatType)
    val code0 = concat(lit("c"), (col("o_orderkey") % 100).cast(StringType))
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        tny0.as("tny"), sml0.as("sml"),
        med0.as("med"), flt0.as("flt"), code0.as("code")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"), lit("P").as("status"),
        (tny0 + lit(1)).cast(ByteType).as("tny"),
        (sml0 + lit(1)).cast(ShortType).as("sml"),
        (med0 + lit(1)).cast(IntegerType).as("med"),
        ((col("o_orderkey") % 1000).cast(DoubleType) / lit(4.0d) +
          lit(0.25d)).cast(FloatType).as("flt"),
        concat(lit("u"), (col("o_orderkey") % 100).cast(StringType))
          .as("code")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(ByteType).as("tny"),
        lit(null).cast(ShortType).as("sml"),
        lit(null).cast(IntegerType).as("med"),
        lit(null).cast(FloatType).as("flt"),
        lit(null).cast(StringType).as("code"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogNumeric]] (CTE body
    * `cdc_numeric`). */
  val cdcLogNumericSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status,
         CAST(o_orderkey % 200 - 100 AS TINYINT) AS tny,
         CAST(o_orderkey % 60000 - 30000 AS SMALLINT) AS sml,
         CAST(o_orderkey % 16000000 - 8000000 AS INTEGER) AS med,
         CAST(CAST(o_orderkey % 1000 AS DOUBLE) / 4 AS REAL) AS flt,
         'c' || CAST(o_orderkey % 100 AS VARCHAR) AS code
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY,
         o_orderkey, CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         CAST(o_orderkey % 200 - 100 + 1 AS TINYINT),
         CAST(o_orderkey % 60000 - 30000 + 1 AS SMALLINT),
         CAST(o_orderkey % 16000000 - 8000000 + 1 AS INTEGER),
         CAST(CAST(o_orderkey % 1000 AS DOUBLE) / 4
              + CAST(0.25 AS DOUBLE) AS REAL),
         'u' || CAST(o_orderkey % 100 AS VARCHAR)
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY,
         o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS TINYINT), CAST(NULL AS SMALLINT),
         CAST(NULL AS INTEGER), CAST(NULL AS REAL), CAST(NULL AS VARCHAR)
       FROM orders WHERE o_orderkey % 7 = 0"""

  /** The gh-ost/pt-osc COPIER's view at cutover: one Insert per live
    * order carrying the key's latest pre-cutover image ([[cdcLog]]'s
    * seq<=2 collapse — the online-schema-change tool guarantees
    * shadow == live at the cutover instant) PLUS the migration's new
    * column `price_cents` (the whole point of the OSC): exact integer
    * cents computed in DECIMAL so both engines agree bit for bit.
    * `seq` carries the copied image's source position (2 for updated
    * keys, 1 otherwise) so post-cutover events (seq 3+) win the
    * collapse exactly as binlog order dictates. */
  def cdcLogOscShadow(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val upd = col("o_orderkey") % 3 === 0
    o.select(
      lit("I").as("op"),
      when(upd, lit(2L)).otherwise(lit(1L)).as("seq"),
      when(upd, col("o_orderdate") + expr("INTERVAL 1 DAY"))
        .otherwise(col("o_orderdate")).as("ts"),
      col("o_orderkey").as("okey"),
      when(upd, col("o_totalprice").cast(DoubleType) + lit(10.0d))
        .otherwise(col("o_totalprice").cast(DoubleType)).as("price"),
      when(upd, lit("P")).otherwise(col("o_orderstatus")).as("status"),
      ((dec2(col("o_totalprice")) +
          when(upd, lit(10)).otherwise(lit(0))) * lit(100))
        .cast(LongType).as("price_cents"))
  }

  /** DuckDB-SQL equivalent of [[cdcLogOscShadow]] (CTE body
    * `osc_shadow`). */
  val cdcLogOscShadowSql: String =
    """SELECT 'I' AS op,
         CASE WHEN o_orderkey % 3 = 0 THEN CAST(2 AS BIGINT)
              ELSE CAST(1 AS BIGINT) END AS seq,
         CASE WHEN o_orderkey % 3 = 0 THEN o_orderdate + INTERVAL 1 DAY
              ELSE o_orderdate END AS ts,
         o_orderkey AS okey,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END AS price,
         CASE WHEN o_orderkey % 3 = 0 THEN 'P'
              ELSE o_orderstatus END AS status,
         CAST((CAST(o_totalprice AS DECIMAL(12,2))
               + CASE WHEN o_orderkey % 3 = 0 THEN 10 ELSE 0 END) * 100
              AS BIGINT) AS price_cents
       FROM orders"""

  /** POST-CUTOVER binlog continuation under the swapped-in table (the
    * OSC's new schema, [[cdcLogOscShadow]]'s envelope): [[cdcLog]]'s
    * seq=3 deletes ride through unchanged, and a fresh update wave
    * (seq=4, keys % 5 = 0 excluding the deleted % 7 keys — MySQL never
    * emits an update for a deleted row) overwrites copied shadow images
    * including the new column. */
  def cdcLogOscPost(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
    val upd = col("o_orderkey") % 3 === 0
    val cols = Seq("op", "seq", "ts", "okey", "price", "status",
      "price_cents")
    explodeEvents(o, cols, Seq(
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(LongType).as("price_cents")),
      (col("o_orderkey") % 5 === 0 && col("o_orderkey") % 7 =!= 0) -> struct(
        lit("U").as("op"), lit(4L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (when(upd, col("o_totalprice").cast(DoubleType) + lit(10.0d))
          .otherwise(col("o_totalprice").cast(DoubleType)) + lit(25.0d))
          .as("price"),
        lit("F").as("status"),
        ((dec2(col("o_totalprice")) +
            when(upd, lit(10)).otherwise(lit(0)) + lit(25)) * lit(100))
          .cast(LongType).as("price_cents"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogOscPost]] (CTE body `osc_post`). */
  val cdcLogOscPostSql: String =
    """SELECT 'D' AS op, CAST(3 AS BIGINT) AS seq,
         o_orderdate + INTERVAL 2 DAY AS ts, o_orderkey AS okey,
         CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS status,
         CAST(NULL AS BIGINT) AS price_cents
       FROM orders WHERE o_orderkey % 7 = 0
       UNION ALL
       SELECT 'U', CAST(4 AS BIGINT), o_orderdate + INTERVAL 3 DAY,
         o_orderkey,
         CASE WHEN o_orderkey % 3 = 0
              THEN CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END + CAST(25 AS DOUBLE),
         'F',
         CAST((CAST(o_totalprice AS DECIMAL(12,2))
               + CASE WHEN o_orderkey % 3 = 0 THEN 10 ELSE 0 END + 25) * 100
              AS BIGINT)
       FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0"""

  /** [[cdcLog]] carrying binlog_row_image=FULL's BEFORE image for the
    * checked payload column (`before_price`): inserts/deletes ship NULL
    * (no before to declare / bypassed by the gate), updates declare the
    * price the source saw before the change — CORRECT for most keys
    * (the insert's price), deliberately WRONG (+999) for keys with
    * o_orderkey % 11 == 0: the planted divergence the strict apply gate
    * must quarantine instead of laundering into current state. */
  def cdcLogConflict(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders").select(
      col("o_orderkey"), col("o_totalprice").cast(DoubleType).as("price"),
      col("o_orderstatus").as("status"), col("o_orderdate"))
    val cols = Seq("op", "seq", "ts", "okey", "price", "status",
      "before_price")
    explodeEvents(o, cols, Seq(
      lit(true) -> struct(
        lit("I").as("op"), lit(1L).as("seq"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("okey"), col("price"), col("status"),
        lit(null).cast(DoubleType).as("before_price")),
      (col("o_orderkey") % 3 === 0) -> struct(
        lit("U").as("op"), lit(2L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
        col("o_orderkey").as("okey"),
        (col("price") + lit(10.0d)).as("price"),
        lit("P").as("status"),
        when(col("o_orderkey") % 11 === 0, col("price") + lit(999.0d))
          .otherwise(col("price")).as("before_price")),
      (col("o_orderkey") % 7 === 0) -> struct(
        lit("D").as("op"), lit(3L).as("seq"),
        (col("o_orderdate") + expr("INTERVAL 2 DAY")).as("ts"),
        col("o_orderkey").as("okey"), lit(null).cast(DoubleType).as("price"),
        lit(null).cast(StringType).as("status"),
        lit(null).cast(DoubleType).as("before_price"))))
  }

  /** DuckDB-SQL equivalent of [[cdcLogConflict]] (CTE body
    * `cdc_conflict`). */
  val cdcLogConflictSql: String =
    """SELECT 'I' AS op, CAST(1 AS BIGINT) AS seq, o_orderdate AS ts,
         o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status, CAST(NULL AS DOUBLE) AS before_price
       FROM orders
       UNION ALL
       SELECT 'U', CAST(2 AS BIGINT), o_orderdate + INTERVAL 1 DAY,
         o_orderkey, CAST(o_totalprice AS DOUBLE) + CAST(10 AS DOUBLE), 'P',
         CASE WHEN o_orderkey % 11 = 0
              THEN CAST(o_totalprice AS DOUBLE) + CAST(999 AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END
       FROM orders WHERE o_orderkey % 3 = 0
       UNION ALL
       SELECT 'D', CAST(3 AS BIGINT), o_orderdate + INTERVAL 2 DAY,
         o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
         CAST(NULL AS DOUBLE)
       FROM orders WHERE o_orderkey % 7 = 0"""
}
