package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2, D4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.2 — projection / filter / predicates / casts / CASE. */
object Projections {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // P1: arithmetic derived columns, all in exact decimal.
    "project_compute" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (dec2(col("l_extendedprice")) * (lit(1).cast(D2) - dec2(col("l_discount"))))
            .cast(D4).cast(DoubleType).as("revenue"),
          (dec2(col("l_extendedprice")) * (lit(1).cast(D2) + dec2(col("l_tax"))))
            .cast(D4).cast(DoubleType).as("charged"),
          (dec2(col("l_quantity")) * dec2(col("l_extendedprice")))
            .cast(D4).cast(DoubleType).as("qty_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P2: conjunctive/disjunctive predicates, IN, BETWEEN, LIKE.
    "filter_pred" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(50000, 150000) &&
          (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")))
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec2(col("o_totalprice")).cast(DoubleType).as("total"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))),

    // P3: three-valued logic — the testdata has no NULLs, so they are
    // manufactured with nullif and round-tripped through coalesce / <=>.
    "filter_null_semantics" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("XX")).as("flag_filled"),
          (nullif(col("l_returnflag"), lit("N")) <=> nullif(col("l_linestatus"), lit("O")))
            .as("ns_eq"))
        .filter(nullif(col("l_returnflag"), lit("N")).isNull ||
                col("l_returnflag") === "R")
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P4: cross-type casts (double->int truncation, double->decimal,
    // timestamp->date, bigint->string) plus the classic MySQL type-map
    // edge cases (SURVEY §1.1): BIGINT UNSIGNED beyond the signed-64
    // boundary (carried in DECIMAL(20,0), emitted as string — the
    // determinism policy keeps decimal out of final schemas), blob
    // encode/hex/decode round-trip, enum-index->label mapping, zero-date
    // '0000-00-00' -> NULL, and the YEAR type as a small int.
    "project_cast" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .withColumn("d0",
          when(col("l_orderkey") % 97 === 0, to_date(lit("0001-01-01")))
            .otherwise(col("l_shipdate").cast(DateType)))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          col("l_extendedprice").cast(DecimalType(12, 2)).cast(DoubleType).as("price_dec"),
          col("l_shipdate").cast(DateType).as("ship_date"),
          col("l_orderkey").cast(StringType).as("okey_str"),
          (lit("18446744073709551615").cast(DecimalType(20, 0)) - col("l_orderkey"))
            .cast(StringType).as("u64_str"),
          hex(encode(concat(col("l_returnflag"), col("l_linestatus")), "UTF-8"))
            .as("bin_hex"),
          (decode(encode(col("l_returnflag"), "UTF-8"), "UTF-8") === col("l_returnflag"))
            .as("bin_rt"),
          elt(when(col("l_returnflag") === "A", 1)
              .when(col("l_returnflag") === "N", 2).otherwise(3),
            lit("accepted"), lit("none"), lit("returned")).as("enum_label"),
          when(col("d0") <= to_date(lit("0001-01-01")), lit(null).cast(DateType))
            .otherwise(col("d0")).as("zero_date"),
          year(col("l_shipdate")).cast(ShortType).as("yr"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P5: CASE WHEN bucketing + aggregation over the buckets.
    "case_when" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 25, "mid")
            .otherwise("high").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")))
  )

  val oracle: Map[String, String] = Map(
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
                AS DECIMAL(18,4)) AS DOUBLE) AS charged,
           CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS DOUBLE)
             AS qty_price
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "filter_pred" ->
      """SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total, o_orderpriority
         FROM orders
         WHERE o_orderstatus IN ('F','O')
           AND o_totalprice BETWEEN 50000 AND 150000
           AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
         ORDER BY o_orderkey""",

    "filter_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
           nullif(l_returnflag, 'N') AS flag_or_null,
           coalesce(nullif(l_returnflag, 'N'), 'XX') AS flag_filled,
           nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O')
             AS ns_eq
         FROM lineitem
         WHERE nullif(l_returnflag, 'N') IS NULL OR l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",

    "project_cast" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) - l_orderkey
                AS VARCHAR) AS u64_str,
           hex(encode(l_returnflag || l_linestatus)) AS bin_hex,
           decode(encode(l_returnflag)) = l_returnflag AS bin_rt,
           (['accepted','none','returned'])[
             CASE WHEN l_returnflag = 'A' THEN 1
                  WHEN l_returnflag = 'N' THEN 2 ELSE 3 END] AS enum_label,
           CASE WHEN d0 <= DATE '0001-01-01' THEN NULL ELSE d0 END AS zero_date,
           CAST(year(l_shipdate) AS SMALLINT) AS yr
         FROM (SELECT *,
                 CASE WHEN l_orderkey % 97 = 0 THEN DATE '0001-01-01'
                      ELSE CAST(l_shipdate AS DATE) END AS d0
               FROM lineitem)
         ORDER BY l_orderkey, l_linenumber""",

    "case_when" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
                     WHEN l_quantity < 25 THEN 'mid'
                     ELSE 'high' END AS bucket, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY bucket"""
  )
}
