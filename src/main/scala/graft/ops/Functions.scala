package graft.ops

import graft.Tables
import graft.Tables.{dec2, D2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.7 — scalar function families, one query per family.
  * Values are chosen to dodge the known Spark/DuckDB dialect traps
  * (round half-even, dayofweek origin, split naming, float math).
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F1: string normalization surface (charset/text cleanup in the
    // reference's type mapping).
    "fn_string" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(
          col("doc_id"),
          substring(col("text"), 1, 20).as("prefix20"),
          upper(col("lang")).as("lang_up"),
          lower(col("source")).as("source_lo"),
          length(col("text")).cast(LongType).as("text_len"),
          concat_ws("-", col("lang"), col("source")).as("lang_source"),
          lpad(col("doc_id").cast(StringType), 6, "0").as("id_pad"),
          regexp_replace(col("source"), "src", "S").as("source_s"),
          trim(concat(lit("  "), col("lang"), lit("  "))).as("lang_trim"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          reverse(col("lang")).as("lang_rev"),
          expr("repeat(lang, 2)").as("lang_x2"),
          expr("left(text, 5)").as("head5"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .orderBy(col("doc_id"))),

    // F2: datetime family — session TZ pinned UTC on both engines.
    "fn_date" -> ((s, dir) =>
      Tables.t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          weekday(col("o_orderdate")).as("wd"),
          // Spark date_trunc returns TIMESTAMP, DuckDB returns DATE for
          // month precision — cast to DATE so both engines agree exactly.
          date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
          col("o_orderdate").cast(DateType).as("od"),
          date_add(col("o_orderdate").cast(DateType), 30).as("due"),
          datediff(lit("2002-01-01").cast(DateType),
            col("o_orderdate").cast(DateType)).as("days_to_2002"),
          // months_between on two month-start dates is an exact integer
          // double — no Spark fractional-month semantics in play, so the
          // oracle's month-boundary date_diff agrees bit-for-bit.
          months_between(lit("2002-01-01").cast(DateType),
            date_trunc("month", col("o_orderdate")).cast(DateType)).as("mon_to_2002"),
          to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
            .as("od_rt"),
          quarter(col("o_orderdate")).as("q"),
          last_day(col("o_orderdate").cast(DateType)).as("month_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))),

    // F3: math family — only operations that are bit-identical across
    // engines (exact-rounded sqrt, integral pow, floor/ceil/abs/sign/mod).
    "fn_math" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast(LongType).as("qty_floor"),
          ceil(col("l_quantity")).cast(LongType).as("qty_ceil"),
          abs(dec2(col("l_quantity")) - lit(25).cast(D2)).cast(D2)
            .cast(DoubleType).as("qty_dev"),
          signum(col("l_quantity") - 25).cast(IntegerType).as("qty_sign"),
          pmod(col("l_orderkey"), lit(7)).cast(LongType).as("key_mod"),
          pow(col("l_linenumber"), 2).as("ln_sq"),
          sqrt(col("l_orderkey")).as("key_sqrt"),
          round(col("l_extendedprice")).as("price_round"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // F4: array / higher-order functions over tokenized documents.
    "fn_array" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).cast(LongType).as("n_words"),
          size(array_distinct(col("words"))).cast(LongType).as("n_distinct"),
          array_contains(col("words"), "key").as("has_key"),
          concat_ws(",", slice(sort_array(col("words")), 1, 3)).as("first3_sorted"),
          aggregate(transform(col("words"), w => length(w)),
            lit(0L), (acc, x) => acc + x).as("total_chars"),
          size(filter(col("words"), w => length(w) > 4)).cast(LongType).as("n_long"))
        .orderBy(col("doc_id"))),

    // F5: map construction + access, projected back to sorted arrays for
    // an engine-portable shape (DuckDB map syntax differs).
    "fn_map" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("m", map_from_arrays(
          array(lit("lang"), lit("source")),
          array(col("lang"), col("source"))))
        .select(
          col("doc_id"),
          element_at(col("m"), "lang").as("lang_val"),
          size(col("m")).cast(LongType).as("m_size"),
          concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"),
          concat_ws(",", sort_array(map_values(col("m")))).as("vals_sorted"))
        .orderBy(col("doc_id"))),

    // F6: JSON passthrough — events.props is a JSON string column.
    "fn_json" -> ((s, dir) =>
      Tables.t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k_int"))
        .orderBy(col("event_id"))),

    // F7: bitwise family — MySQL's &, |, ^, <<, >>, ~, BIT_COUNT surface
    // (bit-flag columns are a classic MySQL schema idiom the type map has
    // to carry). All 64-bit two's-complement in both engines, so every
    // output is exact.
    "fn_bitwise" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(col("l_partkey")).as("k_and_p"),
          col("l_orderkey").bitwiseOR(col("l_partkey")).as("k_or_p"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("k_xor_p"),
          shiftleft(col("l_linenumber").cast(LongType), 3).as("ln_shl3"),
          shiftright(col("l_orderkey"), 2).as("k_shr2"),
          expr("~l_orderkey").as("k_not"),
          bit_count(col("l_orderkey")).as("k_bits"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // F9: hash / encoding family — md5, sha256, base64, hex, plus a
    // base64 decode round-trip flag. This is the reference's consistency
    // surface in function form (its checksum compare is row hashing);
    // only engine-portable digests appear (sha1/crc32/xxhash are not in
    // both engines). All scan-local codegen'd expressions.
    "fn_hash" -> ((s, dir) =>
      Tables.t(s, dir, "customer")
        .select(
          col("c_custkey"),
          md5(col("c_name").cast(BinaryType)).as("h_md5"),
          sha2(col("c_name").cast(BinaryType), 256).as("h_sha256"),
          base64(col("c_name").cast(BinaryType)).as("b64"),
          hex(col("c_name").cast(BinaryType)).as("hx"),
          (unbase64(base64(col("c_name").cast(BinaryType)))
            .cast(StringType) === col("c_name")).as("b64_roundtrip"),
          length(col("c_name")).as("name_len"))
        .orderBy(col("c_custkey"))),

    // F8: URL family — ClickHouse ships a whole URL-function surface
    // (domain, path, queryString, extractURLParameter, topLevelDomain)
    // that destination-side analytics lean on. The URL is constructed
    // deterministically from table columns (the harness ships no URL
    // column), then parsed back with Spark's parse_url; the oracle
    // re-parses the same strings with independent regexes, so this is a
    // genuine differential test of the parser, not an echo.
    "fn_url" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .withColumn("url", concat(
          lit("https://"), col("source"), lit(".example.com/"), col("lang"),
          lit("/doc/"), col("doc_id").cast(StringType),
          lit("?q="), col("n_chars").cast(StringType),
          lit("&page="), (col("doc_id") % 10).cast(StringType)))
        .select(
          col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("qs"),
          expr("parse_url(url, 'QUERY', 'q')").as("q_param"),
          expr("parse_url(url, 'QUERY', 'page')").as("page_param"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"),
          element_at(split(expr("parse_url(url, 'HOST')"), "\\."), -1).as("tld"))
        .orderBy(col("doc_id"))),

    // F10: IPv4 family — ClickHouse ships IPv4NumToString/IPv4StringToNum/
    // isIPAddressInRange for destination-side network analytics. The
    // harness ships no IP column, so a deterministic unsigned-32 address
    // is derived from c_custkey by Knuth multiplicative hashing; the
    // format / re-parse / CIDR-membership surface is then pure integer and
    // bit arithmetic — exact in both engines and fully codegen'd (no UDF,
    // scan-local, zero shuffles before the final sort).
    "fn_ip" -> ((s, dir) => {
      def octet(ip: org.apache.spark.sql.Column, shift: Int) =
        shiftright(ip, shift).bitwiseAND(lit(255L)).cast(StringType)
      Tables.t(s, dir, "customer")
        .withColumn("ip", pmod(col("c_custkey") * lit(2654435761L), lit(4294967296L)))
        .withColumn("ip_str", concat_ws(".",
          octet(col("ip"), 24), octet(col("ip"), 16),
          octet(col("ip"), 8), octet(col("ip"), 0)))
        .select(
          col("c_custkey"), col("ip"), col("ip_str"),
          (shiftright(col("ip"), 24) === lit(10L)).as("in_10_8"),
          (shiftright(col("ip"), 16) === lit(192L * 256 + 168)).as("in_192_168_16"),
          shiftleft(shiftright(col("ip"), 8), 8).as("subnet24"),
          // IPv4StringToNum direction: re-parse the dotted quad from the
          // STRING (a genuine string→num round-trip, not an echo of `ip`)
          aggregate(transform(split(col("ip_str"), "\\."),
            x => x.cast(LongType)), lit(0L),
            (acc, x) => acc * 256 + x).as("ip_rt"))
        .orderBy(col("c_custkey"))
    }),

    // F14: conditional/comparison family — greatest/least/ifnull/nullif/
    // if: the MySQL conditional surface P5's CASE WHEN doesn't cover.
    // NULL propagation is the point: greatest/least return NULL if ANY
    // argument is NULL in MySQL but SKIP nulls in Spark and DuckDB — the
    // planted-null column exercises the (shared) skip semantics.
    "fn_conditional" -> ((s, dir) =>
      Tables.t(s, dir, "lineitem")
        .withColumn("maybe_null",
          when(col("l_linenumber") === 1, lit(null).cast(DoubleType))
            .otherwise(col("l_discount")))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_quantity"), col("l_extendedprice") / 1000.0d,
            lit(10.0d)).as("g3"),
          least(col("l_quantity"), col("l_extendedprice") / 1000.0d,
            lit(10.0d)).as("l3"),
          greatest(col("l_quantity"), col("maybe_null")).as("g_null_skip"),
          coalesce(col("maybe_null"), lit(-1.0d)).as("ifnull_v"),
          nullif(col("l_linenumber"), lit(1)).as("nullif_first"),
          expr("if(l_quantity > 25, 'H', 'L')").as("band"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // F12: timezone family — MySQL CONVERT_TZ / ClickHouse toTimeZone:
    // the wall-clock mapping every cross-region replication pipeline has
    // to get right. Session timestamps are UTC instants; conversions run
    // through each engine's OWN tz database (JVM tzdata vs DuckDB ICU — a
    // genuine differential), with a round-trip back to UTC. The fixture's
    // single-month range keeps the zones DST-stable.
    "fn_tz" -> ((s, dir) =>
      Tables.t(s, dir, "events")
        .select(
          col("event_id"), col("ts"),
          from_utc_timestamp(col("ts"), "America/New_York").as("ts_ny"),
          from_utc_timestamp(col("ts"), "Asia/Kolkata").as("ts_kolkata"),
          from_utc_timestamp(col("ts"), "Asia/Tokyo").as("ts_tokyo"),
          to_utc_timestamp(from_utc_timestamp(col("ts"), "America/New_York"),
            "America/New_York").as("ts_rt"),
          hour(from_utc_timestamp(col("ts"), "America/New_York")).as("hour_ny"),
          unix_micros(col("ts")).as("epoch_us"))
        .orderBy(col("event_id"))),

    // F13: MySQL string idioms — substring_index / instr / locate / left
    // / right / printf-format / translate: the string surface MySQL
    // schemas lean on, over a host string built from columns. The oracle
    // re-implements substring_index with list slicing (DuckDB has no
    // native one) — a differential, not an echo.
    "fn_mysql_string" -> ((s, dir) =>
      Tables.t(s, dir, "customer")
        .withColumn("host", concat(
          lower(col("c_mktsegment")), lit("."),
          regexp_replace(lower(col("c_name")), "[^a-z0-9]", "-"),
          lit(".example.com")))
        .select(
          col("c_custkey"), col("host"),
          substring_index(col("host"), ".", 1).as("sub1"),
          substring_index(col("host"), ".", -2).as("dom2"),
          expr("instr(host, '.')").cast(LongType).as("first_dot"),
          expr("locate('example', host)").cast(LongType).as("loc_example"),
          expr("right(host, 3)").as("tail3"),
          expr("left(host, 4)").as("head4"),
          format_string("%s#%04d", col("c_mktsegment"), col("c_custkey"))
            .as("fmt"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("transl"))
        .orderBy(col("c_custkey"))),

    // F11: lateral explode (ClickHouse arrayJoin / SQL LATERAL VIEW): the
    // row-multiplying direction the array family (F4) can't show. Explode
    // runs scan-local via the Generate operator (no shuffle until the
    // per-doc re-aggregate); docs with no qualifying token drop out.
    "fn_explode" -> ((s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(length(col("word")) > 4)
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_long"),
          min(col("pos")).cast(LongType).as("first_pos"),
          max(length(col("word"))).cast(LongType).as("max_len"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT doc_id,
           substring(text, 1, 20) AS prefix20,
           upper(lang) AS lang_up,
           lower(source) AS source_lo,
           CAST(length(text) AS BIGINT) AS text_len,
           concat_ws('-', lang, source) AS lang_source,
           lpad(CAST(doc_id AS VARCHAR), 6, '0') AS id_pad,
           regexp_replace(source, 'src', 'S') AS source_s,
           trim('  ' || lang || '  ') AS lang_trim,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_x2,
           left(text, 5) AS head5,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents ORDER BY doc_id""",

    "fn_date" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate AS DATE) AS od,
           CAST(o_orderdate AS DATE) + 30 AS due,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                AS INTEGER) AS days_to_2002,
           CAST(date_diff('month', date_trunc('month', o_orderdate),
                DATE '2002-01-01') AS DOUBLE) AS mon_to_2002,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS od_rt,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
         FROM orders ORDER BY o_orderkey""",

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(CAST(abs(CAST(l_quantity AS DECIMAL(18,2)) - CAST(25 AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS qty_dev,
           CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           pow(l_linenumber, 2) AS ln_sq,
           sqrt(l_orderkey) AS key_sqrt,
           round(l_extendedprice) AS price_round
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "fn_array" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           list_contains(string_split(text, ' '), 'key') AS has_key,
           array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> length(w))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(string_split(text, ' '),
                w -> length(w) > 4)) AS BIGINT) AS n_long
         FROM documents ORDER BY doc_id""",

    "fn_map" ->
      """SELECT doc_id,
           lang AS lang_val,
           CAST(2 AS BIGINT) AS m_size,
           'lang,source' AS keys_sorted,
           array_to_string(list_sort([lang, source]), ',') AS vals_sorted
         FROM documents ORDER BY doc_id""",

    "fn_json" ->
      """SELECT event_id,
           props->>'k' AS k_str,
           CAST(props->>'k' AS INTEGER) AS k_int
         FROM events ORDER BY event_id""",

    "fn_hash" ->
      """SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256,
           base64(encode(c_name)) AS b64,
           hex(c_name) AS hx,
           decode(from_base64(base64(encode(c_name)))) = c_name
             AS b64_roundtrip,
           CAST(length(c_name) AS INTEGER) AS name_len
         FROM customer ORDER BY c_custkey""",

    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
           l_orderkey & l_partkey AS k_and_p,
           l_orderkey | l_partkey AS k_or_p,
           xor(l_orderkey, l_partkey) AS k_xor_p,
           CAST(l_linenumber AS BIGINT) << 3 AS ln_shl3,
           l_orderkey >> 2 AS k_shr2,
           ~l_orderkey AS k_not,
           CAST(bit_count(l_orderkey) AS INTEGER) AS k_bits
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "fn_url" ->
      """WITH u AS (SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc/' ||
             CAST(doc_id AS VARCHAR) || '?q=' || CAST(n_chars AS VARCHAR) ||
             '&page=' || CAST(doc_id % 10 AS VARCHAR) AS url
           FROM documents)
         SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\?(.*)$', 1) AS qs,
           regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page_param,
           regexp_extract(url, '^([a-z]+):', 1) AS proto,
           regexp_extract(url, '^https://[^/]*\.([a-z]+)/', 1) AS tld
         FROM u ORDER BY doc_id""",

    "fn_ip" ->
      """WITH t AS (SELECT c_custkey,
             (c_custkey * 2654435761) % 4294967296 AS ip FROM customer),
         u AS (SELECT c_custkey, ip,
             CAST(ip >> 24 AS VARCHAR) || '.' ||
             CAST((ip >> 16) & 255 AS VARCHAR) || '.' ||
             CAST((ip >> 8) & 255 AS VARCHAR) || '.' ||
             CAST(ip & 255 AS VARCHAR) AS ip_str
           FROM t)
         SELECT c_custkey, ip, ip_str,
           (ip >> 24) = 10 AS in_10_8,
           (ip >> 16) = 49320 AS in_192_168_16,
           (ip >> 8) << 8 AS subnet24,
           CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216 +
           CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536 +
           CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256 +
           CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_rt
         FROM u ORDER BY c_custkey""",

    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_extendedprice / 1000.0, 10.0) AS g3,
           least(l_quantity, l_extendedprice / 1000.0, 10.0) AS l3,
           greatest(l_quantity,
             CASE WHEN l_linenumber = 1 THEN NULL ELSE l_discount END)
             AS g_null_skip,
           coalesce(CASE WHEN l_linenumber = 1 THEN NULL
                         ELSE l_discount END, -1.0) AS ifnull_v,
           nullif(l_linenumber, 1) AS nullif_first,
           CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS band
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "fn_tz" ->
      """SELECT event_id, ts,
           timezone('America/New_York', ts AT TIME ZONE 'UTC') AS ts_ny,
           timezone('Asia/Kolkata', ts AT TIME ZONE 'UTC') AS ts_kolkata,
           timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC') AS ts_tokyo,
           timezone('UTC',
             timezone('America/New_York', ts AT TIME ZONE 'UTC')
               AT TIME ZONE 'America/New_York') AS ts_rt,
           CAST(hour(timezone('America/New_York', ts AT TIME ZONE 'UTC'))
             AS INTEGER) AS hour_ny,
           epoch_us(ts) AS epoch_us
         FROM events ORDER BY event_id""",

    "fn_mysql_string" ->
      """WITH h AS (SELECT c_custkey, c_mktsegment,
             lower(c_mktsegment) || '.' ||
             regexp_replace(lower(c_name), '[^a-z0-9]', '-', 'g') ||
             '.example.com' AS host
           FROM customer)
         SELECT c_custkey, host,
           string_split(host, '.')[1] AS sub1,
           array_to_string(string_split(host, '.')[-2:], '.') AS dom2,
           CAST(strpos(host, '.') AS BIGINT) AS first_dot,
           CAST(strpos(host, 'example') AS BIGINT) AS loc_example,
           right(host, 3) AS tail3,
           left(host, 4) AS head4,
           printf('%s#%04d', c_mktsegment, c_custkey) AS fmt,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS transl
         FROM h ORDER BY c_custkey""",

    "fn_explode" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
             FROM documents),
         f AS (SELECT doc_id,
             list_filter(words, x -> length(x) > 4) AS lw,
             list_position(list_transform(words, x -> length(x) > 4), true)
               AS first1
           FROM w)
         SELECT doc_id,
           CAST(len(lw) AS BIGINT) AS n_long,
           CAST(first1 - 1 AS BIGINT) AS first_pos,
           CAST(list_max(list_transform(lw, x -> length(x))) AS BIGINT)
             AS max_len
         FROM f WHERE len(lw) > 0 ORDER BY doc_id"""
  )
}
