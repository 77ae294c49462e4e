package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-operator semantic checks on tiny known inputs + full-coverage
  * smoke over every declared query at sf0.001 (SURVEY.md §5.2.2).
  */
class OperatorSpec extends SparkTestBase {

  test("every declared query runs and most return rows") {
    val empties = Seq("join_left_anti", "set_except", // no order-less customers in data
      "llm_dedup_embed_cosine", // planted pairs may be bucket-split at tiny sf
      "join_theta_range") // sf0.001 has too few suppliers per nation for pairs
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!empties.contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle name is a declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("CDC latest-wins collapse keeps max-seq row and drops deletes") {
    import spark.implicits._
    val log = Seq(
      ("I", 1L, 10L, java.math.BigDecimal.valueOf(100, 2)),
      ("U", 2L, 10L, java.math.BigDecimal.valueOf(200, 2)),
      ("I", 1L, 20L, java.math.BigDecimal.valueOf(300, 2)),
      ("I", 1L, 30L, java.math.BigDecimal.valueOf(400, 2)),
      ("D", 2L, 30L, null.asInstanceOf[java.math.BigDecimal])
    ).toDF("op", "seq", "okey", "price")
    val latest = log.groupBy($"okey")
      .agg(max_by(struct($"op", $"price"), $"seq").as("l"))
      .select($"okey", $"l.op".as("op"), $"l.price".as("price"))
      .filter($"op" =!= "D")
    val rows = latest.orderBy("okey").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 10L && rows(0).getString(1) == "U")
    assert(rows(0).getDecimal(2).compareTo(java.math.BigDecimal.valueOf(200, 2)) == 0)
    assert(rows(1).getLong(0) == 20L)
  }

  test("cdcLog is deterministic and seq-monotone per key") {
    val log = Tables.cdcLog(spark, sf)
    val dup = log.groupBy("okey", "seq").count().filter(col("count") > 1).count()
    assert(dup == 0, "duplicate (okey, seq)")
    assert(log.filter(col("op") === "I").count() ==
      Tables.t(spark, sf, "orders").count())
  }

  test("vec_dec_sum: empty arrays are vacuous in any order; ragged widths fail") {
    import graft.functions.VectorOps
    VectorOps.register(spark)
    import spark.implicits._
    def sumOf(rows: Seq[Seq[Double]]): Seq[java.math.BigDecimal] = {
      val got = rows.toDF("v")
        .select(expr("vec_dec_sum(transform(v, x -> cast(x AS DOUBLE)))"))
        .collect()(0)
      if (got.isNullAt(0)) null
      else got.getSeq[java.math.BigDecimal](0)
    }
    // empty arrays contribute nothing (the exploded form has no rows for
    // them) regardless of whether they precede or follow the wide rows
    val want = Seq(new java.math.BigDecimal("4.000000000000000000"),
      new java.math.BigDecimal("6.000000000000000000"))
    assert(sumOf(Seq(Seq.empty, Seq(1.0, 2.0), Seq(3.0, 4.0))) == want)
    assert(sumOf(Seq(Seq(1.0, 2.0), Seq.empty, Seq(3.0, 4.0))) == want)
    // all-empty column: nothing was ever folded -> NULL (like sum of no rows)
    assert(sumOf(Seq(Seq.empty, Seq.empty)) == null)
    // genuinely ragged non-empty widths fail fast, never truncate
    val e = intercept[Exception] { sumOf(Seq(Seq(1.0), Seq(1.0, 2.0))) }
    assert(e.getMessage != null)
  }

  test("vec_dec_sum == exploded decimal sums, across partition merges") {
    import graft.functions.VectorOps
    import org.apache.spark.sql.types.DecimalType
    VectorOps.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
      .select((col("vec_id") % 4).as("g"),
        VectorOps.toDouble(col("embedding")).as("v"))
      .repartition(8) // several partial states per group -> merge path runs
    val got = e.groupBy(col("g"))
      .agg(expr("vec_dec_sum(v)").as("sx"))
      .select(col("g"), posexplode(col("sx")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2))).toSet
    val want = e.select(col("g"), posexplode(col("v")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(col("col").cast(DecimalType(38, 18))).as("sx"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2))).toSet
    assert(got == want)
  }

  test("null semantics: eqNullSafe vs eq") {
    import spark.implicits._
    val df = Seq((Some("a"), Some("a")), (None, None), (Some("a"), None))
      .toDF("x", "y")
    assert(df.filter($"x" <=> $"y").count() == 2)
    assert(df.filter($"x" === $"y").count() == 1)
  }

  test("set ops: except/intersect/union on known bags") {
    import spark.implicits._
    val a = Seq(1, 2, 2, 3).toDF("k")
    val b = Seq(2, 4).toDF("k")
    assert(a.except(b).orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(1, 3))
    assert(a.intersect(b).collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(a.union(b).count() == 6)
    assert(a.union(b).distinct().count() == 4)
  }

  test("as-of join picks latest prior click per purchase") {
    val out = q("join_asof_event_order")
    // every c_ts (when present) must be <= its p_ts
    assert(out.filter(col("c_ts") > col("p_ts")).count() == 0)
    // one row per purchase
    val purchases = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
  }

  test("approx_count_distinct within declared rsd of exact") {
    val row = q("agg_approx_distinct").collect()(0)
    val li = Tables.t(spark, sf, "lineitem")
    val exactOrders = li.select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    val approx = row.getLong(row.fieldIndex("approx_orders"))
    assert(math.abs(approx - exactOrders).toDouble / exactOrders < 0.1,
      s"approx=$approx exact=$exactOrders")
  }

  test("topk_per_group returns exactly k rows per non-small group") {
    val out = q("topk_per_group")
    val sizes = out.groupBy("c_mktsegment").count().collect()
    sizes.foreach(r => assert(r.getLong(1) <= 3))
  }

  test("mutation_delete removes exactly the predicate rows from latest state") {
    val latest = q("agg_latest_by_version")
    val deleted = latest.filter(col("status") === "F").count()
    val out = q("mutation_delete")
    assert(deleted > 0, "predicate matched nothing — the mutation is vacuous")
    assert(out.filter(col("status") === "F").count() == 0)
    assert(out.count() == latest.count() - deleted)
  }

  test("mutation_update rewrites only the matching rows") {
    val latest = q("agg_latest_by_version")
      .select(col("okey"), col("price").as("old_price"), col("status"))
    val joined = q("mutation_update").select(col("okey"), col("price"))
      .join(latest, "okey")
    // non-matching rows byte-identical; matching rows exactly old * 1.05
    assert(joined.filter(col("status") =!= "O" &&
      col("price") =!= col("old_price")).count() == 0)
    assert(joined.filter(col("status") === "O" &&
      col("price") =!= col("old_price") * lit(1.05d)).count() == 0)
    assert(joined.filter(col("status") === "O").count() > 0,
      "assignment matched nothing — the mutation is vacuous")
  }

  test("summing merge of disjoint parts equals the direct aggregate") {
    val li = Tables.t(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_suppkey"))
      .agg(sum(Tables.dec2(col("l_quantity"))).cast(Tables.D2)
          .cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
    val merged = q("agg_summing_merge")
      .select(col("l_suppkey"), col("sum_qty"), col("n_rows"))
    assert(merged.except(direct).count() == 0 &&
      direct.except(merged).count() == 0)
  }

  test("snapshot + binlog tail handoff equals the full-log collapse") {
    // the invariant that makes --full followed by --increment a correct
    // sync strategy: composing the cutoff snapshot with the retained
    // tail must reproduce collapsing the entire log
    val handoff = q("cdc_snapshot_handoff")
      .select(col("okey"), col("price"), col("status"))
    val full = q("agg_latest_by_version")
      .select(col("okey"), col("price"), col("status"))
    assert(handoff.except(full).count() == 0 &&
      full.except(handoff).count() == 0)
    // both phases contribute: some keys have all their events before the
    // cutoff (served purely by the snapshot), some have tail events
    val cutoff = to_date(lit("1995-06-17"))
    val perKey = Tables.cdcLog(spark, sf)
      .groupBy(col("okey")).agg(max(col("ts") > cutoff).as("hasTail"))
    assert(perKey.filter(!col("hasTail")).count() > 0,
      "no key was served by the snapshot alone")
    assert(perKey.filter(col("hasTail")).count() > 0,
      "no key saw a tail event")
  }

  test("gap detection flags exactly the keys with seq holes") {
    val gaps = q("cdc_gap_detect")
    // synthesized log: keys %7==0 && %3!=0 emit (1,3) — a hole at 2
    assert(gaps.filter(col("n_missing") <= 0).count() == 0)
    val bad = gaps.filter(pmod(col("okey"), lit(7)) =!= 0 ||
      pmod(col("okey"), lit(3)) === 0).count()
    assert(bad == 0, s"$bad keys flagged that cannot have holes")
  }

  test("with-fill spine contains both real and zero-filled days") {
    val out = q("sort_with_fill")
    assert(out.filter(col("n") === 0).count() > 0, "no gaps were filled")
    assert(out.filter(col("n") > 0).count() > 0, "series carried no data")
  }

  test("approx quantiles land within tolerance of the exact percentiles") {
    val approx = q("agg_quantiles_approx").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for ((flag, (a50, a95)) <- approx) {
      val (e50, e95) = exact(flag)
      // l_quantity spans 1..50; accuracy 1000 → rank error ≤ n/1000,
      // value tolerance of ±2 is generous and catches gross breakage
      assert(math.abs(a50 - e50) <= 2.0, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= 2.0, s"$flag p95: $a95 vs $e95")
    }
  }

  test("uniq sketch states merge associatively and estimate within rsd") {
    val out = q("agg_uniq_sketch_merge").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.t(spark, sf, "events")
    // merged-states estimate == the estimate of one direct global sketch
    // (uniqMerge semantics: folding partial states loses nothing)
    val direct = ev.agg(
      org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(col("user_id"))))
      .collect()(0).getLong(0)
    assert(out("<all>") == direct,
      s"merged=${out("<all>")} direct=$direct — state merge is lossy")
    // HLL default lgConfigK=12 → rsd ~1.6%; allow 5%
    val exact = ev.select(col("user_id")).distinct().count()
    assert(math.abs(out("<all>").toDouble - exact) / exact < 0.05,
      s"estimate ${out("<all>")} vs exact $exact")
  }

  test("ttl and sample filters have real signal (neither empty nor total)") {
    val all = Tables.t(spark, sf, "events").count()
    val ttlKept = q("ttl_expiry").agg(sum(col("n"))).collect()(0).getLong(0)
    assert(ttlKept > 0 && ttlKept < all, s"ttl kept $ttlKept of $all")
    val sampleKept = q("sample_hash_bucket").agg(sum(col("n")))
      .collect()(0).getLong(0)
    assert(sampleKept > 0 && sampleKept < all, s"sample kept $sampleKept of $all")
  }

  test("bootstrap DDL: type map, nullability, keys, bookkeeping columns") {
    import org.apache.spark.sql.types._
    import graft.sources.DestinationDdl
    assert(DestinationDdl.chType(LongType) == "Int64")
    assert(DestinationDdl.chType(IntegerType) == "Int32")
    assert(DestinationDdl.chType(DoubleType) == "Float64")
    assert(DestinationDdl.chType(DecimalType(18, 2)) == "Decimal(18, 2)")
    assert(DestinationDdl.chType(TimestampType) == "DateTime64(6)")
    assert(DestinationDdl.chType(TimestampNTZType) == "DateTime64(6)")
    assert(DestinationDdl.chType(ArrayType(FloatType)) == "Array(Float32)")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true), // PK: never Nullable
      StructField("v", DoubleType, nullable = true),
      StructField("tag", StringType, nullable = false), // source NOT NULL
      StructField("emb", ArrayType(FloatType), nullable = true))) // CH forbids Nullable(Array)
    val ddl = DestinationDdl.createTable("t1", schema, Seq("id"))
    assert(ddl == "CREATE TABLE dest.`t1` (`id` Int64, `v` Nullable(Float64), " +
      "`tag` String, `emb` Array(Float32), " +
      "`_version` UInt64, `_is_deleted` UInt8) " +
      "ENGINE = ReplacingMergeTree(_version, _is_deleted) ORDER BY (`id`)")
    // composite key order preserved in ORDER BY
    val ddl2 = DestinationDdl.createTable("t2", schema, Seq("id", "tag"))
    assert(ddl2.endsWith("ORDER BY (`id`, `tag`)"))
    // a key absent from the schema fails loudly
    val e = intercept[IllegalArgumentException] {
      DestinationDdl.createTable("t3", schema, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
