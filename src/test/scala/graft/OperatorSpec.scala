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
}
