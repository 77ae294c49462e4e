package graft

import java.sql.DriverManager

import graft.sources.{EpochParquetSink, JdbcBatchSink, JdbcSource}
import org.apache.spark.sql.functions._

/** The JDBC PRODUCTION path executed for real against embedded Derby (on
  * the Spark classpath) — the harness's declared queries snapshot through
  * parquet (no live MySQL), so this is where the actual
  * `spark.read.format("jdbc")` / `df.write.format("jdbc")` plumbing is
  * proven: round-trip fidelity, PK-chunked parallel reads, and the
  * documented idempotent-replay contract of [[JdbcBatchSink]] (append-mode
  * JDBC duplicates on replay BY DESIGN — dedup is the destination DB's
  * job, e.g. ReplacingMergeTree collapse — while the harness's
  * [[EpochParquetSink]] is replay-idempotent by overwrite). */
class JdbcSpec extends SparkTestBase {

  /** Fresh embedded-Derby database under a temp dir (one per test; the
    * embedded engine allows many databases per JVM). */
  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def withConn[T](url: String)(body: java.sql.Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try body(conn) finally conn.close()
  }

  private def seedOrders(url: String, n: Int): Unit = withConn(url) { conn =>
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE t_orders (okey BIGINT NOT NULL PRIMARY KEY, " +
        "price DOUBLE NOT NULL, status VARCHAR(8) NOT NULL)")
    val ps = conn.prepareStatement("INSERT INTO t_orders VALUES (?, ?, ?)")
    (1 to n).foreach { i =>
      ps.setLong(1, i.toLong)
      ps.setDouble(2, i * 1.25)
      ps.setString(3, if (i % 3 == 0) "P" else "O")
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); ps.close()
  }

  test("JdbcSource snapshots a Derby table; values and schema round-trip") {
    val url = freshUrl()
    seedOrders(url, 100)
    val df = new JdbcSource(url, "", "").snapshot(spark, "t_orders")
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ==
      Seq("okey", "price", "status"))
    assert(df.count() == 100)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val expect = (1 to 100)
      .map(i => (i.toLong, i * 1.25, if (i % 3 == 0) "P" else "O")).toSet
    assert(got == expect)
  }

  test("PK-chunked snapshot parallelizes the read and loses nothing") {
    val url = freshUrl()
    seedOrders(url, 200)
    val src = new JdbcSource(url, "", "", numPartitions = 8)
    val df = src.snapshotPartitioned(spark, "t_orders", "okey", 1L, 200L)
    // the scale path's point: N concurrent connections, each reading one
    // PK range — not one connection funneling the whole table
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 200)
    // chunk boundaries must partition, not drop or duplicate: the row set
    // equals the unchunked snapshot's exactly
    val plain = src.snapshot(spark, "t_orders")
    assert(df.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
  }

  test("JdbcBatchSink appends; a replayed epoch DUPLICATES (the documented contract)") {
    val url = freshUrl()
    withConn(url) { conn =>
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE t_dest (okey BIGINT NOT NULL, " +
        "price DOUBLE NOT NULL, status VARCHAR(8) NOT NULL)")
      st.close()
    }
    val batch = spark.createDataFrame(
      (1 to 50).map(i => (i.toLong, i * 2.5, "O"))).toDF("okey", "price", "status")
    val sink = new JdbcBatchSink(url, "t_dest", "", "")
    sink.write(batch, epochId = 0L)
    def destCount(): Long = withConn(url) { conn =>
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM t_dest")
      rs.next(); rs.getLong(1)
    }
    assert(destCount() == 50L)
    // at-least-once replay of the SAME epoch: append-mode JDBC has no
    // epoch key, so the rows duplicate — exactly the caveat the scaladoc
    // documents (idempotence is the destination DB's job: a
    // ReplacingMergeTree keyed on (pk, version) collapses the replay at
    // merge time). This spec pins the contract so a future "fix" that
    // silently changes the write mode shows up as a test failure.
    sink.write(batch, epochId = 0L)
    assert(destCount() == 100L)
    // ...while the harness's epoch-keyed parquet sink IS replay-idempotent:
    // the same replay overwrites, not duplicates
    val pdir = java.nio.file.Files.createTempDirectory("graft_psink").toString
    val psink = new EpochParquetSink(pdir)
    psink.write(batch, epochId = 0L)
    psink.write(batch, epochId = 0L)
    assert(spark.read.parquet(s"$pdir/epoch=0").count() == 50L)
  }

  test("fullSync drives a JdbcSource end-to-end into parquet") {
    val url = freshUrl()
    seedOrders(url, 60)
    val dest = java.nio.file.Files.createTempDirectory("graft_jfull").toString
    val counts = Replication.fullSync(spark, new JdbcSource(url, "", ""),
      Seq("t_orders"), dest)
    assert(counts == Map("t_orders" -> 60L))
    assert(spark.read.parquet(s"$dest/t_orders").count() == 60L)
  }
}
