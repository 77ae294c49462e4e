package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DdlSql
import graft.streaming.DdlSql._
import graft.streaming.StreamingOps.ColumnDefault

/** The QueryEvent SQL-text parser: raw MySQL DDL statements onto the
  * engine's structured verbs (see DdlSql's dialect notes). Pure
  * driver-side parsing — no Spark session needed. */
class DdlSqlSpec extends AnyFunSuite {

  test("each supported verb parses to its structured statement") {
    assert(DdlSql.parse(
      "ALTER TABLE orders ADD COLUMN note VARCHAR(32) DEFAULT 'none'") ==
      Seq(AddColumn("orders", "note", "VARCHAR(32)", Some("'none'"))))
    assert(DdlSql.parse("ALTER TABLE orders ADD flag TINYINT(1)") ==
      Seq(AddColumn("orders", "flag", "TINYINT(1)", None)))
    assert(DdlSql.parse("ALTER TABLE orders DROP COLUMN extra") ==
      Seq(DropColumn("orders", "extra")))
    assert(DdlSql.parse("ALTER TABLE orders RENAME COLUMN channel TO chan") ==
      Seq(RenameColumn("orders", "channel", "chan")))
    assert(DdlSql.parse("ALTER TABLE orders MODIFY qty BIGINT") ==
      Seq(ModifyColumn("orders", "qty", "BIGINT")))
    // CHANGE with a new name is a rename; same name is a pure MODIFY
    assert(DdlSql.parse("ALTER TABLE orders CHANGE qty qty_big BIGINT") ==
      Seq(RenameColumn("orders", "qty", "qty_big")))
    assert(DdlSql.parse("ALTER TABLE orders CHANGE COLUMN qty qty BIGINT") ==
      Seq(ModifyColumn("orders", "qty", "BIGINT")))
    assert(DdlSql.parse("TRUNCATE TABLE orders") ==
      Seq(TruncateTable("orders")))
    assert(DdlSql.parse("TRUNCATE orders") == Seq(TruncateTable("orders")))
    assert(DdlSql.parse("RENAME TABLE orders TO _orders_del, " +
      "_orders_gho TO orders") ==
      Seq(RenameTable(Seq("orders" -> "_orders_del",
        "_orders_gho" -> "orders"))))
    assert(DdlSql.parse("ALTER TABLE orders RENAME TO orders_v2") ==
      Seq(RenameTable(Seq("orders" -> "orders_v2"))))
  }

  test("MySQL surface noise parses: backticks, db qualifiers, case, " +
      "semicolons, NOT NULL / position clauses, index verbs inert") {
    assert(DdlSql.parse(
      "alter table `shop`.`orders` add column `note` varchar(32) " +
        "not null default 'n/a' after `status`;") ==
      Seq(AddColumn("orders", "note", "VARCHAR(32)", Some("'n/a'"))))
    // doubled-quote escape inside the literal, comma inside the literal
    assert(DdlSql.parse(
      "ALTER TABLE t ADD c VARCHAR(9) DEFAULT 'it''s, ok'") ==
      Seq(AddColumn("t", "c", "VARCHAR(9)", Some("'it''s, ok'"))))
    // numeric defaults, including decimals (the qualifier-dot trap)
    assert(DdlSql.parse("ALTER TABLE t ADD c DECIMAL(10,2) DEFAULT 1.5") ==
      Seq(AddColumn("t", "c", "DECIMAL(10,2)", Some("1.5"))))
    assert(DdlSql.parse("ALTER TABLE t ADD c INT DEFAULT -5") ==
      Seq(AddColumn("t", "c", "INT", Some("-5"))))
    // multi-clause ALTER splits on top-level commas only
    assert(DdlSql.parse("ALTER TABLE t ADD a INT DEFAULT 1, " +
      "DROP COLUMN b, ADD INDEX idx_a (a, b(10))") ==
      Seq(AddColumn("t", "a", "INT", Some("1")), DropColumn("t", "b"),
        Inert("t", "ADD INDEX")))
    // index verbs are recognized-and-inert, not refused
    assert(DdlSql.parse("ALTER TABLE t DROP INDEX idx_a") ==
      Seq(Inert("t", "DROP INDEX")))
    assert(DdlSql.parse(
      "ALTER TABLE t ADD UNIQUE KEY uq_c (c)") ==
      Seq(Inert("t", "ADD INDEX")))
    // a backticked column that SPELLS index is a column, not a verb
    assert(DdlSql.parse("ALTER TABLE t DROP `index`") ==
      Seq(DropColumn("t", "index")))
    // type attributes ride with the type
    assert(DdlSql.parse("ALTER TABLE t MODIFY c BIGINT UNSIGNED") ==
      Seq(ModifyColumn("t", "c", "BIGINT UNSIGNED")))
    // MySQL's parenthesized multi-add yields one AddColumn per spec
    assert(DdlSql.parse(
      "ALTER TABLE t ADD COLUMN (a INT, b VARCHAR(8) DEFAULT 'x')") ==
      Seq(AddColumn("t", "a", "INT", None),
        AddColumn("t", "b", "VARCHAR(8)", Some("'x'"))))
    // a backticked column spelling INDEX is a column in ADD too
    assert(DdlSql.parse("ALTER TABLE t ADD `index` INT") ==
      Seq(AddColumn("t", "index", "INT", None)))
    intercept[IllegalArgumentException] {
      DdlSql.parse("ALTER TABLE t ADD COLUMN (a INT, b INT")
    }
    // the tails every migration tool ships are inert hints, not refusals
    assert(DdlSql.parse("ALTER TABLE t ADD c INT, ALGORITHM=INPLACE, " +
      "LOCK=NONE") ==
      Seq(AddColumn("t", "c", "INT", None), Inert("t", "TABLE OPTION"),
        Inert("t", "TABLE OPTION")))
    assert(DdlSql.parse("ALTER TABLE t ALGORITHM = COPY, ENGINE=InnoDB") ==
      Seq(Inert("t", "TABLE OPTION"), Inert("t", "TABLE OPTION")))
    assert(DdlSql.parse(
      "ALTER TABLE t DEFAULT CHARACTER SET utf8mb4 COLLATE " +
        "utf8mb4_general_ci") == Seq(Inert("t", "TABLE OPTION")))
    assert(DdlSql.parse("ALTER TABLE t RENAME INDEX i1 TO i2") ==
      Seq(Inert("t", "RENAME INDEX")))
    // CONVERT TO CHARACTER SET rewrites data — still refuses
    intercept[IllegalArgumentException] {
      DdlSql.parse("ALTER TABLE t CONVERT TO CHARACTER SET utf8mb4")
    }
  }

  test("unparseable and unsupported statements refuse loudly by name") {
    def refuses(sql: String, naming: String): Unit = {
      val e = intercept[IllegalArgumentException] { DdlSql.parse(sql) }
      assert(e.getMessage.contains(naming),
        s"for <$sql>: ${e.getMessage}")
    }
    // statements entirely outside any recognizable shape
    refuses("INSERT INTO t VALUES (1)", "unsupported statement verb")
    refuses("KILL 42", "unsupported statement verb")
    // ALTER clauses the engine has no safe semantics for
    refuses("ALTER TABLE t ADD PRIMARY KEY (id)", "unsupported")
    refuses("ALTER TABLE t DROP PRIMARY KEY", "unsupported")
    refuses("ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (a) " +
      "REFERENCES u (b)", "unsupported")
    // a constraint word TRAILING a column type must refuse, never be
    // absorbed as a type attribute (a key change alters replication
    // identity — the silent-swallow class)
    refuses("ALTER TABLE t ADD c BIGINT PRIMARY KEY",
      "unsupported column constraint 'PRIMARY'")
    refuses("ALTER TABLE t ADD c BIGINT KEY",
      "unsupported column constraint 'KEY'")
    refuses("ALTER TABLE t MODIFY id BIGINT UNIQUE",
      "unsupported column constraint 'UNIQUE'")
    refuses("ALTER TABLE t PARTITION BY HASH(id)", "unsupported")
    refuses("ALTER TABLE t ALTER COLUMN c SET DEFAULT 5", "unsupported")
    // expression defaults are not frozen literals — refuse
    refuses("ALTER TABLE t ADD c TIMESTAMP DEFAULT CURRENT_TIMESTAMP",
      "unsupported DEFAULT")
    // garbage shapes
    refuses("ALTER TABLE t ADD COLUMN 'oops' INT", "expected column name")
    refuses("ALTER TABLE t RENAME COLUMN a b", "expected TO")
    refuses("ALTER TABLE t ADD c VARCHAR(32", "unterminated type")
    refuses("ALTER TABLE t ADD c VARCHAR(3) DEFAULT 'x", "unterminated")
    refuses("TRUNCATE TABLE a b", "trailing tokens")
    // every refusal carries the statement text for the operator's log
    val e = intercept[IllegalArgumentException] {
      DdlSql.parse("ALTER TABLE t FROB x")
    }
    assert(e.getMessage.contains("ALTER TABLE t FROB x"))
  }

  test("table-level verbs parse for SCOPING and LIFECYCLE: CREATE/DROP " +
      "TABLE are structured statements, a neighbor's is skipped noise") {
    // a real binlog interleaves the whole topology's DDL — CREATE TABLE
    // audit_log must not kill the orders sync; the lifecycle pair now
    // parses structurally so the topology layer can map it
    assert(DdlSql.parse("CREATE TABLE audit_log (id BIGINT, msg TEXT)") ==
      Seq(CreateTable("audit_log",
        Seq("id" -> "BIGINT", "msg" -> "TEXT"), Seq.empty)))
    assert(DdlSql.parse("DROP TABLE IF EXISTS a, b") ==
      Seq(DropTable("a"), DropTable("b")))
    // statement-form index DDL is the inert class, like the ALTER clause
    assert(DdlSql.parse("CREATE UNIQUE INDEX idx ON orders (okey)") ==
      Seq(Inert("orders", "CREATE INDEX")))
    assert(DdlSql.parse("DROP INDEX idx ON orders") ==
      Seq(Inert("orders", "DROP INDEX")))
    // scoped fold: the neighbor's CREATE skips, the real DDL lands
    val scoped = DdlSql.fold(Seq(
      1L -> "CREATE TABLE audit_log (id BIGINT)",
      2L -> "ALTER TABLE orders DROP COLUMN extra"),
      tableFilter = Some("orders"))
    assert(scoped.dropCols == Map("extra" -> 2L))
    assert(scoped.createTables.isEmpty && scoped.dropTables.isEmpty)
    // in scope (or unscoped), the lifecycle verbs RECORD for the
    // topology layer instead of refusing (round-17: the applier is
    // Replication.applyTableLifecycle; a column-level pass still
    // refuses a config carrying them — see ReplicationSpec)
    val lc = DdlSql.fold(Seq(
      1L -> ("CREATE TABLE t_new (id BIGINT NOT NULL, v DOUBLE, " +
        "PRIMARY KEY (id))"),
      2L -> "DROP TABLE orders"))
    assert(lc.createTables == Seq(1L -> CreateTable("t_new",
      Seq("id" -> "BIGINT", "v" -> "DOUBLE"), Seq("id"))))
    assert(lc.dropTables == Seq(2L -> "orders"))
    // maintenance verbs are inert even in scope: they change neither
    // schema nor data (the ALTER-form ENGINE rebuild rule)
    assert(DdlSql.parse("OPTIMIZE TABLE orders") ==
      Seq(Inert("orders", "OPTIMIZE TABLE")))
    assert(DdlSql.fold(Seq(1L -> "ANALYZE TABLE orders"),
      tableFilter = Some("orders")) == DdlSql.DdlConfig())
    // non-table objects and privilege statements: named (or '<none>')
    // so a scoped fold skips them; unscoped they refuse
    assert(DdlSql.parse("CREATE OR REPLACE VIEW daily AS SELECT 1") ==
      Seq(Unsupported("daily", "CREATE VIEW")))
    assert(DdlSql.parse("DROP TRIGGER IF EXISTS trg") ==
      Seq(Unsupported("trg", "DROP TRIGGER")))
    assert(DdlSql.parse("ALTER VIEW v AS SELECT 2") ==
      Seq(Unsupported("v", "ALTER VIEW")))
    assert(DdlSql.parse("GRANT ALL ON db.* TO 'u'@'%'") ==
      Seq(Unsupported("<none>", "GRANT")))
    val noisy = DdlSql.fold(Seq(
      1L -> "CREATE OR REPLACE VIEW daily AS SELECT 1",
      2L -> "GRANT SELECT ON db.* TO 'u'@'%'",
      3L -> "ALTER DATABASE reports CHARACTER SET utf8mb4",
      4L -> "ALTER TABLE orders DROP COLUMN extra"),
      tableFilter = Some("orders"))
    assert(noisy.dropCols == Map("extra" -> 4L))
    intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(1L -> "GRANT SELECT ON db.* TO 'u'@'%'"))
    }
    // RENAME TABLE scoping is per PAIR: a neighbor's cutover skips, a
    // rename touching the scoped table (either side) is kept
    val cutovers = DdlSql.fold(Seq(
      1L -> "RENAME TABLE users TO _users_del, _users_gho TO users",
      2L -> "RENAME TABLE orders TO _orders_del, _orders_gho TO orders"),
      tableFilter = Some("orders"))
    assert(cutovers.tableRenames ==
      Seq("orders" -> "_orders_del", "_orders_gho" -> "orders"))
  }

  test("fold composes a DDL gap into one pass's structured config") {
    val cfg = DdlSql.fold(Seq(
      1L -> "ALTER TABLE orders RENAME COLUMN channel TO chan",
      2L -> "ALTER TABLE orders ADD COLUMN note VARCHAR(32) DEFAULT 'none'",
      3L -> "ALTER TABLE orders DROP COLUMN extra",
      4L -> "TRUNCATE TABLE orders",
      5L -> "TRUNCATE TABLE orders"))
    assert(cfg.renameCols == Map("channel" -> "chan"))
    assert(cfg.defaultCols == Map("note" -> ColumnDefault(2L, "'none'")))
    assert(cfg.dropCols == Map("extra" -> 3L))
    assert(cfg.truncateAtSeq.contains(5L)) // newest truncate wins
    // rename chains collapse to origin→final
    val chain = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t RENAME COLUMN a TO b",
      2L -> "ALTER TABLE t RENAME COLUMN b TO c"))
    assert(chain.renameCols == Map("a" -> "c"))
    // a column born and dropped inside the gap never existed
    val born = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t ADD c INT DEFAULT 7",
      2L -> "ALTER TABLE t DROP COLUMN c"))
    assert(born.defaultCols.isEmpty && born.dropCols.isEmpty)
    // a gap-born column renamed: its default follows the new name and
    // no state-side rename is recorded (the state never saw the old one)
    val reborn = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t ADD c INT DEFAULT 7",
      2L -> "ALTER TABLE t RENAME COLUMN c TO d"))
    assert(reborn.renameCols.isEmpty)
    assert(reborn.defaultCols == Map("d" -> ColumnDefault(1L, "7")))
    // table scoping: other tables' column DDL is skipped; RENAME TABLE
    // pairs keep only the sides touching the scoped table (a fully
    // foreign rename is a neighbor's cutover — routine noise)
    val scoped = DdlSql.fold(Seq(
      1L -> "ALTER TABLE other ADD c INT DEFAULT 1",
      2L -> "ALTER TABLE orders DROP COLUMN extra",
      3L -> "RENAME TABLE x TO y",
      4L -> "RENAME TABLE orders TO o2"), tableFilter = Some("orders"))
    assert(scoped.defaultCols.isEmpty)
    assert(scoped.dropCols == Map("extra" -> 2L))
    assert(scoped.tableRenames == Seq("orders" -> "o2"))
    // events arriving out of order fold in position order
    val unordered = DdlSql.fold(Seq(
      2L -> "ALTER TABLE t RENAME COLUMN b TO c",
      1L -> "ALTER TABLE t RENAME COLUMN a TO b"))
    assert(unordered.renameCols == Map("a" -> "c"))
  }

  test("fold refuses drop/rename NAME REUSE it cannot order — and the " +
      "compositions that DO work keep working") {
    def refuses(events: Seq[(Long, String)], naming: String): Unit = {
      val e = intercept[IllegalArgumentException] { DdlSql.fold(events) }
      assert(e.getMessage.contains(naming), s"got: ${e.getMessage}")
    }
    // DROP a; RENAME b TO a — renames apply before drops, so one
    // config would gate b's carried history under a's drop seq
    refuses(Seq(
      1L -> "ALTER TABLE t DROP COLUMN a",
      2L -> "ALTER TABLE t RENAME COLUMN b TO a"),
      "renames 'b' onto the freed name")
    // RENAME a TO b; DROP a — a no longer exists at the drop's turn
    refuses(Seq(
      1L -> "ALTER TABLE t RENAME COLUMN a TO b",
      2L -> "ALTER TABLE t DROP COLUMN a"),
      "drops 'a'")
    // RENAME a TO b; DROP b — kills the migrated history one config
    // would order wrongly
    refuses(Seq(
      1L -> "ALTER TABLE t RENAME COLUMN a TO b",
      2L -> "ALTER TABLE t DROP COLUMN b"),
      "drops 'b'")
    // DROP a; RENAME a TO b — the dropped column cannot rename
    refuses(Seq(
      1L -> "ALTER TABLE t DROP COLUMN a",
      2L -> "ALTER TABLE t RENAME COLUMN a TO b"),
      "no longer exists")
    // every refusal names the gap sequence (both seqs appear)
    val e = intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(
        3L -> "ALTER TABLE t DROP COLUMN a",
        7L -> "ALTER TABLE t RENAME COLUMN b TO a"))
    }
    assert(e.getMessage.contains("seq 3") && e.getMessage.contains("seq 7"))
    // DROP a; ADD a … DEFAULT composes: old values die at the drop
    // seq, the reborn column backfills its default
    val reborn = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t DROP COLUMN a",
      2L -> "ALTER TABLE t ADD COLUMN a INT DEFAULT 9"))
    assert(reborn.dropCols == Map("a" -> 1L))
    assert(reborn.defaultCols == Map("a" -> ColumnDefault(2L, "9")))
  }

  test("foldTopology: column verbs fold envelope-wide over the " +
      "replicated set, TRUNCATE folds per table, foreign noise skips") {
    val (cfg, truncates) = DdlSql.foldTopology(Seq(
      1L -> "ALTER TABLE t_even RENAME COLUMN channel TO chan",
      2L -> "TRUNCATE TABLE t_odd",
      3L -> "TRUNCATE TABLE t_odd",
      4L -> "TRUNCATE TABLE t_even",
      5L -> "ALTER TABLE t_odd ADD COLUMN note VARCHAR(8) DEFAULT 'n'",
      // a neighbor's DDL — not replicated here, routine noise
      6L -> "ALTER TABLE audit_log DROP COLUMN x",
      7L -> "CREATE TABLE audit_log2 (a INT)",
      8L -> "GRANT SELECT ON db.* TO 'u'@'%'",
      // a cutover pair touching a replicated table is kept
      9L -> "RENAME TABLE users TO _users_del",
      10L -> "RENAME TABLE t_even TO _t_even_del"),
      tables = Set("t_even", "t_odd"))
    // one shared envelope: the rename declared on t_even and the
    // add-default declared on t_odd BOTH fold envelope-wide
    assert(cfg.renameCols == Map("channel" -> "chan"))
    assert(cfg.defaultCols == Map("note" -> ColumnDefault(5L, "'n'")))
    // truncate is the per-table verb: newest position per table, and
    // the single-table slot stays empty
    assert(truncates == Map("t_odd" -> 3L, "t_even" -> 4L))
    assert(cfg.truncateAtSeq.isEmpty)
    assert(cfg.tableRenames == Seq("t_even" -> "_t_even_del"))
    // lifecycle of an UNREPLICATED table is noise to this fold
    assert(cfg.createTables.isEmpty && cfg.dropTables.isEmpty)
    // in-scope lifecycle records, as in the single-table fold
    val (lc, _) = DdlSql.foldTopology(Seq(
      1L -> "DROP TABLE t_odd"), tables = Set("t_even", "t_odd"))
    assert(lc.dropTables == Seq(1L -> "t_odd"))
  }

  test("per-table duplicates of one shared-envelope migration fold " +
      "idempotently; conflicting re-declarations refuse") {
    // a topology migrating a SHARED column emits one identical ALTER
    // per table — the fold must treat them as one declaration
    val (cfg, _) = DdlSql.foldTopology(Seq(
      1L -> "ALTER TABLE t_even ADD COLUMN note VARCHAR(8) DEFAULT 'n'",
      2L -> "ALTER TABLE t_odd ADD COLUMN note VARCHAR(8) DEFAULT 'n'",
      3L -> "ALTER TABLE t_even RENAME COLUMN channel TO chan",
      4L -> "ALTER TABLE t_odd RENAME COLUMN channel TO chan"),
      tables = Set("t_even", "t_odd"))
    assert(cfg.defaultCols == Map("note" -> ColumnDefault(1L, "'n'")))
    assert(cfg.renameCols == Map("channel" -> "chan"))
    // a CONFLICTING re-declaration is a different migration — refuse
    val e = intercept[IllegalArgumentException] {
      DdlSql.foldTopology(Seq(
        1L -> "ALTER TABLE t_even ADD COLUMN note VARCHAR(8) DEFAULT 'n'",
        2L -> "ALTER TABLE t_odd ADD COLUMN note INT DEFAULT 0"),
        tables = Set("t_even", "t_odd"))
    }
    assert(e.getMessage.contains("conflicting"))
  }

  test("a MODIFY followed by DROP of the same column cancels the " +
      "narrowing declaration — the column dies at the drop seq") {
    val cfg = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t MODIFY qty INT",
      2L -> "ALTER TABLE t DROP COLUMN qty"))
    assert(cfg.modifyCols.isEmpty)
    assert(cfg.dropCols == Map("qty" -> 2L))
    // without the drop, the declaration stays recorded for the gate
    assert(DdlSql.fold(Seq(1L -> "ALTER TABLE t MODIFY qty INT"))
      .modifyCols == Map("qty" -> (1L, "INT")))
  }

  test("a column renamed away cannot rename again in the same gap") {
    val e = intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(
        1L -> "ALTER TABLE t RENAME COLUMN a TO b",
        2L -> "ALTER TABLE t RENAME COLUMN a TO c"))
    }
    assert(e.getMessage.contains("renames it again"))
    // the legitimate chain still folds (a→b then b→c ⇒ a→c)
    assert(DdlSql.fold(Seq(
      1L -> "ALTER TABLE t RENAME COLUMN a TO b",
      2L -> "ALTER TABLE t RENAME COLUMN b TO c")).renameCols ==
      Map("a" -> "c"))
  }

  test("statement-format row changes (binlog_format=STATEMENT dumps) " +
      "refuse by verb — never silently skip") {
    // a STATEMENT-format dump ships plain DML as QueryEvents; the
    // engine replicates ROW images, so each verb must refuse loudly
    // naming itself (the refusal IS the contract: an operator pointed
    // at a statement-format feed learns immediately, instead of a
    // silently empty replica)
    for (dml <- Seq(
        "INSERT INTO orders (okey, price) VALUES (1, 2.5)",
        "UPDATE orders SET price = 3.5 WHERE okey = 1",
        "DELETE FROM orders WHERE okey = 1")) {
      val verb = dml.takeWhile(!_.isWhitespace)
      val e = intercept[IllegalArgumentException] { DdlSql.parse(dml) }
      assert(e.getMessage.contains("unsupported statement verb") &&
        e.getMessage.contains(verb),
        s"for <$dml>: ${e.getMessage}")
      // and through fold, even scoped — DML is never topology noise
      // (it carries no parsable table subject, so scoping cannot and
      // must not skip it)
      val ef = intercept[IllegalArgumentException] {
        DdlSql.fold(Seq(1L -> dml), tableFilter = Some("orders"))
      }
      assert(ef.getMessage.contains(verb))
    }
  }

  test("CREATE TABLE bodies parse: inline/constraint PRIMARY KEY, " +
      "index clauses inert, exotic forms degrade to Unsupported") {
    // table-constraint PK, composite
    assert(DdlSql.parse("CREATE TABLE t (a BIGINT NOT NULL, " +
      "b INT, c VARCHAR(10) DEFAULT 'x', PRIMARY KEY (a, b))") ==
      Seq(CreateTable("t", Seq("a" -> "BIGINT", "b" -> "INT",
        "c" -> "VARCHAR(10)"), Seq("a", "b"))))
    // inline PK + attribute soup a real dump ships
    assert(DdlSql.parse("CREATE TABLE IF NOT EXISTS `db`.`t` (" +
      "`id` BIGINT UNSIGNED NOT NULL AUTO_INCREMENT PRIMARY KEY, " +
      "`ts` TIMESTAMP(6) DEFAULT CURRENT_TIMESTAMP(6) ON UPDATE " +
      "CURRENT_TIMESTAMP(6), `note` TEXT COMMENT 'freeform', " +
      "KEY idx_note (note(10)), CONSTRAINT ck CHECK (id > 0)) " +
      "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4") ==
      Seq(CreateTable("t", Seq("id" -> "BIGINT UNSIGNED",
        "ts" -> "TIMESTAMP(6)", "note" -> "TEXT"), Seq("id"))))
    // the bare column-spec KEY shorthand is a PK declaration in CREATE
    assert(DdlSql.parse("CREATE TABLE t (id INT KEY, v DOUBLE)") ==
      Seq(CreateTable("t", Seq("id" -> "INT", "v" -> "DOUBLE"),
        Seq("id"))))
    // TEMPORARY tables are session-local — inert, never lifecycle
    assert(DdlSql.parse("CREATE TEMPORARY TABLE tmp1 (a INT)") ==
      Seq(Inert("tmp1", "CREATE TEMPORARY TABLE")))
    assert(DdlSql.parse("DROP TEMPORARY TABLE IF EXISTS tmp1") ==
      Seq(Inert("tmp1", "DROP TEMPORARY TABLE")))
    // bodies outside the dialect degrade to Unsupported: scoped folds
    // skip them as neighbor noise, in-scope ones refuse at fold
    assert(DdlSql.parse("CREATE TABLE t2 LIKE t") ==
      Seq(Unsupported("t2", "CREATE TABLE")))
    assert(DdlSql.parse("CREATE TABLE t3 AS SELECT * FROM t") ==
      Seq(Unsupported("t3", "CREATE TABLE")))
    intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(1L -> "CREATE TABLE t2 LIKE t"),
        tableFilter = Some("t2"))
    }
    // duplicate PK declarations refuse (degraded to Unsupported at
    // parse, refused in scope)
    assert(DdlSql.parse(
      "CREATE TABLE t (a INT PRIMARY KEY, PRIMARY KEY (a))") ==
      Seq(Unsupported("t", "CREATE TABLE")))
    // DROP list tails parse; trailing garbage refuses
    assert(DdlSql.parse("DROP TABLE a, b CASCADE") ==
      Seq(DropTable("a"), DropTable("b")))
    intercept[IllegalArgumentException] {
      DdlSql.parse("DROP TABLE a b")
    }
  }

  test("the MySQL→engine type map covers the replicated surface and " +
      "refuses what it cannot name") {
    import org.apache.spark.sql.types._
    assert(DdlSql.sparkType("BIGINT") == LongType)
    assert(DdlSql.sparkType("BIGINT UNSIGNED") == DecimalType(20, 0))
    assert(DdlSql.sparkType("INT") == IntegerType)
    assert(DdlSql.sparkType("INT UNSIGNED") == LongType)
    assert(DdlSql.sparkType("SMALLINT") == ShortType)
    assert(DdlSql.sparkType("TINYINT(1)") == ByteType)
    assert(DdlSql.sparkType("TINYINT UNSIGNED") == ShortType)
    assert(DdlSql.sparkType("DECIMAL(12,2)") == DecimalType(12, 2))
    assert(DdlSql.sparkType("NUMERIC") == DecimalType(10, 0))
    assert(DdlSql.sparkType("DOUBLE") == DoubleType)
    assert(DdlSql.sparkType("FLOAT") == FloatType)
    assert(DdlSql.sparkType("VARCHAR(32)") == StringType)
    assert(DdlSql.sparkType("ENUM('a','b')") == StringType)
    assert(DdlSql.sparkType("JSON") == StringType)
    assert(DdlSql.sparkType("LONGBLOB") == BinaryType)
    assert(DdlSql.sparkType("DATE") == DateType)
    assert(DdlSql.sparkType("DATETIME(6)") == TimestampNTZType)
    assert(DdlSql.sparkType("TIMESTAMP") == TimestampNTZType)
    assert(DdlSql.sparkType("YEAR") == ShortType)
    assert(DdlSql.sparkType("BIT(8)") == LongType)
    val e = intercept[IllegalArgumentException] {
      DdlSql.sparkType("GEOMETRY")
    }
    assert(e.getMessage.contains("GEOMETRY"))
  }

  test("fold: sibling-table ALTER idempotency survives a rename CHAIN — " +
      "a re-declared step after collapse is a no-op, not a phantom") {
    // two tables migrate the SAME shared envelope column through a
    // two-step rename, statements interleaved (each table emits each
    // ALTER): once t1's a->b, b->c collapse to a->c, t2's re-declared
    // 'b TO c' no longer maps to anything in renameCols — idempotency
    // must key off the APPLIED STEPS, or the fold records a phantom
    // fresh rename b->c alongside a->c
    val cfg = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t1 RENAME COLUMN a TO b",
      2L -> "ALTER TABLE t2 RENAME COLUMN a TO b",
      3L -> "ALTER TABLE t1 RENAME COLUMN b TO c",
      4L -> "ALTER TABLE t2 RENAME COLUMN b TO c"))
    assert(cfg.renameCols == Map("a" -> "c"),
      s"phantom rename recorded: ${cfg.renameCols}")
    // the gap-born flavor: ADD + RENAME, both duplicated by a sibling —
    // the rename re-keys `added`, so the sibling's replay must match
    // the applied step, not the (empty) renameCols map
    val cfg2 = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t1 ADD COLUMN x INT DEFAULT 5",
      2L -> "ALTER TABLE t2 ADD COLUMN x INT DEFAULT 5",
      3L -> "ALTER TABLE t1 RENAME COLUMN x TO y",
      4L -> "ALTER TABLE t2 RENAME COLUMN x TO y"))
    assert(cfg2.renameCols.isEmpty,
      s"gap-born rename leaked a published-column rename: ${cfg2.renameCols}")
    assert(cfg2.defaultCols.keySet == Set("y"))
    // GROUPED arrival — all of t1's ALTERs, then all of t2's (the
    // normal per-table migration order): t2's re-ADD of x lands after
    // t1's rename already re-keyed it away, so replay detection must
    // key on (verb, table), or the fold records a phantom default for
    // the dead name 'x' alongside y's
    val cfg3 = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t1 ADD COLUMN x INT DEFAULT 5",
      2L -> "ALTER TABLE t1 RENAME COLUMN x TO y",
      3L -> "ALTER TABLE t2 ADD COLUMN x INT DEFAULT 5",
      4L -> "ALTER TABLE t2 RENAME COLUMN x TO y"))
    assert(cfg3.defaultCols.keySet == Set("y"),
      s"grouped sibling replay left a phantom: ${cfg3.defaultCols}")
    assert(cfg3.renameCols.isEmpty)
    // genuine SAME-TABLE name reuse still applies (never a replay):
    // DROP a; ADD a … composes — old values die, the reborn column
    // backfills — even when the spec text repeats an earlier ADD's
    val cfg4 = DdlSql.fold(Seq(
      1L -> "ALTER TABLE t1 ADD COLUMN a INT DEFAULT 7",
      2L -> "ALTER TABLE t1 DROP COLUMN a",
      3L -> "ALTER TABLE t1 ADD COLUMN a INT DEFAULT 7"))
    assert(cfg4.defaultCols.keySet == Set("a"))
    assert(cfg4.defaultCols("a").atSeq == 3L,
      s"the reborn ADD must re-apply, not replay-skip: ${cfg4.defaultCols}")
  }

  test("type map closes over both paths: a CREATE TABLE covering the " +
      "S19-S22 type surface bootstraps byte-identical destination DDL " +
      "to the hand-declared envelope schema") {
    import org.apache.spark.sql.types._
    import graft.sources.DestinationDdl
    // the exercised type-surface policy, spelled as MySQL DDL — every
    // family the S19-S22 fixtures ride (numeric/unsigned/enum/JSON,
    // temporal, exotic YEAR/BIT/TIME, text/binary)
    val sql =
      """CREATE TABLE typed (
           okey BIGINT NOT NULL PRIMARY KEY,
           price DOUBLE,
           status CHAR(1),
           amount DECIMAL(12,2),
           big_id BIGINT UNSIGNED,
           tier ENUM('gold','silver','bronze'),
           attrs JSON,
           d DATE,
           dt DATETIME(6),
           created TIMESTAMP,
           t_sec TIME,
           yr YEAR,
           bits BIT(20),
           payload LONGBLOB,
           ratio FLOAT,
           tiny TINYINT,
           utiny TINYINT UNSIGNED,
           small SMALLINT,
           usmall SMALLINT UNSIGNED,
           med MEDIUMINT,
           qty INT,
           uqty INT UNSIGNED,
           note VARCHAR(32),
           body TEXT)"""
    val Seq(ct: CreateTable) = DdlSql.parse(sql)
    val parsed = StructType(ct.columns.map { case (n, tp) =>
      StructField(n, DdlSql.sparkType(tp),
        nullable = !ct.keyCols.exists(_.equalsIgnoreCase(n)))
    })
    // the ENVELOPE path: the same columns as the S19-S22 fixtures and
    // the MySqlTypes policy docs declare them, by hand
    val envelope = StructType(Seq(
      StructField("okey", LongType, nullable = false),
      StructField("price", DoubleType),
      StructField("status", StringType),
      StructField("amount", DecimalType(12, 2)),
      StructField("big_id", DecimalType(20, 0)), // 2^64-1 overflows Int64
      StructField("tier", StringType), // ENUM rides as string
      StructField("attrs", StringType), // JSON rides as string
      StructField("d", DateType),
      StructField("dt", TimestampNTZType), // DATETIME is a wall clock
      StructField("created", TimestampNTZType), // sessions pin UTC
      StructField("t_sec", IntegerType), // TIME = seconds-of-day
      StructField("yr", ShortType), // YEAR = Int16, 1901..2155
      StructField("bits", LongType), // BIT(n<=64) = its integer value
      StructField("payload", BinaryType),
      StructField("ratio", FloatType),
      StructField("tiny", ByteType),
      StructField("utiny", ShortType),
      StructField("small", ShortType),
      StructField("usmall", IntegerType),
      StructField("med", IntegerType),
      StructField("qty", IntegerType),
      StructField("uqty", LongType),
      StructField("note", StringType),
      StructField("body", StringType)))
    val fromParse = DestinationDdl.createTable("typed", parsed, ct.keyCols)
    val fromEnvelope = DestinationDdl.createTable("typed", envelope,
      Seq("okey"))
    assert(fromParse == fromEnvelope,
      s"the two paths diverged:\n parse:    $fromParse\n envelope: $fromEnvelope")
  }
}
