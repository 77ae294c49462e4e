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

  test("table-level verbs outside the dialect parse for SCOPING: an " +
      "in-scope one refuses at fold, a neighbor's is skipped noise") {
    // a real binlog interleaves the whole topology's DDL — CREATE TABLE
    // audit_log must not kill the orders sync, but CREATE/DROP of the
    // REPLICATED table itself has no safe mapping
    assert(DdlSql.parse("CREATE TABLE audit_log (id BIGINT, msg TEXT)") ==
      Seq(Unsupported("audit_log", "CREATE TABLE")))
    assert(DdlSql.parse("DROP TABLE IF EXISTS a, b") ==
      Seq(Unsupported("a", "DROP TABLE"), Unsupported("b", "DROP TABLE")))
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
    // in scope (or unscoped), the verb refuses loudly by name
    val e1 = intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(1L -> "DROP TABLE orders"),
        tableFilter = Some("orders"))
    }
    assert(e1.getMessage.contains("'DROP TABLE' for replicated table " +
      "'orders'"))
    val e2 = intercept[IllegalArgumentException] {
      DdlSql.fold(Seq(1L -> "CREATE TABLE t (a INT)"))
    }
    assert(e2.getMessage.contains("CREATE TABLE"))
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
}
