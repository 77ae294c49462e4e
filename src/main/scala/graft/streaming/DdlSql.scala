package graft.streaming

/** MySQL-dialect DDL parsed from RAW `QueryEvent` SQL text.
  *
  * A real binlog does not ship structured DDL verbs — it ships the
  * statement text the client ran (`ALTER TABLE orders ADD COLUMN note
  * VARCHAR(32) DEFAULT 'none'`) as a QueryEvent at a binlog position.
  * Every DDL behavior in this engine already exists as a structured
  * declaration ([[StreamingOps.runCdcPass]]'s `renameCols` /
  * `defaultCols` / `dropCols` / `truncateAtSeq`,
  * `graft.Replication.renameTables`); this object is the missing
  * mapping from the wire text onto those verbs, so a binlog feed
  * survives DDL without an operator translating statements by hand.
  *
  * Dialect subset (the verbs the engine has semantics for):
  *
  *  - `ALTER TABLE t ADD [COLUMN] c <type> [NOT NULL|NULL]
  *    [DEFAULT <literal>] [FIRST|AFTER col]` — with a DEFAULT this is
  *    the lazy-backfill verb ([[StreamingOps.ColumnDefault]]); without
  *    one the open envelope absorbs the add (union at schema publish).
  *  - `ALTER TABLE t DROP [COLUMN] c`
  *  - `ALTER TABLE t RENAME COLUMN a TO b`
  *  - `ALTER TABLE t CHANGE [COLUMN] a b <type>` — rename (+ type
  *    change riding the envelope schema; same name = pure MODIFY)
  *  - `ALTER TABLE t MODIFY [COLUMN] c <type>` — the type change
  *    itself arrives via the resumed pass's envelope schema, where the
  *    widening guardrail validates it; the parser recognizes the verb
  *    so a MODIFY-bearing statement doesn't refuse
  *  - `ALTER TABLE t RENAME [TO|AS] u` and
  *    `RENAME TABLE a TO b[, c TO d]` — table renames
  *    ([[graft.Replication.renameTables]]'s journaled swap)
  *  - `TRUNCATE [TABLE] t`
  *  - `ADD/DROP INDEX|KEY` (and UNIQUE/FULLTEXT/SPATIAL variants) —
  *    recognized and deliberately inert: secondary indexes are a
  *    source-side physical concern with no envelope effect
  *
  * Everything else REFUSES loudly naming the statement — a PRIMARY KEY
  * change alters replication identity (keyCols), a partition clause
  * alters physical layout, and silently skipping either would corrupt
  * the replica in exactly the way this engine's refusal discipline
  * exists to prevent. Parsing is a driver-side, O(statement) tokenizer;
  * nothing here touches data. */
object DdlSql {

  sealed trait Statement { def table: String }
  /** `default` is the literal normalized to a Spark-SQL expression
    * string (single-quoted text, bare numerals, NULL/TRUE/FALSE). */
  final case class AddColumn(table: String, column: String,
      sqlType: String, default: Option[String]) extends Statement
  final case class DropColumn(table: String, column: String)
      extends Statement
  final case class RenameColumn(table: String, from: String, to: String)
      extends Statement
  /** Type change only — the new type arrives with the resumed pass's
    * envelope schema; [[StreamingOps]]'s widening guardrail is the
    * enforcement point, not the parser. */
  final case class ModifyColumn(table: String, column: String,
      sqlType: String) extends Statement
  final case class TruncateTable(table: String) extends Statement
  final case class RenameTable(renames: Seq[(String, String)])
      extends Statement { def table: String = renames.head._1 }
  /** Recognized verb with no envelope effect (secondary index DDL). */
  final case class Inert(table: String, clause: String) extends Statement
  /** A table-level verb OUTSIDE the dialect (CREATE/DROP/OPTIMIZE/
    * ANALYZE TABLE), parsed far enough to NAME its table: a scoped fold
    * skips other tables' routine noise (every real binlog interleaves
    * the whole topology's DDL), while an in-scope one still refuses
    * loudly at fold — recreating or dropping the replicated table has
    * no safe mapping. */
  final case class Unsupported(table: String, verb: String)
      extends Statement

  /** The structured configuration one resumed pass takes — the fold of
    * every QueryEvent in the gap between two passes. Feed the fields
    * straight into [[StreamingOps.runCdcPass]]; apply `tableRenames`
    * BEFORE the pass via [[graft.Replication.renameTables]] (they
    * rebind state dirs, not columns). */
  final case class DdlConfig(
      renameCols: Map[String, String] = Map.empty,
      dropCols: Map[String, Long] = Map.empty,
      defaultCols: Map[String, StreamingOps.ColumnDefault] = Map.empty,
      truncateAtSeq: Option[Long] = None,
      tableRenames: Seq[(String, String)] = Nil)

  // ---------------------------------------------------------------
  // tokenizer: whitespace-split with backtick idents, quoted strings
  // ('' / "" escapes), and ( ) , . as single-char tokens — regexes
  // cannot carry a DEFAULT literal containing a comma safely
  // ---------------------------------------------------------------
  private def fail(sql: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"cannot parse DDL statement: $why — in: $sql")

  private def tokenize(sql: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val j = sql.indexOf('`', i + 1)
        if (j < 0) fail(sql, "unterminated backtick identifier")
        out += (" I" + sql.substring(i + 1, j)) // marked ident
        i = j + 1
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          val d = sql.charAt(j)
          if (d == c && j + 1 < n && sql.charAt(j + 1) == c) {
            sb.append(c); j += 2 // doubled-quote escape
          } else if (d == c) { closed = true; j += 1 }
          else { sb.append(d); j += 1 }
        }
        if (!closed) fail(sql, "unterminated string literal")
        out += (" S" + sb.result()) // marked string literal
        i = j
      } else if (c.isDigit ||
        ((c == '-' || c == '+' || c == '.') && i + 1 < n &&
          sql.charAt(i + 1).isDigit)) {
        // numeric literal — scanned whole so a decimal point is never
        // confused with the qualifier dot of `db`.`t`
        var j = if (c == '-' || c == '+') i + 1 else i
        while (j < n && (sql.charAt(j).isDigit || sql.charAt(j) == '.')) j += 1
        if (j < n && (sql.charAt(j) == 'e' || sql.charAt(j) == 'E')) {
          var k = j + 1
          if (k < n && (sql.charAt(k) == '-' || sql.charAt(k) == '+')) k += 1
          val k0 = k
          while (k < n && sql.charAt(k).isDigit) k += 1
          if (k > k0) j = k
        }
        out += sql.substring(i, j)
        i = j
      } else if (c == '(' || c == ')' || c == ',' || c == '.') {
        out += c.toString; i += 1
      } else {
        var j = i
        while (j < n && !sql.charAt(j).isWhitespace &&
          !"`'\"(),.".contains(sql.charAt(j))) j += 1
        out += sql.substring(i, j)
        i = j
      }
    }
    out.result()
  }

  private def isIdentTok(t: String): Boolean =
    t.startsWith(" I") ||
      (!t.startsWith(" ") && t.nonEmpty &&
        (t.charAt(0).isLetter || t.charAt(0) == '_') &&
        t.forall(ch => ch.isLetterOrDigit || ch == '_' || ch == '$'))

  private def identOf(t: String): String =
    if (t.startsWith(" I")) t.substring(2) else t

  private def kw(t: String, k: String): Boolean =
    !t.startsWith(" ") && t.equalsIgnoreCase(k)

  /** Render a token back to statement-ish text for error messages. */
  private def show(t: String): String =
    if (t.startsWith(" I")) s"`${t.substring(2)}`"
    else if (t.startsWith(" S")) s"'${t.substring(2)}'"
    else t

  // a cursor over the token vector
  private final class Cur(val toks: Vector[String], val sql: String) {
    var i = 0
    def more: Boolean = i < toks.length
    def peek: String = if (more) toks(i) else ""
    def next(): String = { val t = peek; i += 1; t }
    def expectKw(k: String): Unit =
      if (!kw(next(), k)) fail(sql, s"expected $k")
    def takeKw(k: String): Boolean =
      if (more && kw(peek, k)) { i += 1; true } else false
    def ident(what: String): String = {
      val t = next()
      if (!isIdentTok(t)) fail(sql, s"expected $what, got ${show(t)}")
      identOf(t)
    }
    /** table name, db-qualifier stripped (`db`.`t` / db.t → t). */
    def tableName(): String = {
      var name = ident("table name")
      while (more && peek == ".") { i += 1; name = ident("table name") }
      name
    }
  }

  /** Parse ONE statement's text into its clause statements (an ALTER
    * with N comma-separated specs yields N). Refuses loudly on
    * anything outside the dialect subset. */
  def parse(sql: String): Seq[Statement] = {
    val stripped = sql.trim.stripSuffix(";").trim
    require(stripped.nonEmpty, "empty DDL statement")
    val c = new Cur(tokenize(stripped), stripped)
    val head = c.next()
    if (kw(head, "TRUNCATE")) {
      c.takeKw("TABLE")
      val t = c.tableName()
      if (c.more) fail(stripped, s"trailing tokens after TRUNCATE ${t}")
      Seq(TruncateTable(t))
    } else if (kw(head, "RENAME")) {
      c.expectKw("TABLE")
      val pairs = Seq.newBuilder[(String, String)]
      var go = true
      while (go) {
        val from = c.tableName()
        c.expectKw("TO")
        pairs += (from -> c.tableName())
        go = c.more && c.peek == ","
        if (go) c.i += 1
      }
      if (c.more) fail(stripped, "trailing tokens after RENAME TABLE list")
      Seq(RenameTable(pairs.result()))
    } else if (kw(head, "ALTER")) {
      if (c.more && !c.peek.startsWith(" ") &&
        nonTableObjects.contains(c.peek.toUpperCase)) {
        // ALTER of a non-table object — same scoping story as
        // CREATE/DROP of one
        val objKind = c.next().toUpperCase
        val name = if (c.more && isIdentTok(c.peek)) c.tableName()
          else "<none>"
        c.i = c.toks.length
        return Seq(Unsupported(name, s"ALTER $objKind"))
      }
      c.expectKw("TABLE")
      val table = c.tableName()
      val out = Seq.newBuilder[Statement]
      var go = true
      while (go) {
        out ++= parseAlterClause(c, table, stripped)
        go = c.more && c.peek == ","
        if (go) c.i += 1
      }
      if (c.more) fail(stripped, s"trailing tokens at ${show(c.peek)}")
      out.result()
    } else if (kw(head, "CREATE") || kw(head, "DROP") ||
      kw(head, "OPTIMIZE") || kw(head, "ANALYZE")) {
      // table-level verbs outside the dialect: name the table so a
      // scoped fold can skip topology noise; CREATE/DROP INDEX is the
      // statement form of the inert index clause
      val verb = head.toUpperCase
      c.takeKw("TEMPORARY"); c.takeKw("NO_WRITE_TO_BINLOG"); c.takeKw("LOCAL")
      if ((kw(head, "CREATE") || kw(head, "DROP")) && {
        c.takeKw("UNIQUE"); c.takeKw("FULLTEXT"); c.takeKw("SPATIAL")
        c.takeKw("INDEX")
      }) {
        c.ident("index name")
        c.expectKw("ON")
        val t = c.tableName()
        c.i = c.toks.length // index column list / options — inert
        Seq(Inert(t, s"$verb INDEX"))
      } else if (c.takeKw("TABLE")) {
        if (c.takeKw("IF")) { c.takeKw("NOT"); c.expectKw("EXISTS") }
        val first = c.tableName()
        val tables = Seq.newBuilder[String]
        tables += first
        // DROP/OPTIMIZE/ANALYZE accept a table list; CREATE's next
        // token is its column list, never a second table
        while (c.more && c.peek == "," && !kw(head, "CREATE")) {
          c.i += 1; tables += c.tableName()
        }
        c.i = c.toks.length // definitions/options — fold decides scope
        if (kw(head, "OPTIMIZE") || kw(head, "ANALYZE"))
          // maintenance verbs: statistics refresh / defrag rebuild —
          // no schema or data semantics on the replica (the ALTER-form
          // ENGINE=InnoDB rebuild is inert for the same reason)
          tables.result().map(t => Inert(t, s"$verb TABLE"))
        else tables.result().map(t => Unsupported(t, s"$verb TABLE"))
      } else if (c.more && !c.peek.startsWith(" ") &&
        (kw(c.peek, "OR") ||
          nonTableObjects.contains(c.peek.toUpperCase))) {
        // CREATE [OR REPLACE]/DROP of a NON-TABLE object (view,
        // trigger, database, routine …): named so a scoped fold can
        // skip it as topology noise; unscoped it still refuses — the
        // caller declared no table to scope by, so nothing may
        // silently drop
        if (c.takeKw("OR")) c.expectKw("REPLACE")
        if (!c.more || c.peek.startsWith(" ") ||
          !nonTableObjects.contains(c.peek.toUpperCase))
          fail(stripped,
            s"unsupported statement verb '${show(head)} ${show(c.peek)}'")
        val objKind = c.next().toUpperCase
        if (c.takeKw("IF")) { c.takeKw("NOT"); c.expectKw("EXISTS") }
        val name = if (c.more && isIdentTok(c.peek)) c.tableName() else "<none>"
        c.i = c.toks.length
        Seq(Unsupported(name, s"$verb $objKind"))
      } else fail(stripped,
        s"unsupported statement verb '${show(head)} ${show(c.peek)}'")
    } else if (kw(head, "GRANT") || kw(head, "REVOKE") ||
      kw(head, "FLUSH")) {
      // privilege/session statements: no table semantics at all — a
      // scoped fold skips them (their '<none>' subject matches no
      // table filter); an unscoped fold still refuses loudly
      c.i = c.toks.length
      Seq(Unsupported("<none>", head.toUpperCase))
    } else fail(stripped,
      s"unsupported statement verb '${show(head)}' (supported: ALTER " +
        "TABLE, RENAME TABLE, TRUNCATE; CREATE/DROP/OPTIMIZE/ANALYZE " +
        "and GRANT/REVOKE/FLUSH parse for scoping and refuse at fold " +
        "when in scope)")
  }

  /** Non-table object kinds a CREATE/DROP may target — named for
    * scoping, never mapped. */
  private val nonTableObjects = Set("DATABASE", "SCHEMA", "VIEW",
    "TRIGGER", "EVENT", "PROCEDURE", "FUNCTION", "USER", "TABLESPACE",
    "SERVER")

  private val typeStop = Set("NOT", "NULL", "DEFAULT", "FIRST", "AFTER",
    "COMMENT", "COLLATE", "CHARACTER")

  /** Consume a column type: leading word plus optional parenthesized
    * args plus attribute words (UNSIGNED, ZEROFILL …) until a stop
    * keyword, a comma, or the end. */
  private def parseType(c: Cur, sql: String): String = {
    val sb = new StringBuilder(c.ident("column type").toUpperCase)
    if (c.more && c.peek == "(") {
      sb.append('(')
      c.i += 1
      var depth = 1
      while (depth > 0) {
        if (!c.more) fail(sql, "unterminated type argument list")
        val t = c.next()
        if (t == "(") depth += 1
        if (t == ")") depth -= 1
        if (depth > 0) sb.append(if (t == ",") "," else show(t))
      }
      sb.append(')')
    }
    while (c.more && c.peek != "," && isIdentTok(c.peek) &&
      !typeStop.contains(identOf(c.peek).toUpperCase)) {
      // a column-spec constraint word here is NOT a type attribute:
      // `ADD c BIGINT PRIMARY KEY` (or the bare `KEY` shorthand)
      // changes replication identity and must refuse, not be absorbed
      val w = identOf(c.peek).toUpperCase
      if (!c.peek.startsWith(" ") && columnConstraintKws.contains(w))
        fail(sql, s"unsupported column constraint '$w' — key/constraint " +
          "changes alter replication identity and have no safe mapping")
      sb.append(' ').append(c.ident("type attribute").toUpperCase)
    }
    sb.result()
  }

  /** Constraint words that may trail a column spec and must refuse
    * rather than ride along as type attributes. */
  private val columnConstraintKws =
    Set("PRIMARY", "KEY", "UNIQUE", "REFERENCES", "CHECK", "CONSTRAINT")

  /** DEFAULT literal → Spark-SQL expression text. Only literals the
    * engine can serve as a lazy backfill are accepted; expressions
    * (CURRENT_TIMESTAMP, functions) refuse — a backfill that re-runs
    * an expression per read would not be MySQL's frozen default. */
  private def parseDefaultLiteral(c: Cur, sql: String): String = {
    val t = c.next()
    if (t.startsWith(" S"))
      "'" + t.substring(2).replace("'", "''") + "'"
    else if (!t.startsWith(" ") &&
      (kw(t, "NULL") || kw(t, "TRUE") || kw(t, "FALSE")))
      t.toUpperCase
    else if (!t.startsWith(" ") &&
      t.matches("[-+]?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?"))
      t
    else fail(sql, s"unsupported DEFAULT value ${show(t)} (literals only)")
  }

  /** Skip the NULL/NOT NULL + DEFAULT + position tail of a column spec,
    * returning the DEFAULT literal if one appeared. */
  private def parseColumnTail(c: Cur, sql: String): Option[String] = {
    var default = Option.empty[String]
    var go = true
    while (go && c.more && c.peek != ",") {
      if (c.takeKw("NOT")) c.expectKw("NULL")
      else if (c.takeKw("NULL")) ()
      else if (c.takeKw("DEFAULT")) default = Some(parseDefaultLiteral(c, sql))
      else if (c.takeKw("FIRST")) ()
      else if (c.takeKw("AFTER")) { c.ident("column name"); () }
      else if (c.takeKw("COMMENT")) { c.next(); () }
      else go = false
    }
    default
  }

  private val indexKws = Set("INDEX", "KEY", "UNIQUE", "FULLTEXT", "SPATIAL")

  /** Bare keywords that open clauses the engine must NOT absorb as a
    * column name: a PRIMARY KEY change alters replication identity, a
    * FOREIGN KEY / CHECK constraint has no destination semantics. A
    * backticked ident spelling one of these is still a column. */
  private val refusedClauseKws =
    Set("PRIMARY", "FOREIGN", "CONSTRAINT", "CHECK", "PARTITION")

  /** Execution hints and physical table options — clauses with NO
    * replica semantics (the destination's physical layout is its own):
    * `ALGORITHM=INPLACE`, `LOCK=NONE` (the tails every gh-ost/pt-osc
    * ALTER ships), `ENGINE=InnoDB` (the standard defrag rebuild),
    * AUTO_INCREMENT / ROW_FORMAT / COMMENT / KEY_BLOCK_SIZE / STATS_*
    * options, and the DEFAULT CHARACTER SET/COLLATE table defaults
    * (which affect FUTURE columns source-side — existing data is
    * untouched, unlike `CONVERT TO CHARACTER SET`, which rewrites data
    * and still refuses). The tokenizer keeps `K=V` as one token, so
    * both `ALGORITHM=INPLACE` and `ALGORITHM = INPLACE` match. */
  private val hintKws = Set("ALGORITHM", "LOCK", "ENGINE",
    "AUTO_INCREMENT", "ROW_FORMAT", "COMMENT", "KEY_BLOCK_SIZE",
    "STATS_PERSISTENT", "STATS_AUTO_RECALC", "CHARSET", "COLLATE",
    "CHARACTER", "DEFAULT")

  /** True iff the cursor stands at a hint/table-option clause. Looks,
    * never consumes — [[skipClause]] eats the clause when it matches.
    * `DEFAULT` qualifies only when followed by a charset word (a bare
    * DEFAULT clause shape doesn't exist in ALTER). */
  private def hintClause(c: Cur): Boolean = {
    if (!c.more || c.peek.startsWith(" ")) false
    else {
      val up = c.peek.toUpperCase
      val word = up.takeWhile(_ != '=')
      if (!hintKws.contains(word)) false
      else if (word == "DEFAULT" || word == "CHARACTER") {
        // DEFAULT [CHARACTER SET|CHARSET|COLLATE] / CHARACTER SET —
        // BOTH require the charset shape one token ahead, or the
        // clause is not a table option and must refuse downstream
        // instead of silently absorbing as an inert hint
        val next = if (c.i + 1 < c.toks.length) c.toks(c.i + 1) else ""
        if (next.startsWith(" ")) false
        else if (word == "DEFAULT")
          Seq("CHARACTER", "CHARSET", "COLLATE")
            .contains(next.toUpperCase.takeWhile(_ != '='))
        else next.equalsIgnoreCase("SET") ||
          next.toUpperCase.startsWith("SET=")
      } else true
    }
  }

  private def refuseClauseKw(c: Cur, sql: String, verb: String): Unit =
    if (c.more && !c.peek.startsWith(" ") &&
      refusedClauseKws.contains(c.peek.toUpperCase))
      fail(sql, s"unsupported ALTER TABLE clause '$verb ${c.peek.toUpperCase}'")

  /** Consume the rest of an inert index clause (to the next top-level
    * comma), keeping paren depth so an index column list's commas don't
    * end the clause early. */
  private def skipClause(c: Cur): Unit = {
    var depth = 0
    while (c.more && !(depth == 0 && c.peek == ",")) {
      val t = c.next()
      if (t == "(") depth += 1
      if (t == ")") depth -= 1
    }
  }

  private def parseAlterClause(c: Cur, table: String,
      sql: String): Seq[Statement] = {
    if (c.takeKw("ADD")) {
      // only a BARE keyword opens an index clause: a backticked ident
      // that happens to spell INDEX is a column named INDEX
      if (c.more && !c.peek.startsWith(" ") &&
        indexKws.contains(c.peek.toUpperCase)) {
        skipClause(c); Seq(Inert(table, "ADD INDEX"))
      } else {
        refuseClauseKw(c, sql, "ADD")
        c.takeKw("COLUMN")
        if (c.more && c.peek == "(") {
          // MySQL's parenthesized multi-add:
          // ADD COLUMN (a INT, b VARCHAR(8) DEFAULT 'x')
          c.i += 1
          val adds = Seq.newBuilder[Statement]
          var go = true
          while (go) {
            val col = c.ident("column name")
            val tpe = parseType(c, sql)
            adds += AddColumn(table, col, tpe, parseColumnTail(c, sql))
            if (c.more && c.peek == ",") c.i += 1 else go = false
          }
          if (!c.more || c.next() != ")")
            fail(sql, "expected ) closing the ADD column list")
          adds.result()
        } else {
          val col = c.ident("column name")
          val tpe = parseType(c, sql)
          Seq(AddColumn(table, col, tpe, parseColumnTail(c, sql)))
        }
      }
    } else if (c.takeKw("DROP")) {
      if (c.more && !c.peek.startsWith(" ") &&
        indexKws.contains(c.peek.toUpperCase)) {
        skipClause(c); Seq(Inert(table, "DROP INDEX"))
      } else {
        refuseClauseKw(c, sql, "DROP")
        c.takeKw("COLUMN")
        Seq(DropColumn(table, c.ident("column name")))
      }
    } else if (c.takeKw("RENAME")) {
      if (c.takeKw("COLUMN")) {
        val from = c.ident("column name")
        c.expectKw("TO")
        Seq(RenameColumn(table, from, c.ident("column name")))
      } else if (c.more && !c.peek.startsWith(" ") &&
        Seq("INDEX", "KEY").contains(c.peek.toUpperCase)) {
        // RENAME INDEX a TO b — secondary-index bookkeeping, inert
        skipClause(c); Seq(Inert(table, "RENAME INDEX"))
      } else {
        c.takeKw("TO"); c.takeKw("AS")
        Seq(RenameTable(Seq(table -> c.tableName())))
      }
    } else if (hintClause(c)) {
      // execution hints and table options with no replica semantics:
      // every gh-ost/pt-osc ALTER ships ALGORITHM=INPLACE, LOCK=NONE
      // tails, and ENGINE=InnoDB is the standard defrag rebuild —
      // refusing them would reject nearly every real migration statement
      skipClause(c); Seq(Inert(table, "TABLE OPTION"))
    } else if (c.takeKw("MODIFY")) {
      c.takeKw("COLUMN")
      val col = c.ident("column name")
      val tpe = parseType(c, sql)
      parseColumnTail(c, sql)
      Seq(ModifyColumn(table, col, tpe))
    } else if (c.takeKw("CHANGE")) {
      c.takeKw("COLUMN")
      val from = c.ident("column name")
      val to = c.ident("column name")
      val tpe = parseType(c, sql)
      parseColumnTail(c, sql)
      if (from.equalsIgnoreCase(to)) Seq(ModifyColumn(table, to, tpe))
      else Seq(RenameColumn(table, from, to))
    } else fail(sql,
      s"unsupported ALTER TABLE clause at ${show(c.peek)} (supported: " +
        "ADD/DROP/MODIFY/CHANGE/RENAME COLUMN, RENAME TO, index verbs)")
  }

  /** Fold the gap's QueryEvents — (binlog position, raw SQL) in
    * position order — into ONE resumed pass's structured config.
    * Composition rules mirror what the structured verbs would see if
    * declared one pass per statement:
    *
    *  - renames CHAIN (a→b then b→c folds to a→c) and re-key pending
    *    default/drop entries declared earlier in the gap;
    *  - a column ADDED and DROPPED within the gap never existed for
    *    the state — both entries cancel;
    *  - TRUNCATE keeps the newest position (each one widens the floor);
    *  - table renames accumulate in statement order (apply them via
    *    [[graft.Replication.renameTables]] BEFORE the pass).
    *
    * `tableFilter` scopes the fold to one destination table's
    * statements (a binlog interleaves every table's DDL); column-verb
    * statements for other tables are skipped, RENAME TABLE pairs are
    * kept whole (they rebind dirs at the topology level). */
  def fold(events: Seq[(Long, String)],
      tableFilter: Option[String] = None): DdlConfig = {
    var cfg = DdlConfig()
    var added = Set.empty[String] // columns born in this gap
    val evs = events.sortBy(_._1)
    for ((seq, sql) <- evs; st <- parse(sql)) {
      val inScope = tableFilter.forall(t => st match {
        case _: RenameTable => true
        case s => s.table.equalsIgnoreCase(t)
      })
      if (inScope) st match {
        case AddColumn(_, col, _, default) =>
          require(!added.contains(col),
            s"DDL gap adds column '$col' twice (at seq $seq)")
          added += col
          default.foreach { d =>
            cfg = cfg.copy(defaultCols = cfg.defaultCols +
              (col -> StreamingOps.ColumnDefault(seq, d)))
          }
        case DropColumn(_, col) =>
          if (added.contains(col)) {
            // born and dropped inside the gap: the envelope never
            // carries it and the state never saw it — both cancel
            added -= col
            cfg = cfg.copy(defaultCols = cfg.defaultCols - col)
          } else {
            cfg = cfg.copy(dropCols = cfg.dropCols + (col -> seq))
          }
        case RenameColumn(_, from, to) =>
          if (added.contains(from)) {
            // a gap-born column renames by re-keying its default —
            // the state has no published column to migrate
            added = added - from + to
            cfg.defaultCols.get(from).foreach { d =>
              cfg = cfg.copy(defaultCols = cfg.defaultCols - from + (to -> d))
            }
          } else cfg.renameCols.find(_._2 == from) match {
            case Some((orig, _)) => // chain a→b, b→c ⇒ a→c
              cfg = cfg.copy(renameCols = cfg.renameCols + (orig -> to))
            case None =>
              cfg = cfg.copy(renameCols = cfg.renameCols + (from -> to))
          }
        case ModifyColumn(_, _, _) =>
          // the type change arrives with the resumed pass's envelope
          // schema — the widening guardrail there is the enforcement
          ()
        case TruncateTable(_) =>
          cfg = cfg.copy(truncateAtSeq =
            Some(math.max(cfg.truncateAtSeq.getOrElse(Long.MinValue), seq)))
        case RenameTable(pairs) =>
          // scoped per PAIR: a rename touching the scoped table on
          // either side matters (the OSC cutover renames it); a fully
          // foreign rename is a neighbor's cutover — routine noise
          val kept = tableFilter match {
            case None => pairs
            case Some(t) => pairs.filter { case (a, b) =>
              a.equalsIgnoreCase(t) || b.equalsIgnoreCase(t) }
          }
          cfg = cfg.copy(tableRenames = cfg.tableRenames ++ kept)
        case Inert(_, _) => ()
        case Unsupported(t, verb) =>
          // reachable only in scope (the filter skipped foreign noise):
          // recreating/dropping THE replicated table has no safe mapping
          throw new IllegalArgumentException(
            s"unsupported statement verb '$verb' for replicated table " +
              s"'$t' at seq $seq — in: $sql")
      }
    }
    cfg
  }
}
