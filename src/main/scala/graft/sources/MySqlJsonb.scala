package graft.sources

/** MySQL's BINARY JSON document format (the `JSON` column type's wire
  * value in row-based binlog events, MYSQL_TYPE_JSON = 245) — the
  * public layout every binlog decoder implements:
  *
  *  - a document is `type(1) value`;
  *  - scalar types: 0x04 literal (0=null, 1=true, 2=false), 0x05/0x06
  *    int16/uint16 (2 LE), 0x07/0x08 int32/uint32 (4 LE), 0x09/0x0a
  *    int64/uint64 (8 LE), 0x0b double (8 LE IEEE), 0x0c utf8mb4
  *    string (varint length, 7 bits per byte with a continuation
  *    high bit, then the bytes);
  *  - containers: 0x00/0x02 SMALL object/array (element count and
  *    byte size as 2-byte LE, offsets 2-byte), 0x01/0x03 LARGE
  *    (4-byte counts/offsets). Objects carry key entries
  *    `(offset, key length)` — keys sorted by (length, bytes), the
  *    server's own ordering — then value entries, then keys, then
  *    values. A value entry is `type(1) + offset` EXCEPT for types
  *    small enough to inline in the offset field (literals and
  *    int16/uint16; in LARGE containers also int32/uint32);
  *  - 0x0f opaque (a typed blob: DECIMAL/DATE/TIME inside JSON) —
  *    refused by name here rather than guessed at.
  *
  * Decode serializes back to COMPACT text (`{"k":1,"s":"x"}` — no
  * whitespace, object keys in stored order, integers plain, doubles
  * via the shortest-digits Java rendering with a forced `.0` for
  * integral values so a double can never masquerade as an int); the
  * renderer parses exactly that grammar. Documents that do not fit
  * the SMALL container form (≥ 64 KiB or ≥ 65536 elements) refuse at
  * encode — a fixture writer's bound, not a decode limit (LARGE
  * containers decode fine).
  */
object MySqlJsonb {

  // ── the document AST ─────────────────────────────────────────────
  private sealed trait JVal
  private case object JNull extends JVal
  private final case class JBool(b: Boolean) extends JVal
  private final case class JInt(v: Long) extends JVal
  private final case class JUInt(v: Long) extends JVal // bits; ≥ 2^63
  private final case class JDouble(d: Double) extends JVal
  private final case class JStr(s: String) extends JVal
  private final case class JArr(items: Vector[JVal]) extends JVal
  private final case class JObj(fields: Vector[(String, JVal)])
    extends JVal

  // ── decode: binary document → compact text ───────────────────────

  /** Decode one binary JSON document (`bytes[off, off+len)`) to its
    * compact text form. An EMPTY value is MySQL's representation of a
    * JSON `null` literal written through some client paths — decoded
    * as the text `null`. */
  def decode(bytes: Array[Byte], off: Int, len: Int,
      what: String): String = {
    if (len == 0) "null"
    else {
      require(len >= 2 || (len >= 1 && (bytes(off) & 0xff) == 0x04),
        s"$what: binary JSON document of $len byte(s) is truncated")
      val v = readValue(bytes, off + 1, off + len, bytes(off) & 0xff,
        what)
      val sb = new StringBuilder
      writeText(v, sb)
      sb.result()
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    (7 to 0 by -1).foreach(i => v = (v << 8) | (b(o + i) & 0xffL))
    v
  }

  private def readValue(b: Array[Byte], vo: Int, end: Int, t: Int,
      what: String): JVal = {
    def need(o: Int, n: Int): Unit = require(o + n <= end,
      s"$what: binary JSON truncated at offset $o (need $n bytes)")
    t match {
      case 0x04 =>
        need(vo, 1)
        (b(vo) & 0xff) match {
          case 0 => JNull
          case 1 => JBool(true)
          case 2 => JBool(false)
          case x => throw new IllegalArgumentException(
            s"$what: unknown JSON literal $x (0=null, 1=true, 2=false)")
        }
      case 0x05 => need(vo, 2); JInt(u16(b, vo).toShort.toLong)
      case 0x06 => need(vo, 2); JInt(u16(b, vo).toLong)
      case 0x07 => need(vo, 4); JInt(u32(b, vo).toInt.toLong)
      case 0x08 => need(vo, 4); JInt(u32(b, vo))
      case 0x09 => need(vo, 8); JInt(i64(b, vo))
      case 0x0a =>
        need(vo, 8)
        val v = i64(b, vo)
        if (v >= 0) JInt(v) else JUInt(v)
      case 0x0b =>
        need(vo, 8)
        JDouble(java.lang.Double.longBitsToDouble(i64(b, vo)))
      case 0x0c =>
        // varint length: 7 bits per byte, high bit = continuation
        var o = vo
        var len = 0L
        var shift = 0
        var more = true
        while (more) {
          need(o, 1)
          val x = b(o) & 0xff
          len |= (x & 0x7fL) << shift
          more = (x & 0x80) != 0
          shift += 7
          o += 1
          require(shift <= 35, s"$what: JSON string varint runs away")
        }
        // a 5-continuation-byte varint can carry up to 2^35-1: past
        // Int.MaxValue the .toInt narrowing would go NEGATIVE, slip
        // past need() (o + negative <= end holds), and surface as a
        // bare StringIndexOutOfBounds instead of the named refusal
        require(len <= Int.MaxValue,
          s"$what: JSON string declares $len bytes — past the 2 GiB " +
            "JVM bound; the document is corrupt")
        need(o, len.toInt)
        JStr(new String(b, o, len.toInt, "UTF-8"))
      case 0x00 | 0x01 | 0x02 | 0x03 =>
        val large = t == 0x01 || t == 0x03
        val isObj = t == 0x00 || t == 0x01
        val w = if (large) 4 else 2
        def rd(o: Int): Long = { need(o, w)
          if (large) u32(b, o) else u16(b, o).toLong }
        val count = rd(vo).toInt
        val size = rd(vo + w).toInt
        require(vo + size <= end,
          s"$what: JSON container declares $size bytes beyond the value")
        val keyEntries = vo + 2 * w
        val valEntries = keyEntries + (if (isObj) count * (w + 2) else 0)
        def valueAt(i: Int): JVal = {
          val eo = valEntries + i * (w + 1)
          need(eo, w + 1)
          val vt = b(eo) & 0xff
          val inline = vt == 0x04 || vt == 0x05 || vt == 0x06 ||
            (large && (vt == 0x07 || vt == 0x08))
          if (inline) readValue(b, eo + 1, eo + 1 + w, vt, what)
          else {
            val voff = rd(eo + 1).toInt
            // offsets are from the container's own start
            readValue(b, vo + voff, end, vt, what)
          }
        }
        if (isObj) {
          val fields = Vector.tabulate(count) { i =>
            val ko = keyEntries + i * (w + 2)
            val koff = rd(ko).toInt
            // the key entry's 2-byte length sits past the offset rd()
            // bounds-checked — a truncated document must hit the named
            // refusal, not a bare ArrayIndexOutOfBounds
            need(ko + w, 2)
            val klen = u16(b, ko + w)
            need(vo + koff, klen)
            val key = new String(b, vo + koff, klen, "UTF-8")
            key -> valueAt(i)
          }
          JObj(fields)
        } else JArr(Vector.tabulate(count)(valueAt))
      case 0x0f => throw new IllegalArgumentException(
        s"$what: JSON opaque value (type 0x0f: DECIMAL/DATE/TIME " +
          "inside a JSON document) is not decodable to portable text " +
          "— refuse rather than guess its client-side rendering")
      case other => throw new IllegalArgumentException(
        s"$what: unknown binary JSON type 0x${other.toHexString} — " +
          "corrupt document or a format this decoder does not know")
    }
  }

  private def writeText(v: JVal, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null"); ()
    case JBool(b) => sb.append(if (b) "true" else "false"); ()
    case JInt(v) => sb.append(v); ()
    case JUInt(bits) => sb.append(java.lang.Long.toUnsignedString(bits)); ()
    case JDouble(d) =>
      if (d.isNaN || d.isInfinite) throw new IllegalArgumentException(
        "non-finite double in a JSON document")
      // negative zero FIRST: longValue() drops the sign bit, so the
      // integral fast path below would render -0.0 as "0.0" — a real
      // (if tiny) value corruption, since the stored document
      // distinguishes them. (Large magnitudes keep Java's exponent
      // rendering, e.g. "1.0E20" — a documented divergence from
      // MySQL's own text form; revisit if server-text parity ever
      // becomes an oracle.)
      else if (d == 0.0 &&
        java.lang.Double.doubleToRawLongBits(d) != 0L) {
        sb.append("-0.0"); ()
      }
      else if (d == d.longValue().toDouble &&
        math.abs(d) < 1e15) { sb.append(d.longValue()).append(".0"); () }
      else { sb.append(d.toString); () }
    case JStr(s) => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      items.zipWithIndex.foreach { case (it, i) =>
        if (i > 0) sb.append(',')
        writeText(it, sb)
      }
      sb.append(']'); ()
    case JObj(fields) =>
      sb.append('{')
      fields.zipWithIndex.foreach { case ((k, fv), i) =>
        if (i > 0) sb.append(',')
        writeString(k, sb)
        sb.append(':')
        writeText(fv, sb)
      }
      sb.append('}'); ()
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    ()
  }

  // ── JSON DIFF application (binlog_row_value_options=PARTIAL_JSON) ──
  // A PARTIAL_UPDATE_ROWS event ships a JSON column's change as a
  // diff list instead of the full after-document: operations REPLACE
  // (0), INSERT (1), REMOVE (2), each with a JSON path into the
  // BEFORE document and (for non-REMOVE) a binary JSON value. The
  // server only emits diffs that are valid against the before image,
  // so a path that does not resolve is corruption — refused by name,
  // never skipped (a half-applied document is a silently diverged
  // replica).

  /** Apply a diff list to a document's TEXT form (the envelope's JSON
    * surface): parse → navigate each path → mutate → re-serialize
    * compact. `diffs` are `(op, path, value-doc-bytes)`; REPLACE
    * requires the path to exist, INSERT requires the final member/
    * element slot to be free (an array index equal to the length
    * appends — MySQL's JSON_INSERT rule), REMOVE requires existence
    * and refuses `$` (a whole-document change is a plain update, not
    * a diff). */
  def applyDiffsToText(baseText: String,
      diffs: Seq[(Int, String, Option[Array[Byte]])],
      what: String): String = {
    var doc = {
      val (v, rest) = parseValue(baseText, skipWs(baseText, 0), what)
      require(skipWs(baseText, rest) == baseText.length,
        s"$what: trailing garbage after the base JSON document")
      v
    }
    diffs.foreach { case (op, path, valueBytes) =>
      val segs = parsePath(path, what)
      val value = valueBytes.map { b =>
        require(b.nonEmpty, s"$what: empty diff value document")
        readValue(b, 1, b.length, b(0) & 0xff, what)
      }
      op match {
        case 0 => // REPLACE
          doc = mutate(doc, segs, what) { existing =>
            require(existing.isDefined,
              s"$what: REPLACE diff path '$path' does not resolve in " +
                "the before document — the diff does not match the " +
                "image it claims to patch; the event is corrupt")
            value
          }
        case 1 => // INSERT
          doc = mutate(doc, segs, what) { existing =>
            require(existing.isEmpty,
              s"$what: INSERT diff path '$path' already exists in the " +
                "before document — the diff does not match the image; " +
                "corrupt")
            value
          }
        case 2 => // REMOVE
          require(valueBytes.isEmpty,
            s"$what: REMOVE diff carries a value — corrupt")
          doc = mutate(doc, segs, what) { existing =>
            require(existing.isDefined,
              s"$what: REMOVE diff path '$path' does not resolve in " +
                "the before document — corrupt")
            None
          }
        case other => throw new IllegalArgumentException(
          s"$what: unknown JSON diff operation $other (0=REPLACE, " +
            "1=INSERT, 2=REMOVE) — refuse rather than guess")
      }
    }
    val sb = new StringBuilder
    writeText(doc, sb)
    sb.result()
  }

  /** A JSON path's segments: `$` then `.member` (bare or
    * double-quoted) / `[index]` steps — the exact-location grammar
    * the server's diff paths use (no wildcards). */
  private sealed trait Seg
  private final case class Member(name: String) extends Seg
  private final case class Elem(i: Int) extends Seg

  private def parsePath(path: String, what: String): List[Seg] = {
    require(path.nonEmpty && path(0) == '$',
      s"$what: JSON diff path '$path' does not start at '$$'")
    var i = 1
    val segs = List.newBuilder[Seg]
    while (i < path.length) path(i) match {
      case '.' =>
        i += 1
        if (i < path.length && path(i) == '"') {
          val (name, i2) = parseString(path, i, what)
          segs += Member(name)
          i = i2
        } else {
          val start = i
          while (i < path.length && path(i) != '.' && path(i) != '[')
            i += 1
          require(i > start,
            s"$what: empty member name in JSON diff path '$path'")
          segs += Member(path.substring(start, i))
        }
      case '[' =>
        val end = path.indexOf(']', i)
        require(end > i + 1,
          s"$what: malformed array step in JSON diff path '$path'")
        val idx = path.substring(i + 1, end).trim.toIntOption
          .getOrElse(throw new IllegalArgumentException(
            s"$what: non-numeric array index in JSON diff path '$path'"))
        require(idx >= 0, s"$what: negative index in path '$path'")
        segs += Elem(idx)
        i = end + 1
      case c => throw new IllegalArgumentException(
        s"$what: unexpected '$c' in JSON diff path '$path'")
    }
    segs.result()
  }

  /** Navigate to `segs`' final slot and transform it: `f` receives
    * the existing value (None if the slot is empty) and returns the
    * new value (None = remove). INTERMEDIATE steps must resolve —
    * the server never emits a diff into a non-existent container. */
  private def mutate(doc: JVal, segs: List[Seg], what: String)(
      f: Option[JVal] => Option[JVal]): JVal = segs match {
    case Nil =>
      f(Some(doc)).getOrElse(throw new IllegalArgumentException(
        s"$what: a JSON diff cannot remove the whole document — a " +
          "full-document change ships as a plain update"))
    case Member(name) :: rest => doc match {
      case JObj(fields) =>
        val i = fields.indexWhere(_._1 == name)
        if (rest.isEmpty) {
          val existing = if (i >= 0) Some(fields(i)._2) else None
          f(existing) match {
            case Some(nv) =>
              if (i >= 0) JObj(fields.updated(i, name -> nv))
              // new members keep the canonical (length, bytes) order
              else JObj((fields :+ (name -> nv)).sortBy { case (k, _) =>
                (k.getBytes("UTF-8").length, k) })
            case None =>
              require(i >= 0, s"$what: unreachable")
              JObj(fields.patch(i, Nil, 1))
          }
        } else {
          require(i >= 0,
            s"$what: JSON diff path steps through missing member " +
              s"'$name' — the diff does not match the before document")
          JObj(fields.updated(i, name -> mutate(fields(i)._2, rest,
            what)(f)))
        }
      case _ => throw new IllegalArgumentException(
        s"$what: JSON diff path steps into member '$name' of a " +
          "non-object — the diff does not match the before document")
    }
    case Elem(idx) :: rest => doc match {
      case JArr(items) =>
        if (rest.isEmpty) {
          val existing = if (idx < items.length) Some(items(idx)) else None
          f(existing) match {
            case Some(nv) =>
              if (idx < items.length) JArr(items.updated(idx, nv))
              else {
                // INSERT past the end appends (MySQL's rule); a gap
                // would fabricate elements the server never wrote
                require(idx == items.length,
                  s"$what: JSON diff inserts at index $idx of a " +
                    s"${items.length}-element array — a gap; corrupt")
                JArr(items :+ nv)
              }
            case None =>
              require(idx < items.length, s"$what: unreachable")
              JArr(items.patch(idx, Nil, 1))
          }
        } else {
          require(idx < items.length,
            s"$what: JSON diff path steps through missing element " +
              s"[$idx] — the diff does not match the before document")
          JArr(items.updated(idx, mutate(items(idx), rest, what)(f)))
        }
      case _ => throw new IllegalArgumentException(
        s"$what: JSON diff path steps into element [$idx] of a " +
          "non-array — the diff does not match the before document")
    }
  }

  // ── encode: text → binary document (the fixture renderer) ────────

  /** Encode JSON text as one binary document. Object keys re-sort by
    * (byte length, bytes) — the server's own storage order — so a
    * round trip through this codec is canonical-form text. */
  def encode(text: String, what: String): Array[Byte] = {
    val (v, rest) = parseValue(text, skipWs(text, 0), what)
    require(skipWs(text, rest) == text.length,
      s"$what: trailing garbage after JSON value: " +
        s"'${text.substring(rest)}'")
    val out = new java.io.ByteArrayOutputStream()
    val (t, body) = encodeValue(v, what)
    out.write(t)
    out.write(body)
    out.toByteArray
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && (s(i) == ' ' || s(i) == '\t' ||
      s(i) == '\n' || s(i) == '\r')) i += 1
    i
  }

  /** Recursive-descent JSON text parser — returns (value, index past
    * it). Strict: refuses trailing garbage, bad escapes, bare words. */
  private def parseValue(s: String, i0: Int,
      what: String): (JVal, Int) = {
    require(i0 < s.length, s"$what: JSON text ends mid-value")
    s(i0) match {
      case '{' =>
        var i = skipWs(s, i0 + 1)
        val fields = Vector.newBuilder[(String, JVal)]
        if (i < s.length && s(i) == '}') (JObj(Vector.empty), i + 1)
        else {
          var done = false
          while (!done) {
            require(i < s.length && s(i) == '"',
              s"$what: expected an object key at offset $i")
            val (k, i1) = parseString(s, i, what)
            i = skipWs(s, i1)
            require(i < s.length && s(i) == ':',
              s"$what: expected ':' at offset $i")
            val (v, i2) = parseValue(s, skipWs(s, i + 1), what)
            fields += (k match { case ks => ks -> v })
            i = skipWs(s, i2)
            require(i < s.length && (s(i) == ',' || s(i) == '}'),
              s"$what: expected ',' or '}' at offset $i")
            if (s(i) == '}') done = true
            else i = skipWs(s, i + 1)
          }
          (JObj(fields.result()), i + 1)
        }
      case '[' =>
        var i = skipWs(s, i0 + 1)
        val items = Vector.newBuilder[JVal]
        if (i < s.length && s(i) == ']') (JArr(Vector.empty), i + 1)
        else {
          var done = false
          while (!done) {
            val (v, i1) = parseValue(s, i, what)
            items += v
            i = skipWs(s, i1)
            require(i < s.length && (s(i) == ',' || s(i) == ']'),
              s"$what: expected ',' or ']' at offset $i")
            if (s(i) == ']') done = true
            else i = skipWs(s, i + 1)
          }
          (JArr(items.result()), i + 1)
        }
      case '"' =>
        val (str, i1) = parseString(s, i0, what)
        (JStr(str), i1)
      case 't' =>
        require(s.startsWith("true", i0), s"$what: bad literal at $i0")
        (JBool(true), i0 + 4)
      case 'f' =>
        require(s.startsWith("false", i0), s"$what: bad literal at $i0")
        (JBool(false), i0 + 5)
      case 'n' =>
        require(s.startsWith("null", i0), s"$what: bad literal at $i0")
        (JNull, i0 + 4)
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var i = i0 + 1
        var isInt = true
        while (i < s.length && (s(i).isDigit || s(i) == '.' ||
          s(i) == 'e' || s(i) == 'E' || s(i) == '+' || s(i) == '-')) {
          if (s(i) == '.' || s(i) == 'e' || s(i) == 'E') isInt = false
          i += 1
        }
        val tok = s.substring(i0, i)
        if (isInt) tok.toLongOption match {
          case Some(l) => (JInt(l), i)
          case None => // past ±2^63: carry as double like JS parsers
            (JDouble(tok.toDoubleOption.getOrElse(
              throw new IllegalArgumentException(
                s"$what: bad number '$tok'"))), i)
        } else (JDouble(tok.toDoubleOption.getOrElse(
          throw new IllegalArgumentException(
            s"$what: bad number '$tok'"))), i)
      case c => throw new IllegalArgumentException(
        s"$what: unexpected '$c' at offset $i0 in JSON text")
    }
  }

  private def parseString(s: String, i0: Int,
      what: String): (String, Int) = {
    val sb = new StringBuilder
    var i = i0 + 1
    while (i < s.length && s(i) != '"') {
      if (s(i) == '\\') {
        require(i + 1 < s.length, s"$what: JSON text ends mid-escape")
        s(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/' => sb.append('/'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            require(i + 6 <= s.length, s"$what: truncated \\u escape")
            sb.append(Integer.parseInt(
              s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => throw new IllegalArgumentException(
            s"$what: unknown escape '\\$e' in JSON string")
        }
      } else { sb.append(s(i)); i += 1 }
    }
    require(i < s.length, s"$what: unterminated JSON string")
    (sb.result(), i + 1)
  }

  /** One value's (type byte, body bytes). Containers serialize SMALL
    * form; refuse what small cannot hold (the renderer's bound). */
  private def encodeValue(v: JVal, what: String): (Int, Array[Byte]) = {
    def le(n: Int, v: Long): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    v match {
      case JNull => (0x04, Array[Byte](0))
      case JBool(b) => (0x04, Array[Byte](if (b) 1 else 2))
      case JInt(l) if l >= Short.MinValue && l <= Short.MaxValue =>
        (0x05, le(2, l))
      case JInt(l) if l >= Int.MinValue && l <= Int.MaxValue =>
        (0x07, le(4, l))
      case JInt(l) => (0x09, le(8, l))
      case JUInt(bits) => (0x0a, le(8, bits))
      case JDouble(d) =>
        (0x0b, le(8, java.lang.Double.doubleToLongBits(d)))
      case JStr(s) =>
        val bytes = s.getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream()
        var len = bytes.length
        while (len >= 0x80) { out.write((len & 0x7f) | 0x80); len >>= 7 }
        out.write(len)
        out.write(bytes)
        (0x0c, out.toByteArray)
      case JArr(items) =>
        (0x02, encodeContainer(None, items, what))
      case JObj(fields) =>
        // the server stores object keys sorted by (length, bytes)
        val sorted = fields.sortBy { case (k, _) =>
          (k.getBytes("UTF-8").length, k) }
        require(sorted.map(_._1).distinct.length == sorted.length,
          s"$what: JSON object repeats a key")
        (0x00, encodeContainer(Some(sorted.map(_._1)),
          sorted.map(_._2), what))
    }
  }

  /** A SMALL container's body: count, size, key entries (objects),
    * value entries, keys, values. */
  private def encodeContainer(keys: Option[Vector[String]],
      values: Vector[JVal], what: String): Array[Byte] = {
    val count = values.length
    val isObj = keys.isDefined
    val keyBytes = keys.getOrElse(Vector.empty).map(_.getBytes("UTF-8"))
    keyBytes.foreach(k => require(k.length <= 0xffff,
      s"$what: JSON object key over 65535 bytes"))
    val encoded = values.map(encodeValue(_, what))
    val headerLen = 4 + (if (isObj) count * 4 else 0) + count * 3
    // lay out keys then out-of-line values after the entry tables
    var off = headerLen
    val keyOffs = keyBytes.map { k => val o = off; off += k.length; o }
    def inline(t: Int, body: Array[Byte]): Option[Int] = t match {
      case 0x04 => Some(body(0) & 0xff)
      case 0x05 | 0x06 => Some((body(0) & 0xff) | ((body(1) & 0xff) << 8))
      case _ => None
    }
    val valOffs = encoded.map { case (t, body) =>
      inline(t, body) match {
        case Some(_) => -1
        case None => val o = off; off += body.length; o
      }
    }
    val size = off
    require(size <= 0xffff && count <= 0xffff,
      s"$what: JSON container needs the LARGE form ($size bytes, " +
        s"$count elements) — this renderer writes SMALL documents " +
        "only; split the value")
    val b = new java.io.ByteArrayOutputStream(size)
    def w16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    w16(count); w16(size)
    keyOffs.zip(keyBytes).foreach { case (o, k) => w16(o); w16(k.length) }
    encoded.zip(valOffs).foreach { case ((t, body), o) =>
      b.write(t)
      inline(t, body) match {
        case Some(v) => w16(v)
        case None => w16(o)
      }
    }
    keyBytes.foreach(b.write)
    encoded.zip(valOffs).foreach { case ((_, body), o) =>
      if (o >= 0) b.write(body)
    }
    b.toByteArray
  }
}
