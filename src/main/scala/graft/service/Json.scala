package graft.service

import scala.collection.immutable.ListMap

/** Minimal JSON reader/writer (zero-dependency build; the reference
  * leans on Go's encoding/json, reference internal/mcp/handlers.go:83).
  *
  * Writer handles the values Spark rows surface: null, Boolean, numbers
  * (incl. BigDecimal), String, java.sql Timestamp/Date, byte arrays
  * (hex), Seq, Map, and org.apache.spark.sql.Row (emitted as an object
  * in schema order — deterministic, an improvement over Go's unordered
  * map keys noted in SURVEY.md §1).
  *
  * Parser is a small recursive-descent JSON reader for the MCP stdio
  * server's JSON-RPC frames. Objects preserve insertion order.
  */
object Json {

  // ---------- writer ----------

  def write(v: Any, indent: Int = 0): String = {
    val sb = new StringBuilder
    writeValue(v, sb, indent, 0)
    sb.toString
  }

  private def writeValue(v: Any, sb: StringBuilder, indent: Int, depth: Int): Unit = v match {
    case null => sb.append("null")
    case None => sb.append("null")
    case Some(x) => writeValue(x, sb, indent, depth)
    case b: Boolean => sb.append(b.toString)
    case s: String => writeString(s, sb)
    case d: Double =>
      if (d.isNaN || d.isInfinite) writeString(d.toString, sb) else sb.append(d.toString)
    case f: Float => writeValue(f.toDouble, sb, indent, depth)
    case n: (Byte @unchecked) if v.isInstanceOf[Byte] => sb.append(n.toString)
    case n: Short => sb.append(n.toString)
    case n: Int => sb.append(n.toString)
    case n: Long => sb.append(n.toString)
    case n: java.math.BigDecimal => sb.append(n.toPlainString)
    case n: BigDecimal => sb.append(n.bigDecimal.toPlainString)
    case t: java.sql.Timestamp => writeString(t.toString, sb)
    case d: java.sql.Date => writeString(d.toString, sb)
    case i: java.time.Instant => writeString(i.toString, sb)
    case d: java.time.LocalDate => writeString(d.toString, sb)
    case d: java.time.LocalDateTime => writeString(d.toString, sb)
    case t: java.time.LocalTime => writeString(t.toString, sb)
    case b: Array[Byte] => writeString(b.map(x => f"$x%02x").mkString, sb)
    case r: org.apache.spark.sql.Row =>
      val names = if (r.schema != null) r.schema.fieldNames else (0 until r.length).map(_.toString).toArray
      writeObject(names.zip(r.toSeq), sb, indent, depth)
    case m: collection.Map[_, _] =>
      writeObject(m.toSeq.map { case (k, x) => (String.valueOf(k), x) }, sb, indent, depth)
    case s: Iterable[_] => writeArray(s, sb, indent, depth)
    case a: Array[_] => writeArray(a.toSeq, sb, indent, depth)
    case other => writeString(String.valueOf(other), sb)
  }

  private def pad(sb: StringBuilder, indent: Int, depth: Int): Unit =
    if (indent > 0) { sb.append('\n'); sb.append(" " * (indent * depth)) }

  private def writeArray(items: Iterable[Any], sb: StringBuilder, indent: Int, depth: Int): Unit = {
    if (items.isEmpty) { sb.append("[]"); return }
    sb.append('[')
    var first = true
    items.foreach { x =>
      if (!first) sb.append(',')
      first = false
      pad(sb, indent, depth + 1)
      writeValue(x, sb, indent, depth + 1)
    }
    pad(sb, indent, depth)
    sb.append(']')
  }

  private def writeObject(fields: Seq[(String, Any)], sb: StringBuilder, indent: Int, depth: Int): Unit = {
    if (fields.isEmpty) { sb.append("{}"); return }
    sb.append('{')
    var first = true
    fields.foreach { case (k, x) =>
      if (!first) sb.append(',')
      first = false
      pad(sb, indent, depth + 1)
      writeString(k, sb)
      sb.append(if (indent > 0) ": " else ":")
      writeValue(x, sb, indent, depth + 1)
    }
    pad(sb, indent, depth)
    sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ---------- parser ----------

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length

    def skipWs(): Unit =
      while (!eof && (s(pos) == ' ' || s(pos) == '\t' || s(pos) == '\n' || s(pos) == '\r')) pos += 1

    def parseValue(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => expect("true"); true
        case 'f' => expect("false"); false
        case 'n' => expect("null"); null
        case _ => parseNumber()
      }
    }

    private def expect(lit: String): Unit = {
      require(s.startsWith(lit, pos), s"expected $lit at $pos")
      pos += lit.length
    }

    private def parseObject(): ListMap[String, Any] = {
      pos += 1 // {
      var m = ListMap.empty[String, Any]
      skipWs()
      if (!eof && s(pos) == '}') { pos += 1; return m }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs()
        require(!eof && s(pos) == ':', s"expected : at $pos")
        pos += 1
        m = m.updated(k, parseValue())
        skipWs()
        require(!eof, "unexpected end in object")
        if (s(pos) == ',') pos += 1
        else if (s(pos) == '}') { pos += 1; return m }
        else throw new IllegalArgumentException(s"expected , or }} at $pos")
      }
      m
    }

    private def parseArray(): Vector[Any] = {
      pos += 1 // [
      var out = Vector.empty[Any]
      skipWs()
      if (!eof && s(pos) == ']') { pos += 1; return out }
      while (true) {
        out = out :+ parseValue()
        skipWs()
        require(!eof, "unexpected end in array")
        if (s(pos) == ',') pos += 1
        else if (s(pos) == ']') { pos += 1; return out }
        else throw new IllegalArgumentException(s"expected , or ] at $pos")
      }
      out
    }

    private def parseString(): String = {
      require(!eof && s(pos) == '"', s"expected string at $pos")
      pos += 1
      val sb = new StringBuilder
      while (!eof && s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          require(!eof, "unexpected end in escape")
          s(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              val hex = s.substring(pos + 1, pos + 5)
              sb.append(Integer.parseInt(hex, 16).toChar)
              pos += 4
            case c => throw new IllegalArgumentException(s"bad escape \\$c")
          }
          pos += 1
        } else {
          sb.append(s(pos))
          pos += 1
        }
      }
      require(!eof, "unterminated string")
      pos += 1
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      if (!eof && (s(pos) == '-' || s(pos) == '+')) pos += 1
      while (!eof && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' || s(pos) == 'E' ||
        s(pos) == '-' || s(pos) == '+')) pos += 1
      val raw = s.substring(start, pos)
      if (raw.contains('.') || raw.contains('e') || raw.contains('E')) raw.toDouble
      else raw.toLongOption.getOrElse(raw.toDouble)
    }
  }
}
