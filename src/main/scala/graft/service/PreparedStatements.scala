package graft.service

/** Trino's prepared-statement surface: `PREPARE name FROM statement`,
  * `EXECUTE name [USING expr, …]`, `EXECUTE IMMEDIATE 'sql'`,
  * `DEALLOCATE PREPARE name`, `DESCRIBE INPUT/OUTPUT name`.
  *
  * The reference passes these through — any Trino client can issue them
  * via execute_query (session state rides the
  * X-Trino-Prepared-Statement headers the Go driver manages
  * transparently). The embedded analog: statements are stored on the
  * ENGINE (one engine = one logical session, the same scoping as
  * SHOW SESSION's values) and `?` parameters substitute positionally as
  * parenthesized expression TEXT — semantically Trino's bind for the
  * deterministic expressions a read-only engine accepts.
  *
  * Safety: PREPARE only STORES text (never executes); EXECUTE routes
  * the substituted statement back through `QueryService.execute`, so
  * the read-only guard, allowlists, and dialect pipeline all apply to
  * the inner statement exactly as if it were sent directly. A prepared
  * write statement therefore prepares fine and fails at EXECUTE — the
  * same place Trino's analyzer rejects it.
  */
object PreparedStatements {

  private val Name = "[A-Za-z_][A-Za-z0-9_]*"
  private val PrepareRe = s"""(?is)^\\s*PREPARE\\s+($Name)\\s+FROM\\s+(.+)$$""".r
  private val ExecImmRe = """(?is)^\s*EXECUTE\s+IMMEDIATE\s+(.+?)\s*$""".r
  private val ExecUsingRe = s"""(?is)^\\s*EXECUTE\\s+($Name)\\s+USING\\s+(.+)$$""".r
  private val ExecRe = s"""(?is)^\\s*EXECUTE\\s+($Name)\\s*$$""".r
  private val DeallocRe = s"""(?is)^\\s*DEALLOCATE\\s+PREPARE\\s+($Name)\\s*$$""".r
  private val DescInRe = s"""(?is)^\\s*DESCRIBE\\s+INPUT\\s+($Name)\\s*$$""".r
  private val DescOutRe = s"""(?is)^\\s*DESCRIBE\\s+OUTPUT\\s+($Name)\\s*$$""".r

  sealed trait Stmt
  final case class Prepare(name: String, sql: String) extends Stmt
  final case class Execute(name: String, args: Seq[String]) extends Stmt
  final case class ExecuteImmediate(sql: String) extends Stmt
  final case class Deallocate(name: String) extends Stmt
  final case class DescribeInput(name: String) extends Stmt
  final case class DescribeOutput(name: String) extends Stmt

  def matchStatement(sql: String): Option[Either[String, Stmt]] = sql match {
    case PrepareRe(n, body) => Some(Right(Prepare(n, body.trim)))
    case ExecImmRe(lit) => Some(unquote(lit.trim).map(ExecuteImmediate))
    case ExecUsingRe(n, args) => Some(splitArgs(args).map(Execute(n, _)))
    case ExecRe(n) => Some(Right(Execute(n, Nil)))
    case DeallocRe(n) => Some(Right(Deallocate(n)))
    case DescInRe(n) => Some(Right(DescribeInput(n)))
    case DescOutRe(n) => Some(Right(DescribeOutput(n)))
    case _ => None
  }

  /** Positional `?` parameters outside string literals / quoted
    * identifiers / comments (same masking concerns as the read-only
    * sanitizer: a '?' inside 'text' is data, not a parameter). */
  def paramCount(sql: String): Int = scanParams(sql)

  /** Substitute args for the `?` parameters (each wrapped in parens to
    * keep expression precedence). Trino's error text on mismatch. */
  def substitute(sql: String, args: Seq[String]): Either[String, String] = {
    val n = paramCount(sql)
    if (n != args.length)
      Left(s"Incorrect number of parameters: expected $n but found ${args.length}")
    else {
      val out = new StringBuilder
      var idx = 0
      var i = 0
      var state: Char = 'n' // n=normal, q=single-quote, d=double-quote, b=backtick, l=line comment, c=block comment
      while (i < sql.length) {
        val ch = sql.charAt(i)
        state match {
          case 'n' =>
            if (ch == '\'') { state = 'q'; out.append(ch) }
            else if (ch == '"') { state = 'd'; out.append(ch) }
            else if (ch == '`') { state = 'b'; out.append(ch) }
            else if (ch == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
              state = 'l'; out.append(ch) }
            else if (ch == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
              state = 'c'; out.append(ch) }
            else if (ch == '?') { out.append('(').append(args(idx)).append(')'); idx += 1 }
            else out.append(ch)
          case 'q' =>
            out.append(ch)
            if (ch == '\'')
              if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') { out.append('\''); i += 1 }
              else state = 'n'
          case 'd' => out.append(ch); if (ch == '"') state = 'n'
          case 'b' => out.append(ch); if (ch == '`') state = 'n'
          case 'l' => out.append(ch); if (ch == '\n') state = 'n'
          case 'c' =>
            out.append(ch)
            if (ch == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
              out.append('/'); i += 1; state = 'n' }
        }
        i += 1
      }
      Right(out.toString)
    }
  }

  private def scanParams(sql: String): Int = {
    var count = 0
    var i = 0
    var state: Char = 'n'
    while (i < sql.length) {
      val ch = sql.charAt(i)
      state match {
        case 'n' =>
          if (ch == '\'') state = 'q'
          else if (ch == '"') state = 'd'
          else if (ch == '`') state = 'b'
          else if (ch == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') state = 'l'
          else if (ch == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') state = 'c'
          else if (ch == '?') count += 1
        case 'q' =>
          if (ch == '\'')
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 1
            else state = 'n'
        case 'd' => if (ch == '"') state = 'n'
        case 'b' => if (ch == '`') state = 'n'
        case 'l' => if (ch == '\n') state = 'n'
        case 'c' =>
          if (ch == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
            i += 1; state = 'n' }
      }
      i += 1
    }
    count
  }

  /** Top-level comma split of a USING argument list (commas inside
    * parens / quotes belong to the expression). */
  def splitArgs(s: String): Either[String, Seq[String]] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ) {
        cur.append(ch)
        if (ch == '\'')
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inQ = false
      } else ch match {
        case '\'' => inQ = true; cur.append(ch)
        case '(' | '[' => depth += 1; cur.append(ch)
        case ')' | ']' => depth -= 1; cur.append(ch)
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case c => cur.append(c)
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    if (inQ || depth != 0) Left(s"malformed USING argument list: $s")
    else if (out.exists(_.isEmpty)) Left(s"malformed USING argument list: $s")
    else Right(out.toSeq)
  }

  /** `EXECUTE IMMEDIATE` takes a single-quoted SQL literal ('' = '). */
  private def unquote(lit: String): Either[String, String] =
    if (lit.length >= 2 && lit.head == '\'' && lit.last == '\'')
      Right(lit.substring(1, lit.length - 1).replace("''", "'"))
    else Left(s"EXECUTE IMMEDIATE expects a quoted statement, got: $lit")
}
