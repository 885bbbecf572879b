package graft.service

import graft.engine.Engine

/** `SET SESSION name = value` / `RESET SESSION name` — Trino's session
  * property surface (pass-through in the reference; the Go driver
  * carries them as X-Trino-Session headers). The embedded analog: two
  * LIVE per-engine properties back the same knobs `SHOW SESSION`
  * displays —
  *   - `query_timeout_seconds`: the per-query deadline
  *     `withTimeoutAndCancel` enforces,
  *   - `max_result_rows`: the collect row cap.
  * Security-relevant config (`allow_write_queries`,
  * `enforce_sql_allowlists`) is deployment config, not session state —
  * SET SESSION on those is rejected (a session must not be able to
  * disarm the read-only guard). `catalog`/`schema` change via USE, as
  * in Trino. Unknown names get Trino's exact error text.
  *
  * Transaction statements (`START TRANSACTION` / `COMMIT` /
  * `ROLLBACK`) are accepted as no-ops with Trino's result shapes: the
  * engine is read-only and single-statement — every query is trivially
  * its own transaction — and BI clients issue these unconditionally.
  */
object SessionProps {

  private val SetRe =
    """(?is)^\s*SET\s+SESSION\s+([A-Za-z_][\w.]*)\s*=\s*(.+?)\s*$""".r
  private val ResetRe =
    """(?is)^\s*RESET\s+SESSION\s+([A-Za-z_][\w.]*)\s*$""".r
  private val StartTxRe =
    """(?is)^\s*START\s+TRANSACTION(\s+.*)?$""".r
  private val CommitRe = """(?is)^\s*COMMIT(\s+WORK)?\s*$""".r
  private val RollbackRe = """(?is)^\s*ROLLBACK(\s+WORK)?\s*$""".r

  sealed trait Stmt
  final case class SetProp(name: String, value: String) extends Stmt
  final case class ResetProp(name: String) extends Stmt
  case object StartTransaction extends Stmt
  case object Commit extends Stmt
  case object Rollback extends Stmt

  def matchStatement(sql: String): Option[Stmt] = sql match {
    case SetRe(n, v) => Some(SetProp(n, v))
    case ResetRe(n) => Some(ResetProp(n))
    case StartTxRe(_) => Some(StartTransaction)
    case CommitRe(_) => Some(Commit)
    case RollbackRe(_) => Some(Rollback)
    case _ => None
  }

  /** Property names SHOW SESSION lists but that are NOT session-settable
    * here (deployment/security config, or USE's job). */
  private val fixed = Set("allow_write_queries", "enforce_sql_allowlists",
    "catalog", "schema")

  def set(engine: Engine, name: String, value: String): Either[String, Unit] =
    name.toLowerCase match {
      case "query_timeout_seconds" =>
        parsePositiveInt(name, value).map(engine.sessionQueryTimeoutSeconds = _)
      case "max_result_rows" =>
        parsePositiveInt(name, value).map(engine.sessionMaxResultRows = _)
      case n if fixed(n) =>
        Left(s"Session property '$name' is not settable " +
          "(deployment configuration; catalog/schema change via USE)")
      case _ => Left(s"Session property '$name' does not exist")
    }

  def reset(engine: Engine, name: String): Either[String, Unit] =
    name.toLowerCase match {
      case "query_timeout_seconds" =>
        engine.sessionQueryTimeoutSeconds = engine.config.queryTimeoutSeconds
        Right(())
      case "max_result_rows" =>
        engine.sessionMaxResultRows = engine.config.maxResultRows
        Right(())
      case n if fixed(n) =>
        Left(s"Session property '$name' is not settable " +
          "(deployment configuration; catalog/schema change via USE)")
      case _ => Left(s"Session property '$name' does not exist")
    }

  /** Trino session property values are literals; accept a bare or
    * single-quoted integer here. */
  private def parsePositiveInt(name: String, value: String): Either[String, Int] = {
    val bare = value.trim.stripPrefix("'").stripSuffix("'").trim
    try {
      val v = bare.toInt
      if (v <= 0) Left(s"Invalid value for session property '$name': $value")
      else Right(v)
    } catch {
      case _: NumberFormatException =>
        Left(s"Invalid value for session property '$name': $value")
    }
  }
}
