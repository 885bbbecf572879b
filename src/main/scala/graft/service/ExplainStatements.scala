package graft.service

/** Statement-form EXPLAIN parsing for execute_query.
  *
  * The reference passes `explain` statements through to Trino
  * (`/root/reference/internal/trino/client.go:288`), whose dialect has
  * two forms Spark's parser rejects outright:
  *
  *   EXPLAIN (TYPE LOGICAL|DISTRIBUTED|VALIDATE|IO [, FORMAT TEXT]) q
  *   EXPLAIN ANALYZE [VERBOSE] q
  *
  * The TYPE form maps onto the same renderer the explain_query tool
  * uses ([[ExplainService]]); ANALYZE executes the query (under the
  * standard guard/timeout path) and renders the finalized-at-runtime
  * adaptive plan plus a runtime summary — the information content of
  * Trino's fragment-annotated output, in Spark's plan vocabulary.
  *
  * Spark's own EXPLAIN spellings (EXTENDED / FORMATTED / CODEGEN /
  * COST) are deliberately NOT matched: they keep flowing to
  * `spark.sql` unchanged so Spark-dialect clients lose nothing.
  */
object ExplainStatements {
  sealed trait Form
  final case class Typed(tpe: String, format: String, inner: String) extends Form
  final case class Analyze(verbose: Boolean, inner: String) extends Form
  final case class Plain(inner: String) extends Form

  private val TypedRe = "(?is)^\\s*EXPLAIN\\s*\\(([^)]*)\\)\\s*(.+)$".r
  private val AnalyzeRe = "(?is)^\\s*EXPLAIN\\s+ANALYZE\\s+(VERBOSE\\s+)?(.+)$".r
  private val PlainRe = "(?is)^\\s*EXPLAIN\\s+(.+)$".r
  // Spark's native explain modes — leave those statements untouched.
  private val SparkModes = Set("EXTENDED", "FORMATTED", "CODEGEN", "COST")

  /** Returns Some(Left(error)) for a recognized-but-invalid option
    * list, Some(Right(form)) for a served form, None to pass through. */
  def matchStatement(sql: String): Option[Either[String, Form]] = sql match {
    case TypedRe(opts, inner) =>
      var tpe = "DISTRIBUTED"
      var fmt = "TEXT"
      for (opt <- opts.split(",").map(_.trim).filter(_.nonEmpty)) {
        opt.split("\\s+").map(_.trim) match {
          case Array(k, v) if k.equalsIgnoreCase("TYPE") => tpe = v.toUpperCase
          case Array(k, v) if k.equalsIgnoreCase("FORMAT") => fmt = v.toUpperCase
          case _ => return Some(Left(s"""invalid EXPLAIN option: "$opt" (expected TYPE <t> or FORMAT <f>)"""))
        }
      }
      if (fmt != "TEXT")
        return Some(Left(s"""EXPLAIN FORMAT $fmt is not supported by this engine (only TEXT); """ +
          "GRAPHVIZ/JSON renderings are Trino-internal shapes"))
      if (!Set("LOGICAL", "DISTRIBUTED", "VALIDATE", "IO")(tpe))
        return Some(Left(s"""invalid EXPLAIN format: "$tpe" (allowed: LOGICAL, DISTRIBUTED, VALIDATE, IO)"""))
      Some(Right(Typed(tpe, fmt, inner.trim)))
    case AnalyzeRe(verbose, inner) =>
      Some(Right(Analyze(verbose != null, inner.trim)))
    case PlainRe(rest) =>
      val firstWord = rest.trim.split("\\s+", 2).head.toUpperCase
      if (SparkModes(firstWord)) None // Spark-dialect explain — pass through
      else Some(Right(Plain(rest.trim)))
    case _ => None
  }

  /** Render an executed query's final adaptive plan + runtime summary
    * (the ANALYZE payload). */
  def renderAnalyzed(df: org.apache.spark.sql.DataFrame, rows: Long,
      wallMillis: Long, verbose: Boolean): String = {
    val executed = df.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val metrics =
      if (!verbose) ""
      else {
        // Plain TreeNode traversal stops at QueryStageExec (its plan is
        // an innerChild, not a child) — walk through stages manually so
        // the populated per-operator accumulators are reachable.
        def nodes(p: org.apache.spark.sql.execution.SparkPlan):
            Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a +: nodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: nodes(q.plan)
          case other => other +: other.children.flatMap(nodes)
        }
        val lines = nodes(finalPlan).flatMap { node =>
          val ms = node.metrics.toSeq.sortBy(_._1)
            .filter(_._2.value > 0)
            .map { case (k, m) => s"$k=${m.value}" }
          if (ms.isEmpty) None else Some(s"${node.nodeName}: ${ms.mkString(", ")}")
        }
        if (lines.isEmpty) "" else lines.mkString("\n\nOperator metrics:\n", "\n", "")
      }
    s"Query Plan (executed, adaptive-final):\n${finalPlan.treeString}" +
      s"\nRuntime: ${wallMillis} ms, $rows output rows$metrics"
  }
}
