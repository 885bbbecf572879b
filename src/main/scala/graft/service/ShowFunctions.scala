package graft.service

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

import graft.dialect.FunctionCatalog
import graft.engine.Engine

/** `SHOW FUNCTIONS [LIKE 'pattern']` — the discovery statement a Trino
  * client runs first against a 200-name dialect surface. The reference
  * serves it by pass-through (allowed `show` prefix,
  * `internal/trino/client.go:287`); Spark's own SHOW FUNCTIONS lists
  * Spark names in a one-column shape, so this engine serves the
  * dialect surface from [[FunctionCatalog]] in Trino's six-column
  * shape: function_name, return_type, argument_types, function_type,
  * deterministic, description — one row per callable overload, ordered
  * by (function_name, argument_types) like Trino's output.
  *
  * Spark's builtin functions remain callable too (the dialect layer
  * only overrides divergent names); `DIALECT.md` documents that split.
  */
object ShowFunctions {

  private val Pat =
    """(?is)^\s*SHOW\s+FUNCTIONS(?:\s+LIKE\s+'([^']*)')?\s*$""".r

  /** Some(pattern Option) when the SQL is SHOW FUNCTIONS [LIKE '...'];
    * the pattern uses SQL LIKE wildcards (% and _) on function_name. */
  def matchFunctions(sql: String): Option[Option[String]] = sql match {
    case Pat(p) => Some(Option(p))
    case _ => None
  }

  def functions(engine: Engine, like: Option[String] = None): DataFrame = {
    val all = FunctionCatalog.entries
      .sortBy(e => (e.name, e.argumentTypes))
      .map(e => Row(e.name, e.returnType, e.argumentTypes, e.functionType,
        e.deterministic, e.description))
    val filtered = like match {
      case Some(p) =>
        val rx = p.flatMap {
          case '%' => ".*"
          case '_' => "."
          case c => java.util.regex.Pattern.quote(c.toString)
        }
        all.filter(_.getString(0).matches(rx))
      case None => all
    }
    val schema = StructType(Seq(
      StructField("function_name", StringType),
      StructField("return_type", StringType),
      StructField("argument_types", StringType),
      StructField("function_type", StringType),
      StructField("deterministic", BooleanType),
      StructField("description", StringType)))
    engine.spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(filtered).asJava), schema)
  }
}
