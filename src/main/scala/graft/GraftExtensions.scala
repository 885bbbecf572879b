package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.dialect.TrinoFunctions

/** Spark-standard extension installer: lets any deployment get the
  * Trino dialect shims and graft's native expressions without calling
  * Engine — e.g.
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *
  * The Engine path registers the same functions directly on its own
  * session; this is the integration point for sessions graft does not
  * build itself (notebooks, Spark Connect servers, other apps).
  * No analyzer/optimizer rules are injected — SURVEY.md §4: built-in
  * Catalyst covers the whole promised surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    (TrinoFunctions.shims ++ TrinoFunctions.graftNatives).foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
}
