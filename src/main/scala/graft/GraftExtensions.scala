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
  * One resolution rule is injected ([[graft.dialect.TimeCastRule]]:
  * Trino's `CAST(timestamp AS TIME)`, which Spark's own cast lacks);
  * otherwise built-in Catalyst covers the whole promised surface
  * (SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (TrinoFunctions.shims ++ TrinoFunctions.graftNatives).foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
    ext.injectResolutionRule(_ => graft.dialect.TimeCastRule)
    // Standard empty-input ROLLUP/CUBE semantics (Trino/ANSI: the ()
    // grouping set emits one row over empty input; Spark emits none).
    ext.injectPostHocResolutionRule(_ => graft.dialect.EmptyGroupingSetsRule)
  }
}
