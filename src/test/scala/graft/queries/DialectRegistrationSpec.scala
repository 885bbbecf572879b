package graft.queries

import graft.SparkSpec

/** Regression net for dialect/registry clashes: Spark 4 routes many
  * Column helpers (e.g. `Column.contains`) through the session's
  * function registry BY NAME, so registering the Trino dialect
  * (TrinoFunctions.register — which overrides names like `contains`,
  * `histogram`, `truncate`, `replace` with Trino semantics) can change
  * what a DataFrame-API query means in that session. The engine's
  * metadata/execute paths register the dialect, and Verify runs every
  * inventory query in one session — so every query must still ANALYZE
  * correctly with the dialect present. This caught dedup_url's
  * `Column.contains` resolving to Trino's array `contains`.
  */
class DialectRegistrationSpec extends SparkSpec {

  test("every inventory query analyzes with the Trino dialect registered") {
    graft.dialect.TrinoFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val errs = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(200)}")
        }
    }
    assert(errs.isEmpty, s"queries broken by dialect registration:\n${errs.mkString("\n")}")
  }
}
