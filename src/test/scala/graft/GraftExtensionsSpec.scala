package graft

import org.apache.spark.sql.SparkSession

import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions gets the dialect + native functions without Engine. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions has the dialect functions") {
    val base = SparkSpec.session // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // builder-level withExtensions: the spark.sql.extensions conf
      // string is only honored when set on the SparkContext at startup
      // (static conf); in-process tests attach the same object directly
      val sess = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(sess ne base) // a genuinely new session over the same context
      assert(sess.sql("SELECT strpos('hello world', 'world')")
        .collect().head.get(0) == 7)
      assert(sess.sql("SELECT sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L))")
        .collect().head.get(0) == 2)
      assert(sess.sql("SELECT dotf(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
        .collect().head.get(0) == 2.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
