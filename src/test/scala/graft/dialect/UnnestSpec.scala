package graft.dialect

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine
import graft.service.QueryService

/** Trino's relational `UNNEST` → LATERAL VIEW rewrite
  * (TrinoFunctions.rewriteUnnest): join forms, the comma form, the
  * FROM-position table function, WITH ORDINALITY, zipped arrays, maps,
  * LEFT JOIN null-preservation, and the loud unsupported combinations. */
class UnnestSpec extends SparkSpec {

  private lazy val qs = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    new QueryService(new Engine(cfg, Some("/root/testdata/sf0.001"),
      existing = Some(spark)))
  }
  private def rows(sql: String): Seq[Seq[Any]] =
    qs.execute(sql).fold(e => fail(s"$sql -> $e"), _.rows.map(_.toSeq))

  test("CROSS JOIN UNNEST explodes an array per row") {
    val out = rows(
      """SELECT n_nationkey, x
        |FROM nation CROSS JOIN UNNEST(sequence(1, 2)) AS t(x)
        |WHERE n_nationkey < 2
        |ORDER BY n_nationkey, x""".stripMargin)
    assert(out == Seq(Seq(0L, 1L), Seq(0L, 2L), Seq(1L, 1L), Seq(1L, 2L)))
  }

  test("comma-join and FROM-position UNNEST forms") {
    val comma = rows(
      """SELECT n_nationkey, x
        |FROM nation, UNNEST(sequence(1, n_nationkey % 2 + 1)) AS t(x)
        |WHERE n_nationkey < 2
        |ORDER BY n_nationkey, x""".stripMargin)
    assert(comma == Seq(Seq(0L, 1L), Seq(1L, 1L), Seq(1L, 2L)))
    val standalone = rows(
      "SELECT x FROM UNNEST(sequence(3, 5)) AS t(x) ORDER BY x")
    assert(standalone == Seq(Seq(3L), Seq(4L), Seq(5L)))
  }

  test("WITH ORDINALITY is 1-based and positionally aliased") {
    val out = rows(
      """SELECT x, ord
        |FROM UNNEST(array('a', 'b', 'c')) WITH ORDINALITY AS t(x, ord)
        |ORDER BY ord""".stripMargin)
    assert(out == Seq(Seq("a", 1L), Seq("b", 2L), Seq("c", 3L)))
  }

  test("map WITH ORDINALITY yields (key, value, ordinal)") {
    val out = rows(
      """SELECT k, v, ord
        |FROM UNNEST(map('a', 1, 'b', 2)) WITH ORDINALITY AS t(k, v, ord)
        |ORDER BY ord""".stripMargin)
    assert(out == Seq(Seq("a", 1, 1L), Seq("b", 2, 2L)))
  }

  test("zipped arrays WITH ORDINALITY: ordinal spans the longest array") {
    val out = rows(
      """SELECT a, b, ord
        |FROM UNNEST(array(1, 2, 3), array('x', 'y')) WITH ORDINALITY
        |  AS t(a, b, ord)
        |ORDER BY ord""".stripMargin)
    assert(out == Seq(Seq(1, "x", 1L), Seq(2, "y", 2L), Seq(3, null, 3L)))
    // all-empty arrays → zero rows, never a descending sequence()
    val empty = rows(
      """SELECT a, b, ord
        |FROM UNNEST(CAST(array() AS ARRAY<INT>), CAST(NULL AS ARRAY<STRING>))
        |  WITH ORDINALITY AS t(a, b, ord)""".stripMargin)
    assert(empty.isEmpty)
  }

  test("multiple arrays zip (NULL-padded to the longest, as in Trino)") {
    val out = rows(
      """SELECT a, b
        |FROM UNNEST(array(1, 2, 3), array('x', 'y')) AS t(a, b)
        |ORDER BY a""".stripMargin)
    assert(out == Seq(Seq(1, "x"), Seq(2, "y"), Seq(3, null)))
  }

  test("UNNEST of a map yields key/value columns") {
    val out = rows(
      """SELECT k, v
        |FROM UNNEST(map('a', 1, 'b', 2)) AS t(k, v)
        |ORDER BY k""".stripMargin)
    assert(out == Seq(Seq("a", 1), Seq("b", 2)))
  }

  test("LEFT JOIN UNNEST ON TRUE keeps rows with null/empty arrays") {
    val out = rows(
      """SELECT n_nationkey, x
        |FROM nation
        |LEFT JOIN UNNEST(
        |  CASE WHEN n_nationkey % 2 = 0 THEN CAST(NULL AS ARRAY<INT>)
        |       ELSE array(10, 20) END) AS t(x) ON TRUE
        |WHERE n_nationkey < 2
        |ORDER BY n_nationkey, x""".stripMargin)
    assert(out == Seq(Seq(0L, null), Seq(1L, 10), Seq(1L, 20)))
  }

  test("unsupported combinations fail loudly; literals stay untouched") {
    val e1 = qs.execute(
      """SELECT a, b FROM UNNEST(array(1), array(2))
        |WITH ORDINALITY AS t(a, b)""".stripMargin)
    assert(e1.isLeft && e1.left.exists(_.toString.contains("ORDINALITY")))
    val e2 = qs.execute(
      "SELECT x FROM nation CROSS JOIN UNNEST(sequence(1, 2)) t2")
    assert(e2.isLeft && e2.left.exists(_.toString.contains("alias")))
    val e3 = qs.execute(
      "SELECT x FROM nation LEFT JOIN UNNEST(sequence(1, 2)) AS t(x)")
    assert(e3.isLeft && e3.left.exists(_.toString.contains("ON TRUE")))
    // 'CROSS JOIN UNNEST(' inside a string literal is data
    val lit = rows("SELECT ' CROSS JOIN UNNEST(x) AS t(c)' AS s")
    assert(lit.head.head.toString.contains("UNNEST"))
  }
}
