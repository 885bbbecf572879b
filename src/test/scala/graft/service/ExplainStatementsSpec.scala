package graft.service

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine

/** Statement-form EXPLAIN through execute_query: Trino's (TYPE ...)
  * options and EXPLAIN ANALYZE, which Spark's parser rejects — the
  * reference serves both by pass-through (client.go:288). */
class ExplainStatementsSpec extends SparkSpec {

  private lazy val qs = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    new QueryService(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)))
  }

  private def run(sql: String) =
    qs.execute(sql).fold(err => throw new AssertionError(s"$sql -> $err"), identity)

  test("EXPLAIN (TYPE LOGICAL) returns the optimized logical plan in Query Plan shape") {
    val r = run("EXPLAIN (TYPE LOGICAL) SELECT COUNT(*) AS c FROM region")
    assert(r.columns == Seq("Query Plan"))
    assert(r.rows.head.head.asInstanceOf[String].contains("Aggregate"))
  }

  test("EXPLAIN (TYPE IO) reports scan locations and read schema") {
    val text = run("EXPLAIN (TYPE IO) SELECT r_name FROM region").rows.head.head.asInstanceOf[String]
    assert(text.contains("Location") && text.contains("ReadSchema"), text)
  }

  test("EXPLAIN (TYPE IO) covers V2 scans (tpch.tiny) with pruned columns") {
    val text = run("EXPLAIN (TYPE IO) SELECT name FROM tpch.tiny.nation")
      .rows.head.head.asInstanceOf[String]
    assert(text.contains("TpchTiny(table=nation"), text)
    assert(text.contains("columns=[name]"), text)
    assert(text.contains("ReadSchema"), text)
  }

  test("EXPLAIN (TYPE VALIDATE) analyzes only") {
    val r = run("EXPLAIN (TYPE VALIDATE) SELECT r_name FROM region")
    assert(r.columns == Seq("Valid") && r.rows == Seq(Seq(true)))
  }

  test("plain EXPLAIN is served in Trino's Query Plan shape") {
    val r = run("EXPLAIN SELECT r_regionkey FROM region WHERE r_regionkey > 1")
    assert(r.columns == Seq("Query Plan"))
    assert(r.rows.head.head.asInstanceOf[String].contains("Physical Plan"))
  }

  test("Spark-mode spellings still pass through to spark.sql") {
    val r = run("EXPLAIN EXTENDED SELECT 1")
    assert(r.columns == Seq("plan")) // Spark's own shape, untouched
  }

  test("EXPLAIN ANALYZE executes and renders the adaptive-final plan with runtime") {
    val text = run("EXPLAIN ANALYZE SELECT r_name, COUNT(*) AS c FROM region GROUP BY r_name")
      .rows.head.head.asInstanceOf[String]
    assert(text.contains("Query Plan (executed"), text)
    assert(text.contains("Runtime:") && text.contains("5 output rows"), text)
  }

  test("EXPLAIN ANALYZE VERBOSE appends per-operator metrics") {
    val text = run("EXPLAIN ANALYZE VERBOSE SELECT COUNT(*) AS c FROM nation")
      .rows.head.head.asInstanceOf[String]
    assert(text.contains("Operator metrics:"), text)
    assert(text.contains("output rows"), text)
  }

  test("invalid option lists and non-TEXT formats reject with clear errors") {
    assert(qs.execute("EXPLAIN (TYPE BOGUS) SELECT 1").left.exists(_.contains("invalid EXPLAIN format")))
    assert(qs.execute("EXPLAIN (FORMAT JSON) SELECT 1").left.exists(_.contains("only TEXT")))
    assert(qs.execute("EXPLAIN (WIBBLE 2) SELECT 1").left.exists(_.contains("invalid EXPLAIN option")))
  }

  test("EXPLAIN rides the type-aware ambiguity retries too") {
    // row-splat UNNEST: the explode reading fails analysis; the retry
    // explains the inline plan instead of surfacing the error
    val t1 = run(
      """EXPLAIN SELECT u.x, u.y
        |FROM (SELECT array(CAST(ROW(1, 2) AS ROW(a int, b int))) AS arr) t
        |CROSS JOIN UNNEST(t.arr) AS u(x, y)""".stripMargin)
      .rows.head.head.asInstanceOf[String]
    assert(t1.toLowerCase.contains("generate"), t1)
    // unprojected WITH TIES key: the in-block rank plan explains
    val t2 = run(
      "EXPLAIN SELECT n_name FROM nation ORDER BY n_regionkey " +
        "FETCH FIRST 2 ROWS WITH TIES").rows.head.head.asInstanceOf[String]
    assert(t2.contains("Window"), t2)
  }

  test("statement wrappers survive the whole fuzz grammar") {
    // 25 seeded fuzz statements (the same generator the differential
    // corpus certifies) pushed through every statement wrapper — the
    // wrappers must parse/serve ANY guardable SELECT, not just the
    // hand-written spec cases. EXPLAIN ANALYZE executes for real, so
    // keep its sample smaller.
    val sqls = (0 until 25).map(i => graft.tools.FuzzDump.genQuery(424200L + i))
    sqls.foreach { q =>
      val lp = run(s"EXPLAIN (TYPE LOGICAL) $q")
      assert(lp.columns == Seq("Query Plan") && lp.rows.nonEmpty, q)
      assert(run(s"EXPLAIN (TYPE VALIDATE) $q").rows.nonEmpty, q)
      val st = run(s"SHOW STATS FOR ($q)")
      assert(st.columns.head == "column_name" && st.rows.nonEmpty, q)
    }
    sqls.take(5).foreach { q =>
      val an = run(s"EXPLAIN ANALYZE $q")
      assert(an.rows.head.head.asInstanceOf[String].contains("Query Plan"), q)
    }
  }

  test("EXPLAIN ANALYZE still refuses write statements via the guard") {
    val r = qs.execute("EXPLAIN ANALYZE DELETE FROM region")
    assert(r.isLeft && r.left.exists(_.contains("security restriction")), r)
  }
}
