package graft.service

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine

/** Trino's prepared-statement surface through execute_query:
  * PREPARE / EXECUTE [USING] / EXECUTE IMMEDIATE / DEALLOCATE PREPARE /
  * DESCRIBE INPUT / DESCRIBE OUTPUT (reference pass-through — any
  * Trino client can issue these; session state is the engine). */
class PreparedStatementsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def qs(env: Map[String, String] = Map.empty): QueryService =
    new QueryService(new Engine(EngineConfig.fromEnv(env).toOption.get,
      Some(dir), Some(spark)))

  test("PREPARE / EXECUTE round-trip with positional parameters") {
    val s = qs()
    val p = s.execute(
      "PREPARE q1 FROM SELECT n_name FROM nation WHERE n_nationkey = ? ORDER BY n_name")
    assert(p.toOption.get.columns == Seq("Result"))
    assert(p.toOption.get.rows == Seq(Seq("PREPARE")))
    val r = s.execute("EXECUTE q1 USING 3").toOption.get
    assert(r.columns == Seq("n_name") && r.rows.size == 1)
    // parameterless prepared statement
    assert(s.execute("PREPARE q2 FROM SELECT COUNT(*) AS n FROM region").isRight)
    assert(s.execute("EXECUTE q2").toOption.get
      .rows.head.head.toString == "5")
    // expressions as arguments (text-substituted with parens)
    assert(s.execute("EXECUTE q1 USING 1 + 2").toOption.get.rows ==
      s.execute("EXECUTE q1 USING 3").toOption.get.rows)
  }

  test("EXECUTE errors: unknown name, parameter-count mismatch") {
    val s = qs()
    assert(s.execute("EXECUTE nope") == Left("Prepared statement not found: nope"))
    s.execute("PREPARE q3 FROM SELECT ? AS a, ? AS b")
    assert(s.execute("EXECUTE q3 USING 1") ==
      Left("Incorrect number of parameters: expected 2 but found 1"))
    assert(s.execute("EXECUTE q3 USING 1, 2, 3") ==
      Left("Incorrect number of parameters: expected 2 but found 3"))
    val ok = s.execute("EXECUTE q3 USING 1, 'x, y'").toOption.get
    assert(ok.rows == Seq(Seq(1, "x, y"))) // comma inside quotes is data
  }

  test("a ? inside a string literal is data, not a parameter") {
    val s = qs()
    s.execute("PREPARE q4 FROM SELECT '?' AS lit, ? AS p")
    val r = s.execute("EXECUTE q4 USING 7").toOption.get
    assert(r.rows == Seq(Seq("?", 7)))
  }

  test("EXECUTE applies the read-only guard to the inner statement") {
    val s = qs()
    // prepares fine (text only), denied at EXECUTE — Trino's analyzer
    // rejects there too
    assert(s.execute("PREPARE w1 FROM DROP TABLE region").isRight)
    val r = s.execute("EXECUTE w1")
    assert(r.isLeft && r.swap.toOption.get.contains("security restriction"), r)
    // and the opt-in allowlist gate applies through EXECUTE as well
    val gated = qs(Map(
      "GRAFT_ENFORCE_SQL_ALLOWLISTS" -> "true",
      "TRINO_ALLOWED_TABLES" -> "spark_catalog.default.region"))
    gated.execute("PREPARE g1 FROM SELECT COUNT(*) AS n FROM customer")
    assert(gated.execute("EXECUTE g1") ==
      Left("table access denied: spark_catalog.default.customer not in allowlist"))
  }

  test("EXECUTE IMMEDIATE runs a quoted statement with '' unescaping") {
    val s = qs()
    val r = s.execute(
      "EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM region WHERE r_name <> ''nope'''")
    assert(r.toOption.get.rows.head.head.toString == "5", r)
    assert(s.execute("EXECUTE IMMEDIATE SELECT 1").isLeft) // must be quoted
  }

  test("DEALLOCATE PREPARE removes; re-PREPARE replaces") {
    val s = qs()
    s.execute("PREPARE q5 FROM SELECT 1 AS a")
    assert(s.execute("DEALLOCATE PREPARE q5").toOption.get.rows ==
      Seq(Seq("DEALLOCATE")))
    assert(s.execute("EXECUTE q5") == Left("Prepared statement not found: q5"))
    assert(s.execute("DEALLOCATE PREPARE q5") ==
      Left("Prepared statement not found: q5"))
    s.execute("PREPARE q6 FROM SELECT 1 AS a")
    s.execute("PREPARE q6 FROM SELECT 2 AS a")
    assert(s.execute("EXECUTE q6").toOption.get.rows == Seq(Seq(2)))
  }

  test("DESCRIBE INPUT / DESCRIBE OUTPUT") {
    val s = qs()
    s.execute("PREPARE q7 FROM SELECT n_name FROM nation " +
      "WHERE n_nationkey = ? AND n_regionkey = ?")
    val in = s.execute("DESCRIBE INPUT q7").toOption.get
    assert(in.columns == Seq("Position", "Type"))
    assert(in.rows == Seq(Seq(1, "unknown"), Seq(2, "unknown")))
    val out = s.execute("DESCRIBE OUTPUT q7").toOption.get
    assert(out.columns == Seq("Column Name", "Catalog", "Schema", "Table",
      "Type", "Type Size", "Aliased"))
    assert(out.rows.map(r => (r.head, r(4))) == Seq(("n_name", "varchar")))
    // analysis only — a prepared write is denied before analysis
    s.execute("PREPARE w2 FROM DELETE FROM region")
    assert(s.execute("DESCRIBE OUTPUT w2").isLeft)
  }

  test("nested prepared-statement bodies are rejected at PREPARE") {
    val s = qs()
    val r = s.execute("PREPARE loop FROM EXECUTE loop")
    assert(r.isLeft && r.swap.toOption.get.contains("invalid statement"), r)
  }
}
