package graft.service

import graft.SparkSpec
import graft.config.EngineConfig
import graft.dialect.{FunctionCatalog, TrinoFunctions}
import graft.engine.Engine

/** SHOW FUNCTIONS: Trino's six-column discovery shape over the dialect
  * registry, with the catalog machine-validated against the live
  * implementation (every sample invocation executes; concrete return
  * types must agree with typeof()). */
class ShowFunctionsSpec extends SparkSpec {

  private lazy val qs = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    new QueryService(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)))
  }

  private def run(sql: String) =
    qs.execute(sql).fold(err => throw new AssertionError(s"$sql -> $err"), r => r)

  // The validation frame the catalog's `sample` fields reference:
  // 2 rows of assorted-typed columns plus pre-aggregated sketches.
  private val frame =
    """(SELECT b.*, a.hll, a.qd, a.sd FROM
      |  (SELECT CAST(1 AS BIGINT) i, CAST(0.5 AS DOUBLE) d, 'abc' s,
      |          TIMESTAMP '2024-01-15 10:30:00' ts, DATE '2024-01-15' dt,
      |          array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) darr,
      |          array('a', 'b') sarr, map('a', CAST(1 AS BIGINT)) m,
      |          CAST('ab' AS BINARY) vb,
      |          array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) iarr
      |   UNION ALL
      |   SELECT CAST(2 AS BIGINT), CAST(0.7 AS DOUBLE), 'bcd',
      |          TIMESTAMP '2024-02-15 11:00:00', DATE '2024-02-20',
      |          array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE)),
      |          array('c', 'a'), map('b', CAST(2 AS BIGINT)),
      |          CAST('cd' AS BINARY),
      |          array(CAST(2 AS BIGINT), CAST(3 AS BIGINT))) b
      |  CROSS JOIN
      |  (SELECT approx_set(i2) hll, qdigest_agg(d2) qd, make_set_digest(i2) sd
      |   FROM (SELECT CAST(1 AS BIGINT) i2, CAST(0.5 AS DOUBLE) d2
      |         UNION ALL SELECT CAST(2 AS BIGINT), CAST(0.7 AS DOUBLE))
      |  ) a) frame""".stripMargin

  private val genericTokens = Set("t", "u", "k", "v", "s", "e")
  private def isGeneric(tpe: String): Boolean =
    tpe.split("[^A-Za-z0-9]+").exists(genericTokens)

  test("SHOW FUNCTIONS returns the six Trino columns, sorted, one row per overload") {
    val r = run("SHOW FUNCTIONS")
    assert(r.columns == Seq("function_name", "return_type", "argument_types",
      "function_type", "deterministic", "description"))
    assert(r.rows.length == FunctionCatalog.entries.length)
    val names = r.rows.map(_.head.asInstanceOf[String])
    assert(names == names.sorted, "rows must be ordered by function_name")
    // overload rows: approx_distinct appears once per accepted arity
    assert(names.count(_ == "approx_distinct") == 2)
  }

  test("SHOW FUNCTIONS LIKE filters on function_name with SQL wildcards") {
    val urls = run("SHOW FUNCTIONS LIKE 'url%'").rows
    assert(urls.nonEmpty)
    assert(urls.forall(_.head.asInstanceOf[String].startsWith("url_extract")))
    val one = run("SHOW FUNCTIONS LIKE 'word_ste_'").rows
    assert(one.map(_.head) == Seq("word_stem"))
  }

  test("catalog names are in lockstep with the live registry") {
    val registry = (TrinoFunctions.shims.keySet ++
      TrinoFunctions.graftNatives.keySet) -- TrinoFunctions.internalNames
    val catalog = FunctionCatalog.entries.map(_.name).toSet
    val missing = (registry -- catalog).toSeq.sorted
    val phantom =
      (catalog -- registry -- TrinoFunctions.rewriteOnlyNames).toSeq.sorted
    assert(missing.isEmpty && phantom.isEmpty,
      s"\ncatalog missing registered names: ${missing.mkString(", ")}\n" +
        s"catalog lists unregistered names: ${phantom.mkString(", ")}")
  }

  test("every sample executes; concrete return types match typeof()") {
    val failures = FunctionCatalog.entries.flatMap { e =>
      e.sample.flatMap { call =>
        val sql = s"SELECT typeof($call) AS t FROM $frame"
        // merge()/truncate() trip the ported write-keyword scan — the
        // REFERENCE blocks `SELECT truncate(x)...` the same way
        // (client.go:306-321), so those functions validate through the
        // session directly, below the guard.
        val res = qs.execute(sql) match {
          case Left(err) if err.startsWith("security restriction") =>
            try Right(spark.sql(sql).collect().head.getString(0))
            catch { case t: Throwable => Left(t.getMessage.take(200)) }
          case Left(err) => Left(err)
          case Right(r) => Right(r.rows.head.head.asInstanceOf[String])
        }
        res match {
          case Left(err) => Some(s"${e.name}(${e.argumentTypes}): $err")
          case Right(got) =>
            if (!isGeneric(e.returnType) && got != e.returnType)
              Some(s"${e.name}(${e.argumentTypes}): catalog says " +
                s"${e.returnType}, typeof says $got")
            else None
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
    val sampled = FunctionCatalog.entries.count(_.sample.nonEmpty)
    info(s"$sampled of ${FunctionCatalog.entries.length} rows sample-validated")
  }

  test("function_type and deterministic flags are coherent") {
    val byName = FunctionCatalog.entries.groupBy(_.name)
    assert(byName("random").forall(!_.deterministic))
    assert(FunctionCatalog.entries.filterNot(_.name == "random")
      .forall(_.deterministic))
    Seq("approx_distinct", "map_agg", "histogram", "reduce_agg", "merge")
      .foreach(n => assert(byName(n).forall(_.functionType == "aggregate"), n))
    Seq("strpos", "try", "zip", "url_extract_host")
      .foreach(n => assert(byName(n).forall(_.functionType == "scalar"), n))
  }
}
