package graft.service

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine

/** End-to-end service behavior over the sf0.001 testdata: the
  * execute_query lifecycle (guard → sql → bounded collect), metadata
  * listings with allowlist filtering and Trino type names, and the four
  * EXPLAIN modes (reference behaviors: internal/trino/client.go:501-791).
  */
class ServicesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def engine(env: Map[String, String] = Map.empty): Engine = {
    val cfg = EngineConfig.fromEnv(env).toOption.get
    new Engine(cfg, Some(dir), existing = Some(spark))
  }

  // --- QueryService ---

  test("execute: flagship aggregation runs and returns rows") {
    val qs = new QueryService(engine())
    val r = qs.execute(
      """SELECT r_name, COUNT(*) AS customer_count
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY customer_count DESC, r_name""".stripMargin).toOption.get
    assert(r.columns == Seq("r_name", "customer_count"))
    assert(r.rows.length == 5 && !r.truncated)
  }

  test("execute: TIME values flow through the tool surface to JSON") {
    val r = new QueryService(engine())
      .execute("SELECT TIME'12:34:56' AS t, make_time(1, 2, 3.5) AS mk")
      .toOption.get
    assert(r.rows == Seq(Seq(java.time.LocalTime.of(12, 34, 56),
      java.time.LocalTime.parse("01:02:03.500"))))
    val json = graft.service.Json.write(Map("t" -> r.rows.head.head))
    assert(json.contains("\"12:34:56\""))
  }

  test("execute: trailing semicolon stripped") {
    assert(new QueryService(engine()).execute("SELECT 1 AS x;").toOption.get.rows ==
      Seq(Seq(1)))
  }

  test("execute: information_schema.tables lists the registered tables") {
    val r = new QueryService(engine())
      .execute("SELECT table_name FROM information_schema.tables ORDER BY table_name")
      .toOption.get
    val names = r.rows.map(_.head.toString)
    assert(names.contains("customer") && names.contains("lineitem"), names)
    assert(!names.exists(_.startsWith("graft_")), names)
  }

  test("execute: information_schema.columns carries Trino type names") {
    val r = new QueryService(engine())
      .execute("""SELECT column_name, data_type FROM information_schema.columns
                 |WHERE table_name = 'region' ORDER BY ordinal_position""".stripMargin)
      .toOption.get
    val byName = r.rows.map(row => row(0).toString -> row(1).toString).toMap
    assert(byName("r_regionkey") == "integer" && byName("r_name") == "varchar", byName)
  }

  test("execute: information_schema respects the table allowlist") {
    val qs = new QueryService(engine(Map("TRINO_ALLOWED_TABLES" ->
      "spark_catalog.default.region,spark_catalog.default.nation")))
    val r = qs.execute(
      "SELECT DISTINCT table_name FROM information_schema.tables ORDER BY table_name")
      .toOption.get
    assert(r.rows.map(_.head.toString) == Seq("nation", "region"), r.rows)
  }

  test("execute: information_schema.schemata and .views are served") {
    val qs = new QueryService(engine())
    val s = qs.execute(
      "SELECT catalog_name, schema_name FROM information_schema.schemata ORDER BY 1, 2")
      .toOption.get
    assert(s.rows.nonEmpty && s.rows.exists(_(1).toString == "default"), s.rows)
    // allowlist filtering applies to schemata like the metadata tools
    val denied = new QueryService(engine(Map(
      "TRINO_ALLOWED_SCHEMAS" -> "spark_catalog.other")))
      .execute("SELECT schema_name FROM information_schema.schemata").toOption.get
    assert(!denied.rows.exists(_.head.toString == "default"), denied.rows)
    // views: empty relation with Trino's column shape, not an error
    val v = qs.execute(
      "SELECT table_name, view_definition FROM information_schema.views").toOption.get
    assert(v.rows.isEmpty)
    assert(v.columns == Seq("table_name", "view_definition"))
  }

  test("execute: information_schema inside a string literal is untouched") {
    val r = new QueryService(engine())
      .execute("SELECT 'information_schema.tables' AS s").toOption.get
    assert(r.rows == Seq(Seq("information_schema.tables")))
  }

  test("execute: write statements rejected with the reference error text") {
    val r = new QueryService(engine()).execute("DROP TABLE region")
    assert(r == Left("security restriction: only SELECT, SHOW, DESCRIBE, and EXPLAIN " +
      "queries are allowed. Set TRINO_ALLOW_WRITE_QUERIES=true to enable write " +
      "operations (at your own risk)"))
  }

  test("execute: multi-statement rejected") {
    assert(new QueryService(engine()).execute("SELECT 1; DROP TABLE region").isLeft)
  }

  test("execute: write keyword in literal is fine") {
    assert(new QueryService(engine())
      .execute("SELECT 'INSERT INTO x' AS s").toOption.get.rows == Seq(Seq("INSERT INTO x")))
  }

  test("execute: row cap truncates and flags") {
    val e = engine(Map("GRAFT_MAX_RESULT_ROWS" -> "7"))
    val r = new QueryService(e).execute("SELECT c_custkey FROM customer ORDER BY c_custkey")
      .toOption.get
    assert(r.rows.length == 7 && r.truncated)
  }

  test("execute: timeout cancels the job group") {
    val e = engine(Map("TRINO_QUERY_TIMEOUT" -> "2"))
    val r = new QueryService(e).execute(
      "SELECT COUNT(*) FROM (SELECT a.id FROM range(100000000) a CROSS JOIN range(10000) b)")
    assert(r.isLeft && r.swap.toOption.get.contains("timed out after 2s"))
  }

  test("execute: JSON output is objects in schema column order") {
    val r = new QueryService(engine()).execute(
      "SELECT 1 AS b_first, 2 AS a_second").toOption.get
    assert(r.toJson.replaceAll("\\s", "") == """[{"b_first":1,"a_second":2}]""")
  }

  test("execute: concurrent queries run in isolated job groups") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val qs = new QueryService(engine())
    val futures = (1 to 4).map { i =>
      Future(qs.execute(s"SELECT COUNT(*) + $i AS n FROM lineitem"))
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.zipWithIndex.foreach { case (r, idx) =>
      assert(r.isRight, r)
      val base = r.toOption.get.rows.head.head.asInstanceOf[Long] - (idx + 1)
      assert(base > 0)
    }
    assert(results.map(_.toOption.get.rows.head.head).distinct.size == 4)
  }

  test("execute: stress — concurrent mixed timeouts never cancel unrelated requests") {
    // The reference's connection pool implies concurrent clients
    // (client.go:165-167). Here: 16 in-flight execute_query calls, a
    // third of which blow their 1 s deadline and trigger a job-group
    // cancel, interleaved with bounded-collect queries that must ALL
    // come back complete — a cross-request cancellation (shared or
    // wrong job group) would surface as a killed fast query, a wrong
    // row count, or a short/truncated result.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fast = new QueryService(engine(Map("GRAFT_MAX_RESULT_ROWS" -> "40")))
    val slow = new QueryService(engine(Map("TRINO_QUERY_TIMEOUT" -> "1")))
    val slowSql = "SELECT COUNT(*) FROM (SELECT a.id FROM range(100000000) a " +
      "CROSS JOIN range(100000) b)"
    val futures = (1 to 16).map { i =>
      if (i % 3 == 0) Future("slow" -> slow.execute(slowSql))
      else Future("fast" -> fast.execute(
        s"SELECT l_orderkey, l_linenumber, $i AS tag FROM lineitem " +
          "ORDER BY l_orderkey, l_linenumber LIMIT 60"))
    }
    val results = Await.result(Future.sequence(futures), 300.seconds)
    val (slows, fasts) = results.partition(_._1 == "slow")
    assert(slows.nonEmpty && fasts.nonEmpty)
    slows.foreach { case (_, r) =>
      assert(r.isLeft && r.swap.exists(_.contains("timed out after 1s")), r)
    }
    fasts.foreach { case (_, r) =>
      assert(r.isRight, r) // not cancelled by a neighbor's timeout
      val qr = r.toOption.get
      assert(qr.rows.size == 40 && qr.truncated, // bounded collect held under load
        s"rows=${qr.rows.size} truncated=${qr.truncated}")
      assert(qr.rows.head(0) == 0L) // right data, ordered scan intact
    }
  }

  // --- MetadataService ---

  test("listCatalogs: spark session catalog visible") {
    // the data-dir engine also registers the tpch.tiny generated catalog
    assert(new MetadataService(engine()).listCatalogs() ==
      Seq("spark_catalog", "tpch"))
  }

  test("listCatalogs: allowlist filters everything else") {
    val e = engine(Map("TRINO_ALLOWED_CATALOGS" -> "nonexistent"))
    assert(new MetadataService(e).listCatalogs().isEmpty)
  }

  test("listSchemas: default catalog contains default schema") {
    assert(new MetadataService(engine()).listSchemas("").contains("default"))
  }

  test("listSchemas: allowlist filtering") {
    val e = engine(Map("TRINO_ALLOWED_SCHEMAS" -> "spark_catalog.other"))
    assert(new MetadataService(e).listSchemas("").isEmpty)
  }

  test("listTables: registered testdata views visible in default namespace") {
    val tables = new MetadataService(engine()).listTables("", "")
    assert(Seq("region", "nation", "customer", "orders", "lineitem",
      "events", "documents", "embeddings").forall(tables.contains))
  }

  test("listTables: engine-internal relation caches are not exposed") {
    val tables = new MetadataService(engine()).listTables("", "")
    assert(!tables.exists(_.startsWith("graft_src_")), tables.mkString(","))
  }

  test("listTables: table allowlist filters") {
    val e = engine(Map("TRINO_ALLOWED_TABLES" -> "spark_catalog.default.region"))
    assert(new MetadataService(e).listTables("", "") == Seq("region"))
  }

  test("getTableSchema: Trino-style type names for the star schema") {
    val cols = new MetadataService(engine()).getTableSchema("", "", "customer").toOption.get
    val byName = cols.map(m => m("Column") -> m("Type")).toMap
    assert(byName("c_custkey") == "bigint")
    assert(byName("c_name") == "varchar")
    assert(byName("c_acctbal") == "double")
  }

  test("getTableSchema: nested types (embeddings) map to Trino names") {
    val cols = new MetadataService(engine()).getTableSchema("", "", "embeddings").toOption.get
    val byName = cols.map(m => m("Column") -> m("Type")).toMap
    assert(byName("embedding") == "array(real)")
    assert(byName("label") == "integer")
  }

  test("getTableSchema: schema.table and catalog.schema.table resolution") {
    val m = new MetadataService(engine())
    assert(m.getTableSchema("", "", "default.region").isRight ||
      m.getTableSchema("", "", "region").isRight) // 2-part resolves to default ns
    assert(m.getTableSchema("", "", "region").toOption.get.nonEmpty)
  }

  test("getTableSchema: allowlist denial uses the reference error text") {
    val e = engine(Map("TRINO_ALLOWED_TABLES" -> "spark_catalog.default.region"))
    assert(new MetadataService(e).getTableSchema("", "", "customer") ==
      Left("table access denied: spark_catalog.default.customer not in allowlist"))
  }

  // --- ExplainService ---

  test("explain: default (distributed) mode has a formatted physical plan") {
    val r = new ExplainService(engine()).explain(
      "SELECT r_name, COUNT(*) FROM region GROUP BY r_name", "").toOption.get
    val text = r.head("Query Plan").toString
    assert(text.contains("HashAggregate") || text.contains("Physical Plan"))
  }

  test("explain: LOGICAL mode shows the optimized logical plan") {
    val r = new ExplainService(engine()).explain(
      "SELECT r_name FROM region WHERE r_regionkey = 1", "LOGICAL").toOption.get
    val text = r.head("Query Plan").toString
    assert(text.contains("Relation") || text.contains("Filter"))
  }

  test("explain: VALIDATE mode returns Valid=true for good SQL") {
    assert(new ExplainService(engine()).explain("SELECT 1", "VALIDATE") ==
      Right(Seq(Map("Valid" -> true))))
  }

  test("explain: VALIDATE mode fails for bad SQL") {
    assert(new ExplainService(engine()).explain("SELECT missing_col FROM region", "VALIDATE").isLeft)
  }

  test("explain: IO mode reports file scans with pushed filters") {
    val r = new ExplainService(engine()).explain(
      "SELECT r_name FROM region WHERE r_regionkey = 1", "IO").toOption.get
    val text = r.head("Query Plan").toString
    assert(text.contains("Location") && text.contains("ReadSchema"))
  }

  test("explain: IO mode sees scans through the AQE wrapper") {
    val r = new ExplainService(engine()).explain(
      "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY o_orderstatus", "IO").toOption.get
    val text = r.head("Query Plan").toString
    assert(text.contains("Location"), s"got: $text")
  }

  test("explain: invalid format rejected with the reference error text") {
    assert(new ExplainService(engine()).explain("SELECT 1", "FANCY") ==
      Left("""invalid EXPLAIN format: "FANCY" (allowed: LOGICAL, DISTRIBUTED, VALIDATE, IO)"""))
  }

  test("explain: target query still passes the guard") {
    assert(new ExplainService(engine()).explain("DROP TABLE region", "LOGICAL").isLeft)
  }

  // --- Json round-trip ---

  test("Json: writer/parser round-trip") {
    val v = Map("a" -> Seq(1L, 2L, 3L), "b" -> "x\"y\n", "c" -> null, "d" -> true)
    val parsed = Json.parse(Json.write(v)).asInstanceOf[collection.Map[String, Any]]
    assert(parsed("a") == Vector(1L, 2L, 3L))
    assert(parsed("b") == "x\"y\n")
    assert(parsed("c") == null)
    assert(parsed("d") == true)
  }
}
