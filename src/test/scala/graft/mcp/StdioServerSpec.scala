package graft.mcp

import scala.collection.immutable.ListMap

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine
import graft.service.Json

/** Scripted JSON-RPC session exercising all six tools end-to-end over
  * sf0.001, asserting the MCP frame shapes (initialize / tools/list /
  * tools/call; reference internal/mcp/server.go + handlers.go). */
class StdioServerSpec extends SparkSpec {

  private lazy val server = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    new StdioServer(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)))
  }

  private def rpc(method: String, id: Long, params: Any = null): collection.Map[String, Any] = {
    val req = ListMap("jsonrpc" -> "2.0", "id" -> id, "method" -> method) ++
      Option(params).map(p => ListMap("params" -> p)).getOrElse(ListMap.empty)
    val resp = server.handle(Json.write(req))
    assert(resp.isDefined, s"no response for $method")
    Json.parse(resp.get).asInstanceOf[collection.Map[String, Any]]
  }

  private def callTool(name: String, args: ListMap[String, Any], id: Long): (Boolean, String) = {
    val resp = rpc("tools/call", id, ListMap("name" -> name, "arguments" -> args))
    val result = resp("result").asInstanceOf[collection.Map[String, Any]]
    val content = result("content").asInstanceOf[Vector[Any]].head
      .asInstanceOf[collection.Map[String, Any]]
    (result("isError").asInstanceOf[Boolean], content("text").toString)
  }

  test("initialize handshake") {
    val r = rpc("initialize", 1)
    val result = r("result").asInstanceOf[collection.Map[String, Any]]
    // no requested version → server answers with its latest supported
    assert(result("protocolVersion") == StdioServer.LatestProtocolVersion)
    val info = result("serverInfo").asInstanceOf[collection.Map[String, Any]]
    assert(info("name") == "mcp-graft-spark")
  }

  test("initialize negotiates the protocol version per the MCP spec") {
    // supported revision requested → echoed back verbatim
    for (v <- Seq("2024-11-05", "2025-03-26")) {
      val r = rpc("initialize", 1, ListMap("protocolVersion" -> v))
      val result = r("result").asInstanceOf[collection.Map[String, Any]]
      assert(result("protocolVersion") == v, v)
    }
    // unknown revision → server proposes its latest; client may disconnect
    val r = rpc("initialize", 1, ListMap("protocolVersion" -> "1999-01-01"))
    val result = r("result").asInstanceOf[collection.Map[String, Any]]
    assert(result("protocolVersion") == StdioServer.LatestProtocolVersion)
  }

  test("tools/list pagination: cursor walk, opaque tokens, invalid cursor error") {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    val paged = new StdioServer(
      new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)), toolPageSize = 2)
    def list(cursor: Option[String]): collection.Map[String, Any] = {
      val params = cursor.map(c => ListMap("cursor" -> c)).getOrElse(ListMap.empty[String, Any])
      val resp = paged.handle(Json.write(
        ListMap("jsonrpc" -> "2.0", "id" -> 9, "method" -> "tools/list", "params" -> params)))
      Json.parse(resp.get).asInstanceOf[collection.Map[String, Any]]
    }
    // walk every page via nextCursor; union must be all six tools, no dups
    var cursor: Option[String] = None
    var pages = 0
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    var done = false
    while (!done) {
      val result = list(cursor)("result").asInstanceOf[collection.Map[String, Any]]
      val tools = result("tools").asInstanceOf[Vector[Any]]
        .map(_.asInstanceOf[collection.Map[String, Any]]("name").toString)
      assert(tools.size <= 2)
      seen ++= tools
      result.get("nextCursor") match {
        case Some(c) => cursor = Some(c.toString); pages += 1; assert(pages < 10)
        case None => done = true
      }
    }
    assert(seen.size == 6 && seen.distinct.size == 6, seen)
    assert(pages == 2) // 2+2+2: two nextCursors then a final page without one
    // the unpaged default returns one page and NO nextCursor
    val whole = rpc("tools/list", 10)("result").asInstanceOf[collection.Map[String, Any]]
    assert(whole("tools").asInstanceOf[Vector[Any]].size == 6)
    assert(!whole.contains("nextCursor"))
    // invalid cursors → JSON-RPC Invalid params (-32602), per spec
    for (bad <- Seq("not-base64!", "Z2FyYmFnZQ", StdioServer.encodeCursor(999).dropRight(2) + "xx")) {
      val r = list(Some(bad))
      val err = r.get("error").map(_.asInstanceOf[collection.Map[String, Any]])
      assert(err.exists(_("code") == -32602L), s"cursor $bad -> $r")
    }
    // out-of-range offset in a well-formed token is also invalid
    val oob = list(Some(StdioServer.encodeCursor(999)))
    assert(oob.get("error").map(_.asInstanceOf[collection.Map[String, Any]])
      .exists(_("code") == -32602L))
  }

  test("notifications get no reply") {
    assert(server.handle("""{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
  }

  test("tools/list exposes exactly the six reference tools") {
    val r = rpc("tools/list", 2)
    val tools = r("result").asInstanceOf[collection.Map[String, Any]]("tools")
      .asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[collection.Map[String, Any]]("name").toString)
    assert(tools == Vector("execute_query", "list_catalogs", "list_schemas",
      "list_tables", "get_table_schema", "explain_query"))
  }

  test("execute_query tool returns JSON rows with a query id and stats") {
    val (isErr, text) = callTool("execute_query",
      ListMap("query" -> "SELECT r_name FROM region ORDER BY r_name LIMIT 2"), 3)
    assert(!isErr)
    val env = Json.parse(text).asInstanceOf[collection.Map[String, Any]]
    assert(env("queryId").toString.startsWith("graft-query-"))
    val stats = env("stats").asInstanceOf[collection.Map[String, Any]]
    assert(stats("rows") == 2L && stats("truncated") == false)
    val rows = env("data").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[collection.Map[String, Any]]("r_name"))
    assert(rows == Vector("AFRICA", "AMERICA"))
  }

  test("execute_query tool blocks writes") {
    val (isErr, text) = callTool("execute_query",
      ListMap("query" -> "DROP TABLE region"), 4)
    assert(isErr && text.contains("security restriction"))
  }

  test("execute_query tool rejects missing query arg") {
    val (isErr, text) = callTool("execute_query", ListMap(), 5)
    assert(isErr && text == "query parameter must be a string")
  }

  test("list_catalogs tool") {
    val (isErr, text) = callTool("list_catalogs", ListMap(), 6)
    // data-dir engines serve the default catalog plus generated tpch.tiny
    assert(!isErr && Json.parse(text) == Vector("spark_catalog", "tpch"))
  }

  test("list_schemas tool") {
    val (isErr, text) = callTool("list_schemas", ListMap(), 7)
    assert(!isErr && Json.parse(text).asInstanceOf[Vector[Any]].contains("default"))
  }

  test("list_tables tool") {
    val (isErr, text) = callTool("list_tables", ListMap(), 8)
    assert(!isErr && Json.parse(text).asInstanceOf[Vector[Any]].contains("lineitem"))
  }

  test("get_table_schema tool emits Trino-style columns") {
    val (isErr, text) = callTool("get_table_schema", ListMap("table" -> "orders"), 9)
    assert(!isErr)
    val cols = Json.parse(text).asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[collection.Map[String, Any]])
    val byName = cols.map(m => m("Column") -> m("Type")).toMap
    assert(byName("o_orderkey") == "bigint" && byName("o_orderstatus") == "varchar")
  }

  test("get_table_schema tool requires table arg") {
    val (isErr, text) = callTool("get_table_schema", ListMap(), 10)
    assert(isErr && text == "table parameter is required")
  }

  test("explain_query tool returns a plan") {
    val (isErr, text) = callTool("explain_query",
      ListMap("query" -> "SELECT COUNT(*) FROM lineitem", "format" -> "LOGICAL"), 11)
    assert(!isErr && text.contains("Query Plan"))
  }

  test("explain_query tool rejects bad formats") {
    val (isErr, text) = callTool("explain_query",
      ListMap("query" -> "SELECT 1", "format" -> "NOPE"), 12)
    assert(isErr && text.contains("invalid EXPLAIN format"))
  }

  test("metadata tool failure surfaces as isError, not a thrown exception") {
    // a bogus catalog makes Spark throw AnalysisException inside the
    // handler; the dispatch must wrap it so the serve() loop survives
    val (isErr, text) = callTool("list_schemas",
      ListMap("catalog" -> "no_such_catalog"), 14)
    assert(isErr, s"expected isError=true, got: $text")
    assert(text.startsWith("tool list_schemas failed:"), text)
    // and the server still answers afterwards
    val (stillOk, _) = callTool("list_catalogs", ListMap(), 15)
    assert(!stillOk)
  }

  test("unknown method yields JSON-RPC error") {
    val r = rpc("bogus/method", 13)
    assert(r.contains("error"))
  }

  test("parse error yields -32700") {
    val resp = server.handle("{not json").get
    val r = Json.parse(resp).asInstanceOf[collection.Map[String, Any]]
    assert(r("error").asInstanceOf[collection.Map[String, Any]]("code") == -32700L)
  }
}
