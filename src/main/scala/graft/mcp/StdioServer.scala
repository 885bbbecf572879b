package graft.mcp

import java.io.{BufferedReader, PrintStream}

import scala.collection.immutable.ListMap

import graft.config.EngineConfig
import graft.engine.Engine
import graft.service.{ExplainService, Json, MetadataService, QueryService}

/** MCP server over stdio: a JSON-RPC 2.0 loop exposing the reference's
  * six tools (registration mirrored from reference
  * internal/mcp/handlers.go:287-333; stdio transport per
  * internal/mcp/server.go:66-68). Tool results are `content:[{type:
  * "text", text:<pretty JSON>}]`, matching the reference's
  * NewToolResultText(json.MarshalIndent(...)) shape; errors return
  * isError=true with the handler's error text.
  */
class StdioServer(engine: Engine, version: String = "dev",
    toolPageSize: Int = StdioServer.ToolPageSize) {

  private val queries = new QueryService(engine)
  private val metadata = new MetadataService(engine)
  private val explains = new ExplainService(engine)

  val toolDefs: Seq[ListMap[String, Any]] = {
    def str(desc: String) = ListMap("type" -> "string", "description" -> desc)
    def tool(name: String, title: String, desc: String,
        props: ListMap[String, Any], required: Seq[String]) =
      ListMap[String, Any](
        "name" -> name,
        "title" -> title,
        "description" -> desc,
        "inputSchema" -> ListMap[String, Any](
          "type" -> "object",
          "properties" -> props,
          "required" -> required))
    Seq(
      tool("execute_query", "Execute Query",
        "Execute SQL queries on the embedded Spark analytics engine. By default, " +
          "only read-only queries (SELECT, SHOW, DESCRIBE, EXPLAIN) are allowed for " +
          "security. When TRINO_ALLOW_WRITE_QUERIES=true is set, the guard is " +
          "bypassed. Suited for complex analytics, aggregations, joins, and " +
          "exploration on large datasets.",
        ListMap("query" -> str("SQL query to execute. By default read-only queries " +
          "only; DML/DDL requires TRINO_ALLOW_WRITE_QUERIES=true")),
        Seq("query")),
      tool("list_catalogs", "List Catalogs",
        "Discover available catalogs. Each catalog is an entry point to queryable " +
          "data; the embedded engine exposes Spark's session catalog.",
        ListMap(), Nil),
      tool("list_schemas", "List Schemas",
        "Browse schemas (databases/namespaces) within a catalog. Use this to " +
          "navigate the data hierarchy before querying specific datasets.",
        ListMap("catalog" -> str("Catalog name (optional; defaults to server configuration if omitted)")),
        Nil),
      tool("list_tables", "List Tables",
        "Discover tables and views available for querying. Essential for finding " +
          "datasets to analyze. Can scope to a specific catalog/schema.",
        ListMap("catalog" -> str("Catalog name (optional)"),
          "schema" -> str("Schema name within catalog (optional)")),
        Nil),
      tool("get_table_schema", "Get Table Schema",
        "Inspect table structure and column metadata: column names, data types " +
          "(Trino-style names), nullability. Critical for understanding data before " +
          "writing analytical queries.",
        ListMap("catalog" -> str("Catalog containing the table (optional)"),
          "schema" -> str("Schema containing the table (optional)"),
          "table" -> str("Table name to inspect")),
        Seq("table")),
      tool("explain_query", "Explain Query",
        "Analyze query execution plans without running expensive queries. Shows " +
          "the optimized logical or formatted physical (distributed) plan, " +
          "validates syntax, or reports file/column IO. Formats: LOGICAL, " +
          "DISTRIBUTED, VALIDATE, IO.",
        ListMap("query" -> str("SQL query to analyze (SELECT, JOIN, aggregations, etc.)"),
          "format" -> str("Plan type: LOGICAL, DISTRIBUTED, VALIDATE, or IO (optional)")),
        Seq("query")))
  }

  /** Handle one JSON-RPC request; None for notifications (no reply). */
  def handle(line: String): Option[String] = {
    val req =
      try Json.parse(line).asInstanceOf[collection.Map[String, Any]]
      catch {
        case _: Throwable =>
          return Some(Json.write(ListMap("jsonrpc" -> "2.0", "id" -> null,
            "error" -> ListMap("code" -> -32700L, "message" -> "parse error"))))
      }
    val id = req.get("id").orNull
    val method = req.get("method").map(String.valueOf).getOrElse("")
    def reply(result: Any): Option[String] =
      Some(Json.write(ListMap("jsonrpc" -> "2.0", "id" -> id, "result" -> result)))
    def error(code: Long, msg: String): Option[String] =
      Some(Json.write(ListMap("jsonrpc" -> "2.0", "id" -> id,
        "error" -> ListMap("code" -> code, "message" -> msg))))

    def params: collection.Map[String, Any] = req.get("params").collect {
      case m: collection.Map[_, _] => m.asInstanceOf[collection.Map[String, Any]]
    }.getOrElse(Map.empty[String, Any])

    method match {
      case "initialize" =>
        // Version negotiation per the MCP spec (the reference gets this
        // from mcp-go): if the client requests a revision we support,
        // echo it back; otherwise answer with the latest we support and
        // let the client decide whether to continue.
        val requested = params.get("protocolVersion").map(String.valueOf)
        val negotiated = requested.filter(StdioServer.SupportedProtocolVersions.contains)
          .getOrElse(StdioServer.LatestProtocolVersion)
        reply(ListMap(
          "protocolVersion" -> negotiated,
          "capabilities" -> ListMap("tools" -> ListMap[String, Any]()),
          "serverInfo" -> ListMap("name" -> "mcp-graft-spark", "version" -> version)))
      case "notifications/initialized" | "initialized" => None
      case "ping" => reply(ListMap[String, Any]())
      case "tools/list" =>
        // Spec pagination: optional opaque cursor; unknown cursors are
        // an Invalid params error, a missing cursor starts at page one;
        // nextCursor is present only when more tools remain.
        val start = params.get("cursor") match {
          case None => 0
          case Some(c) => StdioServer.decodeCursor(String.valueOf(c)) match {
            case Some(off) if off >= 0 && off <= toolDefs.size => off
            case _ => return error(-32602L, "invalid cursor")
          }
        }
        val page = toolDefs.slice(start, start + toolPageSize)
        val more = start + toolPageSize < toolDefs.size
        reply(
          if (more)
            ListMap("tools" -> page,
              "nextCursor" -> StdioServer.encodeCursor(start + toolPageSize))
          else ListMap("tools" -> page))
      case "tools/call" =>
        val name = params.get("name").map(String.valueOf).getOrElse("")
        val args = params.get("arguments").collect {
          case m: collection.Map[_, _] => m.asInstanceOf[collection.Map[String, Any]]
        }.getOrElse(Map.empty[String, Any])
        callTool(name, args) match {
          case Right(text) =>
            reply(ListMap("content" -> Seq(ListMap("type" -> "text", "text" -> text)),
              "isError" -> false))
          case Left(err) =>
            reply(ListMap("content" -> Seq(ListMap("type" -> "text", "text" -> err)),
              "isError" -> true))
        }
      case _ => error(-32601L, s"method not found: $method")
    }
  }

  /** Dispatch mirroring the reference handlers (handlers.go:55-285).
    * Every handler failure — including AnalysisException from a bogus
    * catalog/schema name in the metadata tools — becomes an
    * isError=true tool result rather than escaping and killing the
    * serve() loop (reference: NewToolResultErrorFromErr wraps all
    * handler errors, handlers.go). */
  def callTool(name: String, args: collection.Map[String, Any]): Either[String, String] =
    try dispatch(name, args)
    catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        Left(s"tool $name failed: ${msg.linesIterator.take(3).mkString(" ").take(500)}")
    }

  private def dispatch(name: String, args: collection.Map[String, Any]): Either[String, String] = {
    def strArg(k: String): Option[String] = args.get(k).collect { case s: String => s }
    name match {
      case "execute_query" =>
        strArg("query") match {
          case None => Left("query parameter must be a string")
          case Some(q) => queries.execute(q).map(_.toJsonWithStats)
        }
      case "list_catalogs" =>
        Right(Json.write(metadata.listCatalogs(), indent = 2))
      case "list_schemas" =>
        Right(Json.write(metadata.listSchemas(strArg("catalog").getOrElse("")), indent = 2))
      case "list_tables" =>
        Right(Json.write(metadata.listTables(
          strArg("catalog").getOrElse(""), strArg("schema").getOrElse("")), indent = 2))
      case "get_table_schema" =>
        strArg("table") match {
          case None => Left("table parameter is required")
          case Some(t) =>
            metadata.getTableSchema(strArg("catalog").getOrElse(""),
              strArg("schema").getOrElse(""), t).map(Json.write(_, indent = 2))
        }
      case "explain_query" =>
        strArg("query") match {
          case None => Left("query parameter must be a string")
          case Some(q) =>
            explains.explain(q, strArg("format").getOrElse("")).map(Json.write(_, indent = 2))
        }
      case other => Left(s"unknown tool: $other")
    }
  }

  /** Blocking stdio loop (server.go:66-68): one JSON-RPC frame per line. */
  def serve(in: BufferedReader, out: PrintStream): Unit = {
    var line = in.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) handle(line).foreach { resp =>
        out.println(resp)
        out.flush()
      }
      line = in.readLine()
    }
  }
}

/** `runMain graft.mcp.StdioServer <dataDir>` — boots config from env,
  * registers the data directory's tables, serves MCP on stdio
  * (reference cmd/main.go:22-76 startup sequence: config → engine →
  * self-test → serve). */
object StdioServer {
  /** MCP revisions this server implements (tools-only surface is
    * identical across them). Echo the client's requested version when
    * supported, else answer with the latest (spec: the client then
    * decides whether to continue). */
  val SupportedProtocolVersions: Set[String] =
    Set("2024-11-05", "2025-03-26")
  val LatestProtocolVersion: String = "2025-03-26"

  /** tools/list page size. Larger than the tool count, so pagination
    * engages only under a test-sized page — but the cursor contract
    * (opaque token, invalid → -32602) is always enforced. */
  val ToolPageSize: Int = 50

  private[mcp] def encodeCursor(offset: Int): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s"tools:$offset".getBytes("UTF-8"))

  private[mcp] def decodeCursor(s: String): Option[Int] =
    try {
      val decoded = new String(java.util.Base64.getUrlDecoder.decode(s), "UTF-8")
      if (decoded.startsWith("tools:")) decoded.stripPrefix("tools:").toIntOption
      else None
    } catch { case _: IllegalArgumentException => None }

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    EngineConfig.fromEnv() match {
      case Left(err) =>
        System.err.println(s"config error: $err")
        sys.exit(1)
      case Right(cfg) =>
        val engine = new Engine(cfg, Some(dataDir))
        val server = new StdioServer(engine)
        // startup self-test, mirroring main.go:45-54
        val cats = new MetadataService(engine).listCatalogs()
        System.err.println(s"[graft-mcp] ready; catalogs=${cats.mkString(",")}")
        server.serve(new BufferedReader(new java.io.InputStreamReader(System.in)),
          System.out)
    }
  }
}
