package graft.mcp

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import scala.collection.immutable.ListMap

import graft.service.Json

/** Streamable-HTTP transport for the MCP server (reference
  * internal/mcp/server.go:71-167): POST /mcp carries one JSON-RPC frame
  * per request with MCP session management (`Mcp-Session-Id` issued on
  * initialize, unknown ids → 404, DELETE terminates — the streamable-
  * HTTP spec the reference's WithStateLess(false) server provides),
  * GET /status reports liveness/version, CORS headers are permissive
  * like the reference's, and shutdown is graceful. Built on the JDK's
  * HttpServer — the zero-dependency build has no HTTP framework. (The
  * reference's legacy /sse endpoint is not ported: server-sent
  * streaming has no analogue when every tool result is a single frame;
  * see DIALECT.md "Transport & auth".)
  */
class HttpTransport(server: StdioServer, port: Int, version: String = "dev",
    auth: Option[graft.security.BearerAuth] = None) {

  private val http = HttpServer.create(new InetSocketAddress(port), 0)
  @volatile private var started = false

  /** Live session ids (bounded; oldest evicted past `maxSessions` —
    * a client that never DELETEs cannot grow the set unboundedly). */
  private val maxSessions = 1024
  private val sessions =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
          size() > maxSessions
      })

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = http.getAddress.getPort

  private def cors(ex: HttpExchange): Unit = {
    val h = ex.getResponseHeaders
    h.add("Access-Control-Allow-Origin", "*")
    h.add("Access-Control-Allow-Methods", "GET, POST, DELETE, OPTIONS")
    h.add("Access-Control-Allow-Headers", "Content-Type, Authorization, Mcp-Session-Id")
    h.add("Access-Control-Expose-Headers", "Mcp-Session-Id")
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }

  http.createContext("/mcp", (ex: HttpExchange) => {
    cors(ex)
    ex.getRequestMethod match {
      case "OPTIONS" => ex.sendResponseHeaders(204, -1)
      case "POST" =>
        // Bearer validation when OAuth is enabled (reference wires its
        // oauth middleware over every tool handler, server.go:45-53)
        val denied = auth.flatMap { a =>
          a.validate(Option(ex.getRequestHeaders.getFirst("Authorization")))
            .left.toOption
        }
        denied match {
          case Some(reason) =>
            ex.getResponseHeaders.add("WWW-Authenticate", "Bearer")
            respond(ex, 401, Json.write(ListMap("error" -> reason)))
          case None =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val sid = Option(ex.getRequestHeaders.getFirst("Mcp-Session-Id"))
            val isInit = body.contains("\"initialize\"")
            if (sid.exists(s => !sessions.containsKey(s)))
              // spec: a request with an unknown/expired session id → 404,
              // client must re-initialize
              respond(ex, 404, """{"error":"unknown or expired session"}""")
            else server.handle(body) match {
              case Some(resp) =>
                if (isInit && resp.contains("protocolVersion")) {
                  val fresh = java.util.UUID.randomUUID().toString
                  sessions.put(fresh, java.lang.Long.valueOf(System.currentTimeMillis()))
                  ex.getResponseHeaders.add("Mcp-Session-Id", fresh)
                }
                respond(ex, 200, resp)
              case None => ex.sendResponseHeaders(202, -1) // notification
            }
        }
      case "DELETE" =>
        // spec: DELETE with the session header terminates the session
        Option(ex.getRequestHeaders.getFirst("Mcp-Session-Id")) match {
          case Some(s) if sessions.remove(s) != null => ex.sendResponseHeaders(204, -1)
          case _ => respond(ex, 404, """{"error":"unknown or expired session"}""")
        }
      case _ => respond(ex, 405, """{"error":"method not allowed"}""")
    }
    ex.close()
  })

  http.createContext("/status", (ex: HttpExchange) => {
    cors(ex)
    respond(ex, 200, Json.write(ListMap(
      "status" -> "ok", "name" -> "mcp-graft-spark", "version" -> version)))
    ex.close()
  })

  def start(): Unit = {
    http.start()
    started = true
  }

  /** Graceful shutdown (bounded, like server.go:153-166's 30 s drain). */
  def stop(drainSeconds: Int = 2): Unit = if (started) {
    http.stop(drainSeconds)
    started = false
  }
}

/** `runMain graft.mcp.HttpMain <dataDir> [port]` — HTTP variant of the
  * stdio entrypoint (MCP_TRANSPORT=http equivalent, cmd/main.go:61-76). */
object HttpMain {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val port = args.lift(1).map(_.toInt)
      .orElse(sys.env.get("MCP_PORT").map(_.toInt)).getOrElse(8080)
    graft.config.EngineConfig.fromEnv() match {
      case Left(err) =>
        System.err.println(s"config error: $err"); sys.exit(1)
      case Right(cfg) =>
        val engine = new graft.engine.Engine(cfg, Some(dataDir))
        val transport = new HttpTransport(new StdioServer(engine), port,
          auth = graft.security.BearerAuth.fromConfig(cfg))
        if (cfg.oauthEnabled)
          System.err.println(s"[graft-mcp] OAuth enabled (mode: ${cfg.oauthMode}, " +
            s"provider: ${cfg.oauthProvider})")
        transport.start()
        System.err.println(s"[graft-mcp] http listening on :${transport.boundPort}")
        Thread.currentThread().join()
    }
  }
}
