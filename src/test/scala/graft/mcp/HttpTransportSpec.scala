package graft.mcp

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine
import graft.service.Json

/** HTTP transport: POST /mcp JSON-RPC frames, GET /status, CORS
  * preflight (reference internal/mcp/server.go:71-167 behaviors). */
class HttpTransportSpec extends SparkSpec {

  private lazy val transport = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    val t = new HttpTransport(
      new StdioServer(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark))),
      port = 0)
    t.start()
    t
  }
  private lazy val base = s"http://127.0.0.1:${transport.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    transport.stop(0)
    super.afterAll()
  }

  private def post(body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base/mcp"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /mcp executes a tool call") {
    val resp = post("""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"execute_query","arguments":{"query":"SELECT COUNT(*) AS n FROM region"}}}""")
    assert(resp.statusCode() == 200)
    val r = Json.parse(resp.body()).asInstanceOf[collection.Map[String, Any]]
    val result = r("result").asInstanceOf[collection.Map[String, Any]]
    assert(result("isError") == false)
    assert(result("content").asInstanceOf[Vector[Any]].head
      .asInstanceOf[collection.Map[String, Any]]("text").toString.contains("\"n\": 5"))
  }

  test("POST /mcp notification returns 202 with no body") {
    val resp = post("""{"jsonrpc":"2.0","method":"notifications/initialized"}""")
    assert(resp.statusCode() == 202 && resp.body().isEmpty)
  }

  test("GET /status reports ok") {
    val resp = client.send(HttpRequest.newBuilder(URI.create(s"$base/status")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    val r = Json.parse(resp.body()).asInstanceOf[collection.Map[String, Any]]
    assert(r("status") == "ok" && r("name") == "mcp-graft-spark")
  }

  test("OPTIONS preflight carries CORS headers") {
    val resp = client.send(HttpRequest.newBuilder(URI.create(s"$base/mcp"))
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 204)
    assert(resp.headers().firstValue("Access-Control-Allow-Origin").orElse("") == "*")
  }

  test("GET /mcp is rejected") {
    val resp = client.send(HttpRequest.newBuilder(URI.create(s"$base/mcp")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 405)
  }

  test("MCP session lifecycle: issue on initialize, 404 unknown, DELETE ends") {
    val init = post("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
    assert(init.statusCode() == 200)
    val sid = init.headers().firstValue("Mcp-Session-Id").orElse("")
    assert(sid.nonEmpty, "initialize must issue Mcp-Session-Id")

    def withSid(s: String) = client.send(HttpRequest.newBuilder(URI.create(s"$base/mcp"))
      .header("Content-Type", "application/json").header("Mcp-Session-Id", s)
      .POST(HttpRequest.BodyPublishers.ofString(
        """{"jsonrpc":"2.0","id":2,"method":"ping"}""")).build(),
      HttpResponse.BodyHandlers.ofString())

    assert(withSid(sid).statusCode() == 200)
    assert(withSid("not-a-session").statusCode() == 404)

    def del(s: String) = client.send(HttpRequest.newBuilder(URI.create(s"$base/mcp"))
      .header("Mcp-Session-Id", s).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(del(sid).statusCode() == 204)
    assert(del(sid).statusCode() == 404)        // already terminated
    assert(withSid(sid).statusCode() == 404)    // and requests now rejected
  }

  test("legacy /sse transport: endpoint event, POST /messages, response over stream") {
    val conn = new java.net.URI(s"$base/sse").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setReadTimeout(30000)
    assert(conn.getResponseCode == 200)
    assert(conn.getContentType.startsWith("text/event-stream"))
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(conn.getInputStream, "UTF-8"))
    // frame 1: the endpoint announcement
    assert(reader.readLine() == "event: endpoint")
    val endpoint = reader.readLine()
    assert(endpoint.startsWith("data: /messages?sessionId="), endpoint)
    assert(reader.readLine() == "")
    val postUrl = s"$base${endpoint.drop("data: ".length)}"
    // tool call POSTed to the announced endpoint → 202, result on stream
    val resp = client.send(HttpRequest.newBuilder(URI.create(postUrl))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        """{"jsonrpc":"2.0","id":7,"method":"tools/call","params":{"name":"execute_query","arguments":{"query":"SELECT COUNT(*) AS n FROM region"}}}"""))
      .build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 202)
    assert(reader.readLine() == "event: message")
    val data = reader.readLine()
    assert(data.startsWith("data: ") && data.contains("\\\"n\\\": 5"), data)
    conn.disconnect()
  }

  test("legacy /messages with unknown session returns 404") {
    val resp = client.send(HttpRequest.newBuilder(
        URI.create(s"$base/messages?sessionId=nope"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString("""{"jsonrpc":"2.0","id":1,"method":"ping"}"""))
      .build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 404)
  }

  test("OAuth-enabled transport enforces bearer tokens on /mcp") {
    val cfg = EngineConfig.fromEnv(Map(
      "OAUTH_ENABLED" -> "true", "OAUTH_HMAC_SECRET" -> "s3cret")).toOption.get
    val t = new HttpTransport(
      new StdioServer(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark))),
      port = 0, auth = graft.security.BearerAuth.fromConfig(cfg))
    t.start()
    try {
      val url = s"http://127.0.0.1:${t.boundPort}/mcp"
      def call(headers: Seq[(String, String)]): HttpResponse[String] = {
        val b = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"jsonrpc":"2.0","id":1,"method":"ping"}"""))
        headers.foreach { case (k, v) => b.header(k, v) }
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      val noToken = call(Nil)
      assert(noToken.statusCode() == 401)
      // 401 carries the discovery-shaped challenge (server.go:193-196)
      assert(noToken.headers().firstValue("WWW-Authenticate").orElse("")
        .startsWith("""Bearer realm="OAuth""""))
      val badToken = call(Seq("Authorization" -> "Bearer bogus.token"))
      assert(badToken.statusCode() == 401)
      val good = graft.security.BearerAuth.mint("s3cret", "alice")
      val ok = call(Seq("Authorization" -> s"Bearer $good"))
      assert(ok.statusCode() == 200)
    } finally t.stop(0)
  }

  test("OAuth discovery + proxy endpoints served over HTTP") {
    val cfg = EngineConfig.fromEnv(Map(
      "OAUTH_ENABLED" -> "true", "OAUTH_MODE" -> "proxy",
      "OAUTH_PROVIDER" -> "okta", "JWT_SECRET" -> "s3cret",
      "OIDC_ISSUER" -> "https://issuer.test", "OIDC_AUDIENCE" -> "api",
      "OIDC_CLIENT_ID" -> "cid")).toOption.get
    val stub = new OAuthEndpoints.Upstream {
      override def resolve(issuer: String) = Right(
        OAuthEndpoints.UpstreamEndpoints(s"$issuer/authorize", s"$issuer/token"))
      override def postToken(url: String, form: Map[String, String]) =
        Right("""{"access_token":"t"}""")
    }
    val t = new HttpTransport(
      new StdioServer(new Engine(EngineConfig.fromEnv(Map.empty).toOption.get,
        Some("/root/testdata/sf0.001"), Some(spark))),
      port = 0, auth = graft.security.BearerAuth.fromConfig(cfg),
      oauth = Some(new OAuthEndpoints(cfg, "http://localhost:0", stub)))
    t.start()
    try {
      val b = s"http://127.0.0.1:${t.boundPort}"
      def get(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(s"$b$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      val meta = get("/.well-known/oauth-authorization-server")
      assert(meta.statusCode() == 200 && meta.body().contains("authorization_endpoint"))
      // /status reports oauth state (server.go:119-121)
      val st = get("/status")
      assert(st.body().contains("\"mode\":\"proxy\"") &&
        st.body().contains("\"provider\":\"okta\""), st.body())
      assert(get("/.well-known/oauth-metadata").statusCode() == 200)
      val prm = get("/.well-known/oauth-protected-resource")
      assert(prm.statusCode() == 200 && prm.body().contains("authorization_servers"))
      // /callback preserves the query and bounces to /oauth/callback
      val noRedirect = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NEVER).build()
      val cb = noRedirect.send(HttpRequest.newBuilder(
        URI.create(s"$b/callback?code=c&state=s")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(cb.statusCode() == 302)
      assert(cb.headers().firstValue("Location").orElse("") == "/oauth/callback?code=c&state=s")
      // authorize 302s to the (stubbed) upstream
      val az = noRedirect.send(HttpRequest.newBuilder(URI.create(
        s"$b/oauth/authorize?redirect_uri=http%3A%2F%2Flocalhost%3A3000%2Fcb")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(az.statusCode() == 302)
      assert(az.headers().firstValue("Location").orElse("")
        .startsWith("https://issuer.test/authorize?"))
      // 401 advertises the protected-resource metadata
      val denied = client.send(HttpRequest.newBuilder(URI.create(s"$b/mcp"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(denied.statusCode() == 401)
      val challenges = denied.headers().allValues("WWW-Authenticate")
      assert(challenges.stream().anyMatch(_.contains("oauth-protected-resource")))
    } finally t.stop(0)
  }
}
