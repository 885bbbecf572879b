package graft.mcp

import org.scalatest.funsuite.AnyFunSuite

import graft.config.EngineConfig

/** Proxy-mode OAuth flow (reference docs/oauth.md "Proxy Mode";
  * endpoint surface per internal/mcp/server.go:124-128). The upstream
  * provider is stubbed — the signed-state round-trip, redirect
  * validation, and credential injection are what is under test. */
class OAuthEndpointsSpec extends AnyFunSuite {

  private val stubUpstream = new OAuthEndpoints.Upstream {
    var lastTokenForm: Map[String, String] = Map.empty
    override def resolve(issuer: String) =
      if (issuer.isEmpty) Left("OIDC_ISSUER is not configured")
      else Right(OAuthEndpoints.UpstreamEndpoints(
        s"$issuer/authorize", s"$issuer/token"))
    override def postToken(url: String, form: Map[String, String]) = {
      lastTokenForm = form
      Right("""{"access_token":"tok","token_type":"Bearer"}""")
    }
  }

  private def cfg(extra: (String, String)*): EngineConfig =
    EngineConfig.fromEnv(Map(
      "OAUTH_ENABLED" -> "true", "OAUTH_MODE" -> "proxy",
      "OAUTH_PROVIDER" -> "okta",
      "OIDC_ISSUER" -> "https://issuer.test", "OIDC_AUDIENCE" -> "api",
      "OIDC_CLIENT_ID" -> "client-1", "OIDC_CLIENT_SECRET" -> "c-secret",
      "JWT_SECRET" -> "state-secret") ++ extra).toOption.get

  private val NOW = 1_000_000_000_000L

  private def endpoints(c: EngineConfig = cfg(), now: Long = NOW) =
    new OAuthEndpoints(c, "http://localhost:8080", stubUpstream, () => now)

  test("authorize 302s to upstream with signed state and PKCE passthrough") {
    val loc = endpoints().authorize(Map(
      "redirect_uri" -> "http://localhost:3000/cb", "state" -> "client-state",
      "code_challenge" -> "abc", "code_challenge_method" -> "S256")).toOption.get
    assert(loc.startsWith("https://issuer.test/authorize?"))
    assert(loc.contains("client_id=client-1"))
    assert(loc.contains("code_challenge=abc"))
    assert(loc.contains("redirect_uri=http%3A%2F%2Flocalhost%3A8080%2Foauth%2Fcallback"))
    assert(!loc.contains("c-secret"), "client secret must never appear in the authorize URL")
  }

  test("callback round-trip returns the code to the validated client redirect") {
    val e = endpoints()
    val loc = e.authorize(Map(
      "redirect_uri" -> "http://localhost:3000/cb", "state" -> "client-state")).toOption.get
    val state = loc.split("state=")(1).split("&")(0)
    val dec = java.net.URLDecoder.decode(state, "UTF-8")
    val back = e.callback(Map("code" -> "authcode-7", "state" -> dec)).toOption.get
    assert(back.startsWith("http://localhost:3000/cb?"))
    assert(back.contains("code=authcode-7"))
    assert(back.contains("state=client-state"))
  }

  test("tampered or foreign state is rejected") {
    val e = endpoints()
    assert(e.callback(Map("code" -> "c", "state" -> "forged.sig")).isLeft)
    // state signed under a different secret
    val other = new OAuthEndpoints(cfg("JWT_SECRET" -> "other-secret"),
      "http://localhost:8080", stubUpstream, () => NOW)
    val loc = other.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")).toOption.get
    val state = java.net.URLDecoder.decode(loc.split("state=")(1).split("&")(0), "UTF-8")
    assert(e.callback(Map("code" -> "c", "state" -> state)) ==
      Left("invalid state signature"))
  }

  test("expired state is rejected") {
    val e = endpoints()
    val loc = e.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")).toOption.get
    val state = java.net.URLDecoder.decode(loc.split("state=")(1).split("&")(0), "UTF-8")
    val later = endpoints(now = NOW + 11 * 60 * 1000L)
    assert(later.callback(Map("code" -> "c", "state" -> state)) == Left("state expired"))
  }

  test("disallowed redirect URIs rejected in fixed and allowlist modes") {
    // fixed mode: nothing configured -> localhost only
    assert(endpoints().authorize(Map("redirect_uri" -> "https://evil.test/cb")) ==
      Left("fixed redirect mode accepts only localhost redirect URIs"))
    // allowlist mode
    val al = endpoints(cfg("OAUTH_ALLOWED_REDIRECT_URIS" ->
      "https://app.example.com/callback"))
    assert(al.authorize(Map("redirect_uri" -> "https://app.example.com/callback")).isRight)
    assert(al.authorize(Map("redirect_uri" -> "https://app.example.com/x")).isLeft)
  }

  test("dynamic client registration validates redirects and is deterministic") {
    val e = endpoints()
    val resp = e.register(
      """{"redirect_uris":["http://localhost:3000/cb"],"client_name":"x"}""").toOption.get
    assert(resp.contains("\"client_id\":\"graft-"))
    assert(resp.contains("\"redirect_uris\":[\"http://localhost:3000/cb\"]"))
    // stateless: same redirect set -> same client_id
    assert(e.register("""{"redirect_uris":["http://localhost:3000/cb"]}""").toOption.get
      .split("client_id_issued_at")(0) == resp.split("client_id_issued_at")(0))
    // disallowed redirect rejected, missing redirect_uris rejected
    assert(e.register("""{"redirect_uris":["https://evil.test/cb"]}""").isLeft)
    assert(e.register("""{"client_name":"x"}""") == Left("redirect_uris is required"))
    assert(e.register("not json").isLeft)
  }

  test("token exchange injects server-held client credentials") {
    val e = endpoints()
    val resp = e.token(Map("grant_type" -> "authorization_code", "code" -> "c",
      "code_verifier" -> "v")).toOption.get
    assert(resp.contains("access_token"))
    assert(stubUpstream.lastTokenForm("client_id") == "client-1")
    assert(stubUpstream.lastTokenForm("client_secret") == "c-secret")
    assert(stubUpstream.lastTokenForm("grant_type") == "authorization_code")
  }

  test("malformed percent-encoding drops the pair instead of throwing") {
    assert(OAuthEndpoints.parseParams("a=%zz&b=ok") == Map("b" -> "ok"))
    assert(OAuthEndpoints.parseParams("%zz") == Map.empty)
    assert(OAuthEndpoints.parseParams(null) == Map.empty)
  }

  test("transient discovery failure is not cached; success is") {
    var calls = 0
    var fail = true
    val flaky = new OAuthEndpoints.Upstream {
      override def resolve(issuer: String) = {
        calls += 1
        if (fail) Left("issuer unreachable")
        else Right(OAuthEndpoints.UpstreamEndpoints(s"$issuer/a", s"$issuer/t"))
      }
      override def postToken(u: String, f: Map[String, String]) = Right("{}")
    }
    val e = new OAuthEndpoints(cfg(), "http://localhost:8080", flaky, () => NOW)
    assert(e.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")).isLeft)
    fail = false // issuer recovers
    assert(e.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")).isRight)
    val before = calls
    assert(e.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")).isRight)
    assert(calls == before, "successful resolve must be cached")
  }

  test("no state secret configured fails closed, not with a 500") {
    val noSecret = EngineConfig.fromEnv(Map(
      "OAUTH_ENABLED" -> "true", "OAUTH_MODE" -> "proxy",
      "OAUTH_PROVIDER" -> "okta", "OIDC_ISSUER" -> "https://issuer.test",
      "OIDC_CLIENT_ID" -> "cid")).toOption.get
    val e = new OAuthEndpoints(noSecret, "http://localhost:8080", stubUpstream, () => NOW)
    assert(e.authorize(Map("redirect_uri" -> "http://localhost:3000/cb")) ==
      Left("proxy mode requires JWT_SECRET (or OIDC_CLIENT_SECRET) to sign state"))
    assert(e.callback(Map("code" -> "c", "state" -> "x.y")).isLeft)
  }

  test("metadata: proxy mode advertises self, native mode the issuer") {
    val proxyMeta = endpoints().authorizationServerMetadata
    assert(proxyMeta.contains(""""issuer":"http://localhost:8080""""))
    assert(proxyMeta.contains("http://localhost:8080/oauth/authorize"))
    val nativeCfg = cfg("OAUTH_MODE" -> "native")
    val nativeMeta = endpoints(nativeCfg).authorizationServerMetadata
    assert(nativeMeta.contains(""""issuer":"https://issuer.test""""))
    val prm = endpoints().protectedResourceMetadata
    assert(prm.contains("oauth") || prm.contains("authorization_servers"))
  }

  test("deprecated OAUTH_REDIRECT_URI env is honored as fallback") {
    val c = EngineConfig.fromEnv(Map(
      "OAUTH_ENABLED" -> "true", "OAUTH_REDIRECT_URI" -> "https://a.example.com/cb")).toOption.get
    assert(c.oauthRedirectUris == Seq("https://a.example.com/cb"))
    val c2 = EngineConfig.fromEnv(Map("OAUTH_ENABLED" -> "true",
      "OAUTH_ALLOWED_REDIRECT_URIS" -> "https://b.example.com/cb,https://c.example.com/cb",
      "OAUTH_REDIRECT_URI" -> "https://ignored.example.com/cb")).toOption.get
    assert(c2.oauthRedirectUris ==
      Seq("https://b.example.com/cb", "https://c.example.com/cb"))
  }
}
