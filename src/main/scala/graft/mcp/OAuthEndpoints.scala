package graft.mcp

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.collection.immutable.ListMap

import graft.config.EngineConfig
import graft.security.RedirectUris
import graft.service.Json

/** OAuth discovery + proxy-mode endpoints for the HTTP transport
  * (reference internal/mcp/server.go:95-97 registers these through its
  * middleware library; the URL surface is pinned by server.go:124-128
  * logs: `/.well-known/oauth-authorization-server`,
  * `/.well-known/oauth-metadata` (legacy), `/oauth/callback`, plus
  * `/callback` → `/oauth/callback` for Claude Code).
  *
  * Proxy mode (docs/oauth.md "Proxy Mode"): this server fronts the
  * upstream provider. `/oauth/authorize` validates the client's
  * redirect_uri (fixed = localhost-only / allowlist = exact match,
  * [[RedirectUris]]) and 302s to the upstream authorize endpoint with
  * an HMAC-signed state wrapping the client's redirect + state
  * ("HMAC-SHA256 signed state prevents tampering", docs/oauth.md);
  * `/oauth/callback` verifies that signature constant-time, re-checks
  * the redirect allowlist (defense-in-depth), and bounces the provider
  * `code` back to the client; `/oauth/token` forwards the exchange to
  * the upstream token endpoint adding the configured client secret.
  *
  * Upstream endpoint resolution and the token POST are injected so the
  * flow is testable against a stub issuer with zero egress.
  */
final class OAuthEndpoints(cfg: EngineConfig, selfUrl: String,
    upstream: OAuthEndpoints.Upstream = OAuthEndpoints.DiscoveryUpstream,
    nowMillis: () => Long = () => System.currentTimeMillis()) {

  private val redirects = new RedirectUris(cfg.oauthRedirectUris)
  private val stateTtlMillis = 10 * 60 * 1000L

  /** Upstream endpoints, memoized on SUCCESS only: a transient
    * discovery failure must not be cached for the life of the server
    * (it would permanently cripple metadata/authorize/token), and a
    * success must not be re-fetched per request. */
  @volatile private var upstreamCache: Option[OAuthEndpoints.UpstreamEndpoints] = None
  private def resolveUpstream(): Either[String, OAuthEndpoints.UpstreamEndpoints] =
    upstreamCache match {
      case Some(u) => Right(u)
      case None =>
        val r = upstream.resolve(cfg.oidcIssuer)
        r.foreach(u => upstreamCache = Some(u))
        r
    }

  def mode: String = cfg.oauthMode
  def provider: String = cfg.oauthProvider

  // ---------- discovery metadata ----------

  /** RFC 8414-shaped authorization-server metadata. Proxy mode points
    * at this server's own endpoints; native mode at the upstream
    * issuer (the client talks to the provider directly). */
  def authorizationServerMetadata: String = {
    val issuer =
      if (cfg.oauthMode == "proxy" || cfg.oauthProvider == "hmac") selfUrl
      else cfg.oidcIssuer
    val endpoints =
      if (cfg.oauthMode == "proxy")
        ListMap(
          "authorization_endpoint" -> s"$selfUrl/oauth/authorize",
          "token_endpoint" -> s"$selfUrl/oauth/token",
          "registration_endpoint" -> s"$selfUrl/oauth/register")
      else if (cfg.oidcIssuer.nonEmpty)
        resolveUpstream().toOption.map(u => ListMap(
          "authorization_endpoint" -> u.authorizeUrl,
          "token_endpoint" -> u.tokenUrl)).getOrElse(ListMap.empty)
      else ListMap.empty
    Json.write(ListMap[String, Any]("issuer" -> issuer) ++ endpoints ++ ListMap[String, Any](
      "response_types_supported" -> Seq("code"),
      "grant_types_supported" -> Seq("authorization_code", "refresh_token"),
      "code_challenge_methods_supported" -> Seq("S256"),
      "token_endpoint_auth_methods_supported" -> Seq("client_secret_post", "none")))
  }

  /** RFC 9728 protected-resource metadata (advertised in the 401
    * WWW-Authenticate header, server.go:193-196). */
  def protectedResourceMetadata: String = {
    val authServer =
      if (cfg.oauthMode == "proxy" || cfg.oauthProvider == "hmac") selfUrl
      else cfg.oidcIssuer
    Json.write(ListMap[String, Any](
      "resource" -> s"$selfUrl/mcp",
      "authorization_servers" -> Seq(authServer),
      "bearer_methods_supported" -> Seq("header")))
  }

  // ---------- proxy-mode flow ----------

  /** `/oauth/authorize?redirect_uri=…&state=…&code_challenge=…` →
    * Right(upstream 302 Location) or Left(error). */
  def authorize(params: Map[String, String]): Either[String, String] = {
    val redirectUri = params.getOrElse("redirect_uri", "")
    for {
      _ <- requireStateSecret()
      _ <- redirects.validate(redirectUri)
      up <- resolveUpstream()
      _ <- if (cfg.oidcClientId.nonEmpty) Right(())
           else Left("OIDC_CLIENT_ID is not configured for proxy mode")
    } yield {
      val state = signState(ListMap(
        "ru" -> redirectUri,
        "cs" -> params.getOrElse("state", ""),
        "ts" -> nowMillis().toString))
      val q = ListMap(
        "response_type" -> "code",
        "client_id" -> cfg.oidcClientId,
        "redirect_uri" -> s"$selfUrl/oauth/callback",
        "state" -> state) ++
        params.get("scope").map("scope" -> _).toMap ++
        params.get("code_challenge").map("code_challenge" -> _).toMap ++
        params.get("code_challenge_method").map("code_challenge_method" -> _).toMap
      up.authorizeUrl + "?" + encodeQuery(q)
    }
  }

  /** `/oauth/callback?code=…&state=…` from the provider → Right(client
    * redirect Location) carrying the code + the client's original
    * state. The signed state is the only trusted carrier of the
    * client's redirect URI; it is verified AND re-validated against
    * the allowlist (defense-in-depth, docs/oauth.md). */
  def callback(params: Map[String, String]): Either[String, String] =
    for {
      _ <- requireStateSecret()
      code <- params.get("code").filter(_.nonEmpty).toRight("missing code")
      state <- params.get("state").toRight("missing state")
      fields <- verifyState(state)
      redirectUri = fields.getOrElse("ru", "")
      _ <- redirects.validate(redirectUri)
      _ <- fields.get("ts").flatMap(_.toLongOption)
        .filter(ts => nowMillis() - ts < stateTtlMillis)
        .toRight("state expired")
    } yield {
      val clientState = fields.getOrElse("cs", "")
      val sep = if (redirectUri.contains('?')) "&" else "?"
      redirectUri + sep + encodeQuery(ListMap("code" -> code) ++
        (if (clientState.nonEmpty) ListMap("state" -> clientState) else ListMap.empty))
    }

  /** `/oauth/register` (RFC 7591 dynamic client registration) — MCP
    * clients (mcp-remote, Claude Code) bootstrap by registering
    * before the authorize round-trip. Stateless: the returned
    * client_id is an HMAC of the validated redirect set (no registry
    * to persist or leak), and the flow never trusts it for
    * authorization decisions — redirect validation happens per
    * request in [[authorize]]/[[callback]]. */
  def register(body: String): Either[String, String] =
    for {
      _ <- requireStateSecret()
      parsed <- try Json.parse(body) match {
        case m: collection.Map[_, _] =>
          Right(m.toSeq.map { case (k, v) => (String.valueOf(k), v) }.toMap)
        case _ => Left("registration body is not a JSON object")
      } catch { case _: Exception => Left("invalid registration JSON") }
      uris <- parsed.get("redirect_uris") match {
        case Some(xs: Iterable[_]) if xs.nonEmpty =>
          Right(xs.map(String.valueOf).toSeq)
        case _ => Left("redirect_uris is required")
      }
      _ <- uris.foldLeft[Either[String, Unit]](Right(())) { (acc, u) =>
        acc.flatMap(_ => redirects.validate(u))
      }
    } yield {
      val clientId = "graft-" + Base64.getUrlEncoder.withoutPadding.encodeToString(
        hmac(uris.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))).take(22)
      Json.write(ListMap[String, Any](
        "client_id" -> clientId,
        "client_id_issued_at" -> nowMillis() / 1000L,
        "redirect_uris" -> uris,
        "token_endpoint_auth_method" -> "none",
        "grant_types" -> Seq("authorization_code", "refresh_token"),
        "response_types" -> Seq("code")))
    }

  /** `/oauth/token` form params → Right(upstream JSON response).
    * Adds the server-held client credentials (the whole point of proxy
    * mode: the client never sees them, docs/oauth.md). */
  def token(form: Map[String, String]): Either[String, String] =
    for {
      up <- resolveUpstream()
      resp <- upstream.postToken(up.tokenUrl, form ++ ListMap(
        "client_id" -> cfg.oidcClientId,
        "client_secret" -> cfg.oidcClientSecret,
        "redirect_uri" -> s"$selfUrl/oauth/callback"))
    } yield resp

  // ---------- signed state ----------

  private def stateSecret: Array[Byte] = {
    // JWT_SECRET keeps state verifiable across pods (docs/oauth.md
    // "JWT_SECRET must be configured for multi-pod deployments")
    val s = if (cfg.oauthHmacSecret.nonEmpty) cfg.oauthHmacSecret
            else cfg.oidcClientSecret
    s.getBytes(StandardCharsets.UTF_8)
  }

  /** Fail closed (400, not a 500 from an empty-key Mac) when no state
    * secret is configured at all. */
  private def requireStateSecret(): Either[String, Unit] =
    if (stateSecret.nonEmpty) Right(())
    else Left("proxy mode requires JWT_SECRET (or OIDC_CLIENT_SECRET) to sign state")

  private def signState(fields: ListMap[String, String]): String = {
    val payload = Json.write(fields).getBytes(StandardCharsets.UTF_8)
    val enc = Base64.getUrlEncoder.withoutPadding()
    enc.encodeToString(payload) + "." + enc.encodeToString(hmac(payload))
  }

  private def verifyState(state: String): Either[String, Map[String, String]] =
    state.split('.') match {
      case Array(p64, s64) =>
        try {
          val payload = Base64.getUrlDecoder.decode(p64)
          val sig = Base64.getUrlDecoder.decode(s64)
          if (!java.security.MessageDigest.isEqual(hmac(payload), sig))
            Left("invalid state signature")
          else Json.parse(new String(payload, StandardCharsets.UTF_8)) match {
            case m: collection.Map[_, _] =>
              Right(m.toSeq.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }.toMap)
            case _ => Left("invalid state payload")
          }
        } catch { case _: Exception => Left("invalid state encoding") }
      case _ => Left("invalid state format")
    }

  private def hmac(payload: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(stateSecret, "HmacSHA256"))
    mac.doFinal(payload)
  }

  private def encodeQuery(q: Map[String, String]): String =
    q.iterator.map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
}

object OAuthEndpoints {

  final case class UpstreamEndpoints(authorizeUrl: String, tokenUrl: String)

  /** Upstream provider seam: endpoint resolution + the token POST. */
  trait Upstream {
    def resolve(issuer: String): Either[String, UpstreamEndpoints]
    def postToken(tokenUrl: String, form: Map[String, String]): Either[String, String]
  }

  /** Production upstream: OIDC discovery + JDK HTTP client. */
  object DiscoveryUpstream extends Upstream {
    override def resolve(issuer: String): Either[String, UpstreamEndpoints] =
      if (issuer.isEmpty) Left("OIDC_ISSUER is not configured")
      else graft.security.Jwks.Discovery.defaultGet(
        issuer.stripSuffix("/") + "/.well-known/openid-configuration").flatMap { json =>
        try Json.parse(json) match {
          case m: collection.Map[_, _] =>
            val f = m.toSeq.map { case (k, v) => (String.valueOf(k), String.valueOf(v)) }.toMap
            (for (a <- f.get("authorization_endpoint"); t <- f.get("token_endpoint"))
              yield UpstreamEndpoints(a, t))
              .toRight("openid-configuration lacks authorization/token endpoints")
          case _ => Left("openid-configuration is not a JSON object")
        } catch { case e: Exception => Left(s"invalid openid-configuration: ${e.getMessage}") }
      }

    override def postToken(tokenUrl: String, form: Map[String, String]): Either[String, String] = {
      try {
        val body = form.iterator.map { case (k, v) =>
          URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
        }.mkString("&")
        val client = java.net.http.HttpClient.newBuilder()
          .connectTimeout(java.time.Duration.ofSeconds(10)).build()
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(tokenUrl))
          .timeout(java.time.Duration.ofSeconds(10))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) Right(resp.body())
        else Left(s"token endpoint returned HTTP ${resp.statusCode()}: ${resp.body()}")
      } catch { case e: Exception => Left(s"token exchange failed: ${e.getMessage}") }
    }
  }

  /** Parse a query/form string into a map (last value wins). Total:
    * malformed percent-encoding (`%zz`) drops the pair instead of
    * letting URLDecoder's IllegalArgumentException escape the HTTP
    * handler (which would reset the connection with no response). */
  def parseParams(s: String): Map[String, String] = {
    def dec(x: String): Option[String] =
      try Some(URLDecoder.decode(x, "UTF-8"))
      catch { case _: IllegalArgumentException => None }
    Option(s).filter(_.nonEmpty).toSeq.flatMap(_.split('&')).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => for (dk <- dec(k); dv <- dec(v)) yield dk -> dv
        case Array(k) if k.nonEmpty => dec(k).map(_ -> "")
        case _ => None
      }
    }.toMap
  }
}
