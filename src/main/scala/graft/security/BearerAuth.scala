package graft.security

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Bearer-token validation for the HTTP transport's /mcp endpoint.
  *
  * The reference wires an OAuth middleware over every tool handler when
  * OAUTH_ENABLED=true (reference internal/mcp/server.go:45-53,
  * providers hmac/okta/google/azure per internal/config/config.go:30-36).
  * All four providers are supported:
  *
  *  - `hmac`: self-contained shared-secret validation, no network.
  *    Native format is a standard HS256 JWT (docs/jwt.md pins
  *    HMAC-SHA256 signatures and required claims sub/exp); the
  *    pre-r8 two-segment legacy format (`b64(payload).b64(sig)`,
  *    payload `subject[:expiry]`) is still accepted.
  *  - `okta` / `google` / `azure`: full OIDC resource-server
  *    validation (signature via the issuer's JWKS, iss/aud/exp/nbf
  *    claims) through [[OidcValidator]]. Key material comes from
  *    issuer discovery over HTTP, or — zero-egress deployments — an
  *    inline/file JWKS (OIDC_JWKS / OIDC_JWKS_FILE, embedded-engine
  *    extension). Misconfiguration fails closed.
  */
final class BearerAuth(provider: String, secret: String,
    nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L,
    oidc: Option[OidcValidator] = None) {

  /** Validate an Authorization header; Right(principal) on success
    * (username > email > subject precedence, client.go:475-490). */
  def validate(authHeader: Option[String]): Either[String, String] =
    validateUser(authHeader).map(u => Attribution.queryUsername(Some(u)))

  /** Validate and surface the full claim set the control plane reads
    * for attribution / impersonation (handlers.go:31-52). */
  def validateUser(authHeader: Option[String]): Either[String, Attribution.User] =
    authHeader match {
      case None => Left("missing bearer token")
      case Some(h) if !h.startsWith("Bearer ") => Left("malformed Authorization header")
      case Some(h) =>
        val token = h.stripPrefix("Bearer ").trim
        provider match {
          case "hmac" => validateHmac(token)
          case "okta" | "google" | "azure" =>
            oidc.toRight(s"OAuth provider '$provider' requires OIDC_ISSUER and " +
                "OIDC_AUDIENCE (and JWKS reachability) to validate tokens")
              .flatMap(_.validate(token))
          case p => Left(s"unknown OAuth provider '$p'")
        }
    }

  private def validateHmac(token: String): Either[String, Attribution.User] = {
    if (secret.isEmpty) return Left("JWT_SECRET is not configured")
    token.count(_ == '.') match {
      case 2 => validateHmacJwt(token)
      case 1 => validateHmacLegacy(token)
      case _ => Left("invalid token format")
    }
  }

  /** Standard HS256 JWT (docs/jwt.md: HMAC-SHA256 signature; required
    * claims sub, exp). No iss/aud for the hmac provider. */
  private def validateHmacJwt(token: String): Either[String, Attribution.User] =
    for {
      parts <- Jwt.parse(token)
      _ <- Jwt.verifyHmac(parts, secret)
      _ <- Jwt.validateClaims(parts.payload, issuer = None, audience = None,
        nowEpochSeconds())
      user <- {
        val u = Jwt.user(parts.payload)
        if (u.subject.isEmpty) Left("token has no sub claim") else Right(u)
      }
    } yield user

  private def validateHmacLegacy(token: String): Either[String, Attribution.User] =
    token.split('.') match {
      case Array(p64, s64) =>
        val payload =
          try Base64.getUrlDecoder.decode(p64)
          catch { case _: IllegalArgumentException => return Left("invalid token encoding") }
        val expected =
          try Base64.getUrlDecoder.decode(s64)
          catch { case _: IllegalArgumentException => return Left("invalid token encoding") }
        if (!java.security.MessageDigest.isEqual(sign(payload), expected))
          Left("invalid token signature")
        else {
          val subject = new String(payload, StandardCharsets.UTF_8)
          subject.split(':') match {
            case Array(sub, exp) if exp.forall(_.isDigit) =>
              if (exp.toLong < nowEpochSeconds()) Left("token expired")
              else Right(Attribution.User(subject = sub))
            case _ => Right(Attribution.User(subject = subject))
          }
        }
      case _ => Left("invalid token format")
    }

  private def sign(payload: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(payload)
  }
}

object BearerAuth {
  /** Mint a legacy two-segment token (tests and local tooling). */
  def mint(secret: String, subject: String, expiry: Option[Long] = None): String = {
    val payload = (subject + expiry.map(e => s":$e").getOrElse(""))
      .getBytes(StandardCharsets.UTF_8)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    val enc = Base64.getUrlEncoder.withoutPadding()
    enc.encodeToString(payload) + "." + enc.encodeToString(mac.doFinal(payload))
  }

  /** Mint a reference-native HS256 JWT for the hmac provider. */
  def mintJwt(secret: String, subject: String, expiry: Long,
      extraClaims: Map[String, Any] = Map.empty): String =
    Jwt.mintHs256(secret,
      scala.collection.immutable.ListMap[String, Any]("sub" -> subject, "exp" -> expiry) ++ extraClaims)

  /** Build from config iff OAuth is enabled (server.go:45: OAUTH_ENABLED
    * gates the middleware entirely). OIDC providers get a validator
    * wired to the configured JWKS source: inline > file > issuer
    * discovery over HTTP. */
  def fromConfig(cfg: graft.config.EngineConfig): Option[BearerAuth] =
    if (!cfg.oauthEnabled) None
    else {
      val oidc = cfg.oauthProvider match {
        case "okta" | "google" | "azure" if cfg.oidcIssuer.nonEmpty =>
          val source: Jwks.Source =
            if (cfg.oidcJwks.nonEmpty) new Jwks.Static(cfg.oidcJwks)
            else if (cfg.oidcJwksFile.nonEmpty)
              new Jwks.Static(
                try new String(java.nio.file.Files.readAllBytes(
                  java.nio.file.Paths.get(cfg.oidcJwksFile)), StandardCharsets.UTF_8)
                catch { case _: Exception => "" })
            else new Jwks.Discovery(cfg.oidcIssuer)
          Some(new OidcValidator(cfg.oidcIssuer, cfg.oidcAudience, source))
        case _ => None
      }
      Some(new BearerAuth(cfg.oauthProvider, cfg.oauthHmacSecret, oidc = oidc))
    }
}
