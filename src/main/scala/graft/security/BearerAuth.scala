package graft.security

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Bearer-token validation for the HTTP transport's /mcp endpoint.
  *
  * The reference wires an OAuth middleware over every tool handler when
  * OAUTH_ENABLED=true (reference internal/mcp/server.go:45-53,
  * providers hmac/okta/google/azure per internal/config/config.go:70-73).
  * Embedded disposition:
  *  - `hmac` (the reference's default provider) is fully supported:
  *    self-contained shared-secret validation, no network required.
  *    Token format: `base64url(payload) + "." + base64url(
  *    HMAC-SHA256(secret, payload))`, payload = the subject string,
  *    optionally `subject:expiryEpochSeconds`.
  *  - OIDC providers (okta/google/azure) require fetching issuer
  *    metadata + JWKS over the network; a zero-egress embedded engine
  *    cannot validate those tokens, so requests are REJECTED (fail
  *    closed) rather than waved through. Documented in DIALECT.md.
  */
final class BearerAuth(provider: String, secret: String,
    nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L) {

  /** Validate an Authorization header value; Right(subject) on success. */
  def validate(authHeader: Option[String]): Either[String, String] =
    authHeader match {
      case None => Left("missing bearer token")
      case Some(h) if !h.startsWith("Bearer ") => Left("malformed Authorization header")
      case Some(h) =>
        provider match {
          case "hmac" => validateHmac(h.stripPrefix("Bearer ").trim)
          case p => Left(s"OAuth provider '$p' requires issuer/JWKS network " +
            "access unavailable to the embedded engine; use provider hmac")
        }
    }

  private def validateHmac(token: String): Either[String, String] = {
    if (secret.isEmpty) return Left("OAUTH_HMAC_SECRET is not configured")
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
              if (exp.toLong < nowEpochSeconds()) Left("token expired") else Right(sub)
            case _ => Right(subject)
          }
        }
      case _ => Left("invalid token format")
    }
  }

  private def sign(payload: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(payload)
  }
}

object BearerAuth {
  /** Mint a token (exposed for tests and local tooling). */
  def mint(secret: String, subject: String, expiry: Option[Long] = None): String = {
    val payload = (subject + expiry.map(e => s":$e").getOrElse(""))
      .getBytes(StandardCharsets.UTF_8)
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    val enc = Base64.getUrlEncoder.withoutPadding()
    enc.encodeToString(payload) + "." + enc.encodeToString(mac.doFinal(payload))
  }

  /** Build from config iff OAuth is enabled (server.go:45: OAUTH_ENABLED
    * gates the middleware entirely). */
  def fromConfig(cfg: graft.config.EngineConfig): Option[BearerAuth] =
    if (cfg.oauthEnabled) Some(new BearerAuth(cfg.oauthProvider, cfg.oauthHmacSecret))
    else None
}
