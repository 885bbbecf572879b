package graft.security

import java.net.URI

/** OAuth proxy-mode redirect-URI validation (reference
  * internal/config/config.go:160-168 parses OAUTH_ALLOWED_REDIRECT_URIS
  * with deprecated OAUTH_REDIRECT_URI fallback; docs/oauth.md
  * "Important Security Notes" pins the two modes):
  *
  *  - **Fixed mode** (no URIs configured): ONLY localhost redirect
  *    URIs are accepted — development/testing, prevents open-redirect.
  *  - **Allowlist mode** (URIs configured): exact string match
  *    required; non-localhost entries must be HTTPS.
  */
final class RedirectUris(allowed: Seq[String]) {

  def mode: String = if (allowed.isEmpty) "fixed" else "allowlist"

  def validate(uri: String): Either[String, Unit] =
    parse(uri).flatMap { parsed =>
      if (allowed.isEmpty) {
        if (isLocalhost(parsed)) Right(())
        else Left("fixed redirect mode accepts only localhost redirect URIs")
      } else if (!allowed.contains(uri)) {
        Left("redirect URI is not in the configured allowlist")
      } else if (!isLocalhost(parsed) && parsed.getScheme != "https") {
        Left("non-localhost redirect URIs must use HTTPS")
      } else Right(())
    }

  private def parse(uri: String): Either[String, URI] =
    try {
      val u = new URI(uri)
      if (u.getScheme == null || u.getHost == null) Left("invalid redirect URI")
      else Right(u)
    } catch { case _: Exception => Left("invalid redirect URI") }

  private def isLocalhost(u: URI): Boolean = {
    val h = u.getHost
    h == "localhost" || h == "127.0.0.1" || h == "[::1]" || h == "::1"
  }
}
