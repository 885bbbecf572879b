package graft.security

/** OIDC resource-server token validation for the okta / google / azure
  * providers (reference internal/config/config.go:30-36; behavior per
  * docs/oauth.md "Native Mode (Direct OAuth)" steps 4-5: the server
  * validates the client's JWT using the issuer's JWKS, then grants
  * access). Fail-closed throughout: misconfiguration (no issuer, no
  * audience), unreachable JWKS, unknown kid after one refresh, any
  * claim or signature failure — all reject.
  *
  * Provider differences (Okta org servers, Google accounts, Azure AD
  * tenants) are entirely in the configured issuer/audience values —
  * the validation algorithm is identical, which is also how the
  * reference's middleware library treats them.
  */
final class OidcValidator(
    issuer: String,
    audience: String,
    keySource: Jwks.Source,
    nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L,
    leewaySeconds: Long = 60L) {

  /** Validate a compact JWT; Right(user) carries the attribution
    * claims (preferred_username / email / sub). */
  def validate(token: String): Either[String, Attribution.User] = {
    if (issuer.isEmpty) return Left("OIDC_ISSUER is not configured")
    if (audience.isEmpty) return Left("OIDC_AUDIENCE is not configured")
    for {
      parts <- Jwt.parse(token)
      key <- resolveKey(parts)
      _ <- Jwt.verifyAsymmetric(parts, key)
      _ <- Jwt.validateClaims(parts.payload, Some(issuer), Some(audience),
        nowEpochSeconds(), leewaySeconds)
    } yield Jwt.user(parts.payload)
  }

  /** kid → key. Unknown kid triggers ONE JWKS refresh (provider key
    * rotation); a token with no kid matches only a single-key set. */
  private def resolveKey(parts: Jwt.Parts): Either[String, java.security.PublicKey] =
    keySource.keys().flatMap { ks =>
      pick(parts, ks) match {
        case Some(k) => Right(k)
        case None =>
          keySource.refresh().flatMap(fresh =>
            pick(parts, fresh).toRight(
              parts.kid.fold("token has no kid and JWKS is not a single-key set")(k =>
                s"no JWKS key matches kid '$k'")))
      }
    }

  private def pick(parts: Jwt.Parts, ks: Seq[Jwks.Jwk]): Option[java.security.PublicKey] = {
    val wantEc = parts.alg.startsWith("ES")
    val family = ks.filter(k => if (wantEc) k.kty == "EC" else k.kty == "RSA")
    parts.kid match {
      case Some(kid) => family.find(_.kid.contains(kid)).map(_.key)
      case None => family match {
        case Seq(only) => Some(only.key)
        case _ => None
      }
    }
  }
}
