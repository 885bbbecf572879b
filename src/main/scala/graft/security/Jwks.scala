package graft.security

import java.math.BigInteger
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.spec.{ECGenParameterSpec, ECPoint, ECPublicKeySpec, RSAPublicKeySpec}
import java.security.{AlgorithmParameters, KeyFactory, PublicKey}
import java.time.Duration
import java.util.Base64

import graft.service.Json

/** JWKS (RFC 7517) parsing and sourcing for the OIDC providers the
  * reference supports — okta / google / azure
  * (reference internal/config/config.go:30-36; validation behavior per
  * docs/oauth.md "Native Mode": the server validates bearer JWTs using
  * the JWKS published by the configured issuer).
  *
  * Key material is built with `java.security` only: RSA keys from
  * (n, e), EC keys from (crv, x, y) on the named NIST curves. Keys
  * with `use` other than `sig`, unknown `kty`, or malformed fields are
  * skipped — one bad key must not take down the whole set.
  */
object Jwks {

  final case class Jwk(kid: Option[String], kty: String, alg: Option[String], key: PublicKey)

  def parse(json: String): Either[String, Seq[Jwk]] =
    try {
      Json.parse(json) match {
        case m: collection.Map[_, _] =>
          val keys = m.toSeq.collectFirst { case (k, v) if String.valueOf(k) == "keys" => v } match {
            case Some(xs: Iterable[_]) => xs.toSeq
            case _ => return Left("JWKS has no 'keys' array")
          }
          Right(keys.flatMap {
            case km: collection.Map[_, _] =>
              val fields = km.toSeq.map { case (k, v) => (String.valueOf(k), v) }.toMap
              parseKey(fields)
            case _ => None
          })
        case _ => Left("JWKS is not a JSON object")
      }
    } catch { case e: Exception => Left(s"invalid JWKS JSON: ${e.getMessage}") }

  private def parseKey(f: Map[String, Any]): Option[Jwk] = {
    def str(k: String): Option[String] = f.get(k).map(String.valueOf).filter(_.nonEmpty)
    if (str("use").exists(_ != "sig")) return None
    val kid = str("kid")
    val alg = str("alg")
    try str("kty") match {
      case Some("RSA") =>
        for (n <- str("n"); e <- str("e")) yield {
          val spec = new RSAPublicKeySpec(b64ToBigInt(n), b64ToBigInt(e))
          Jwk(kid, "RSA", alg, KeyFactory.getInstance("RSA").generatePublic(spec))
        }
      case Some("EC") =>
        for (crv <- str("crv"); x <- str("x"); y <- str("y"); jca <- curveName(crv)) yield {
          val params = AlgorithmParameters.getInstance("EC")
          params.init(new ECGenParameterSpec(jca))
          val ecSpec = params.getParameterSpec(classOf[java.security.spec.ECParameterSpec])
          val point = new ECPoint(b64ToBigInt(x), b64ToBigInt(y))
          Jwk(kid, "EC", alg,
            KeyFactory.getInstance("EC").generatePublic(new ECPublicKeySpec(point, ecSpec)))
        }
      case _ => None
    } catch { case _: Exception => None }
  }

  private def curveName(crv: String): Option[String] = crv match {
    case "P-256" => Some("secp256r1")
    case "P-384" => Some("secp384r1")
    case "P-521" => Some("secp521r1")
    case _ => None
  }

  private def b64ToBigInt(s: String): BigInteger =
    new BigInteger(1, Base64.getUrlDecoder.decode(s))

  // ---------- key sources ----------

  /** Where validation keys come from. `refresh()` is the
    * unknown-kid escape hatch (provider key rotation). */
  trait Source {
    def keys(): Either[String, Seq[Jwk]]
    def refresh(): Either[String, Seq[Jwk]] = keys()
  }

  /** Fixed JWKS document — inline JSON or a file. The zero-egress
    * deployment path (embedded-engine extension: OIDC_JWKS /
    * OIDC_JWKS_FILE), and the test seam. */
  final class Static(json: String) extends Source {
    private val parsed = parse(json)
    override def keys(): Either[String, Seq[Jwk]] = parsed
  }

  /** Issuer-discovery source: GET `{issuer}/.well-known/openid-configuration`,
    * follow `jwks_uri`, cache the key set. The cache avoids hitting the
    * provider per request (the reference's middleware library does the
    * same); `refresh()` re-fetches at most once per `minRefreshMillis`
    * so a flood of bad-kid tokens cannot DoS the provider.
    */
  final class Discovery(issuer: String,
      httpGet: String => Either[String, String] = Discovery.defaultGet,
      cacheTtlMillis: Long = 5 * 60 * 1000L,
      minRefreshMillis: Long = 30 * 1000L,
      nowMillis: () => Long = () => System.currentTimeMillis()) extends Source {

    @volatile private var cached: Option[(Seq[Jwk], Long)] = None
    // Far past (not 0): the first keys() must always attempt a fetch,
    // even under test clocks that start at 0. Half MinValue so the
    // now - lastFetch subtraction cannot overflow.
    @volatile private var lastFetch = Long.MinValue / 2

    override def keys(): Either[String, Seq[Jwk]] = cached match {
      case Some((ks, at)) if nowMillis() - at < cacheTtlMillis => Right(ks)
      // TTL lapsed but a fetch (success OR failure) happened within the
      // refresh window: serve stale instead of hammering a struggling
      // issuer once per bearer request. `lastFetch` is stamped on every
      // attempt, so failures back off too.
      case Some((ks, _)) if nowMillis() - lastFetch < minRefreshMillis => Right(ks)
      case None if nowMillis() - lastFetch < minRefreshMillis =>
        Left("JWKS fetch failed recently; backing off before retrying discovery")
      case _ => fetch()
    }

    override def refresh(): Either[String, Seq[Jwk]] =
      if (nowMillis() - lastFetch < minRefreshMillis)
        cached.map { case (ks, _) => Right(ks) }.getOrElse(fetch())
      else fetch()

    private def fetch(): Either[String, Seq[Jwk]] = synchronized {
      lastFetch = nowMillis()
      val res = for {
        metaJson <- httpGet(issuer.stripSuffix("/") + "/.well-known/openid-configuration")
        jwksUri <- extractJwksUri(metaJson)
        jwksJson <- httpGet(jwksUri)
        ks <- parse(jwksJson)
      } yield ks
      res match {
        case Right(ks) => cached = Some((ks, nowMillis())); Right(ks)
        case Left(err) => cached match {
          case Some((ks, _)) => Right(ks) // serve stale over failing hard
          case None => Left(err)
        }
      }
    }

    private def extractJwksUri(metaJson: String): Either[String, String] =
      try Json.parse(metaJson) match {
        case m: collection.Map[_, _] =>
          m.toSeq.collectFirst { case (k, v) if String.valueOf(k) == "jwks_uri" => String.valueOf(v) }
            .toRight("openid-configuration has no jwks_uri")
        case _ => Left("openid-configuration is not a JSON object")
      } catch { case e: Exception => Left(s"invalid openid-configuration: ${e.getMessage}") }
  }

  object Discovery {
    /** Plain JDK HTTP GET (no third-party client). */
    def defaultGet(url: String): Either[String, String] =
      try {
        val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(10)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) Right(resp.body())
        else Left(s"GET $url -> HTTP ${resp.statusCode()}")
      } catch { case e: Exception => Left(s"GET $url failed: ${e.getMessage}") }
  }
}
