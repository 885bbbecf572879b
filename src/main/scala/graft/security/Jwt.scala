package graft.security

import java.nio.charset.StandardCharsets
import java.security.{PublicKey, Signature}
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import graft.service.Json

/** Compact JWS (JWT) parsing and verification — the token format every
  * OAuth provider the reference supports emits (reference
  * internal/config/config.go:27-38 providers hmac/okta/google/azure;
  * validation semantics per docs/jwt.md + docs/oauth.md: signature,
  * iss, aud, exp/nbf, then claim extraction sub / preferred_username /
  * email for attribution, internal/mcp/handlers.go:31-52).
  *
  * Pure JVM (`java.security`) — no third-party crypto. Supported
  * algorithms: HS256 (shared secret, the hmac provider), RS256/384/512
  * and ES256/384/512 (JWKS keys, the OIDC providers). `alg:none` and
  * cross-family confusion (an HS token against an RSA key, or vice
  * versa) are structurally impossible: the caller picks the verifier,
  * and each verifier accepts only its own family.
  */
object Jwt {

  /** Decoded-but-unverified token. `signingInput` is the exact byte
    * sequence the signature covers (`b64(header) + "." + b64(payload)`). */
  final case class Parts(
      header: Map[String, Any],
      payload: Map[String, Any],
      signingInput: Array[Byte],
      signature: Array[Byte]) {
    def alg: String = header.get("alg").map(String.valueOf).getOrElse("")
    def kid: Option[String] = header.get("kid").map(String.valueOf)
  }

  def parse(token: String): Either[String, Parts] =
    // limit -1: an alg=none token ends in '.', the empty signature
    // segment must survive the split to be rejected as such
    token.split("\\.", -1) match {
      case Array(h64, p64, s64) =>
        for {
          h <- b64Url(h64)
          p <- b64Url(p64)
          s <- b64Url(s64)
          hJson <- parseObj(new String(h, StandardCharsets.UTF_8), "header")
          pJson <- parseObj(new String(p, StandardCharsets.UTF_8), "payload")
        } yield Parts(hJson, pJson,
          (h64 + "." + p64).getBytes(StandardCharsets.US_ASCII), s)
      case _ => Left("invalid token format")
    }

  private def b64Url(s: String): Either[String, Array[Byte]] =
    try Right(Base64.getUrlDecoder.decode(s))
    catch { case _: IllegalArgumentException => Left("invalid token encoding") }

  private def parseObj(s: String, what: String): Either[String, Map[String, Any]] =
    try Json.parse(s) match {
      case m: collection.Map[_, _] =>
        Right(m.toSeq.map { case (k, v) => (String.valueOf(k), v) }.toMap)
      case _ => Left(s"JWT $what is not a JSON object")
    } catch { case _: Exception => Left(s"JWT $what is not valid JSON") }

  // ---------- signature verification ----------

  /** HS256 over the signing input (hmac provider; docs/jwt.md pins
    * HMAC-SHA256). Constant-time compare. */
  def verifyHmac(parts: Parts, secret: String): Either[String, Unit] = {
    if (parts.alg != "HS256") return Left(s"unsupported algorithm '${parts.alg}' for hmac provider")
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    if (java.security.MessageDigest.isEqual(mac.doFinal(parts.signingInput), parts.signature))
      Right(())
    else Left("invalid token signature")
  }

  /** Asymmetric verification for the OIDC providers. Only the RS and
    * ES families — any other `alg` (none, HS256) is rejected before a
    * key is touched, closing the classic key-confusion hole. */
  def verifyAsymmetric(parts: Parts, key: PublicKey): Either[String, Unit] = {
    val (jcaAlg, isEc) = parts.alg match {
      case "RS256" => ("SHA256withRSA", false)
      case "RS384" => ("SHA384withRSA", false)
      case "RS512" => ("SHA512withRSA", false)
      case "ES256" => ("SHA256withECDSA", true)
      case "ES384" => ("SHA384withECDSA", true)
      case "ES512" => ("SHA512withECDSA", true)
      case other => return Left(s"unsupported algorithm '$other'")
    }
    val familyOk = (isEc && key.getAlgorithm == "EC") ||
      (!isEc && key.getAlgorithm == "RSA")
    if (!familyOk) return Left(s"algorithm '${parts.alg}' does not match key type ${key.getAlgorithm}")
    val sigBytes =
      if (isEc) joseEcToDer(parts.signature) match {
        case Right(der) => der
        case Left(e) => return Left(e)
      } else parts.signature
    try {
      val sig = Signature.getInstance(jcaAlg)
      sig.initVerify(key)
      sig.update(parts.signingInput)
      if (sig.verify(sigBytes)) Right(()) else Left("invalid token signature")
    } catch { case e: Exception => Left(s"signature verification failed: ${e.getMessage}") }
  }

  /** JOSE ECDSA signatures are raw `R || S` (fixed width); JCA expects
    * ASN.1 DER `SEQUENCE { INTEGER r, INTEGER s }`. */
  private[security] def joseEcToDer(rs: Array[Byte]): Either[String, Array[Byte]] = {
    if (rs.isEmpty || rs.length % 2 != 0) return Left("invalid ECDSA signature length")
    val half = rs.length / 2
    def asInteger(bytes: Array[Byte]): Array[Byte] = {
      val stripped = bytes.dropWhile(_ == 0) match {
        case Array() => Array[Byte](0)
        case a => a
      }
      if ((stripped(0) & 0x80) != 0) Array[Byte](0) ++ stripped else stripped
    }
    def lenBytes(n: Int): Array[Byte] =
      if (n < 128) Array(n.toByte)
      else if (n < 256) Array(0x81.toByte, n.toByte)
      else Array(0x82.toByte, (n >> 8).toByte, (n & 0xff).toByte)
    val r = asInteger(rs.take(half))
    val s = asInteger(rs.drop(half))
    val body = Array[Byte](2) ++ lenBytes(r.length) ++ r ++ Array[Byte](2) ++ lenBytes(s.length) ++ s
    Right(Array[Byte](0x30) ++ lenBytes(body.length) ++ body)
  }

  // ---------- claims ----------

  /** Standard OIDC resource-server claim checks, mirroring what the
    * reference's middleware enforces (docs/jwt.md "Claims Validation"):
    * `iss` must equal the configured issuer, `aud` must contain the
    * configured audience (string or array form), `exp` is required and
    * in the future, `nbf` honored when present. 60 s clock leeway. */
  def validateClaims(payload: Map[String, Any], issuer: Option[String],
      audience: Option[String], nowEpochSeconds: Long,
      leewaySeconds: Long = 60L): Either[String, Unit] = {
    val issBad = issuer.filter(_.nonEmpty).exists(iss =>
      !payload.get("iss").map(String.valueOf).contains(iss))
    val audBad = audience.filter(_.nonEmpty).exists { aud =>
      payload.get("aud") match {
        case Some(s: String) => s != aud
        case Some(xs: Iterable[_]) => !xs.exists(String.valueOf(_) == aud)
        case _ => true
      }
    }
    if (issBad) Left("invalid token issuer")
    else if (audBad) Left("invalid token audience")
    else numClaim(payload, "exp") match {
      case None => Left("token has no expiry")
      case Some(exp) if exp + leewaySeconds < nowEpochSeconds => Left("token expired")
      case _ =>
        numClaim(payload, "nbf") match {
          case Some(nbf) if nbf - leewaySeconds > nowEpochSeconds => Left("token not yet valid")
          case _ => Right(())
        }
    }
  }

  private def numClaim(payload: Map[String, Any], name: String): Option[Long] =
    payload.get(name).flatMap {
      case n: Int => Some(n.toLong)
      case n: Long => Some(n)
      case n: Double => Some(n.toLong)
      case n: BigDecimal => Some(n.toLong)
      case n: java.math.BigDecimal => Some(n.longValue)
      case s: String => s.toLongOption
      case _ => None
    }

  /** Principal extraction: the three claims the reference's handlers
    * read for attribution / impersonation (handlers.go:31-52 via
    * oauth.User: preferred_username, email, sub). */
  def user(payload: Map[String, Any]): Attribution.User = {
    def str(k: String) = payload.get(k).map(String.valueOf).getOrElse("")
    Attribution.User(
      username = str("preferred_username"),
      email = str("email"),
      subject = str("sub"))
  }

  // ---------- minting (tests + local tooling) ----------

  private def enc(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding().encodeToString(bytes)

  /** Mint an HS256 JWT (the hmac provider's native format). */
  def mintHs256(secret: String, claims: Map[String, Any],
      extraHeader: Map[String, Any] = Map.empty): String = {
    val header = scala.collection.immutable.ListMap[String, Any]("alg" -> "HS256", "typ" -> "JWT") ++ extraHeader
    val si = enc(Json.write(header).getBytes(StandardCharsets.UTF_8)) + "." +
      enc(Json.write(claims).getBytes(StandardCharsets.UTF_8))
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    si + "." + enc(mac.doFinal(si.getBytes(StandardCharsets.US_ASCII)))
  }

  /** Mint an asymmetric JWT (tests: RS256 / ES256 against a generated
    * keypair). For ES*, converts the DER signature JCA produces back to
    * JOSE `R || S` at the curve's fixed width. */
  def mintAsymmetric(priv: java.security.PrivateKey, alg: String,
      claims: Map[String, Any], kid: Option[String] = None): String = {
    val jca = alg match {
      case "RS256" => "SHA256withRSA"
      case "RS384" => "SHA384withRSA"
      case "RS512" => "SHA512withRSA"
      case "ES256" => "SHA256withECDSA"
      case "ES384" => "SHA384withECDSA"
      case "ES512" => "SHA512withECDSA"
      case other => throw new IllegalArgumentException(s"unsupported alg $other")
    }
    val header = scala.collection.immutable.ListMap[String, Any]("alg" -> alg, "typ" -> "JWT") ++
      kid.map("kid" -> (_: Any)).toMap
    val si = enc(Json.write(header).getBytes(StandardCharsets.UTF_8)) + "." +
      enc(Json.write(claims).getBytes(StandardCharsets.UTF_8))
    val sig = Signature.getInstance(jca)
    sig.initSign(priv)
    sig.update(si.getBytes(StandardCharsets.US_ASCII))
    val raw = sig.sign()
    val sigBytes = if (alg.startsWith("ES")) derToJoseEc(raw, alg) else raw
    si + "." + enc(sigBytes)
  }

  private def derToJoseEc(der: Array[Byte], alg: String): Array[Byte] = {
    val width = alg match {
      case "ES256" => 32
      case "ES384" => 48
      case _ => 66 // P-521
    }
    // DER: 30 len 02 lenR R 02 lenS S  (len may be multi-byte; walk it)
    var i = 1
    def readLen(): Int = {
      val b = der(i) & 0xff; i += 1
      if (b < 0x80) b
      else { var n = 0; var k = b - 0x80; while (k > 0) { n = (n << 8) | (der(i) & 0xff); i += 1; k -= 1 }; n }
    }
    readLen() // sequence length
    require(der(i) == 2); i += 1
    val rLen = readLen()
    val r = der.slice(i, i + rLen); i += rLen
    require(der(i) == 2); i += 1
    val sLen = readLen()
    val s = der.slice(i, i + sLen)
    def fixed(x: Array[Byte]): Array[Byte] = {
      val t = x.dropWhile(_ == 0)
      Array.fill[Byte](width - t.length)(0) ++ t
    }
    fixed(r) ++ fixed(s)
  }
}
