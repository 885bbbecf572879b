package graft.security

import org.scalatest.funsuite.AnyFunSuite

/** Redirect-URI validation modes (reference docs/oauth.md "Important
  * Security Notes": fixed mode localhost-only; allowlist mode exact
  * match; HTTPS required for non-localhost). */
class RedirectUrisSpec extends AnyFunSuite {

  test("fixed mode (no allowlist) accepts only localhost") {
    val fixed = new RedirectUris(Nil)
    assert(fixed.mode == "fixed")
    assert(fixed.validate("http://localhost:8765/callback").isRight)
    assert(fixed.validate("http://127.0.0.1/cb").isRight)
    assert(fixed.validate("https://localhost/cb").isRight)
    assert(fixed.validate("https://app.example.com/callback") ==
      Left("fixed redirect mode accepts only localhost redirect URIs"))
    assert(fixed.validate("http://localhost.evil.com/cb").isLeft)
  }

  test("allowlist mode requires exact match") {
    val al = new RedirectUris(Seq("https://app.example.com/callback",
      "http://localhost:3000/cb"))
    assert(al.mode == "allowlist")
    assert(al.validate("https://app.example.com/callback").isRight)
    assert(al.validate("http://localhost:3000/cb").isRight)
    assert(al.validate("https://app.example.com/callback/extra") ==
      Left("redirect URI is not in the configured allowlist"))
    assert(al.validate("https://app.example.com/other").isLeft)
  }

  test("non-localhost allowlist entries must be HTTPS") {
    val al = new RedirectUris(Seq("http://app.example.com/callback"))
    assert(al.validate("http://app.example.com/callback") ==
      Left("non-localhost redirect URIs must use HTTPS"))
  }

  test("malformed URIs rejected") {
    val fixed = new RedirectUris(Nil)
    assert(fixed.validate("not a uri") == Left("invalid redirect URI"))
    assert(fixed.validate("") == Left("invalid redirect URI"))
    assert(fixed.validate("relative/path") == Left("invalid redirect URI"))
  }
}
