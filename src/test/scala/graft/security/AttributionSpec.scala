package graft.security

import org.scalatest.funsuite.AnyFunSuite

import Attribution.User

/** Pinned attribution precedence (reference client_test.go:448-498) and
  * impersonation field selection (handlers.go:31-52). */
class AttributionSpec extends AnyFunSuite {

  test("user with email") {
    assert(Attribution.queryUsername(Some(User(email = "abc@example.com"))) == "abc@example.com")
  }
  test("user with username") {
    assert(Attribution.queryUsername(Some(User(username = "abc@example.com"))) == "abc@example.com")
  }
  test("username wins over email") {
    assert(Attribution.queryUsername(
      Some(User(username = "abc@example.com", email = "def@example.com"))) == "abc@example.com")
  }
  test("subject as last resort") {
    assert(Attribution.queryUsername(Some(User(subject = "abc@example.com"))) == "abc@example.com")
  }
  test("empty user yields no attribution") {
    assert(Attribution.queryUsername(Some(User())) == "")
  }
  test("no user yields no attribution") {
    assert(Attribution.queryUsername(None) == "")
  }

  test("impersonation field selection: email/subject/username/default") {
    val u = Some(User(username = "u", email = "e", subject = "s"))
    assert(Attribution.impersonationPrincipal(u, "email") == "e")
    assert(Attribution.impersonationPrincipal(u, "subject") == "s")
    assert(Attribution.impersonationPrincipal(u, "username") == "u")
    assert(Attribution.impersonationPrincipal(u, "anything-else") == "u")
    assert(Attribution.impersonationPrincipal(None, "email") == "")
  }
}
