package graft

import graft.plans.Authenticators._

/** LdapAuthenticator semantics beyond the q2t gate: the filter
  * grammar, the auth cache (TTL + denial caching, proven by the bind
  * counter), and the reference's config precondition. */
class AuthenticatorsSuite extends org.scalatest.funsuite.AnyFunSuite {

  private def dit(): LdapDirectory = {
    val d = new LdapDirectory
    d.add("uid=amy,ou=people,dc=x", Map(
      "userPassword" -> Set("s3cret"), "uid" -> Set("amy"),
      "dept" -> Set("ml"), "memberOf" -> Set("cn=eng,dc=x")))
    d.add("uid=bob,ou=people,dc=x", Map(
      "userPassword" -> Set("hunter2"), "uid" -> Set("bob"),
      "dept" -> Set("sales")))
    d
  }

  test("filter grammar: eq, and, or; loud on unsupported forms") {
    val attrs = Map("a" -> Set("1"), "b" -> Set("2"))
    assert(parseFilter("(a=1)").matches(attrs))
    assert(!parseFilter("(a=9)").matches(attrs))
    assert(parseFilter("(&(a=1)(b=2))").matches(attrs))
    assert(!parseFilter("(&(a=1)(b=9))").matches(attrs))
    assert(parseFilter("(|(a=9)(b=2))").matches(attrs))
    intercept[IllegalArgumentException](parseFilter("a=1"))
    intercept[IllegalArgumentException](parseFilter("(a~=1)(junk"))
  }

  test("group auth requires the user base DN (the reference check)") {
    val e = intercept[IllegalArgumentException] {
      new LdapAuthenticator(dit(), LdapConfig(
        userBindSearchPattern = "uid=${USER},ou=people,dc=x",
        groupAuthorizationSearchPattern = Some("(uid=${USER})")))
    }
    assert(e.getMessage.contains("Base distinguished name"))
  }

  test("bind outcomes: success, wrong password, unknown user") {
    val auth = new LdapAuthenticator(dit(), LdapConfig(
      userBindSearchPattern = "uid=${USER},ou=people,dc=x"))
    assert(auth.createAuthenticatedPrincipal("amy", "s3cret") == "amy")
    assert(intercept[AccessDenied] {
      auth.createAuthenticatedPrincipal("amy", "nope")
    }.msg == "Invalid credentials")
    assert(intercept[AccessDenied] {
      auth.createAuthenticatedPrincipal("ghost", "x")
    }.msg == "Invalid credentials")
  }

  test("group membership gates the principal with the exact message") {
    val auth = new LdapAuthenticator(dit(), LdapConfig(
      userBindSearchPattern = "uid=${USER},ou=people,dc=x",
      userBaseDistinguishedName = Some("ou=people,dc=x"),
      groupAuthorizationSearchPattern =
        Some("(&(uid=${USER})(memberOf=cn=eng,dc=x))")))
    assert(auth.createAuthenticatedPrincipal("amy", "s3cret") == "amy")
    assert(intercept[AccessDenied] {
      auth.createAuthenticatedPrincipal("bob", "hunter2")
    }.msg == "User [bob] not a member of the authorized group")
  }

  test("auth cache: repeat credentials skip the bind until the TTL") {
    var now = 0L
    val auth = new LdapAuthenticator(dit(), LdapConfig(
      userBindSearchPattern = "uid=${USER},ou=people,dc=x",
      cacheTtlMs = 1000L), clock = () => now)
    auth.createAuthenticatedPrincipal("amy", "s3cret")
    auth.createAuthenticatedPrincipal("amy", "s3cret")
    assert(auth.bindsAttempted.get() == 1L) // second hit served cached
    // denials cache too (the reference caches the thrown exception)
    intercept[AccessDenied](auth.createAuthenticatedPrincipal("amy", "bad"))
    intercept[AccessDenied](auth.createAuthenticatedPrincipal("amy", "bad"))
    assert(auth.bindsAttempted.get() == 2L)
    now = 2000L // past the TTL: the next call re-binds
    auth.createAuthenticatedPrincipal("amy", "s3cret")
    assert(auth.bindsAttempted.get() == 3L)
  }
}
