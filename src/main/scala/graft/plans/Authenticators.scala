package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

/** Password authenticators — the Spark-native re-expression of the
  * reference's LDAP password authenticator
  * (`presto-password-authenticators/.../LdapAuthenticator.java`), the
  * last row of the round-11 audit's missing list.
  *
  * DOCUMENTED SUBSTITUTION (the [[graft.sources.KafkaLog]] pattern):
  * no LDAP server exists in this zero-egress distribution, so the
  * wire half (JNDI `DirContext`) is [[LdapDirectory]], an in-process
  * DIT keyed by distinguished name. Everything above it keeps the
  * reference's semantics, each cited:
  *
  *   - '''Bind-DN template''' (`createPrincipal:139-141` +
  *     `replaceUser:173-176`): the principal is
  *     `userBindSearchPattern` with every `${USER}` replaced.
  *   - '''Simple bind''' (`authenticate:103-116`): wrong DN or wrong
  *     password throws the reference's exact
  *     `Invalid credentials` access-denied error.
  *   - '''Group authorization''' (`checkForGroupMembership:144-171`):
  *     when `groupAuthorizationSearchPattern` is configured (which
  *     REQUIRES `userBaseDistinguishedName`, `:71-72`), a subtree
  *     search under the user base with the `${USER}`-substituted
  *     filter must return at least one entry, else
  *     `User [u] not a member of the authorized group`.
  *   - '''Auth cache''' (`:81-84`): successful AND denied outcomes
  *     cache per (user, password) for `ldapCacheTtl`; the clock is
  *     injectable so the TTL expiry is deterministic under test.
  *
  * The filter evaluator covers the LDAP filter forms the reference's
  * docs use for the pattern — equality `(attr=value)`, conjunction
  * `(&(a)(b))`, disjunction `(|(a)(b))` — and fails loudly beyond.
  *
  * Spark binding: the returned principal is exactly what
  * [[ResourceGroups.select]] consumes as its `user` criterion — the
  * authenticate → select-group → scheduler-pool chain is the
  * reference's own query-admission path re-expressed.
  */
object Authenticators {

  final case class AccessDenied(msg: String)
      extends RuntimeException(msg)

  /** The in-process DIT: dn → attribute multimap. A bindable entry
    * carries `userPassword`. */
  final class LdapDirectory {
    private[plans] val entries =
      new ConcurrentHashMap[String, Map[String, Set[String]]]()

    def add(dn: String, attrs: Map[String, Set[String]]): Unit =
      entries.put(dn.toLowerCase, attrs)

    /** Simple bind: the DN must exist and carry the password. */
    private[plans] def bind(dn: String, password: String): Boolean = {
      val e = entries.get(dn.toLowerCase)
      e != null && e.getOrElse("userPassword", Set.empty).contains(password)
    }

    /** Subtree search: every entry under `base` matching `filter`. */
    private[plans] def search(base: String, filter: Filter): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val suffix = base.toLowerCase
      entries.asScala.collect {
        case (dn, attrs) if dn.endsWith(suffix) && filter.matches(attrs) =>
          dn
      }.toSeq
    }
  }

  // ---- the LDAP filter subset the search patterns use ----
  sealed trait Filter {
    def matches(attrs: Map[String, Set[String]]): Boolean = this match {
      case Eq(a, v) => attrs.getOrElse(a, Set.empty)
        .exists(_.equalsIgnoreCase(v))
      case AndF(fs) => fs.forall(_.matches(attrs))
      case OrF(fs) => fs.exists(_.matches(attrs))
    }
  }
  final case class Eq(attr: String, value: String) extends Filter
  final case class AndF(fs: Seq[Filter]) extends Filter
  final case class OrF(fs: Seq[Filter]) extends Filter

  private[graft] def parseFilter(s: String): Filter = {
    val (f, rest) = parseOne(s.trim)
    require(rest.isEmpty, s"trailing filter text: '$rest'")
    f
  }
  private def parseOne(s: String): (Filter, String) = {
    require(s.startsWith("("), s"LDAP filter must start with '(': $s")
    val inner = s.drop(1)
    inner.headOption match {
      case Some(op @ ('&' | '|')) =>
        var rest = inner.drop(1)
        val parts = Seq.newBuilder[Filter]
        while (rest.startsWith("(")) {
          val (f, r) = parseOne(rest)
          parts += f
          rest = r
        }
        require(rest.startsWith(")"), s"unterminated filter: $s")
        val fs = parts.result()
        (if (op == '&') AndF(fs) else OrF(fs), rest.drop(1))
      case _ =>
        val close = depthClose(s)
        val body = s.substring(1, close)
        val eq = body.indexOf('=')
        require(eq > 0, s"unsupported LDAP filter form: ($body)")
        (Eq(body.substring(0, eq).trim, body.substring(eq + 1).trim),
          s.substring(close + 1))
    }
  }
  private def depthClose(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '(') depth += 1
      else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced LDAP filter: $s")
  }

  final case class LdapConfig(
      userBindSearchPattern: String,
      userBaseDistinguishedName: Option[String] = None,
      groupAuthorizationSearchPattern: Option[String] = None,
      cacheTtlMs: Long = 60000L)

  private def replaceUser(pattern: String, user: String): String =
    pattern.replace("${USER}", user)

  /** The authenticator. `clock` is injectable (the cache-TTL arm must
    * be deterministic under test). */
  final class LdapAuthenticator(dir: LdapDirectory, config: LdapConfig,
      clock: () => Long = () => System.currentTimeMillis()) {

    // the reference REQUIRES a user base when group auth is on (:71-72)
    require(config.groupAuthorizationSearchPattern.isEmpty ||
      config.userBaseDistinguishedName.isDefined,
      "Base distinguished name (DN) for user is null")

    // (user, password) -> (expiry, outcome); denials cache too — the
    // reference caches thrown AccessDeniedException via the loader
    private val cache =
      new ConcurrentHashMap[(String, String), (Long, Either[AccessDenied, String])]()

    /** Binds actually performed — the cache proof. */
    val bindsAttempted = new java.util.concurrent.atomic.AtomicLong(0L)

    def createAuthenticatedPrincipal(user: String, password: String)
        : String = {
      val key = (user, password)
      val now = clock()
      val cached = cache.get(key)
      val outcome =
        if (cached != null && cached._1 > now) cached._2
        else {
          val o = authenticate(user, password)
          cache.put(key, (now + config.cacheTtlMs, o))
          o
        }
      outcome match {
        case Right(principal) => principal
        case Left(denied) => throw denied
      }
    }

    private def authenticate(user: String, password: String)
        : Either[AccessDenied, String] = {
      bindsAttempted.incrementAndGet()
      val dn = replaceUser(config.userBindSearchPattern, user)
      if (!dir.bind(dn, password))
        Left(AccessDenied("Invalid credentials"))
      else config.groupAuthorizationSearchPattern match {
        case None => Right(user)
        case Some(pattern) =>
          val base = config.userBaseDistinguishedName.get
          val filter = parseFilter(replaceUser(pattern, user))
          if (dir.search(base, filter).nonEmpty) Right(user)
          else Left(AccessDenied(
            s"User [$user] not a member of the authorized group"))
      }
    }
  }
}
