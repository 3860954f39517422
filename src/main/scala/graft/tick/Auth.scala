package graft.tick

import scala.collection.mutable

/** Authentication + authorization semantics — the reference's `auth`
  * package (auth/auth.go:1-216) and the user/subscription service on
  * top of it (services/auth/service.go), extracted as a library:
  * privilege bitmasks, the path-hierarchy resource model with lexical
  * cleaning (so `/a/b/../d` cannot escape a grant on `/a/b`), the
  * database-name → path-element mapping with its clean/dirty marker,
  * HTTP-method → privilege mapping (services/httpd/handler.go:672-684),
  * user CRUD with username validation, and subscription-token users
  * (`_sub:<token>` with write access to /api/write, /api/ping and the
  * granted database resource).
  *
  * KDF parity (round 18 closes the formerly-documented deviation): the
  * reference's bcrypt is implemented pure-JVM ([[Bcrypt]], behind the
  * [[Auth.Hasher]] seam as [[Auth.BcryptHasher]]) so reference-created
  * `$2a$...` password hashes verify directly; PBKDF2-HMAC-SHA256 stays
  * the default for fresh stores (JDK-native, faster). The salted-SHA256
  * authentication CACHE (service.go:242-257) is matched as-is.
  */
object Auth {

  // ------------------------------------------------------- privileges

  /** Privilege bitmask (auth.go:18-37): none=1, read=2, write=4,
    * delete=8, all=16 — `all` is its own bit, and a grant of `all`
    * authorizes any action (auth.go:146). */
  val NoPrivileges = 1
  val ReadPrivilege = 2
  val WritePrivilege = 4
  val DeletePrivilege = 8
  val AllPrivileges = 16

  /** PrivilegeList — every single-bit privilege in order. */
  val PrivilegeList: Seq[Int] =
    Seq(NoPrivileges, ReadPrivilege, WritePrivilege, DeletePrivilege, AllPrivileges)

  def privilegeString(p: Int): String = p match {
    case NoPrivileges => "none"
    case ReadPrivilege => "read"
    case WritePrivilege => "write"
    case DeletePrivilege => "delete"
    case AllPrivileges => "all"
    case _ => "unknown"
  }

  // ------------------------------------------------- Go path semantics

  /** Go `path.Clean` — the lexical algorithm (no filesystem): collapse
    * multiple slashes, drop `.`, resolve `..` (rooted paths cannot
    * escape `/`), empty → ".". */
  def pathClean(p: String): String = {
    if (p.isEmpty) return "."
    val rooted = p.startsWith("/")
    val out = mutable.ArrayBuffer.empty[String]
    var dotdot = 0 // count of leading ".." kept on UNROOTED paths
    p.split("/").foreach {
      case "" | "." => ()
      case ".." =>
        if (out.size > dotdot) out.remove(out.size - 1)
        else if (!rooted) { out += ".."; dotdot += 1 }
      case seg => out += seg
    }
    val body = out.mkString("/")
    if (rooted) "/" + body
    else if (body.isEmpty) "."
    else body
  }

  /** Go `path.Dir`: Clean of everything before the final slash. */
  def pathDir(p: String): String = {
    val i = p.lastIndexOf('/')
    pathClean(p.substring(0, i + 1))
  }

  /** Go `path.Join`. */
  def pathJoin(parts: String*): String = {
    val joined = parts.filter(_.nonEmpty).mkString("/")
    if (joined.isEmpty) "" else pathClean(joined)
  }

  // -------------------------------------------------------- resources

  private val databaseRootResource = "/database"
  private val apiRootResource = "/api"

  def apiResource(p: String): String = pathJoin(apiRootResource, p)

  /** Database name → single path element, one-to-one (auth.go:183-215):
    * `/`→`_` with a `_clean`/`_dirty` marker recording whether the name
    * needed mangling. */
  def databaseResource(database: String): String = {
    if (database.isEmpty) return databaseRootResource
    val db = database.replace("/", "_")
    val marked = if (db == database) db + "_clean" else db + "_dirty"
    pathJoin(databaseRootResource, marked)
  }

  // ------------------------------------------------------------- user

  /** Immutable user (auth.go:63-127): resources are path-Cleaned at
    * construction and privileges OR-folded into one mask each. */
  final case class User(
      name: String,
      admin: Boolean,
      hash: Seq[Byte],
      privilegeMask: Map[String, Int]) {

    /** Privileges() — each mask expanded along PrivilegeList. */
    def privileges: Map[String, Seq[Int]] =
      privilegeMask.map { case (r, m) =>
        r -> PrivilegeList.filter(p => (m & p) != 0)
      }

    /** AuthorizeAction (auth.go:129-165): admin and no-privilege
      * actions pass; otherwise walk the cleaned resource path upward
      * until a granted prefix matches; `all` authorizes anything. The
      * Left strings are the reference's error messages verbatim. */
    def authorizeAction(resource: String, privilege: Int): Either[String, Unit] = {
      if (privilege == NoPrivileges || admin) return Right(())
      if (!resource.startsWith("/"))
        return Left(s"""invalid action resource: "$resource", must be an absolute path""")
      if (privilegeMask.nonEmpty) {
        var r = pathClean(resource)
        var done = false
        while (!done) {
          privilegeMask.get(r) match {
            case Some(mask) =>
              if ((mask & privilege) != 0 || mask == AllPrivileges) return Right(())
              done = true // matching resource without the privilege: STOP (no fallthrough)
            case None =>
              if (r == "/") done = true
              else r = pathDir(r)
          }
        }
      }
      Left(s"""user $name does not have "${privilegeString(privilege)}" privilege for resource "$resource"""")
    }
  }

  def newUser(name: String, hash: Seq[Byte], admin: Boolean,
      privileges: Map[String, Seq[Int]]): User =
    User(name, admin, hash,
      privileges.map { case (r, ps) => pathClean(r) -> ps.fold(0)(_ | _) })

  /** The implicit super-user (auth.go:97). */
  val AdminUser: User = newUser("ADMIN_USER", Nil, admin = true, Map.empty)

  // ------------------------------------------- HTTP method → privilege

  /** services/httpd/handler.go:672-684. */
  def requiredPrivilegeForHTTPMethod(method: String): Either[String, Int] =
    method.toUpperCase match {
      case "HEAD" | "OPTIONS" => Right(NoPrivileges)
      case "GET" => Right(ReadPrivilege)
      case "POST" | "PATCH" | "PUT" => Right(WritePrivilege)
      case "DELETE" => Right(DeletePrivilege)
      case m => Left(s"""unknown method "$m"""")
    }

  /** authorizeRequest (handler.go:692-712): method → privilege, path →
    * /api resource, with the API-specific error wording. */
  def authorizeRequest(user: User, method: String, urlPath: String,
      basePath: String = "/kapacitor/v1"): Either[String, Unit] =
    requiredPrivilegeForHTTPMethod(method).flatMap { rp =>
      val res = apiResource(urlPath.stripPrefix(basePath))
      user.authorizeAction(res, rp).left.map { _ =>
        s"""user ${user.name} does not have "${privilegeString(rp)}" privilege for API endpoint "$urlPath""""
      }
    }

  // ----------------------------------------------------------- hashing

  /** Password KDF seam. The default is PBKDF2-HMAC-SHA256 (JDK-native,
    * 64k iterations) — the reference uses bcrypt, which the JDK does
    * not ship; any bcrypt implementation can be plugged here. */
  trait Hasher {
    def hash(password: String): Seq[Byte]
    def verify(password: String, stored: Seq[Byte]): Boolean
  }

  /** The REFERENCE's KDF ([[Bcrypt]], `services/auth/service.go` via
    * golang.org/x/crypto/bcrypt): stores the `$2a$NN$...` modular-crypt
    * string as the hash bytes, exactly what a reference deployment's
    * user store holds — so migrating users' existing bcrypt hashes
    * verify as-is, and hashes created here verify in the reference.
    * Verify accepts $2a/$2b/$2y. Pbkdf2Hasher remains the default for
    * fresh stores (JDK-native, faster); this closes the hash-portability
    * gap for stores created by the reference. */
  final class BcryptHasher(cost: Int = Bcrypt.DefaultCost) extends Hasher {
    def hash(password: String): Seq[Byte] =
      Bcrypt.hashPassword(password, cost).getBytes("UTF-8").toSeq
    def verify(password: String, stored: Seq[Byte]): Boolean =
      Bcrypt.checkPassword(password, new String(stored.toArray, "UTF-8"))
  }

  final class Pbkdf2Hasher(iterations: Int = 65536) extends Hasher {
    private val rand = new java.security.SecureRandom
    def hash(password: String): Seq[Byte] = {
      val salt = new Array[Byte](16); rand.nextBytes(salt)
      (salt ++ derive(password, salt)).toSeq
    }
    def verify(password: String, stored: Seq[Byte]): Boolean = {
      if (stored.length < 16) return false
      val (salt, h) = stored.splitAt(16)
      java.security.MessageDigest.isEqual(
        derive(password, salt.toArray), h.toArray)
    }
    private def derive(password: String, salt: Array[Byte]): Array[Byte] = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iterations, 256)
      javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
    }
  }

  // ----------------------------------------------------------- service

  /** Pattern for valid usernames (service.go:407). */
  private val validUsername = """^[-\._\p{L}0-9@]+$""".r

  /** Prefix identifying subscription-token users — itself an INVALID
    * username, so such users cannot be created externally
    * (service.go:327-331). */
  private val subscriptionUsernamePrefix = "_sub:"

  private val writeResource = apiResource("/write")
  private val pingResource = apiResource("/ping")

  /** The user/subscription service semantics (services/auth/service.go)
    * over an in-memory store — the BoltDB/meta persistence is a
    * declared non-goal shell. Includes the salted-SHA256 authentication
    * cache with expiration (service.go:216-241): a cache hit skips the
    * slow KDF; an expired or missing entry falls through to the full
    * verify and repopulates. */
  final class Service(hasher: Hasher = new Pbkdf2Hasher(),
      cacheExpirationMs: Long = 10 * 60 * 1000L,
      now: () => Long = () => System.currentTimeMillis()) {

    private val users = mutable.Map.empty[String, User]
    private case class Cred(salt: Array[Byte], hash: Array[Byte], expires: Long)
    private val authCache = mutable.Map.empty[String, Cred]
    private val sha = () => java.security.MessageDigest.getInstance("SHA-256")

    def createUser(name: String, password: String, admin: Boolean,
        privileges: Map[String, Seq[Int]] = Map.empty): User = synchronized {
      require(validUsername.findFirstIn(name).isDefined,
        s"invalid username: $name")
      require(!users.contains(name), "user already exists")
      val u = newUser(name, hasher.hash(password), admin, privileges)
      users(name) = u
      u
    }

    def user(name: String): Option[User] = synchronized(users.get(name))

    def updateUser(name: String, admin: Boolean,
        privileges: Map[String, Seq[Int]]): User = synchronized {
      val old = users.getOrElse(name,
        throw new NoSuchElementException(s"user $name does not exist"))
      val u = newUser(name, old.hash, admin, privileges)
      users(name) = u
      u
    }

    def deleteUser(name: String): Unit = synchronized {
      users.remove(name); authCache.remove(name); ()
    }

    /** Authenticate (service.go:195-241): salted-SHA256 cache fast
      * path, full KDF verify on miss/expiry, cache repopulation on
      * success, eviction on failure. */
    def authenticate(name: String, password: String): Either[String, User] = synchronized {
      val u = users.getOrElse(name, return Left(s"user $name does not exist"))
      authCache.get(name) match {
        case Some(c) if c.expires > now() &&
            java.security.MessageDigest.isEqual(hashWithSalt(c.salt, password), c.hash) =>
          return Right(u)
        case _ => ()
      }
      if (!hasher.verify(password, u.hash)) {
        authCache.remove(name)
        Left("failed to authenticate user")
      } else {
        val salt = new Array[Byte](32)
        new java.security.SecureRandom().nextBytes(salt)
        authCache(name) = Cred(salt, hashWithSalt(salt, password),
          now() + cacheExpirationMs)
        Right(u)
      }
    }

    private def hashWithSalt(salt: Array[Byte], password: String): Array[Byte] = {
      val d = sha(); d.update(salt); d.update(password.getBytes("UTF-8")); d.digest()
    }

    // -------------------------------------------- subscription tokens

    private def subscriptionUsername(token: String): Either[String, String] =
      if (validUsername.findFirstIn(token).isEmpty)
        Left(s"""token must be a valid username: "$token"""")
      else Right(subscriptionUsernamePrefix + token)

    /** GrantSubscriptionAccess (service.go:346-372): the token user
      * gets write on /api/write, all on /api/ping, and write on the
      * database resource; an existing grant is REPLACED. */
    def grantSubscriptionAccess(token: String, db: String, rp: String): Either[String, Unit] =
      synchronized {
        subscriptionUsername(token).map { username =>
          val u = newUser(username, Nil, admin = false, Map(
            writeResource -> Seq(WritePrivilege),
            pingResource -> Seq(AllPrivileges),
            databaseResource(db) -> Seq(WritePrivilege)))
          users(username) = u
        }
      }

    def subscriptionUser(token: String): Either[String, User] = synchronized {
      subscriptionUsername(token).flatMap(username =>
        users.get(username).toRight("invalid subscription token"))
    }

    def listSubscriptionTokens(): Seq[String] = synchronized {
      users.keys.filter(_.startsWith(subscriptionUsernamePrefix))
        .map(_.substring(subscriptionUsernamePrefix.length)).toSeq.sorted
    }

    def revokeSubscriptionAccess(token: String): Either[String, Unit] = synchronized {
      subscriptionUsername(token).map { username =>
        users.remove(username); authCache.remove(username); ()
      }
    }
  }
}
