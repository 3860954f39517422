package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tick.Auth
import graft.tick.Auth._

/** Auth semantics pinned against the reference's own test tables
  * (auth/auth_test.go Test_Privilege_String / Test_NewUser /
  * Test_User_AuthorizeAction — error strings verbatim) plus the
  * service-level user/subscription laws (services/auth/service.go). */
class AuthSpec extends AnyFunSuite {

  test("privilege strings (Test_Privilege_String)") {
    assert(privilegeString(NoPrivileges) === "none")
    assert(privilegeString(ReadPrivilege) === "read")
    assert(privilegeString(WritePrivilege) === "write")
    assert(privilegeString(DeletePrivilege) === "delete")
    assert(privilegeString(AllPrivileges) === "all")
    assert(privilegeString(AllPrivileges + 1) === "unknown")
  }

  test("newUser cleans resources and folds privilege masks (Test_NewUser)") {
    val u = newUser("u", Nil, admin = false, Map(
      "/a/b/" -> Seq(ReadPrivilege, WritePrivilege),
      "/c/d/../e" -> Seq(DeletePrivilege)))
    assert(u.privilegeMask === Map(
      "/a/b" -> (ReadPrivilege | WritePrivilege),
      "/c/e" -> DeletePrivilege))
    assert(u.privileges("/a/b").toSet === Set(ReadPrivilege, WritePrivilege))
  }

  test("authorizeAction hierarchy, masks, and error strings (Test_User_AuthorizeAction)") {
    def user(priv: Map[String, Seq[Int]], name: String) =
      newUser(name, Nil, admin = false, priv)
    val w = Seq(WritePrivilege)

    // exact resource
    assert(user(Map("/a/b/c" -> w), "bob").authorizeAction("/a/b/c", WritePrivilege).isRight)
    // trailing-slash grant cleans to the same resource
    assert(user(Map("/a/b/" -> w), "jim").authorizeAction("/a/b/c", WritePrivilege).isRight)
    // parent grant authorizes children
    assert(user(Map("/a/b" -> w), "sue").authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/b" -> w, "/c" -> w, "/d" -> w, "/a" -> w), "sue")
      .authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/a/" -> w), "sally").authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/" -> w), "alice").authorizeAction("/a/b/c", WritePrivilege).isRight)
    // unrelated grant: the reference error string verbatim
    assert(user(Map("/c/" -> w), "nick").authorizeAction("/a/b/c", WritePrivilege) ===
      Left("""user nick does not have "write" privilege for resource "/a/b/c""""))
    assert(user(Map("/a/b/c/" -> w), "annie").authorizeAction("/a/b/c", WritePrivilege).isRight)
    // right resource, wrong privilege
    assert(user(Map("/a/b/c" -> Seq(ReadPrivilege)), "fred")
      .authorizeAction("/a/b/c", WritePrivilege) ===
      Left("""user fred does not have "write" privilege for resource "/a/b/c""""))
    // relative resource is invalid
    assert(user(Map("/a/b/c" -> Seq(ReadPrivilege)), "phillip")
      .authorizeAction("a/b/c", WritePrivilege) ===
      Left("""invalid action resource: "a/b/c", must be an absolute path"""))
    // multi-privilege masks
    assert(user(Map("/" -> Seq(WritePrivilege, ReadPrivilege)), "amy")
      .authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/" -> Seq(WritePrivilege, ReadPrivilege, DeletePrivilege)), "andy")
      .authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/" -> Seq(WritePrivilege, DeletePrivilege)), "nicole")
      .authorizeAction("/a/b/c", WritePrivilege).isRight)
    // `all` authorizes anything
    assert(user(Map("/" -> Seq(AllPrivileges)), "nathan")
      .authorizeAction("/a/b/c", WritePrivilege).isRight)
    assert(user(Map("/" -> Seq(ReadPrivilege, DeletePrivilege)), "natalie")
      .authorizeAction("/a/b/c", WritePrivilege) ===
      Left("""user natalie does not have "write" privilege for resource "/a/b/c""""))
    assert(user(Map("/" -> Seq(NoPrivileges)), "katherine")
      .authorizeAction("/a/b/c", WritePrivilege) ===
      Left("""user katherine does not have "write" privilege for resource "/a/b/c""""))
    // path traversal cannot escape: /a/b/c/../../d/e/f cleans to /a/d/e/f
    assert(user(Map("/a/d/e/f" -> Seq(ReadPrivilege)), "cleverbob")
      .authorizeAction("/a/b/c/../../d/e/f", ReadPrivilege).isRight)
    // admin passes everything; NoPrivileges actions always pass
    assert(AdminUser.authorizeAction("/anything", DeletePrivilege).isRight)
    assert(user(Map.empty, "nobody").authorizeAction("/x", NoPrivileges).isRight)
  }

  test("database resources are one-to-one with a clean/dirty marker") {
    assert(databaseResource("") === "/database")
    assert(databaseResource("db_name") === "/database/db_name_clean")
    assert(databaseResource("db/name") === "/database/db_name_dirty")
    // the two forms never collide
    assert(databaseResource("db_name") !== databaseResource("db/name"))
  }

  test("HTTP method privileges and API endpoint errors (handler.go)") {
    assert(requiredPrivilegeForHTTPMethod("head") === Right(NoPrivileges))
    assert(requiredPrivilegeForHTTPMethod("GET") === Right(ReadPrivilege))
    assert(requiredPrivilegeForHTTPMethod("post") === Right(WritePrivilege))
    assert(requiredPrivilegeForHTTPMethod("PATCH") === Right(WritePrivilege))
    assert(requiredPrivilegeForHTTPMethod("DELETE") === Right(DeletePrivilege))
    assert(requiredPrivilegeForHTTPMethod("BREW") === Left("""unknown method "BREW""""))

    val u = newUser("ro", Nil, admin = false,
      Map(apiResource("/tasks") -> Seq(ReadPrivilege)))
    assert(Auth.authorizeRequest(u, "GET", "/kapacitor/v1/tasks/t1").isRight)
    assert(Auth.authorizeRequest(u, "DELETE", "/kapacitor/v1/tasks/t1") ===
      Left("""user ro does not have "delete" privilege for API endpoint "/kapacitor/v1/tasks/t1""""))
  }

  test("service: user lifecycle, authentication cache, failure eviction") {
    var clock = 0L
    val svc = new Auth.Service(cacheExpirationMs = 1000L, now = () => clock)
    svc.createUser("ada", "s3cret", admin = false,
      Map("/database/db_clean" -> Seq(ReadPrivilege)))
    intercept[IllegalArgumentException](svc.createUser("ada", "x", admin = false))
    intercept[IllegalArgumentException](svc.createUser("bad name!", "x", admin = false))

    assert(svc.authenticate("ada", "wrong") === Left("failed to authenticate user"))
    val Right(u) = svc.authenticate("ada", "s3cret"): @unchecked
    assert(u.name === "ada" && !u.admin)
    // cache fast path within expiry; full verify again after expiry
    assert(svc.authenticate("ada", "s3cret").isRight)
    clock = 5000L
    assert(svc.authenticate("ada", "s3cret").isRight)
    assert(svc.authenticate("ada", "nope") === Left("failed to authenticate user"))

    val u2 = svc.updateUser("ada", admin = true, Map.empty)
    assert(u2.admin)
    svc.deleteUser("ada")
    assert(svc.user("ada").isEmpty)
    assert(svc.authenticate("ada", "s3cret").isLeft)
  }

  test("service: subscription tokens grant write to the database resource") {
    val svc = new Auth.Service()
    assert(svc.grantSubscriptionAccess("bad token!", "db", "rp") ===
      Left("""token must be a valid username: "bad token!""""))
    assert(svc.grantSubscriptionAccess("tok1", "mydb", "autogen").isRight)
    assert(svc.grantSubscriptionAccess("tok2", "other/db", "autogen").isRight)
    assert(svc.listSubscriptionTokens() === Seq("tok1", "tok2"))

    val Right(su) = svc.subscriptionUser("tok1"): @unchecked
    assert(su.name === "_sub:tok1" && !su.admin)
    // write to the granted db; ping always; no read on the db; no other db
    assert(su.authorizeAction(databaseResource("mydb"), WritePrivilege).isRight)
    assert(su.authorizeAction(apiResource("/write"), WritePrivilege).isRight)
    assert(su.authorizeAction(apiResource("/ping"), ReadPrivilege).isRight)
    assert(su.authorizeAction(databaseResource("mydb"), ReadPrivilege).isLeft)
    assert(su.authorizeAction(databaseResource("otherdb"), WritePrivilege).isLeft)
    // the prefix is an invalid username, so the account cannot be
    // created or impersonated externally
    intercept[IllegalArgumentException](svc.createUser("_sub:tok3", "x", admin = false))

    // re-grant REPLACES; revoke removes
    assert(svc.grantSubscriptionAccess("tok1", "newdb", "autogen").isRight)
    val Right(su2) = svc.subscriptionUser("tok1"): @unchecked
    assert(su2.authorizeAction(databaseResource("newdb"), WritePrivilege).isRight)
    assert(su2.authorizeAction(databaseResource("mydb"), WritePrivilege).isLeft)
    assert(svc.revokeSubscriptionAccess("tok1").isRight)
    assert(svc.subscriptionUser("tok1") === Left("invalid subscription token"))
    assert(svc.listSubscriptionTokens() === Seq("tok2"))
  }

  test("Go path.Clean parity on the shapes auth uses") {
    assert(pathClean("") === ".")
    assert(pathClean("/") === "/")
    assert(pathClean("/a/b/") === "/a/b")
    assert(pathClean("/a//b") === "/a/b")
    assert(pathClean("/a/b/../c") === "/a/c")
    assert(pathClean("/a/b/c/../../d/e/f") === "/a/d/e/f")
    assert(pathClean("/../a") === "/a")
    assert(pathClean("a/../b") === "b")
    assert(pathDir("/a/b/c") === "/a/b")
    assert(pathDir("/a") === "/")
    assert(pathJoin("/api", "/write") === "/api/write")
  }
}
