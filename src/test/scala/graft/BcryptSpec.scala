package graft

import graft.tick.{Auth, Bcrypt}
import org.scalatest.funsuite.AnyFunSuite

/** Bcrypt KDF parity (tick/Bcrypt vs golang.org/x/crypto/bcrypt as used
  * by services/auth). The fixed vectors were produced by glibc crypt(3)'s
  * bcrypt ($2b$ — byte-identical to $2a$ for ≤72-byte passwords); the
  * first four match the classic public jBCrypt/OpenWall test suite. */
class BcryptSpec extends AnyFunSuite {

  private val vectors = Seq(
    ("", "$2b$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    ("a", "$2b$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2b$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    ("abcdefghijklmnopqrstuvwxyz",
      "$2b$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC"),
    ("~!@#$%^&*()      ~!@#$%^&*()PNBFRD",
      "$2b$06$fPIsBO8qRqkjj273rfaOI.HtSV9jLDpTbZn782DC6/t7qT67P6FfO"),
    ("password", "$2b$10$k1wbIrmNyFAPwPVPSVa/zeG7ZkWAwgNRuKAfa/M8yMeVMyfgw/Uyy"),
    ("correct horse battery staple",
      "$2b$08$aTsUwsyowQuzRrDqFflhge/lrMMdoEhDrgav9iTF8ko3OgxkENFlS"))

  test("known bcrypt hashes verify (reference-created stores port over)") {
    for ((pw, stored) <- vectors) {
      assert(Bcrypt.checkPassword(pw, stored), s"vector failed for '$pw'")
      assert(!Bcrypt.checkPassword(pw + "x", stored), s"wrong password accepted for '$pw'")
    }
  }

  test("re-deriving a vector from its salt reproduces the exact hash string") {
    for ((pw, stored) <- vectors) {
      val cost = stored.slice(4, 6).toInt
      val salt = Bcrypt.b64Decode(stored.slice(7, 29), 16)
      val mine = Bcrypt.format(pw.getBytes("UTF-8"), salt, cost)
      // we emit the $2a prefix (what GenerateFromPassword writes); bodies
      // are identical to glibc's $2b
      assert(mine === "$2a" + stored.drop(3))
    }
  }

  test("hashPassword → checkPassword round-trip with a random salt") {
    val h = Bcrypt.hashPassword("s3cret", cost = 6)
    assert(h.startsWith("$2a$06$") && h.length === 60)
    assert(Bcrypt.checkPassword("s3cret", h))
    assert(!Bcrypt.checkPassword("s3cret!", h))
  }

  test("malformed stored strings are rejected, never thrown") {
    assert(!Bcrypt.checkPassword("x", ""))
    assert(!Bcrypt.checkPassword("x", "$2a$06$short"))
    assert(!Bcrypt.checkPassword("x", "$1$md5crypt$whatever"))
    assert(!Bcrypt.checkPassword("x", "$2a$99$" + "A" * 53)) // cost out of range
  }

  test("bcrypt base64 round-trips both payload sizes") {
    val salt = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    assert(Bcrypt.b64Decode(Bcrypt.b64Encode(salt), 16).toSeq === salt.toSeq)
    val h = Array.tabulate(23)(i => (255 - i * 11).toByte)
    assert(Bcrypt.b64Decode(Bcrypt.b64Encode(h), 23).toSeq === h.toSeq)
  }

  test("long-password parity: Generate rejects >72, Compare keys on first 72") {
    val long72 = "x" * 72
    val h = Bcrypt.hashPassword(long72, cost = 4)
    // CompareHashAndPassword never length-checks; its EKS schedule reads
    // exactly 72 key bytes, so the tail can't affect the verdict
    assert(Bcrypt.checkPassword(long72 + "tail-that-is-ignored", h))
    // GenerateFromPassword returns ErrPasswordTooLong for >72 bytes
    intercept[IllegalArgumentException] { Bcrypt.hashPassword("x" * 73, cost = 4) }
  }

  test("BcryptHasher plugs into the auth service seam") {
    val svc = new Auth.Service(hasher = new Auth.BcryptHasher(cost = 4))
    assert(svc.createUser("alice", "wonderland", admin = true, Map.empty).name === "alice")
    assert(svc.authenticate("alice", "wonderland").isRight)
    assert(svc.authenticate("alice", "rabbit").isLeft)
    // a hash copied from a reference user store verifies through the seam
    val h = new Auth.BcryptHasher()
    assert(h.verify("abc",
      "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i".getBytes("UTF-8").toSeq))
  }
}
