package graft.tick

/** Pure-JVM bcrypt (Provos & Mazières, "A Future-Adaptable Password
  * Scheme", USENIX 1999) — the KDF the reference's auth service stores
  * (`services/auth` via golang.org/x/crypto/bcrypt), so password hashes
  * created by a reference deployment verify here directly. Produces and
  * parses the modular-crypt format `$2a$NN$<22-char salt><31-char hash>`
  * ($2b/$2y parse as the same algorithm — they differ from $2a only for
  * >72-byte passwords). Long-password parity with x/crypto: hashPassword
  * REJECTS >72-byte passwords (GenerateFromPassword's ErrPasswordTooLong);
  * checkPassword keys on the first 72 bytes (CompareHashAndPassword never
  * length-checks — its EKS schedule reads exactly 72 key bytes).
  *
  * Algorithm notes (matching x/crypto/bcrypt + blowfish bit-for-bit):
  *  - key = password bytes + one 0x00 terminator, cycled;
  *  - EksBlowfishSetup: salted key schedule once (the 16-byte salt XORed
  *    into the chained L/R as a cyclic 4-word stream through the P array
  *    AND all four S-boxes), then 2^cost alternating plain expansions
  *    with the key and the salt;
  *  - ciphertext = "OrpheanBeholderScryDoubt" ECB-encrypted 64 times per
  *    8-byte block, emitted big-endian, truncated to 23 bytes;
  *  - bcrypt's own base64 alphabet (`./A-Za-z0-9`), no padding.
  *
  * The Blowfish initial P/S tables are the first 8,336 hexadecimal digits
  * of π. Rather than embedding the 1,042-word constant blob, they are
  * GENERATED once at class load from Machin's formula
  * (π = 16·arctan(1/5) − 4·arctan(1/239)) in exact BigInteger arithmetic
  * with ~40 guard digits, and spot-checked against the published first
  * and last P-array words — a transcription error is structurally
  * impossible and any generation error fails loudly at init.
  */
object Bcrypt {

  val MinCost = 4
  val MaxCost = 31
  val DefaultCost = 10 // x/crypto/bcrypt.DefaultCost

  // ------------------------------------------------- π-derived tables

  private val NWords = 18 + 4 * 256

  private lazy val piWords: Array[Int] = {
    import java.math.BigInteger
    // 1042 words × 8 hex digits = 8336 hex ≈ 10037 decimal digits; the
    // extra ~43 decimal digits absorb series truncation + the ~2.6e7 ulp
    // worst-case drift of the truncating divides
    val scale = 10080
    val ten = BigInteger.TEN.pow(scale)
    def atanInv(x: Long): BigInteger = {
      var term = ten.divide(BigInteger.valueOf(x))
      var sum = term
      val x2 = BigInteger.valueOf(x * x)
      var k = 1
      while (term.signum != 0) {
        term = term.divide(x2)
        val t = term.divide(BigInteger.valueOf(2L * k + 1))
        sum = if (k % 2 == 1) sum.subtract(t) else sum.add(t)
        k += 1
      }
      sum
    }
    val pi = atanInv(5).multiply(BigInteger.valueOf(16))
      .subtract(atanInv(239).multiply(BigInteger.valueOf(4)))
    val frac = pi.subtract(BigInteger.valueOf(3).multiply(ten))
    val nHex = NWords * 8
    // ⌊frac · 16^nHex / 10^scale⌋ — one multiply + one divide, and the
    // hex expansion IS the digit string
    val hexInt = frac.multiply(BigInteger.ONE.shiftLeft(4 * nHex)).divide(ten)
    val hex = {
      val s = hexInt.toString(16)
      "0" * (nHex - s.length) + s
    }
    val out = new Array[Int](NWords)
    var i = 0
    while (i < NWords) {
      out(i) = java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16).toInt
      i += 1
    }
    // published Blowfish schedule endpoints (Schneier's tables): any
    // generation slip breaks these before it can break a hash silently
    require(out(0) == 0x243f6a88 && out(1) == 0x85a308d3 &&
      out(17) == 0x8979fb1b,
      "π digit generation does not reproduce the Blowfish P array")
    out
  }

  // ------------------------------------------------- Blowfish machine

  private final class State {
    val P: Array[Int] = java.util.Arrays.copyOfRange(piWords, 0, 18)
    val S: Array[Array[Int]] = Array.tabulate(4)(b =>
      java.util.Arrays.copyOfRange(piWords, 18 + 256 * b, 18 + 256 * (b + 1)))

    @inline private def f(x: Int): Int =
      ((S(0)(x >>> 24) + S(1)((x >>> 16) & 0xff)) ^ S(2)((x >>> 8) & 0xff)) + S(3)(x & 0xff)

    /** One block; returns L in the high 32 bits, R in the low. */
    def encrypt(l0: Int, r0: Int): Long = {
      var l = l0; var r = r0
      var i = 0
      while (i < 16) {
        l ^= P(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t
      r ^= P(16)
      l ^= P(17)
      (l.toLong << 32) | (r.toLong & 0xffffffffL)
    }

    /** Plain key schedule (blowfish.ExpandKey): P ^= cyclic key words,
      * then re-key P and all S from the chained zero-seeded encryption. */
    def expandKey(key: Array[Byte]): Unit = {
      var off = 0
      def nextWord(): Int = {
        var w = 0; var j = 0
        while (j < 4) { w = (w << 8) | (key(off) & 0xff); off = (off + 1) % key.length; j += 1 }
        w
      }
      var i = 0
      while (i < 18) { P(i) ^= nextWord(); i += 1 }
      var lr = 0L
      i = 0
      while (i < 18) {
        lr = encrypt((lr >>> 32).toInt, lr.toInt)
        P(i) = (lr >>> 32).toInt; P(i + 1) = lr.toInt
        i += 2
      }
      var b = 0
      while (b < 4) {
        var j = 0
        while (j < 256) {
          lr = encrypt((lr >>> 32).toInt, lr.toInt)
          S(b)(j) = (lr >>> 32).toInt; S(b)(j + 1) = lr.toInt
          j += 2
        }
        b += 1
      }
    }

    /** Salted schedule (blowfish.NewSaltedCipher → expandKeyWithSalt):
      * the 4 salt words XOR into the chained L/R before EVERY encryption,
      * cycling across the P array and all four S-boxes. */
    def expandKeyWithSalt(key: Array[Byte], salt: Array[Byte]): Unit = {
      var off = 0
      def nextKeyWord(): Int = {
        var w = 0; var j = 0
        while (j < 4) { w = (w << 8) | (key(off) & 0xff); off = (off + 1) % key.length; j += 1 }
        w
      }
      val sw = Array.tabulate(4) { i =>
        ((salt(i * 4) & 0xff) << 24) | ((salt(i * 4 + 1) & 0xff) << 16) |
          ((salt(i * 4 + 2) & 0xff) << 8) | (salt(i * 4 + 3) & 0xff)
      }
      var i = 0
      while (i < 18) { P(i) ^= nextKeyWord(); i += 1 }
      var s = 0
      var l = 0; var r = 0
      i = 0
      while (i < 18) {
        l ^= sw(s); r ^= sw(s + 1); s = (s + 2) % 4
        val lr = encrypt(l, r)
        l = (lr >>> 32).toInt; r = lr.toInt
        P(i) = l; P(i + 1) = r
        i += 2
      }
      var b = 0
      while (b < 4) {
        var j = 0
        while (j < 256) {
          l ^= sw(s); r ^= sw(s + 1); s = (s + 2) % 4
          val lr = encrypt(l, r)
          l = (lr >>> 32).toInt; r = lr.toInt
          S(b)(j) = l; S(b)(j + 1) = r
          j += 2
        }
        b += 1
      }
    }
  }

  // ------------------------------------------------------ bcrypt core

  private val Magic = "OrpheanBeholderScryDoubt".getBytes("US-ASCII") // 24 bytes

  /** The 23 raw digest bytes for (password, 16-byte salt, cost). */
  def rawHash(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    require(cost >= MinCost && cost <= MaxCost, s"bcrypt cost out of range: $cost")
    // x/crypto/bcrypt: key = password + 0x00, but the EKS P-array pass
    // consumes exactly 72 key bytes, so bytes past 72 never reach the
    // schedule — truncating here reproduces CompareHashAndPassword's
    // effective behavior for long inputs bit-for-bit. (Generate-side
    // rejection of >72-byte passwords lives in hashPassword, matching
    // x/crypto's ErrPasswordTooLong, which newFromPassword raises but
    // CompareHashAndPassword does not.)
    val trimmed = if (password.length > 72) password.take(72) else password
    val key = new Array[Byte](trimmed.length + 1)
    System.arraycopy(trimmed, 0, key, 0, trimmed.length)
    val st = new State
    st.expandKeyWithSalt(key, salt)
    var i = 0L
    val rounds = 1L << cost
    while (i < rounds) {
      st.expandKey(key)
      st.expandKey(salt)
      i += 1
    }
    val ct = new Array[Int](6)
    var b = 0
    while (b < 6) {
      ct(b) = ((Magic(b * 4) & 0xff) << 24) | ((Magic(b * 4 + 1) & 0xff) << 16) |
        ((Magic(b * 4 + 2) & 0xff) << 8) | (Magic(b * 4 + 3) & 0xff)
      b += 1
    }
    b = 0
    while (b < 6) {
      var j = 0
      while (j < 64) {
        val lr = st.encrypt(ct(b), ct(b + 1))
        ct(b) = (lr >>> 32).toInt; ct(b + 1) = lr.toInt
        j += 1
      }
      b += 2
    }
    val out = new Array[Byte](24)
    b = 0
    while (b < 6) {
      out(b * 4) = (ct(b) >>> 24).toByte; out(b * 4 + 1) = (ct(b) >>> 16).toByte
      out(b * 4 + 2) = (ct(b) >>> 8).toByte; out(b * 4 + 3) = ct(b).toByte
      b += 1
    }
    out.take(23) // maxCryptedHashSize — the 24th byte is never emitted
  }

  // ------------------------------------------- bcrypt base64 (no pad)

  private val Alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def b64Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val b0 = data(i) & 0xff
      sb.append(Alphabet(b0 >> 2))
      if (i + 1 < data.length) {
        val b1 = data(i + 1) & 0xff
        sb.append(Alphabet(((b0 & 0x3) << 4) | (b1 >> 4)))
        if (i + 2 < data.length) {
          val b2 = data(i + 2) & 0xff
          sb.append(Alphabet(((b1 & 0xf) << 2) | (b2 >> 6)))
          sb.append(Alphabet(b2 & 0x3f))
        } else sb.append(Alphabet((b1 & 0xf) << 2))
      } else sb.append(Alphabet((b0 & 0x3) << 4))
      i += 3
    }
    sb.toString
  }

  def b64Decode(s: String, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0; var o = 0
    def v(c: Char): Int = {
      val x = if (c < 128) Decode(c.toInt) else -1
      require(x >= 0, s"invalid bcrypt base64 character: $c")
      x
    }
    while (o < outLen) {
      val c0 = v(s(i)); val c1 = v(s(i + 1))
      out(o) = ((c0 << 2) | (c1 >> 4)).toByte; o += 1
      if (o < outLen) {
        val c2 = v(s(i + 2))
        out(o) = (((c1 & 0xf) << 4) | (c2 >> 2)).toByte; o += 1
        if (o < outLen) {
          val c3 = v(s(i + 3))
          out(o) = (((c2 & 0x3) << 6) | c3).toByte; o += 1
        }
      }
      i += 4
    }
    out
  }

  // -------------------------------------------------- crypt(3) format

  /** `$2a$NN$<22 salt><31 hash>` — what GenerateFromPassword stores. */
  def format(password: Array[Byte], salt: Array[Byte], cost: Int): String =
    f"$$2a$$$cost%02d$$" + b64Encode(salt) + b64Encode(rawHash(password, salt, cost))

  /** GenerateFromPassword: rejects >72-byte passwords the way x/crypto's
    * newFromPassword does (ErrPasswordTooLong) — hashes the reference
    * could never have created must not be creatable here either. */
  def hashPassword(password: String, cost: Int = DefaultCost): String = {
    val bytes = password.getBytes("UTF-8")
    require(bytes.length <= 72, s"bcrypt: password length exceeds 72 bytes (${bytes.length})")
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    format(bytes, salt, cost)
  }

  /** Constant-time check of `password` against a stored `$2a/$2b/$2y`
    * string (CompareHashAndPassword). Returns false — never throws — on
    * malformed input. */
  def checkPassword(password: String, stored: String): Boolean = {
    val re = """^\$2[aby]\$(\d\d)\$([./A-Za-z0-9]{22})([./A-Za-z0-9]{31})$""".r
    stored match {
      case re(costS, saltS, hashS) =>
        val cost = costS.toInt
        if (cost < MinCost || cost > MaxCost) return false
        val salt = b64Decode(saltS, 16)
        val expect = b64Decode(hashS, 23)
        val got = rawHash(password.getBytes("UTF-8"), salt, cost)
        java.security.MessageDigest.isEqual(got, expect)
      case _ => false
    }
  }
}
