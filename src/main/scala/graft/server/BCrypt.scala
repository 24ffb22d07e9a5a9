package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}

/** OpenBSD bcrypt (Provos & Mazières, "A Future-Adaptable Password
  * Scheme", USENIX 1999) in pure Scala, so user files with hash type 1
  * (`auth/user_file.go:29-30`) work without any dependency. Matches the
  * Go implementation the reference uses (`golang.org/x/crypto/bcrypt`,
  * `auth/user_file.go:130`, `auth/authenticator.go:78`): `$2a$` output,
  * `$2a$`/`$2b$`/`$2y$` accepted on verify (identical algorithm for keys
  * within the 72-byte limit), cost 4..31, default 10.
  *
  * The Blowfish initial state (18 P words + 4×256 S words = the first
  * 8336 fractional hex digits of π) is computed at class-init from
  * Machin's formula `π = 16·atan(1/5) − 4·atan(1/239)` in fixed-point
  * BigInt rather than embedded as a table — the spec pins the well-known
  * leading words (P0=0x243F6A88, S0=0xD1310BA6) and full bcrypt output
  * against glibc `crypt(3)` vectors.
  */
object BCrypt {

  private val PLen = 18
  private val SLen = 1024 // 4 boxes × 256, flattened

  /** Fractional hex digits of π as PLen+SLen big-endian 32-bit words. */
  private[graft] val PiWords: Array[Int] = {
    val words = PLen + SLen
    val bits = 32 * words + 64 // 64 guard bits ≫ accumulated 1-ulp term error
    def atanInv(x: Int): BigInt = {
      // atan(1/x) · 2^bits via the alternating Taylor series.
      val x2 = BigInt(x.toLong * x)
      var power = (BigInt(1) << bits) / x
      var sum = power
      var k = 1
      while (power.signum != 0) {
        power = power / x2
        val d = power / (2 * k + 1)
        sum = if ((k & 1) == 1) sum - d else sum + d
        k += 1
      }
      sum
    }
    val pi = atanInv(5) * 16 - atanInv(239) * 4
    val frac = pi & ((BigInt(1) << bits) - 1) // drop the integer part (3)
    val mask = BigInt(0xffffffffL)
    Array.tabulate(words) { i =>
      ((frac >> (bits - 32 * (i + 1))) & mask).toLong.toInt
    }
  }

  /** Blowfish state with the bcrypt ("eksblowfish") key schedule. */
  private final class State {
    private val P = java.util.Arrays.copyOfRange(PiWords, 0, PLen)
    private val S = java.util.Arrays.copyOfRange(PiWords, PLen, PLen + SLen)

    private def f(x: Int): Int =
      ((S(x >>> 24) + S(256 | ((x >>> 16) & 0xff))) ^ S(512 | ((x >>> 8) & 0xff))) +
        S(768 | (x & 0xff))

    /** One 16-round Feistel encipherment; returns l‖r packed in a Long. */
    def encipher(l0: Int, r0: Int): Long = {
      var l = l0; var r = r0
      var i = 0
      while (i < 16) {
        l ^= P(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t // undo the final swap
      r ^= P(16); l ^= P(17)
      (l.toLong << 32) | (r.toLong & 0xffffffffL)
    }

    /** Key schedule: XOR the cyclic big-endian word stream of `key` into
      * P, then refill P and S by chained encipherment. With `salt`
      * non-null each block first XORs the next two words of the cyclic
      * salt stream (the salt byte counter runs on across the P and S
      * fills); with null salt this is the plain Blowfish schedule. */
    def expand(key: Array[Byte], salt: Array[Byte]): Unit = {
      var kj = 0
      var i = 0
      while (i < PLen) {
        var w = 0; var b = 0
        while (b < 4) { w = (w << 8) | (key(kj) & 0xff); kj += 1; if (kj == key.length) kj = 0; b += 1 }
        P(i) ^= w
        i += 1
      }
      var sj = 0
      def nextSalt(): Int = {
        var w = 0; var b = 0
        while (b < 4) { w = (w << 8) | (salt(sj) & 0xff); sj += 1; if (sj == salt.length) sj = 0; b += 1 }
        w
      }
      var l = 0; var r = 0
      i = 0
      while (i < PLen) {
        if (salt != null) { l ^= nextSalt(); r ^= nextSalt() }
        val e = encipher(l, r); l = (e >>> 32).toInt; r = e.toInt
        P(i) = l; P(i + 1) = r
        i += 2
      }
      i = 0
      while (i < SLen) {
        if (salt != null) { l ^= nextSalt(); r ^= nextSalt() }
        val e = encipher(l, r); l = (e >>> 32).toInt; r = e.toInt
        S(i) = l; S(i + 1) = r
        i += 2
      }
    }
  }

  /** Plain Blowfish ECB encryption of one block — exposed so the spec can
    * pin the classic Schneier test vectors, validating the π-derived
    * state and the Feistel core independently of the bcrypt layer. */
  private[graft] def blowfishEncrypt(key: Array[Byte], block: Long): Long = {
    val st = new State
    st.expand(key, null)
    st.encipher((block >>> 32).toInt, block.toInt)
  }

  val MinCost = 4
  val MaxCost = 31
  val DefaultCost = 10 // bcrypt.DefaultCost in the Go lib
  private val MaxKeyBytes = 72

  // "OrpheanBeholderScryDoubt" as six big-endian words
  private val Magic =
    Array(0x4f727068, 0x65616e42, 0x65686f6c, 0x64657253, 0x63727944, 0x6f756274)

  /** eksblowfish + 64× ECB of the magic block; 23-byte digest. */
  private def hashRaw(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(cost >= MinCost && cost <= MaxCost, s"bcrypt cost $cost outside [$MinCost,$MaxCost]")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    require(password.length <= MaxKeyBytes, s"bcrypt password longer than $MaxKeyBytes bytes")
    val key = java.util.Arrays.copyOf(password, password.length + 1) // trailing NUL
    val st = new State
    st.expand(key, salt)
    var rounds = 1L << cost
    while (rounds > 0) {
      st.expand(key, null)
      st.expand(salt, null)
      rounds -= 1
    }
    val ct = Magic.clone()
    var rep = 0
    while (rep < 64) {
      var b = 0
      while (b < 6) {
        val e = st.encipher(ct(b), ct(b + 1))
        ct(b) = (e >>> 32).toInt; ct(b + 1) = e.toInt
        b += 2
      }
      rep += 1
    }
    val out = new Array[Byte](23) // 24th byte discarded, per the original
    var i = 0
    while (i < 23) {
      out(i) = (ct(i / 4) >>> (24 - 8 * (i % 4))).toByte
      i += 1
    }
    out
  }

  // bcrypt's base64 (distinct alphabet, no padding)
  private val B64 = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val B64Inv: Array[Byte] = {
    val inv = Array.fill[Byte](128)(-1)
    B64.zipWithIndex.foreach { case (c, i) => inv(c) = i.toByte }
    inv
  }

  private def b64Encode(d: Array[Byte]): String = {
    val sb = new StringBuilder((d.length * 4 + 2) / 3)
    var i = 0
    while (i < d.length) {
      val b0 = d(i) & 0xff
      sb.append(B64(b0 >>> 2))
      var c = (b0 & 0x3) << 4
      if (i + 1 < d.length) {
        val b1 = d(i + 1) & 0xff
        c |= b1 >>> 4
        sb.append(B64(c))
        c = (b1 & 0xf) << 2
        if (i + 2 < d.length) {
          val b2 = d(i + 2) & 0xff
          c |= b2 >>> 6
          sb.append(B64(c))
          sb.append(B64(b2 & 0x3f))
        } else sb.append(B64(c))
      } else sb.append(B64(c))
      i += 3
    }
    sb.toString
  }

  private[graft] def b64Decode(s: String, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var si = 0; var oi = 0
    def next(): Int = {
      val c = s.charAt(si); si += 1
      val v = if (c < 128) B64Inv(c) else -1
      require(v >= 0, s"invalid bcrypt base64 character '$c'")
      v
    }
    while (oi < outLen) {
      val c0 = next(); val c1 = next()
      out(oi) = ((c0 << 2) | (c1 >>> 4)).toByte; oi += 1
      if (oi < outLen) {
        val c2 = next()
        out(oi) = (((c1 & 0xf) << 4) | (c2 >>> 2)).toByte; oi += 1
        if (oi < outLen) {
          val c3 = next()
          out(oi) = (((c2 & 0x3) << 6) | c3).toByte; oi += 1
        }
      }
    }
    out
  }

  /** `$2a$NN$<22-char salt><31-char digest>` for the given salt. */
  private[graft] def hashWithSalt(password: String, cost: Int, salt: Array[Byte]): String =
    f"$$2a$$$cost%02d$$" + b64Encode(salt) + b64Encode(hashRaw(password.getBytes(UTF_8), salt, cost))

  /** Hash with a fresh random 16-byte salt (Go `GenerateFromPassword`). */
  def hash(password: String, cost: Int = DefaultCost): String = {
    val salt = new Array[Byte](16)
    new SecureRandom().nextBytes(salt)
    hashWithSalt(password, cost, salt)
  }

  /** Constant-time verify; accepts `$2a$`/`$2b$`/`$2y$` (Go
    * `CompareHashAndPassword`). Malformed hashes and over-long passwords
    * verify false rather than throwing. */
  def check(password: String, hashed: String): Boolean = {
    val m = "^\\$2([aby])\\$(\\d{2})\\$([./A-Za-z0-9]{53})$".r
    hashed match {
      case m(_, costStr, body) =>
        val cost = costStr.toInt
        if (cost < MinCost || cost > MaxCost) return false
        val pw = password.getBytes(UTF_8)
        if (pw.length > MaxKeyBytes) return false
        val salt = b64Decode(body.substring(0, 22), 16)
        val expect = b64Decode(body.substring(22), 23)
        MessageDigest.isEqual(hashRaw(pw, salt, cost), expect)
      case _ => false
    }
  }
}
