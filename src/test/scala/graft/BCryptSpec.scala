package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.{Auth, Authenticator, BCrypt}

/** BCrypt correctness, pinned in three independent layers:
  * 1. the computed π state (published Blowfish initial constants),
  * 2. the Feistel core (Schneier's published Blowfish test vectors),
  * 3. full bcrypt strings against glibc `crypt(3)` outputs (generated
  *    with `$2b$` salts — algorithm-identical to `$2a$` for ≤72-byte
  *    keys — and re-prefixed; the first two are also the classic
  *    public jBCrypt/OpenBSD suite vectors).
  */
class BCryptSpec extends AnyFunSuite {

  test("pi-derived Blowfish initial state matches the published constants") {
    // P-array head and tail, S-box heads (any Blowfish reference lists these)
    assert(BCrypt.PiWords(0) == 0x243f6a88)
    assert(BCrypt.PiWords(1) == 0x85a308d3)
    assert(BCrypt.PiWords(2) == 0x13198a2e)
    assert(BCrypt.PiWords(3) == 0x03707344)
    assert(BCrypt.PiWords(14) == 0x3f84d5b5)
    assert(BCrypt.PiWords(15) == 0xb5470917)
    assert(BCrypt.PiWords(16) == 0x9216d5d9)
    assert(BCrypt.PiWords(17) == 0x8979fb1b)
    assert(BCrypt.PiWords(18) == 0xd1310ba6)  // S0[0]
    assert(BCrypt.PiWords(19) == 0x98dfb5ac)  // S0[1]
    assert(BCrypt.PiWords(18 + 1023) == 0x3ac372e6) // S3[255]
  }

  test("Blowfish core matches Schneier's published ECB test vectors") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val vectors = Seq(
      ("0000000000000000", 0x0000000000000000L, 0x4ef997456198dd78L),
      ("ffffffffffffffff", 0xffffffffffffffffL, 0x51866fd5b85ecb8aL),
      ("3000000000000000", 0x1000000000000001L, 0x7d856f9a613063f2L),
      ("1111111111111111", 0x1111111111111111L, 0x2466dd878b963c9dL),
      ("0123456789abcdef", 0x1111111111111111L, 0x61f9c3802281b096L),
      ("fedcba9876543210", 0x0123456789abcdefL, 0x0aceab0fc6a0a28dL),
      ("7ca110454a1a6e57", 0x01a1d6d039776742L, 0x59c68245eb05282bL))
    vectors.foreach { case (key, pt, ct) =>
      assert(BCrypt.blowfishEncrypt(hex(key), pt) == ct, s"key=$key")
    }
  }

  // glibc crypt(3) outputs; "$2b$" re-prefixed "$2a$" (same algorithm ≤72B)
  private val vectors = Seq(
    ("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2a$08$aTsUwsyowQuzRrDqFflhgeUU4hwpt32r5sCXQfY.kpQD2oLp5OMDy"),
    ("abcdefghijklmnopqrstuvwxyz",
      "$2a$10$fVH8e28OQRj9tqiDXs1e1uxpsjN0c7II7YPKXua2NAKYvM6iQk7dq"),
    ("password", "$2a$05$abcdefghijklmnopqrstuuWG29KuyeAicPCJODk1zjyGvyQUU2awu"),
    ("~!@#$%^&*()      ~!@#$%^&*()PNBFRD",
      "$2a$04$WvvTPHKwdBJ3uk0Z37EMR.nagb0XVxU5gUqX3bIElGa/Q0fS0Xsr6"),
    ("a" * 72, "$2a$04$ABCDEFGHIJKLMNOPQRSTUuBW85jKB0ZWT2CgCe.0OLGox8A45B8Xa"),
    ("pässwörd", "$2a$06$maoyE2smTfUD5lMDLz2LLuh7PSmPT4teWYj01otVkSOW7Kh8z6vQG"))

  test("bcrypt matches crypt(3) vectors (salt-determined rehash + check)") {
    vectors.foreach { case (pw, expect) =>
      assert(BCrypt.check(pw, expect), s"check failed for '$pw'")
      // byte-identical regeneration from the embedded cost+salt
      val cost = expect.substring(4, 6).toInt
      val salt = BCrypt.b64Decode(expect.substring(7, 29), 16)
      assert(BCrypt.hashWithSalt(pw, cost, salt) == expect, s"regen for '$pw'")
      // verify accepts the 2b/2y prefixes too (same algorithm)
      assert(BCrypt.check(pw, "$2b" + expect.drop(3)), s"2b prefix for '$pw'")
      assert(BCrypt.check(pw, "$2y" + expect.drop(3)), s"2y prefix for '$pw'")
    }
  }

  test("wrong password, wrong cost, malformed hashes all verify false") {
    val good = vectors(4)._2
    assert(!BCrypt.check("Password", good))
    assert(!BCrypt.check("password", good.replace("$05$", "$06$")))
    assert(!BCrypt.check("password", "not-a-bcrypt-hash"))
    assert(!BCrypt.check("password", "$2a$05$short"))
    assert(!BCrypt.check("x" * 100, good)) // over 72 bytes: false, no throw
  }

  test("hash round-trips with a random salt and respects cost bounds") {
    val h = BCrypt.hash("s3cret", cost = 4)
    assert(h.startsWith("$2a$04$") && h.length == 60)
    assert(BCrypt.check("s3cret", h) && !BCrypt.check("s3cre", h))
    val h2 = BCrypt.hash("s3cret", cost = 4)
    assert(h2 != h, "random salts must differ")
    intercept[IllegalArgumentException](BCrypt.hash("pw", cost = 3))
    intercept[IllegalArgumentException](BCrypt.hash("pw", cost = 32))
  }

  test("bcrypt user file: write, read back, authenticate") {
    val dir = java.nio.file.Files.createTempDirectory("bcrypt-users").toFile
    val path = new java.io.File(dir, "users.db").getPath
    Auth.writeUserFile(path, Seq(
      Auth.UserRecord("admin", BCrypt.hash("s3cret", 4), Auth.RoleWriter),
      Auth.UserRecord("viewer", BCrypt.hash("viewpass", 4), Auth.RoleReader)),
      Auth.HashBcrypt)
    val (users, ht) = Auth.readUserFile(path)
    assert(ht == Auth.HashBcrypt && users.keySet == Set("admin", "viewer"))
    val auth = Authenticator.fromFile(path)
    assert(auth.authenticate("admin", "s3cret").exists(_.role == Auth.RoleWriter))
    assert(auth.authenticate("admin", "wrong").isEmpty)
    assert(auth.authenticate("viewer", "viewpass").exists(_.role == Auth.RoleReader))
    assert(auth.authenticate("ghost", "x").isEmpty)
  }

  test("hashPassword routes bcrypt; missing user file defaults to bcrypt") {
    val h = Auth.hashPassword("pw", Auth.HashBcrypt)
    assert(h.startsWith("$2a$10$")) // Go bcrypt.DefaultCost
    assert(BCrypt.check("pw", h))
    val (users, ht) = Auth.readUserFile("/nonexistent/users.db")
    assert(users.isEmpty && ht == Auth.HashBcrypt)
  }
}
