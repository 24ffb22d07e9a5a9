package graft.server

import java.io.{DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** User-file authentication, byte-compatible with the reference's binary
  * user database (`auth/user_file.go:17-45`): little-endian header
  * `magic u32 | version u8 | hashType u8 | userCount u32` then per user
  * three `u16`-length-prefixed strings (username, passwordHash, role).
  *
  * Hash types follow `auth/user_file.go:26-36`: 1=bcrypt ([[BCrypt]],
  * pure-Scala, Go-compatible `$2a$` strings), 2=SHA-256, 3=SHA-512 (hex
  * digests, unsalted — the reference's own documented simplification).
  * Like the reference, a missing file defaults to bcrypt
  * (`auth/user_file.go:86`).
  *
  * Roles and the authorization rule mirror `auth/authenticator.go:35-38,
  * 142-155`: `writer` may do everything, `reader` only read operations.
  */
object Auth {
  val Magic: Int = 0x55535244 // "USRD"
  val Version: Byte = 1

  val HashBcrypt: Byte = 1
  val HashSha256: Byte = 2
  val HashSha512: Byte = 3

  val RoleReader = "reader"
  val RoleWriter = "writer"

  final case class UserRecord(username: String, passwordHash: String, role: String)

  /** Password hash for the given hash type (`auth/user_file.go:125-145`):
    * salted `$2a$` bcrypt string, or unsalted hex digest for SHA. */
  def hashPassword(password: String, hashType: Byte): String = hashType match {
    case HashBcrypt => BCrypt.hash(password)
    case HashSha256 | HashSha512 =>
      val algo = if (hashType == HashSha256) "SHA-256" else "SHA-512"
      MessageDigest.getInstance(algo).digest(password.getBytes(UTF_8))
        .map("%02x".format(_)).mkString
    case other => throw new IllegalArgumentException(s"unsupported hash type $other")
  }

  // little-endian primitives (JDK Data*Streams are big-endian)
  private def writeU16LE(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def writeU32LE(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def readU16LE(i: DataInputStream): Int =
    i.readUnsignedByte() | (i.readUnsignedByte() << 8)
  private def readU32LE(i: DataInputStream): Int =
    i.readUnsignedByte() | (i.readUnsignedByte() << 8) |
      (i.readUnsignedByte() << 16) | (i.readUnsignedByte() << 24)

  private def writeString(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 0xffff, "string too long for u16 length prefix")
    writeU16LE(o, b.length); o.write(b)
  }
  private def readString(i: DataInputStream): String = {
    val b = new Array[Byte](readU16LE(i))
    i.readFully(b); new String(b, UTF_8)
  }

  /** Write the binary user file (`auth/user_file.go:53-79`). */
  def writeUserFile(path: String, users: Seq[UserRecord],
      hashType: Byte = HashBcrypt): Unit = {
    val o = new DataOutputStream(new FileOutputStream(path))
    try {
      writeU32LE(o, Magic); o.write(Version); o.write(hashType)
      writeU32LE(o, users.size)
      users.foreach { u =>
        writeString(o, u.username); writeString(o, u.passwordHash)
        writeString(o, u.role)
      }
    } finally o.close()
  }

  /** Read the binary user file; a missing/empty file is an empty database
    * (`auth/user_file.go:81-98`). */
  def readUserFile(path: String): (Map[String, UserRecord], Byte) = {
    val f = new java.io.File(path)
    if (!f.exists()) return (Map.empty, HashBcrypt)
    val i = new DataInputStream(new FileInputStream(f))
    try {
      val magic =
        try readU32LE(i)
        catch { case _: EOFException => return (Map.empty, HashBcrypt) }
      require(magic == Magic, f"invalid user file magic: got $magic%x")
      val version = i.readByte()
      require(version <= Version, s"unsupported user file version $version")
      val hashType = i.readByte()
      require(hashType == HashBcrypt || hashType == HashSha256 || hashType == HashSha512,
        s"unsupported hash type $hashType")
      val n = readU32LE(i)
      val users = (0 until n).map { _ =>
        val u = UserRecord(readString(i), readString(i), readString(i))
        u.username -> u
      }.toMap
      (users, hashType)
    } finally i.close()
  }
}

/** Username/password check + role authorization over a loaded user file
  * (`auth/authenticator.go:41-155`). Constant-time digest comparison like
  * the reference's `subtle.ConstantTimeCompare`. */
final class Authenticator(users: Map[String, Auth.UserRecord], hashType: Byte) {
  import Auth._

  def authenticate(username: String, password: String): Option[UserRecord] =
    users.get(username).filter { u =>
      if (hashType == HashBcrypt) BCrypt.check(password, u.passwordHash)
      else {
        val presented = hashPassword(password, hashType)
        MessageDigest.isEqual(presented.getBytes(UTF_8), u.passwordHash.getBytes(UTF_8))
      }
    }

  /** `writer` ⊇ `reader`; anything else is denied (`authenticator.go:150-154`). */
  def authorize(user: UserRecord, requiredRole: String): Boolean =
    user.role == RoleWriter || (user.role == RoleReader && requiredRole == RoleReader)
}

object Authenticator {
  def fromFile(path: String): Authenticator = {
    val (users, hashType) = Auth.readUserFile(path)
    new Authenticator(users, hashType)
  }
}
