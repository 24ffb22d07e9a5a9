package graft.cli

import graft.server.Auth
import graft.tsdb.TxLog
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.JavaConverters._

/** Operator-facing admin CLIs — thin mains over the library surfaces,
  * mirroring the reference's `cmd/user-admin`, `cmd/snapshot-util`,
  * `cmd/restore-util`. Each tool's logic lives in a `run(args): Int`
  * (exit code) so specs drive it in-process; `main` only forwards the
  * code to the exit status. Flags follow the reference's `-flag value`
  * convention. */
private[cli] object CliArgs {
  /** `-k v` pairs + bare subcommand words, reference flag style. */
  def parse(args: Array[String]): (List[String], Map[String, String]) = {
    val words = List.newBuilder[String]
    var flags = Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      if (args(i).startsWith("-")) {
        val k = args(i).dropWhile(_ == '-')
        if (i + 1 < args.length && !args(i + 1).startsWith("-")) {
          flags += k -> args(i + 1); i += 2
        } else { flags += k -> "true"; i += 1 }
      } else { words += args(i); i += 1 }
    }
    (words.result(), flags)
  }
}

/** `user-admin add|list|delete` over the binary user file
  * (`cmd/user-admin/main.go`): add prompts for the password unless
  * `-password` is given (the reference reads it from the terminal),
  * list prints username/role/hash-type, delete removes one user.
  * `-hash-type` defaults to bcrypt like the reference
  * (`cmd/user-admin/main.go:21`). */
object UserAdmin {
  def main(args: Array[String]): Unit = { val c = run(args); if (c != 0) sys.exit(c) }

  def run(args: Array[String], passwordInput: () => String = readPassword): Int = {
    val (words, flags) = CliArgs.parse(args)
    val file = flags.getOrElse("file", "users.db")
    words.headOption match {
      case Some("add") =>
        val username = flags.getOrElse("username", "")
        if (username.isEmpty) { Console.err.println("Error: -username is required."); return 1 }
        val role = flags.getOrElse("role", Auth.RoleReader)
        if (role != Auth.RoleReader && role != Auth.RoleWriter) {
          Console.err.println(s"Error: -role must be '${Auth.RoleReader}' or '${Auth.RoleWriter}'.")
          return 1
        }
        val hashType = flags.getOrElse("hash-type", "bcrypt") match {
          case "bcrypt" => Auth.HashBcrypt
          case "sha256" => Auth.HashSha256
          case "sha512" => Auth.HashSha512
          case other =>
            Console.err.println(s"Error: unsupported -hash-type '$other' (bcrypt, sha256, sha512).")
            return 1
        }
        val password = flags.getOrElse("password", passwordInput())
        if (password.isEmpty) { Console.err.println("Error: empty password."); return 1 }
        val (users, existingHash) = Auth.readUserFile(file)
        if (users.contains(username)) {
          Console.err.println(s"Error: user '$username' already exists."); return 1
        }
        // a user file has ONE hash type (header field) — adding to an
        // existing file keeps it, like the reference
        val ht = if (users.isEmpty) hashType else existingHash
        val rec = Auth.UserRecord(username, Auth.hashPassword(password, ht), role)
        Auth.writeUserFile(file, (users.values.toSeq :+ rec).sortBy(_.username), ht)
        println(s"User '$username' added with role '$role'.")
        0
      case Some("list") =>
        val (users, hashType) = Auth.readUserFile(file)
        if (users.isEmpty) println("No users found.")
        else {
          println(f"${"USERNAME"}%-24s ${"ROLE"}%-8s HASH")
          users.values.toSeq.sortBy(_.username).foreach { u =>
            val ht = hashType match {
              case Auth.HashBcrypt => "bcrypt"
              case Auth.HashSha256 => "sha256"
              case Auth.HashSha512 => "sha512"
              case other => s"type$other"
            }
            println(f"${u.username}%-24s ${u.role}%-8s $ht")
          }
        }
        0
      case Some("delete") =>
        val username = flags.getOrElse("username", "")
        if (username.isEmpty) { Console.err.println("Error: -username is required."); return 1 }
        val (users, hashType) = Auth.readUserFile(file)
        if (!users.contains(username)) {
          Console.err.println(s"Error: user '$username' not found."); return 1
        }
        Auth.writeUserFile(file, (users - username).values.toSeq.sortBy(_.username), hashType)
        println(s"User '$username' deleted.")
        0
      case other =>
        Console.err.println(
          s"""Usage: user-admin <add|list|delete> [-file F] [-username U] [-role reader|writer] [-hash-type bcrypt|sha256|sha512] [-password P]
             |${other.map(c => s"Unknown command: $c").getOrElse("Missing command.")}""".stripMargin)
        1
    }
  }

  private def readPassword(): String =
    Option(System.console()) match {
      case Some(c) => new String(c.readPassword("Enter password: "))
      case None => Option(scala.io.StdIn.readLine("Enter password: ")).getOrElse("")
    }
}

/** `snapshot-util -base-dir <dir>`: list the snapshots under a base
  * directory (`cmd/snapshot-util/main.go` ListSnapshots) — any child
  * with a `_log` is a snapshot; prints its latest committed version,
  * live data-file count, and total bytes. Pure filesystem + commit-log
  * read, no Spark session needed. */
object SnapshotUtil {
  def main(args: Array[String]): Unit = { val c = run(args); if (c != 0) sys.exit(c) }

  def run(args: Array[String]): Int = {
    val (_, flags) = CliArgs.parse(args)
    val base = flags.getOrElse("base-dir", "")
    if (base.isEmpty) {
      Console.err.println("Error: -base-dir flag is required."); return 1
    }
    val basePath = Paths.get(base)
    if (!Files.isDirectory(basePath)) {
      Console.err.println(s"Error: $base is not a directory."); return 1
    }
    val snaps = Files.list(basePath).iterator().asScala.toSeq.sorted
      .filter(p => Files.isDirectory(p.resolve("_log")))
    if (snaps.isEmpty) { println("No snapshots found."); return 0 }
    println(f"${"NAME"}%-32s ${"VERSION"}%8s ${"FILES"}%6s ${"BYTES"}%12s")
    snaps.foreach { p =>
      val version = new TxLog(p.resolve("_log").toString).latestVersion()
      val dataDir = p.resolve("data")
      val files =
        if (Files.isDirectory(dataDir))
          Files.walk(dataDir).iterator().asScala
            .filter(f => f.getFileName.toString.endsWith(".parquet")).toSeq
        else Nil
      val bytes = files.map(f => Files.size(f)).sum
      println(f"${p.getFileName.toString}%-32s $version%8d ${files.size}%6d $bytes%12d")
    }
    0
  }
}

/** `restore-util -snapshot-dir <src> -target-dir <dst> [-overwrite]`:
  * restore a snapshot into a fresh engine root
  * (`cmd/restore-util/main.go`) — the offline filesystem form of NBQL
  * `RESTORE FROM`: validates the snapshot, refuses a non-empty target
  * without `-overwrite`, copies log + data; a `TsdbEngine` opened on the
  * target then replays the restored commit log. */
object RestoreUtil {
  def main(args: Array[String]): Unit = { val c = run(args); if (c != 0) sys.exit(c) }

  def run(args: Array[String]): Int = {
    val (_, flags) = CliArgs.parse(args)
    val src = flags.getOrElse("snapshot-dir", "")
    val dst = flags.getOrElse("target-dir", "")
    if (src.isEmpty || dst.isEmpty) {
      Console.err.println(
        "Usage: restore-util -snapshot-dir <path_to_snapshot> -target-dir <path_to_new_data_dir> [-overwrite]")
      return 1
    }
    if (!Files.isDirectory(Paths.get(src, "_log"))) {
      Console.err.println(s"Error: no snapshot at $src (missing _log)."); return 1
    }
    val dstPath = Paths.get(dst)
    val nonEmpty = Files.isDirectory(dstPath) &&
      Files.list(dstPath).iterator().asScala.nonEmpty
    if (nonEmpty && !flags.contains("overwrite")) {
      Console.err.println(s"Error: target $dst not empty; pass -overwrite."); return 1
    }
    if (nonEmpty) deleteDir(dstPath)
    copyDir(Paths.get(src), dstPath)
    val version = new TxLog(dstPath.resolve("_log").toString).latestVersion()
    println(s"Restored snapshot to $dst at version $version.")
    0
  }

  private def deleteDir(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))

  private def copyDir(srcP: Path, dstP: Path): Unit =
    Files.walk(srcP).iterator().asScala.foreach { s =>
      val d = dstP.resolve(srcP.relativize(s))
      if (Files.isDirectory(s)) Files.createDirectories(d)
      else {
        Files.createDirectories(d.getParent)
        Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
      }
    }
}

/** `estimate-config` — the reference's write/read-amplification config
  * advisor (`cmd/estimate-config/main.go`) mapped onto the parquet
  * engine's knobs. The objective shape is the reference's exactly
  * (equal weights, wWA = wRA = 0.5):
  * `WA = C/S + 1/M + 1/T` (more commits per file size → more rewrite;
  * fewer tolerated live files / tighter compaction cadence → more
  * rewrite) and `RA = M + C/S + T` (files a query must merge grows
  * with tolerated commits and with the compaction interval).
  * In engine terms: M = max uncompacted commits before `compact()`
  * (the L0-file-count analog), S = target data-file MB (the
  * `maxPartitionBytes`/file-sizing guidance), T = compaction cadence
  * in seconds. `-rate` is the expected commit throughput (the
  * reference pins C=100). */
object EstimateConfig {
  private val wWA = 0.5
  private val wRA = 0.5

  private[graft] def score(c: Double, s: Double, m: Double, t: Double): Double = {
    val wa = c / s + 1.0 / m + 1.0 / t
    val ra = m + c / s + t
    wWA * wa + wRA * ra
  }

  /** Grid-search the reference's candidate lists; returns (M, S, T,
    * score). */
  private[graft] def best(rate: Double): (Double, Double, Double, Double) = {
    val ms = Seq(4, 6, 8, 10, 12, 16, 24, 32, 36, 40, 48, 56, 64).map(_.toDouble)
    val ss = Seq(1, 4, 8, 16, 32, 64).map(_.toDouble)
    val ts = Seq(10, 30, 60, 90, 120, 300).map(_.toDouble)
    (for (m <- ms; s <- ss; t <- ts) yield (m, s, t, score(rate, s, m, t)))
      .minBy(_._4)
  }

  def main(args: Array[String]): Unit = { val c = run(args); if (c != 0) sys.exit(c) }

  def run(args: Array[String]): Int = {
    val (_, flags) = CliArgs.parse(args)
    val rate = flags.get("rate") match {
      case None => 100.0
      case Some(v) => v.toDoubleOption match {
        case Some(r) if r > 0 => r
        case _ =>
          Console.err.println("Error: -rate must be a positive number.")
          return 1
      }
    }
    val (m, s, t, sc) = best(rate)
    println("Best Parameters:")
    println(f"  MaxUncompactedCommits = $m%.0f")
    println(f"  TargetDataFileSize = $s%.0f MB")
    println(f"  CompactionIntervalSeconds = $t%.0f")
    println(f"  Objective Score = $sc%.4f (lower is better)")
    0
  }
}
