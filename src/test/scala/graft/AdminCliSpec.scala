package graft

import graft.cli.{RestoreUtil, SnapshotUtil, UserAdmin}
import graft.model.{DataPoint, FieldValue}
import graft.server.{Auth, Authenticator}
import graft.tsdb.{QueryParams, TsdbEngine}
import java.nio.file.{Files, Paths}

/** Smoke-level coverage of the operator CLIs (`cmd/user-admin`,
  * `cmd/snapshot-util`, `cmd/restore-util` analogs): each tool's `run`
  * drives the same library surface the servers use, so the assertions
  * close the loop through Auth / TxLog / the engine. */
class AdminCliSpec extends SparkSpec {

  def withDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_cli").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("user-admin: add/list/delete round-trip; the file authenticates") {
    withDir { dir =>
      val file = s"$dir/users.db"
      assert(UserAdmin.run(Array("add", "-file", file, "-username", "alice",
        "-role", "writer", "-password", "secret")) == 0)
      assert(UserAdmin.run(Array("add", "-file", file, "-username", "bob",
        "-role", "reader", "-password", "pw2")) == 0)
      // duplicate add and bad role are rejected
      assert(UserAdmin.run(Array("add", "-file", file, "-username", "alice",
        "-password", "x")) != 0)
      assert(UserAdmin.run(Array("add", "-file", file, "-username", "c",
        "-role", "admin", "-password", "x")) != 0)
      // the written file drives the real authenticator
      val auth = Authenticator.fromFile(file)
      val alice = auth.authenticate("alice", "secret")
      assert(alice.exists(_.role == Auth.RoleWriter))
      assert(auth.authenticate("alice", "wrong").isEmpty)
      assert(auth.authenticate("bob", "pw2").isDefined)
      // delete removes exactly one user
      assert(UserAdmin.run(Array("delete", "-file", file, "-username", "bob")) == 0)
      assert(UserAdmin.run(Array("delete", "-file", file, "-username", "bob")) != 0)
      val after = Authenticator.fromFile(file)
      assert(after.authenticate("bob", "pw2").isEmpty)
      assert(after.authenticate("alice", "secret").isDefined)
      // list succeeds on both populated and missing files
      assert(UserAdmin.run(Array("list", "-file", file)) == 0)
      assert(UserAdmin.run(Array("list", "-file", s"$dir/absent.db")) == 0)
    }
  }

  test("snapshot-util lists snapshots; restore-util restores a working engine") {
    withDir { dir =>
      val eng = new TsdbEngine(spark, s"$dir/db")
      def pt(ts: Long, v: Double) = DataPoint("m", Map("h" -> "a"), ts,
        Map("v" -> FieldValue.ofDouble(v)))
      assert(eng.putBatch(Seq(pt(1000L, 1.0), pt(2000L, 2.0))).isRight)
      val snapBase = s"$dir/snaps"
      Files.createDirectories(Paths.get(snapBase))
      assert(eng.snapshot(s"$snapBase/snap1").isRight)

      // list: the snapshot shows up with its committed version + files
      assert(SnapshotUtil.run(Array("-base-dir", snapBase)) == 0)
      assert(SnapshotUtil.run(Array()) != 0, "-base-dir is required")

      // restore into a fresh root; refuse a non-empty target w/o -overwrite
      val target = s"$dir/restored"
      assert(RestoreUtil.run(Array("-snapshot-dir", s"$snapBase/snap1",
        "-target-dir", target)) == 0)
      assert(RestoreUtil.run(Array("-snapshot-dir", s"$snapBase/snap1",
        "-target-dir", target)) != 0, "non-empty target must need -overwrite")
      assert(RestoreUtil.run(Array("-snapshot-dir", s"$snapBase/snap1",
        "-target-dir", target, "-overwrite")) == 0)
      assert(RestoreUtil.run(Array("-snapshot-dir", s"$dir/nope",
        "-target-dir", s"$dir/x")) != 0, "missing snapshot must fail")

      // the restored root is a fully working engine with the same data
      val restored = new TsdbEngine(spark, target)
      val rows = restored.query(QueryParams("m", startNs = 0L, endNs = Some(10000L)))
        .collect()
      assert(rows.map(_.getAs[Long]("timestamp")).sorted.toSeq == Seq(1000L, 2000L))
      assert(restored.version == eng.version)
    }
  }

  test("estimate-config: grid minimum matches the objective; flags validated") {
    import graft.cli.EstimateConfig
    // the chosen point really is the grid argmin of the published objective
    val (m, s, t, sc) = EstimateConfig.best(100.0)
    val grid = for {
      gm <- Seq(4, 6, 8, 10, 12, 16, 24, 32, 36, 40, 48, 56, 64)
      gs <- Seq(1, 4, 8, 16, 32, 64); gt <- Seq(10, 30, 60, 90, 120, 300)
    } yield EstimateConfig.score(100.0, gs, gm, gt)
    assert(sc == grid.min)
    assert(EstimateConfig.score(100.0, s, m, t) == sc)
    // higher write rate pushes toward bigger files (C/S dominates)
    val (_, sHi, _, _) = EstimateConfig.best(100000.0)
    assert(sHi >= s)
    // exit codes
    assert(EstimateConfig.run(Array("-rate", "250")) == 0)
    assert(EstimateConfig.run(Array("-rate", "bogus")) == 1)
  }
}
