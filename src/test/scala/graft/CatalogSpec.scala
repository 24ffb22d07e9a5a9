package graft

import graft.model.{DataPoint, FieldValue}
import graft.tsdb._

/** Per-database catalog (`engine2/engine.go:177-222`) and the
  * shared-storage replication story (reference `replication/` — here a
  * follower engine tailing the same commit log). */
class CatalogSpec extends SparkSpec {

  def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  def pt(metric: String, ts: Long, v: Double): DataPoint =
    DataPoint(metric, Map("h" -> "1"), ts, Map("v" -> FieldValue.ofDouble(v)))

  test("create: name validation, reserved names, duplicates, IF NOT EXISTS") {
    withRoot { root =>
      val cat = new Catalog(spark, root)
      assert(cat.create("metrics-prod").isRight)
      assert(cat.create("9starts-with-digit").isLeft)
      assert(cat.create("has space").isLeft)
      assert(cat.create("a" * 65).isLeft)
      assert(cat.create("system").isLeft, "reserved name")
      assert(cat.create("internal").isLeft, "reserved name")
      assert(cat.create("metrics-prod").isLeft, "duplicate")
      assert(cat.create("metrics-prod", ifNotExists = true).isRight)
      assert(cat.open("nope").isLeft, "open of absent db fails")
      assert(cat.list() == Seq("metrics-prod"))
    }
  }

  test("databases are isolated; drop removes one without touching others") {
    withRoot { root =>
      val cat = new Catalog(spark, root)
      assert(cat.create("db1").isRight && cat.create("db2").isRight)
      val e1 = cat.open("db1").toOption.get
      val e2 = cat.open("db2").toOption.get
      assert(e1.putBatch(Seq(pt("cpu", 1000, 1.0), pt("cpu", 2000, 2.0))).isRight)
      assert(e2.putBatch(Seq(pt("mem", 1000, 9.0))).isRight)

      assert(e1.query(QueryParams("cpu", startNs = 0, endNs = Some(10000))).count() == 2)
      assert(e1.query(QueryParams("mem", startNs = 0, endNs = Some(10000))).count() == 0,
        "db1 must not see db2's metric")
      assert(e2.query(QueryParams("mem", startNs = 0, endNs = Some(10000))).count() == 1)
      assert(e2.query(QueryParams("cpu", startNs = 0, endNs = Some(10000))).count() == 0)

      assert(cat.drop("db1").isRight)
      assert(cat.list() == Seq("db2"))
      assert(cat.open("db1").isLeft)
      assert(e2.query(QueryParams("mem", startNs = 0, endNs = Some(10000))).count() == 1,
        "dropping db1 must not disturb db2")
    }
  }

  test("replication: a follower on the same root observes commits atomically via sync()") {
    withRoot { root =>
      val writer = new TsdbEngine(spark, s"$root/db")
      assert(writer.putBatch(Seq(pt("cpu", 1000, 1.0))).isRight)

      // follower opens at the current committed version
      val follower = new TsdbEngine(spark, s"$root/db")
      assert(follower.query(QueryParams("cpu", startNs = 0, endNs = Some(10000))).count() == 1)
      val v1 = follower.version

      // writer commits more: an append and a delete
      assert(writer.putBatch(Seq(pt("cpu", 2000, 2.0), pt("cpu", 3000, 3.0))).isRight)
      writer.deletePoint("cpu", Map("h" -> "1"), 1000)

      // follower is isolated at its snapshot until it syncs (no torn reads)
      assert(follower.version == v1)
      assert(follower.query(QueryParams("cpu", startNs = 0, endNs = Some(10000))).count() == 1)

      // sync = tail the shipped log; exactly the committed state appears
      val v2 = follower.sync()
      assert(v2 == writer.version)
      val rows = follower.query(QueryParams("cpu", startNs = 0, endNs = Some(10000)))
        .select("timestamp").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(2000L, 3000L), "append visible, deleted point gone")

      // promoted follower never reuses sequence space below the high-water mark
      assert(follower.nextSeq() >= 5, "4 writer seqs observed - next must be above them")
      assert(follower.putBatch(Seq(pt("cpu", 4000, 4.0))).isRight)
      writer.sync()
      assert(writer.query(QueryParams("cpu", startNs = 0, endNs = Some(10000))).count() == 3)
    }
  }

  test("push replication ships commits to a disjoint-storage follower in order") {
    withRoot { root =>
      val leader = new TsdbEngine(spark, s"$root/leader")
      assert(leader.putBatch(Seq(pt("cpu", 1000, 1.0), pt("cpu", 2000, 2.0))).isRight)
      val shipped1 = leader.replicateTo(s"$root/follower")
      assert(shipped1 == leader.version)

      val follower = new TsdbEngine(spark, s"$root/follower")
      def rows(e: TsdbEngine): Seq[Long] =
        e.query(QueryParams("cpu", startNs = 0, endNs = Some(10000)))
          .select("timestamp").collect().map(_.getLong(0)).sorted.toSeq
      assert(rows(follower) == Seq(1000L, 2000L))

      // more commits: append + delete + compaction (file-set swap)
      assert(leader.putBatch(Seq(pt("cpu", 3000, 3.0))).isRight)
      leader.deletePoint("cpu", Map("h" -> "1"), 1000)
      leader.compact() // vacuums superseded source files pre-ship
      val shipped2 = leader.replicateTo(s"$root/follower")
      assert(shipped2 == leader.version && shipped2 > shipped1)

      assert(rows(follower) == Seq(1000L, 2000L), "isolated until sync")
      follower.sync()
      assert(rows(follower) == Seq(2000L, 3000L), "append + delete + compact shipped")

      // idempotent re-ship: no change, still consistent
      assert(leader.replicateTo(s"$root/follower") == shipped2)
      follower.sync()
      assert(rows(follower) == Seq(2000L, 3000L))
    }
  }
}
