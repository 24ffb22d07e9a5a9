package graft

import graft.operators.{AsOfJoin, RangeJoin, Sessionize}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: latest right at-or-before, inclusive ties, null when none") {
    val trades = Seq(
      ("A", 100L, 1.0), ("A", 200L, 2.0), ("B", 50L, 3.0))
      .toDF("sym", "t_ts", "price")
    val quotes = Seq(
      ("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 150L, 12.0), ("B", 60L, 13.0))
      .toDF("sym", "q_ts", "bid")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select($"sym", $"t_ts", $"q_ts_matched", $"bid")
      .as[(String, Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      ("A", 100L, Some(100L), Some(11.0)), // tie at 100 is inclusive
      ("A", 200L, Some(150L), Some(12.0)),
      ("B", 50L, None, None)))             // no quote before 50
  }

  test("sessionize: gap break creates sessions with correct rollups") {
    val ev = Seq(
      (1L, 0L), (1L, 100L), (1L, 250L),   // session 0 (gaps <= 150)
      (1L, 1000L), (1L, 1100L),           // session 1
      (2L, 0L))                           // other key
      .toDF("user_id", "t")
    val out = Sessionize.sessions(ev, "user_id", "t", gapNs = 150L)
      .select($"user_id", $"session_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, 250L, 3L),
      (1L, 1L, 1000L, 1100L, 2L),
      (2L, 0L, 0L, 0L, 1L)))
  }

  test("range join: bin-and-verify equals the naive inequality join") {
    // intervals spanning 1..4 bins at W=100, boundary instants at both
    // ends, an instant matching two overlapping intervals, and misses
    val ivs = Seq((1L, 0L, 100L), (2L, 50L, 420L), (3L, 400L, 400L), (4L, 900L, 950L))
      .toDF("iv_id", "s", "e")
    val pts = Seq((10L, 0L), (11L, 100L), (12L, 101L), (13L, 400L), (14L, 420L), (15L, 421L), (16L, 899L))
      .toDF("pt_id", "t")
    val got = RangeJoin.intervalJoin(ivs, pts, "s", "e", "t", binWidth = 100L)
      .select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
    val naive = ivs.crossJoin(pts).filter($"t" >= $"s" && $"t" <= $"e")
      .select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (2L, 13L),
      (2L, 14L), (3L, 13L)))
  }

  test("range join: with equality keys, and no nested-loop in the plan") {
    val ivs = Seq(("u1", 1L, 0L, 100L), ("u2", 2L, 0L, 100L)).toDF("u", "iv_id", "s", "e")
    val pts = Seq(("u1", 10L, 50L), ("u2", 11L, 50L), ("u2", 12L, 150L)).toDF("u", "pt_id", "t")
    val df = RangeJoin.intervalJoin(ivs, pts, "s", "e", "t", binWidth = 64L, by = Seq("u"))
    val got = df.select($"iv_id", $"pt_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }
}
