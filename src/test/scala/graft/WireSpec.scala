package graft

import graft.model.FieldValue
import graft.server.Wire
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the binary wire codec: arbitrary frames and typed
  * field maps survive an encode→decode round-trip, and corrupted frames
  * are rejected by the CRC — the invariants that make the protocol safe
  * to speak with the reference's own clients. */
class WireSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private val genString = Gen.alphaNumStr.map(_.take(100))
  private val genField: Gen[FieldValue] = Gen.oneOf(
    Gen.chooseNum(-1e9, 1e9).map(FieldValue.ofDouble),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(FieldValue.ofLong),
    genString.map(FieldValue.ofString),
    Gen.oneOf(true, false).map(FieldValue.ofBool),
    Gen.const(FieldValue.NilValue))
  private val genFields = Gen.mapOf(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(32)), genField))
  private val genTags = Gen.mapOf(Gen.zip(genString.suchThat(_.nonEmpty), genString))

  test("PUSH payload round-trips every field type") {
    check(Prop.forAllNoShrink(genString.suchThat(_.nonEmpty), genTags,
      Gen.long, genFields) { (metric, tags, ts, fields) =>
      val i = Wire.dis(Wire.encodePush(metric, tags, ts, fields))
      Wire.readString(i) == metric && Wire.readTags(i) == tags &&
        i.readLong() == ts && Wire.readFields(i) == fields
    })
  }

  test("frames round-trip and a flipped byte is rejected by CRC-32C") {
    check(Prop.forAllNoShrink(Gen.chooseNum(0, 255),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { (cmd, payload) =>
      val bos = new java.io.ByteArrayOutputStream()
      Wire.writeFrame(bos, cmd.toByte, payload.toArray)
      val bytes = bos.toByteArray
      val frame = Wire.readFrame(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val ok = frame.cmd == cmd.toByte && frame.payload.toSeq == payload
      val corrupted = payload.isEmpty || {
        val corrupt = bytes.clone()
        corrupt(5) = (corrupt(5) ^ 0x40).toByte // flip a payload bit
        scala.util.Try(Wire.readFrame(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(corrupt)))).isFailure
      }
      ok && corrupted
    })
  }

  test("query result part round-trips raw and aggregated items") {
    val raw = Wire.PointItem(7L, "cpu", Map("h" -> "a"), 123L,
      Map("v" -> FieldValue.ofDouble(1.5), "s" -> FieldValue.ofString("x")),
      0L, Nil, isAggregated = false)
    val (d1, c1) = Wire.decodeQueryResultPart(Wire.encodeQueryResultPart(raw, "CUR"))
    assert(d1 == raw && c1 == "CUR")

    val agg = Wire.PointItem(0L, "m", Map.empty, 1000L, Map.empty,
      1000L, Seq("sum_v" -> 42.0, "count_v" -> 3.0), isAggregated = true)
    val (d2, _) = Wire.decodeQueryResultPart(Wire.encodeQueryResultPart(agg))
    assert(d2 == agg)
  }
}
