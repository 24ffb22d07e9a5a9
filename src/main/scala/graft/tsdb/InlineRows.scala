package graft.tsdb

import graft.model.{DataPoint, FieldValue}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Codec for rows committed INLINE in the transaction log (the
  * WAL/memtable analog — see [[TsdbEngine.appendPoints]]): a small
  * driver-resident batch is serialized into its commit manifest instead
  * of paying a Spark write job for a 500-row parquet file. The commit
  * rename IS the durability point, exactly like a WAL append
  * (reference `wal/wal.go:53-60`); threshold compaction folds
  * accumulated inline rows into the clustered layout.
  *
  * Format (base64 of): rowCount, then per row — metric (UTF), tag
  * count + k/v UTF pairs, timestamp, field count + name UTF + tagged
  * value (0 nil / 1 double / 2 long / 3 string / 4 bool), seq. */
object InlineRows {

  def encode(points: Seq[(DataPoint, Long)]): String = {
    val bos = new ByteArrayOutputStream(points.size * 64)
    val o = new DataOutputStream(bos)
    o.writeInt(points.size)
    points.foreach { case (p, seq) =>
      o.writeUTF(p.metric)
      o.writeInt(p.tags.size)
      p.tags.foreach { case (k, v) => o.writeUTF(k); o.writeUTF(v) }
      o.writeLong(p.timestamp)
      o.writeInt(p.fields.size)
      p.fields.foreach { case (k, v) =>
        o.writeUTF(k)
        (v.d, v.l, v.s, v.b) match {
          case (Some(d), _, _, _) => o.writeByte(1); o.writeDouble(d)
          case (_, Some(l), _, _) => o.writeByte(2); o.writeLong(l)
          case (_, _, Some(s), _) => o.writeByte(3); o.writeUTF(s)
          case (_, _, _, Some(b)) => o.writeByte(4); o.writeBoolean(b)
          case _ => o.writeByte(0)
        }
      }
      o.writeLong(seq)
    }
    o.flush()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  def decode(blob: String): Seq[(DataPoint, Long)] = {
    val i = new DataInputStream(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(blob)))
    val n = i.readInt()
    (0 until n).map { _ =>
      val metric = i.readUTF()
      val tags = (0 until i.readInt()).map(_ => (i.readUTF(), i.readUTF())).toMap
      val ts = i.readLong()
      val fields = (0 until i.readInt()).map { _ =>
        val name = i.readUTF()
        val v = i.readByte() match {
          case 1 => FieldValue.ofDouble(i.readDouble())
          case 2 => FieldValue.ofLong(i.readLong())
          case 3 => FieldValue.ofString(i.readUTF())
          case 4 => FieldValue.ofBool(i.readBoolean())
          case _ => FieldValue.NilValue
        }
        name -> v
      }.toMap
      (DataPoint(metric, tags, ts, fields), i.readLong())
    }
  }

  /** writeUTF caps one string at 64 KB of modified-UTF8; stay well
    * under it (a point failing this takes the staged-file path). */
  def encodable(p: DataPoint): Boolean = {
    def ok(s: String): Boolean = s.length <= 16384
    ok(p.metric) && p.tags.forall { case (k, v) => ok(k) && ok(v) } &&
      p.fields.forall { case (k, v) => ok(k) && v.s.forall(ok) }
  }
}
