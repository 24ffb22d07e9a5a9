package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling: the Catalyst lambda route
  * (transform(sequence…, element_at…) + array_distinct) pays several
  * interpreted lambda invocations per shingle; this expression builds the
  * distinct n-gram set in one tight JVM loop (invoked from generated code,
  * so the surrounding projection stays inside whole-stage codegen). */
object ShingleUtil {
  /** Distinct word n-grams joined by a single space, first-occurrence
    * order, as ArrayData of UTF8String. */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val last = len - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `word_shingles(words, n)` — distinct n-gram shingles of a word array. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(words: Any): Any =
    ShingleUtil.shingles(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Winnowing selection in one tight JVM loop. The Catalyst-lambda
  * formulation (transform over a window sequence slicing a computed hash
  * array) is a trap: CollapseProject inlines the hash-array expression
  * into the lambda body, where CSE cannot hoist it, so every window
  * element re-hashes the whole document — O(tokens²) md5 calls per row.
  * This expression evaluates its child once and runs O(tokens · w). */
object WinnowUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Positional n-gram hashes — first 32 bits of md5 of the space-joined
    * shingle as an unsigned long, bit-identical to SQL
    * `conv(substring(md5(s), 1, 8), 16, 10)` — then window-`w` minimum
    * selection, distinct in first-selection order. Fewer than n words →
    * empty; fewer than w shingles → the single global minimum. */
  def winnow(words: ArrayData, n: Int, w: Int): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val wd = words.getUTF8String(i + j)
        if (wd != null) sb.append(wd.toString)
        j += 1
      }
      digest.reset()
      val d = digest.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = m - w
    if (lastStart >= 0) {
      var s = 0
      while (s <= lastStart) {
        var mn = hs(s)
        var k = 1
        while (k < w) { if (hs(s + k) < mn) mn = hs(s + k); k += 1 }
        out.add(mn)
        s += 1
      }
    } else {
      var mn = hs(0)
      var k = 1
      while (k < m) { if (hs(k) < mn) mn = hs(k); k += 1 }
      out.add(mn)
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_hashes(words, n, w)` — winnowing fingerprint sketch of a word
  * array (Schleimer/Wilkerson/Aiken selection over positional n-grams). */
case class WinnowHashes(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(n >= 1 && w >= 1, "shingle size and window must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_hashes requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(words: Any): Any =
    WinnowUtil.winnow(words.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowUtil.winnow($c, $n, $w)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow_hashes"
}

/** Deflate compression ratio — the MassiveText/Gopher-style redundancy
  * signal (highly repetitive text compresses far below ~0.4; high-entropy
  * gibberish stays near 1). Level 6 zlib, per-thread Deflater reuse (no
  * allocation per row). Deterministic for a given input on a given zlib
  * level, but NOT SQL-reproducible — this signal is spec-tested, not
  * battery-oracled. */
object CompressUtil {
  /** Frees each thread's native zlib state when the thread dies (pool
    * churn would otherwise retain it until the Deflater's own JDK-internal
    * cleaner eventually runs): the dead thread's ThreadLocal entry makes
    * the Thread object collectable, which triggers this end(). */
  private val cleaner = java.lang.ref.Cleaner.create()
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater = {
      val d = new java.util.zip.Deflater(6)
      cleaner.register(Thread.currentThread(), () => d.end())
      d
    }
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** deflate(utf8(text)).length / utf8(text).length; 1.0 for empty. */
  def ratio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val b = buf.get()
    while (!d.finished()) total += d.deflate(b)
    total.toDouble / bytes.length
  }
}

/** `compress_ratio(text)` — deflate bytes over input bytes. */
case class CompressRatio(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"compress_ratio requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(text: Any): Any =
    CompressUtil.ratio(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressUtil.ratio($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "compress_ratio"
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge
  def word_shingles(words: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words), n))
  def winnow_hashes(words: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(ColumnBridge.expression(words), n, w))
  def compress_ratio(text: Column): Column =
    ColumnBridge.column(CompressRatio(ColumnBridge.expression(text)))
}
