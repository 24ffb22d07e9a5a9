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

/** Row-local replacements for per-document aggregations that were
  * formulated as explode → groupBy — a corpus-wide shuffle of every
  * posting just to fold values that never leave their own row (r18
  * optimization round 2, guide §2.4 "remove shuffles outright"). Each
  * util reproduces the engine-agnostic md5 formulation of the SQL oracle
  * bit-for-bit, so results are unchanged; only the plan shape is (the
  * Exchange disappears). */
object DocAggUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** Max frequency of any positional n-gram of `words` (duplicates
    * kept — frequency is the point); 0 when fewer than n words. Equals
    * `max(count) … GROUP BY doc, ngram` over the exploded positional
    * n-grams, computed without leaving the row. */
  def topNgramCount(words: ArrayData, n: Int): Long = {
    val m = words.numElements() - n + 1
    if (m <= 0) return 0L
    val counts = new java.util.HashMap[String, Integer](m * 2)
    var best = 0
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** MinHash lanes over a shingle array: lane i = lexicographic min over
    * shingles of `substring(md5("<i/4>:" + shingle), (i%4)*8 + 1, 8)` —
    * the identical engine-agnostic string minhash the SQL oracle
    * computes (8 lowercase hex chars per lane, 4 lanes per md5). A
    * fixed-width lowercase-hex slice compares lexicographically exactly
    * like its 32-bit unsigned value, so the loop keeps unsigned-int
    * minima and renders the winners to hex once at the end. Null for an
    * empty array (callers filter empties out — SQL min over zero rows
    * is null). */
  def minhashLanes(shingles: ArrayData, k: Int): ArrayData = {
    val len = shingles.numElements()
    if (len == 0) return null
    val nMd5 = (k + 3) / 4
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, 0xFFFFFFFFL + 1) // above any u32
    val digest = md5.get()
    var i = 0
    while (i < len) {
      val s = shingles.getUTF8String(i)
      val body = (if (s == null) "" else s.toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var j = 0
      while (j < nMd5) {
        digest.reset()
        // seed prefix is "<j>:" — j is a single decimal digit for k <= 40
        digest.update(('0' + j).toByte)
        digest.update(':'.toByte)
        val d = digest.digest(body)
        var lane = j * 4
        var off = 0
        while (lane < k && off < 16) {
          val v = ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
            ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
          if (v < mins(lane)) mins(lane) = v
          lane += 1
          off += 4
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var lane = 0
    while (lane < k) {
      val v = mins(lane)
      val cs = new Array[Char](8)
      var p = 0
      while (p < 8) {
        cs(p) = hexChars(((v >>> (4 * (7 - p))) & 0xF).toInt)
        p += 1
      }
      out(lane) = UTF8String.fromString(new String(cs))
      lane += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a (distinct) shingle array: per shingle, lane b
    * reads bit b%4 of hex nibble b/4 of md5(shingle) (+1 when set, −1
    * otherwise); sketch bit b = sign of the summed vote — identical to
    * the explode → 64-sum-agg formulation and the oracle's nibble
    * arithmetic. 0 for an empty array (callers filter empties). */
  def simhash64(shingles: ArrayData): Long = {
    val len = shingles.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < len) {
      val s = shingles.getUTF8String(i)
      val digest = md5.get()
      digest.reset()
      val d = digest.digest((if (s == null) "" else s.toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        val q = b >> 2 // hex-nibble index 0..15 over the first 8 bytes
        val byteV = d(q >> 1) & 0xff
        val nib = if ((q & 1) == 0) byteV >> 4 else byteV & 0xF
        if (((nib >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sk = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sk |= 1L << b
      b += 1
    }
    sk
  }
}

/** Native whitespace tokenizer — the `words()` kernel every text
  * operator starts from. The Catalyst formulation
  * `filter(split(lower(trim(text)), "\\s+"), w => w =!= "")` is a
  * higher-order function, which evaluates INTERPRETED (CodegenFallback)
  * and drags the whole projection out of whole-stage codegen; this
  * expression produces the identical token array in one byte scan.
  * Semantics replicated exactly: trim/lowercase via UTF8String's own
  * methods (the same ones Spark's trim/lower call), then runs of Java
  * regex `\s` (ASCII space, \t, \n, \x0B, \f, \r — Java's default,
  * non-UNICODE_CHARACTER_CLASS class) split the byte stream; empty
  * tokens cannot occur (leading/trailing/consecutive separators produce
  * nothing), which is what the `w =!= ""` filter achieved. UTF-8
  * continuation bytes are ≥ 0x80, so byte-level ASCII matching never
  * splits inside a multi-byte character. */
object SplitWordsUtil {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def splitWords(text: UTF8String): ArrayData = {
    val t = text.trim().toLowerCase()
    val bytes = t.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start)
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    new GenericArrayData(out.toArray)
  }
}

/** `count_in(words, set)` — occurrences of any of `set`'s strings in the
  * array (the stopword-hit kernel of langId/qualityScore; the
  * `size(filter(ws, w.isin(...)))` formulation is an interpreted
  * higher-order function). */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression {
  require(set.nonEmpty, "count_in needs a non-empty set")
  @transient private lazy val utf8Set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType

  def countIn(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null && utf8Set.contains(w)) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(arr: Any): Any =
    countIn(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInExpr", this,
      "graft.functions.CountInSet")
    defineCodeGen(ctx, ev, c => s"$ref.countIn($c)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "count_in"
}

/** `split_words(text)` — lowercased whitespace word list of a string. */
case class SplitWords(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"split_words requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    SplitWordsUtil.splitWords(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SplitWordsUtil.splitWords($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "split_words"
}

/** Positional / distinct n-gram hash arrays — the posting-generation
  * kernel of the span, decontamination and containment operators. Values
  * are the SAME engine-agnostic u32 md5 prefix every SQL oracle replays
  * (`conv(substring(md5(gram), 1, 8), 16, 10)` — identical to
  * [[WinnowUtil]]'s internal hashes); computing them BEFORE the explode
  * means gram strings are never materialized as rows and the interpreted
  * `transform`/`concat_ws` lambda per gram disappears (r18 round 2). */
object GramHashUtil {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hashAt(words: ArrayData, i: Int, n: Int,
      digest: java.security.MessageDigest): Long = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      val w = words.getUTF8String(i + j)
      if (w != null) sb.append(w.toString)
      j += 1
    }
    digest.reset()
    val d = digest.digest(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Hashes of all POSITIONAL n-grams (duplicates kept, index order) —
    * row i is the gram starting at token i. Empty for < n words. */
  def positional(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = hashAt(words, i, n, digest); i += 1 }
    new GenericArrayData(out)
  }

  /** Hashes of the DISTINCT n-grams (distinct as strings, first-seen
    * order) — matches hashing [[ShingleUtil.shingles]]'s output
    * element-wise. Empty for < n words. */
  def distinctHashes(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    val seen = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      val s = sb.toString
      if (!seen.containsKey(s)) {
        digest.reset()
        val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        seen.put(s, ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.values().iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `gram_hashes(words, n, distinct)` — u32 md5-prefix n-gram hashes. */
case class GramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_hashes requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(words: Any): Any =
    if (distinct) GramHashUtil.distinctHashes(words.asInstanceOf[ArrayData], n)
    else GramHashUtil.positional(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (distinct) s"graft.functions.GramHashUtil.distinctHashes($c, $n)"
      else s"graft.functions.GramHashUtil.positional($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "gram_hashes"
}

/** `positional_ngrams(words, n)` — ALL n-grams in position order,
  * duplicates kept (the frequency-preserving variant of
  * [[WordShingles]]); one loop instead of an interpreted
  * transform/concat_ws lambda per gram. */
case class PositionalNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_ngrams requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(words: Any): Any =
    PositionalNgrams.build(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PositionalNgrams.build($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "positional_ngrams"
}

object PositionalNgrams {
  def build(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `cut_spans(words, spans)` — drop the tokens inside every
  * [span_start, span_end) range (the exact-substring dedup cut). The
  * Catalyst formulation — `filter(ws, (_, i) => !exists(spans, …))` —
  * evaluates two nested interpreted lambdas per token × span; this is
  * one loop. Spans come pre-merged (non-overlapping maximal intervals),
  * but the loop makes no use of that assumption. */
case class CutSpans(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(_: StructType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cut_spans requires (array<string>, array<struct>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  def cut(words: ArrayData, spans: ArrayData): ArrayData = {
    val n = words.numElements()
    val m = spans.numElements()
    val starts = new Array[Long](m)
    val ends = new Array[Long](m)
    var j = 0
    while (j < m) {
      val row = spans.getStruct(j, 2)
      starts(j) = row.getLong(0)
      ends(j) = row.getLong(1)
      j += 1
    }
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      var inSpan = false
      var s = 0
      while (!inSpan && s < m) {
        if (i >= starts(s) && i < ends(s)) inSpan = true
        s += 1
      }
      if (!inSpan) out.add(words.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(words: Any, spans: Any): Any =
    cut(words.asInstanceOf[ArrayData], spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cutSpansExpr", this,
      "graft.functions.CutSpans")
    defineCodeGen(ctx, ev, (w, s) => s"$ref.cut($w, $s)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cut_spans"
}

/** `bpeish_count(text)` — the BPE-ish subword count: maximal `\w` runs
  * plus standalone punctuation code points, previously
  * `size(filter(split(text, "[^\\w]+"), _ != "")) +
  * (length − length(regexp_replace(text, "[^\\w\\s]", "")))` — two regex
  * passes and an interpreted filter lambda per row. Java's default
  * (non-UNICODE_CHARACTER_CLASS) `\w` = [a-zA-Z0-9_] and `\s` are
  * ASCII-only, so every non-ASCII code point is punctuation; lengths are
  * code points on both sides (Spark `length` = UTF8String.numChars), so
  * one UTF-8 byte scan reproduces the exact counts. */
case class BpeishCount(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpeish_count requires string, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(text: Any): Any =
    BpeishUtil.count(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeishUtil.count($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "bpeish_count"
}

object BpeishUtil {
  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'
  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var chunks = 0
    var punct = 0
    var inWord = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        if (isWordByte(b)) {
          if (!inWord) { chunks += 1; inWord = true }
        } else {
          inWord = false
          if (!isWsByte(b)) punct += 1
        }
        i += 1
      } else {
        // non-ASCII code point: not \w, not \s -> punctuation; skip
        // continuation bytes so each code point counts once
        inWord = false
        punct += 1
        i += 1
        while (i < n && (bytes(i) & 0xC0) == 0x80) i += 1
      }
    }
    chunks + punct
  }
}

/** `top_ngram_count(words, n)` — max positional n-gram frequency. */
case class TopNgramCount(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "ngram size must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_ngram_count requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(words: Any): Any =
    DocAggUtil.topNgramCount(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocAggUtil.topNgramCount($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "top_ngram_count"
}

/** `minhash_lanes(shingles, k)` — k-lane engine-agnostic string minhash. */
case class MinhashLanes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 40, "lane count must be in [1, 40]") // single-digit md5 seeds
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_lanes requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null for empty shingle arrays

  override protected def nullSafeEval(shingles: Any): Any =
    DocAggUtil.minhashLanes(shingles.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): the util returns null for an
    // empty array and the generated code must propagate that
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DocAggUtil.minhashLanes($c, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_lanes"
}

/** `simhash64(shingles)` — 64-bit SimHash sketch of a shingle array. */
case class Simhash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(shingles: Any): Any =
    DocAggUtil.simhash64(shingles.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocAggUtil.simhash64($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash64"
}

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge
  def word_shingles(words: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words), n))
  def winnow_hashes(words: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(ColumnBridge.expression(words), n, w))
  def compress_ratio(text: Column): Column =
    ColumnBridge.column(CompressRatio(ColumnBridge.expression(text)))
  def top_ngram_count(words: Column, n: Int): Column =
    ColumnBridge.column(TopNgramCount(ColumnBridge.expression(words), n))
  def gram_hashes(words: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(words), n, distinct))
  def split_words(text: Column): Column =
    ColumnBridge.column(SplitWords(ColumnBridge.expression(text)))
  def count_in(words: Column, set: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(words), set))
  def cut_spans(words: Column, spans: Column): Column =
    ColumnBridge.column(CutSpans(
      ColumnBridge.expression(words), ColumnBridge.expression(spans)))
  def bpeish_count(text: Column): Column =
    ColumnBridge.column(BpeishCount(ColumnBridge.expression(text)))
  def positional_ngrams(words: Column, n: Int): Column =
    ColumnBridge.column(PositionalNgrams(ColumnBridge.expression(words), n))
  def minhash_lanes(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinhashLanes(ColumnBridge.expression(shingles), k))
  def simhash64(shingles: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(shingles)))
}
