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

object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge
  def word_shingles(words: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words), n))
}
