package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * The built-in route (`zip_with` + `aggregate`) evaluates one interpreted
  * lambda call per element — ~25M boxed calls for a 125k-pair × 64-dim
  * cosine join. These expressions instead emit a primitive fused loop in
  * whole-stage codegen (and a matching interpreted path), making vector
  * similarity a few ns/element: the difference between the embedding
  * dedup battery finishing in seconds vs minutes, and the only way
  * brute-force verification stays feasible at 100 TB candidate volumes.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case ArrayType(_: DecimalType, _) => true // SQL array(1.0, …) literals
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  protected def getD(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  protected def codegenGet(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** Σ aᵢ·bᵢ over two numeric arrays (fused primitive loop). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += getD(lt, x, i) * getD(rt, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${codegenGet(elemType(left), a, i)} * ${codegenGet(elemType(right), b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Cosine similarity in ONE pass: dot, |a|², |b|² accumulated in the same
  * loop; null when either norm is zero (never a divide-by-zero, ANSI-safe). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = getD(lt, x, i); val yv = getD(rt, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${codegenGet(elemType(left), a, i)};
         |  double $yv = ${codegenGet(elemType(right), b, i)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** All multi-table sign-LSH bucket keys of a vector in ONE fused loop:
  * key t = `(t << bits) | Σᵢ (vec·planes[t·bits+i] >= 0) << i`.
  *
  * The composed-Column alternative (per-plane `when(vec_dot(...) >= 0)`
  * chains bitwise-OR'd per table) builds a `tables × bits`-subexpression
  * tree — at the selective 24×8 setting that is 192 dot products of
  * 64-double literal arrays whose PLANNING + codegen dominate the whole
  * query (measured ~6 s/run at sf0.1, nearly all fixed cost). Here the
  * planes ride as one reference object and the generated code is a tiny
  * triple loop — the same sequential left-to-right accumulation order as
  * [[DotProduct]] and the SQL oracle's `list_dot_product`, so bucket
  * signs agree bit-for-bit across engines. */
case class SignLshKeys(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits < 32 && planes.nonEmpty && planes.length % bits == 0,
    "planes must hold tables × bits rows")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_keys requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val tables = planes.length / bits
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var i = 0
      while (i < bits) {
        val p = planes(t * bits + i)
        val n = math.min(arr.numElements(), p.length)
        var s = 0.0
        var j = 0
        while (j < n) {
          s += (if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)) * p(j)
          j += 1
        }
        if (s >= 0) b |= (1L << i)
        i += 1
      }
      out(t) = b + (t.toLong << bits)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val (t, i, j, b, s, n, out, p) = (ctx.freshName("t"), ctx.freshName("i"),
        ctx.freshName("j"), ctx.freshName("b"), ctx.freshName("s"),
        ctx.freshName("n"), ctx.freshName("out"), ctx.freshName("p"))
      val tables = planes.length / bits
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $b = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    double[] $p = $planesRef[$t * $bits + $i];
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += (double) $a.$get($j) * $p[$j];
         |    }
         |    if ($s >= 0) $b |= (1L << $i);
         |  }
         |  $out[$t] = $b + (((long) $t) << $bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "sign_lsh_keys"
}

/** Shared shape/arithmetic for the fused product-quantization
  * expressions: codebooks(j)(c) is the c-th codeword of subspace j, each
  * `sub` doubles wide; subspace j covers vector dims [j·sub, (j+1)·sub).
  * All dot/Σx² loops run in index order, and d2 = x·x − 2·x·c + c·c
  * evaluates as ((ss − dot·2) + cc) — the EXACT IEEE sequence the DuckDB
  * oracle's `list_dot_product`-based SQL performs, so codes and tables
  * are bit-reproducible cross-engine. Fused for the same reason as
  * [[SignLshKeys]]: the compositional Column form costs m×ks
  * literal-array subtrees to plan and codegen per query. */
trait PqExpression extends UnaryExpression {
  def codebooks: Array[Array[Array[Double]]]
  protected val m: Int = codebooks.length
  protected val ks: Int = codebooks(0).length
  protected val sub: Int = codebooks(0)(0).length
  /** codeword self-dots cc(j)(c) = Σ c², precomputed once. */
  @transient protected lazy val cc: Array[Array[Double]] =
    codebooks.map(_.map(cw => { var s = 0.0; var d = 0
      while (d < cw.length) { s += cw(d) * cw(d); d += 1 }; s }))

  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** A vector whose length differs from m·sub is a dim/codebook mismatch;
    * clamping would silently emit code 0 / zero dots and diverge from the
    * oracle with no error, so fail loudly instead. */
  protected def dimCheck(arr: ArrayData): Unit =
    if (arr.numElements() != m * sub) throw new IllegalArgumentException(
      s"$prettyName: vector has ${arr.numElements()} elements but codebooks " +
        s"expect ${m * sub} (m=$m x sub=$sub)")

  protected def dimCheckJava(a: String): String =
    s"""if ($a.numElements() != ${m * sub}) {
       |  throw new IllegalArgumentException("$prettyName: vector has " +
       |    $a.numElements() + " elements but codebooks expect ${m * sub}");
       |}""".stripMargin

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
}

/** codes(j) = argmin_c ‖sub_j(vec) − codebooks(j)(c)‖², ties → lowest
  * code. One fused loop over a reference object. */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends PqExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    dimCheck(arr)
    val f = isFloat
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = sub
      var ss = 0.0
      var d = 0
      while (d < n) {
        val x = if (f) arr.getFloat(off + d).toDouble else arr.getDouble(off + d)
        ss += x * x; d += 1
      }
      var best = Double.PositiveInfinity
      var bc = 0
      var ci = 0
      while (ci < ks) {
        val cw = codebooks(j)(ci)
        var s = 0.0
        d = 0
        while (d < n) {
          s += (if (f) arr.getFloat(off + d).toDouble else arr.getDouble(off + d)) * cw(d)
          d += 1
        }
        val d2 = ss - s * 2 + cc(j)(ci)
        if (d2 < best) { best = d2; bc = ci }
        ci += 1
      }
      out(j) = bc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val (j, d, ci, off, ss, s, d2, best, bc, out, cw, x) =
        (ctx.freshName("j"), ctx.freshName("d"), ctx.freshName("ci"),
          ctx.freshName("off"), ctx.freshName("ss"),
          ctx.freshName("s"), ctx.freshName("d2"), ctx.freshName("best"),
          ctx.freshName("bc"), ctx.freshName("out"), ctx.freshName("cw"),
          ctx.freshName("x"))
      s"""
         |${dimCheckJava(a)}
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  double $ss = 0.0;
         |  for (int $d = 0; $d < $sub; $d++) {
         |    double $x = (double) $a.$get($off + $d);
         |    $ss += $x * $x;
         |  }
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bc = 0;
         |  for (int $ci = 0; $ci < $ks; $ci++) {
         |    double[] $cw = $cbRef[$j][$ci];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      $s += (double) $a.$get($off + $d) * $cw[$d];
         |    }
         |    double $d2 = $ss - $s * 2 + $ccRef[$j][$ci];
         |    if ($d2 < $best) { $best = $d2; $bc = $ci; }
         |  }
         |  $out[$j] = $bc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_codes"
}

/** Per-query ADC lookup tables: table(j)(c) = ⌊dot(sub_j(vec),
  * codebooks(j)(c))·10⁴ + 0.5⌋ as a long — integer partials whose sum is
  * summation-order-free. */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends PqExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    dimCheck(arr)
    val f = isFloat
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = sub
      val tbl = new Array[Long](ks)
      var ci = 0
      while (ci < ks) {
        val cw = codebooks(j)(ci)
        var s = 0.0
        var d = 0
        while (d < n) {
          s += (if (f) arr.getFloat(off + d).toDouble else arr.getDouble(off + d)) * cw(d)
          d += 1
        }
        tbl(ci) = math.floor(s * 1e4 + 0.5).toLong
        ci += 1
      }
      out(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(tbl)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val (j, d, ci, off, s, out, tbl, cw) =
        (ctx.freshName("j"), ctx.freshName("d"), ctx.freshName("ci"),
          ctx.freshName("off"), ctx.freshName("s"),
          ctx.freshName("out"), ctx.freshName("tbl"), ctx.freshName("cw"))
      s"""
         |${dimCheckJava(a)}
         |Object[] $out = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  long[] $tbl = new long[$ks];
         |  for (int $ci = 0; $ci < $ks; $ci++) {
         |    double[] $cw = $cbRef[$j][$ci];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      $s += (double) $a.$get($off + $d) * $cw[$d];
         |    }
         |    $tbl[$ci] = (long) java.lang.Math.floor($s * 1.0E4 + 0.5);
         |  }
         |  $out[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($tbl);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "pq_adc_table"
}

/** The `n` nearest centroid ids by max dot product (ties → lowest cid),
  * ordered (dot desc, cid asc) — IVF coarse assignment as ONE fused
  * expression over a reference-object centroid matrix.
  *
  * This is the scale enabler for `nlist ∝ √n`: the compositional Column
  * form (an `array_sort` over nlist literal structs, each a dot over dim
  * `lit()` elements) costs nlist×dim expression NODES to plan and
  * codegen — fine at nlist 16, pathological past ~10² (the generated
  * method blows the JVM's 64 KB limit and falls off whole-stage
  * codegen). Here the centroids ride as one `double[][]` reference and
  * the generated code is a fixed triple loop, so nlist in the thousands
  * costs only FLOPs. Dot accumulation is the same sequential
  * left-to-right order as [[DotProduct]] (which backed the literal
  * form), and the (dot desc, cid asc) selection reproduces
  * `array_sort((negSim, cid))` exactly — so cell assignments are
  * bit-identical to the literal-centroid form the battery oracles pin. */
case class IvfAssign(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(n >= 1 && n <= centroids.length && centroids.nonEmpty,
    s"need 1 <= n=$n <= nlist=${centroids.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_assign requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val bd = new Array[Double](n) // best dots, descending
    val bc = new Array[Int](n)    // their cids
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val len = math.min(arr.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < len) {
        s += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)) * cent(i)
        i += 1
      }
      // insertion keeping (dot desc, cid asc); equal dots keep earlier
      // (lower) cid first because candidates arrive in cid order
      if (filled < n || s > bd(filled - 1)) {
        var p = math.min(filled, n - 1)
        while (p > 0 && bd(p - 1) < s) { bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1 }
        bd(p) = s; bc(p) = c
        if (filled < n) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bc, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val (c, i, s, p, bd, bc, filled, cent, len) = (ctx.freshName("c"),
        ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("p"),
        ctx.freshName("bd"), ctx.freshName("bc"), ctx.freshName("filled"),
        ctx.freshName("cent"), ctx.freshName("len"))
      s"""
         |double[] $bd = new double[$n];
         |int[] $bc = new int[$n];
         |int $filled = 0;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $len = java.lang.Math.min($a.numElements(), $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    $s += (double) $a.$get($i) * $cent[$i];
         |  }
         |  if ($filled < $n || $s > $bd[$filled - 1]) {
         |    int $p = java.lang.Math.min($filled, $n - 1);
         |    while ($p > 0 && $bd[$p - 1] < $s) {
         |      $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $s; $bc[$p] = $c;
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bc, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "ivf_assign"
}

object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge
  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ex(a), ex(b)))
  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ex(a), ex(b)))
  def sign_lsh_keys(vec: Column, planes: Seq[Array[Double]], bits: Int): Column =
    ColumnBridge.column(SignLshKeys(ex(vec), planes.toArray, bits))
  def pq_codes(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCodes(ex(vec), codebooks))
  def pq_adc_table(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcTable(ex(vec), codebooks))
  def ivf_assign(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(IvfAssign(ex(vec), centroids, n))

  /** Register `vec_dot` / `vec_cosine` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => CosineSimilarity(es.head, es(1)), "built-in")
  }
}
