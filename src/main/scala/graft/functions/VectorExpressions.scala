package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinternal.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `ARRAY<FLOAT|DOUBLE>`
  * embedding columns (SURVEY.md §2.4 similarity search; §4.2 names cosine
  * the one justified custom-Catalyst item).
  *
  * Why an Expression and not a UDF or higher-order `aggregate`: a UDF boxes
  * both arrays per row; `zip_with`+`aggregate` allocate a lambda frame per
  * element. These generate (doGenCode) a tight primitive loop inside
  * whole-stage codegen — the difference between memory-bound and
  * compute-bound at 10^8 comparisons per executor.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Only float/double arrays are legal inputs: the accessors read raw
    * slots, so an int/long array would be BIT-REINTERPRETED into garbage
    * doubles (NaNs at best) instead of failing — reject at analysis time.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline protected final def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java accessor snippet for codegen. */
  protected def getter(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"

  /** Mixed embedding dimensions are data corruption, not a computable case:
    * truncating to the shorter array would return plausible-looking but
    * wrong similarities with no signal (and DuckDB's list functions — the
    * reproducibility reference — error on mismatched lengths too).
    */
  @inline protected final def checkedLen(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector dimensions differ (${n} vs ${y.numElements()})")
    n
  }

  /** Codegen image of [[checkedLen]]. */
  protected def checkedLenCode(n: String, x: String, y: String): String =
    s"""
       |int $n = $x.numElements();
       |if ($n != $y.numElements()) {
       |  throw new IllegalArgumentException("$prettyName: vector dimensions differ ("
       |    + $n + " vs " + $y.numElements() + ")");
       |}
     """.stripMargin
}

/** dot(a, b) — sequential fold in array order (matters for cross-engine
  * FP reproducibility: DuckDB's list_dot_product folds the same way).
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = checkedLen(x, y)
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(x, i, lf) * elem(y, i, rf); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |${checkedLenCode(n, x, y)}
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(x, i, elemIsFloat(left))} * ${getter(y, i, elemIsFloat(right))};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (||a||·||b||); 0.0 when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = checkedLen(x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xe = elem(x, i, lf); val ye = elem(y, i, rf)
      dot += xe * ye; na += xe * xe; nb += ye * ye; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xe = ctx.freshName("xe"); val ye = ctx.freshName("ye")
      s"""
         |${checkedLenCode(n, x, y)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xe = ${getter(x, i, elemIsFloat(left))};
         |  double $ye = ${getter(y, i, elemIsFloat(right))};
         |  $dot += $xe * $ye; $na += $xe * $xe; $nb += $ye * $ye;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** ||a||₂ — L2 norm. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Same raw-slot-accessor hazard as the binary kernels: anything but a
    * float/double array would be bit-reinterpreted, so reject it at
    * analysis time.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float|double> input, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) {
      val e = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += e * e; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
              else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc"); val e = ctx.freshName("e")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  double $e = ${get(x, i)};
         |  $acc += $e * $e;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

/** 64-bit SimHash over a token array: bit j of the result is the sign of
  * Σ_tokens (bit j of xxhash64(token) ? +1 : -1) — the classic Charikar
  * sketch for near-duplicate text (SURVEY.md §2.4). Hamming distance between
  * SimHashes approximates token-multiset dissimilarity.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with codegen.CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val h = XXH64.hashUTF8String(tok, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  // Interpreted eval only: SimHash runs once per document (not per pair), so
  // it is never the hot loop; codegen would buy nothing measurable.

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Column-level facade. */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vec_cosine(a: Column, b: Column): Column = column(CosineSimilarity(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(L2Norm(expression(a)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
}
