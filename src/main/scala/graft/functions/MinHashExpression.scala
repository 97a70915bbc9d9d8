package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinternal.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over a token array: shingles of `shingleN`
  * consecutive tokens, `k` signature slots.
  *
  * Why an Expression and not the HOF composition
  * (`transform(sequence(0,k-1), i -> array_min(transform(shingles, s ->
  * xxhash64(i, s))))`): the interpreted higher-order path re-evaluates the
  * whole shingle subtree per outer slot — k× re-shingling plus per-element
  * lambda frames, which measured ~3 orders of magnitude slower at sf0.1.
  * This implementation walks the tokens once, hashes each shingle twice
  * (xxhash64 with two seeds) and derives the k slot hashes by
  * Carter-Wegman double hashing h_i = b1 + i·b2 — O(shingles·k) integer
  * adds, no allocation beyond the signature array.
  *
  * Deterministic across sessions/partitions: pure function of the input.
  */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {

  // k <= 0 would emit an empty signature (divide-by-zero in the Jaccard
  // estimate); shingleN <= 0 would absorb only the empty shingle, making
  // every document's signature identical — an all-pairs candidate explosion
  require(k >= 1, s"minhash_signature: k must be >= 1, got $k")
  require(shingleN >= 1, s"minhash_signature: shingleN must be >= 1, got $shingleN")

  override def prettyName: String = "minhash_signature"

  /** Analysis-time type contract: a non-ARRAY<STRING> child fails cleanly
    * at plan time instead of a runtime ClassCastException / garbage reads.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sig = Array.fill(k)(Long.MaxValue)

    def absorb(shingle: UTF8String): Unit = {
      val b1 = XXH64.hashUTF8String(shingle, 0x51_7C_C1_B7_27_22_0A_95L)
      val b2 = XXH64.hashUTF8String(shingle, 0x27_D4_EB_2F_16_56_67_C5L) | 1L
      var i = 0
      var h = b1
      while (i < k) {
        if (h < sig(i)) sig(i) = h
        h += b2
        i += 1
      }
    }

    if (n < shingleN) {
      // degenerate doc: single whole-text shingle (mirrors TextFunctions.shingles)
      val parts = new Array[UTF8String](math.max(n, 0))
      var i = 0
      while (i < n) { parts(i) = toks.getUTF8String(i); i += 1 }
      absorb(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
    } else {
      val space = UTF8String.fromString(" ")
      var s = 0
      val parts = new Array[UTF8String](shingleN)
      while (s <= n - shingleN) {
        var j = 0
        while (j < shingleN) { parts(j) = toks.getUTF8String(s + j); j += 1 }
        absorb(UTF8String.concatWs(space, parts: _*))
        s += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  /** Column facade: signature of `k` slots over `shingleN`-gram shingles of
    * a token array.
    */
  def minhashSig(tokens: Column, k: Int, shingleN: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k, shingleN))
}
