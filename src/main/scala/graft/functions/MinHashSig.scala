package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** The signature kernel as a static method so both the interpreted
  * path and whole-stage-generated Java call the identical code. */
object MinHashSigKernel {
  def compute(arr: ArrayData, numHashes: Int, shingleN: Int): GenericArrayData = {
    val nTok = arr.numElements()
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        tokHash(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
      }
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = nTok - shingleN + 1
    var g = 0
    while (g < nShingles) {
      var sh = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < shingleN) {
        sh = XXH64.hashLong(tokHash(g + j) ^ sh, 7L)
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val hk = XXH64.hashLong(sh, k.toLong)
        if (hk < sig(k)) sig(k) = hk
        k += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }
}

/** MinHash signature of a token array as one custom Catalyst
  * expression: token-hash once, roll shingles of `shingleN` token
  * hashes, and track `numHashes` per-salt minima — all in a single
  * JVM loop per row.
  *
  * Replaces the nested higher-order-function formulation whose
  * re-evaluated shingle construction made signing 500 docs take 374 s
  * at bench (each of the 64 salts re-built the whole shingle array
  * through the interpreter). Same sketch semantics: sig[k] =
  * min over shingles of hash_k(shingle); duplicates don't affect the
  * min, so no shingle dedup is needed. Hash family: XXH64 re-seeded
  * per salt — the same family as the engine's `xxhash64`.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  require(numHashes > 0 && shingleN > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigKernel.compute(input.asInstanceOf[ArrayData], numHashes, shingleN)

  /** Codegen: the generated stage evaluates the child inline and
    * calls the shared static kernel — no interpreted expression
    * dispatch, and identical results to the eval path by
    * construction. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSigKernel.compute($a, $numHashes, $shingleN);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSignature(tokens: Column, numHashes: Int, shingleN: Int): Column =
    graftbridge.toColumn(MinHashSignature(
      graftbridge.toExpression(tokens), numHashes, shingleN))
}
