package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** The signature kernel as a static method so both the interpreted
  * path and whole-stage-generated Java call the identical code.
  *
  * Hash family (all SQL-replayable — this flipped q45 from rows-only
  * to EXACT): token hash = [[SplitMix64Kernel.strHash]]; shingle hash
  * = the foldMix chain sh ← mix(sh ⊕ tokHash) from 0; per-salt hash
  * h_k = mix(sh + k·Golden). Minima are tracked in UNSIGNED order —
  * the oracle's HUGEINT domain is [0, 2^64), so signed comparison
  * would disagree on any hash with the top bit set; the empty-shingle
  * sentinel is accordingly unsigned-max (-1L). */
object MinHashSigKernel {
  import SplitMix64Kernel.{mix, Golden}
  def compute(arr: ArrayData, numHashes: Int, shingleN: Int): GenericArrayData = {
    val nTok = arr.numElements()
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        tokHash(i) = SplitMix64Kernel.strHash(s)
      }
      i += 1
    }
    val sig = Array.fill(numHashes)(-1L) // unsigned max
    val nShingles = nTok - shingleN + 1
    var g = 0
    while (g < nShingles) {
      var sh = 0L
      var j = 0
      while (j < shingleN) {
        sh = mix(sh ^ tokHash(g + j))
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val hk = mix(sh + k * Golden)
        if (java.lang.Long.compareUnsigned(hk, sig(k)) < 0) sig(k) = hk
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
  * min, so no shingle dedup is needed. Hash family: splitmix64 chains
  * (see the kernel's scaladoc) — SQL-replayable by the DuckDB oracle.
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
