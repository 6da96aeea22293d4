package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static vote-loop kernel shared by the interpreted and generated
  * paths. */
object SimHashKernel {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** 64-bit SimHash of a token array (Charikar similarity hashing):
  * each token's xxhash64 votes ±1 per bit position; the fingerprint
  * sets bit j iff the vote sum is positive. Near-duplicate documents
  * (small token-multiset edits) land within a small Hamming distance.
  *
  * This is the project's one custom Catalyst `Expression`: the
  * 64-bucket vote loop is awkward and slow as a built-in composition
  * (64 nested higher-order-function passes over the token array), but
  * is a single tight JVM loop here. Token hashing reuses Spark's own
  * XXH64 (same function backing `xxhash64`), so signatures are
  * consistent with the MinHash pipeline's hashes.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHashKernel.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.graftbridge

  def simhash64(tokens: Column): Column =
    graftbridge.toColumn(SimHash64(graftbridge.toExpression(tokens)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
