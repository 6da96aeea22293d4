package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel: bounded-width min-cost Viterbi segmentation of ONE
  * word over its candidate-piece lattice — the per-word E-step of
  * unigram-LM tokenizer training (q155). One tight JVM loop per row,
  * called identically from the interpreted eval and the generated
  * code (the PrefixKernel pattern; CLAUDE.md rule: per-row DP loops
  * are a custom Expression, not nested higher-order functions). */
object ViterbiKernel {

  /** edges rows: (endPos 1-based, pieceLen, cost). DP over end
    * positions e = 1..len(w): best(e) = min over k of
    * best(e−k) + cost(e,k). TIE RULE — the exactness contract with
    * the DuckDB replay: smaller total cost first, then SMALLER piece
    * length (row_number over (cost, k) in SQL); with best(e−k)
    * itself unique by induction, the backtraced path is unique.
    * Returns the piece array in word order, or empty if position
    * len(w) is unreachable (cannot happen while every single char is
    * in the vocabulary — the char-smoothing invariant — but the
    * kernel stays total). */
  def segment(w: UTF8String, edges: ArrayData, maxPiece: Int): GenericArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val INF = Long.MaxValue
    val costAt = Array.fill((n + 1) * (maxPiece + 1))(-1L)
    val m = edges.numElements()
    var i = 0
    while (i < m) {
      val r = edges.getStruct(i, 3)
      val e = r.getInt(0); val k = r.getInt(1); val c = r.getLong(2)
      // vocab costs are quantized -ln(p) with p <= 1: always >= 0,
      // so -1 is a safe "no such piece" sentinel
      if (e >= 1 && e <= n && k >= 1 && k <= maxPiece)
        costAt(e * (maxPiece + 1) + k) = c
      i += 1
    }
    val best = Array.fill(n + 1)(INF)
    val bk = new Array[Int](n + 1)
    best(0) = 0L
    var e = 1
    while (e <= n) {
      val km = math.min(maxPiece, e)
      var k = 1
      while (k <= km) {
        val c = costAt(e * (maxPiece + 1) + k)
        if (c >= 0 && best(e - k) != INF) {
          val tc = best(e - k) + c
          // k ascends, so on ties the FIRST (smallest-k) achiever wins
          if (tc < best(e)) { best(e) = tc; bk(e) = k }
        }
        k += 1
      }
      e += 1
    }
    if (best(n) == INF) return new GenericArrayData(Array.empty[Any])
    var steps = 0
    var pos = n
    while (pos > 0) { pos -= bk(pos); steps += 1 }
    val out = new Array[Any](steps)
    pos = n
    var j = steps - 1
    while (pos > 0) {
      val k = bk(pos)
      out(j) = UTF8String.fromString(s.substring(pos - k, pos))
      pos -= k
      j -= 1
    }
    new GenericArrayData(out)
  }
}

/** Viterbi best-segmentation of a word under the current piece costs,
  * as one codegen'd Catalyst expression over (word, collected lattice
  * edges). See [[ViterbiKernel.segment]] for the DP contract. */
case class UnigramViterbi(left: Expression, right: Expression, maxPiece: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _))
        if st.fields.length == 3 &&
          st.fields(0).dataType == IntegerType &&
          st.fields(1).dataType == IntegerType &&
          st.fields(2).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi requires (string, array<struct<int,int,bigint>>), got $other")
    }

  override protected def nullSafeEval(w: Any, edges: Any): Any =
    ViterbiKernel.segment(w.asInstanceOf[UTF8String],
      edges.asInstanceOf[ArrayData], maxPiece)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, e) =>
      s"${ev.value} = graft.functions.ViterbiKernel.segment($w, $e, $maxPiece);")

  override def prettyName: String = "unigram_viterbi"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramViterbi =
    copy(left = newLeft, right = newRight)
}

object UnigramViterbi {
  def viterbiPieces(w: Column, edges: Column, maxPiece: Int): Column =
    graftbridge.toColumn(UnigramViterbi(
      graftbridge.toExpression(w), graftbridge.toExpression(edges), maxPiece))
}
