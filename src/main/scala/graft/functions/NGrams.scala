package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for the distinct word-n-gram (shingle) computation —
  * one tight JVM loop per row, called identically from the
  * interpreted eval and the generated code. */
object NGramKernel {
  private val SPACE = UTF8String.fromString(" ")

  def wordNGrams(arr: ArrayData, n: Int, distinct: Boolean): GenericArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](nTok)
    var i = 0
    while (i < nTok) {
      toks(i) =
        if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val window = new Array[UTF8String](n)
    if (distinct) {
      // first-occurrence order, like array_distinct
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var g = 0
      while (g <= nTok - n) {
        var j = 0
        while (j < n) { window(j) = toks(g + j); j += 1 }
        seen.add(UTF8String.concatWs(SPACE, window: _*))
        g += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    } else {
      // every occurrence, in order (for repetition statistics)
      val out = new Array[Any](nTok - n + 1)
      var g = 0
      while (g <= nTok - n) {
        var j = 0
        while (j < n) { window(j) = toks(g + j); j += 1 }
        out(g) = UTF8String.concatWs(SPACE, window: _*)
        g += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Distinct word n-grams of a token array as one custom Catalyst
  * expression. Replaces the higher-order-function formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`
  * + `array_distinct`) whose interpreted per-element lambdas made the
  * shingle stage the q44 bottleneck (~4 s per evaluation over 5000
  * docs at sf0.1, re-paid at every plan reference) — same lesson as
  * the round-1 MinHash rewrite (PLANS.md; CLAUDE.md: hot per-row
  * array loops belong in custom Expressions). Short inputs
  * (fewer tokens than n) yield an empty array, matching the oracle's
  * empty generate_series(1, 0).
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n > 0, "n-gram size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word n-grams require array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NGramKernel.wordNGrams(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NGramKernel.wordNGrams($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object NGrams {
  /** Distinct n-grams (shingle set). */
  def wordNGrams(tokens: Column, n: Int): Column =
    graftbridge.toColumn(WordNGrams(graftbridge.toExpression(tokens), n))

  /** Every n-gram occurrence in order (repetition statistics). */
  def wordNGramsAll(tokens: Column, n: Int): Column =
    graftbridge.toColumn(WordNGrams(graftbridge.toExpression(tokens), n,
      distinct = false))
}
