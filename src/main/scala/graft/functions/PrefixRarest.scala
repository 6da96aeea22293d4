package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel: the PPJoin prefix of a shingle set — its first
  * p = n − ⌈t·n⌉ + 1 elements under the global (df, gram) total order,
  * where df comes from a bounded hot-gram table and absent grams count
  * as df = 1. One tight JVM loop per row, called identically from the
  * interpreted eval and the generated code. */
object PrefixKernel {

  def prefixRarest(arr: ArrayData,
      hot: java.util.HashMap[UTF8String, java.lang.Long],
      t: Double): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val p = n - math.ceil(t * n).toInt + 1
    val grams = new Array[UTF8String](n)
    val dfs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      grams(i) = g
      val d = hot.get(g)
      dfs(i) = if (d == null) 1L else d.longValue()
      i += 1
    }
    if (p >= n) return new GenericArrayData(grams.asInstanceOf[Array[Any]])
    val idx = new Array[Integer](n)
    i = 0
    while (i < n) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(dfs(a.intValue()), dfs(b.intValue()))
        if (c != 0) c else grams(a.intValue()).compareTo(grams(b.intValue()))
      }
    })
    val out = new Array[Any](p)
    i = 0
    while (i < p) { out(i) = grams(idx(i).intValue()); i += 1 }
    new GenericArrayData(out)
  }
}

/** The AllPairs/PPJoin prefix of a gram-set column as ONE custom
  * Catalyst expression, replacing the round-1/2/3 formulation
  * (explode → shuffle-join with the gram-df table on `g` → window
  * `row_number` re-shuffled and SORTED by doc) that BENCH_r03 showed
  * was the widest shuffle+sort in q44/q53/q69 (round-3 verdict #1).
  *
  * Why a bounded hot-gram map keeps this EXACT: prefix filtering is
  * complete under ANY global total order of grams — rarity ordering
  * is purely a collision-minimizing heuristic, never a correctness
  * requirement (Bayardo et al. WWW'07 §3 fix the "ordering" as an
  * arbitrary canonical one; Xiao et al. WWW'08 choose df order for
  * performance). Mapping every gram to
  * `df*(g) = hot.getOrElse(g, 1)` and ordering by `(df*, gram)` is a
  * global total order — the same function of `g` on every document —
  * so candidates remain a superset of all true pairs and the exact
  * verify step leaves the query's output byte-identical. The hot map
  * only needs the grams whose true df is LARGE: those are precisely
  * the scale-killer keys the prefix must exclude, and a capped top-K
  * captures them by construction; a rare gram demoted to df* = 1
  * costs at most a few extra candidate rows, never a missed pair.
  *
  * This turns the whole prefix computation into a map-side projection
  * (zero shuffles, whole-stage codegen) at the price of one bounded
  * plan-time constant — same Setup-block pattern as q86's sampled
  * centroids and q83's quantized planes.
  */
case class PrefixRarest(child: Expression, hot: Map[String, Long], t: Double)
    extends UnaryExpression {

  require(t > 0 && t <= 1, "similarity threshold must be in (0, 1]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"prefix_rarest requires array<string>, got $other")
  }

  @transient private lazy val lookup = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](hot.size * 2)
    hot.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    PrefixKernel.prefixRarest(input.asInstanceOf[ArrayData], lookup, t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hotRef = ctx.addReferenceObj("hotGrams", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PrefixKernel.prefixRarest($a, $hotRef, $t);")
  }

  override def prettyName: String = "prefix_rarest"

  // default case-class toString would dump the whole hot map into
  // every explain string
  override def toString: String =
    s"prefix_rarest($child, hot=${hot.size} grams, t=$t)"

  override protected def withNewChildInternal(newChild: Expression): PrefixRarest =
    copy(child = newChild)
}

object PrefixRarest {
  def prefixRarest(grams: Column, hot: Map[String, Long], t: Double): Column =
    graftbridge.toColumn(
      PrefixRarest(graftbridge.toExpression(grams), hot, t))
}
