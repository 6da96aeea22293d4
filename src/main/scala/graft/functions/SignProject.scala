package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Rademacher (±1) random projection of a quantized embedding — the
  * Johnson-Lindenstrauss dimensionality reduction a 100 TB similarity
  * pipeline runs before ANN (Achlioptas 2001, "Database-friendly
  * random projections": ±1 entries preserve JL with no dense
  * Gaussians). Input is the integer-quantized embedding (micro-units,
  * array<long>); each output dim j is Σ_i s_ij·q_i with the sign row
  * s_j packed as one 64-bit mask (bit i set → +1). Pure integer
  * adds/subtracts → bit-stable on any engine and partitioning, and
  * the oracle replays it as a generated ±q[i] sum.
  *
  * Per-row k×d loop → custom codegen Expression, not nested
  * higher-order functions (the 374s→4s house lesson, CLAUDE.md).
  */
object SignProjectKernel {
  /** Deterministic sign-mask row for output dim j: bit i is the sign
    * bit of splitmix64(salt·Golden + j·64 + i) — the shared constant
    * both the engine expression and the generated oracle derive from. */
  def masks(k: Int, salt: Long): Array[Long] = {
    Array.tabulate(k) { j =>
      var m = 0L
      var i = 0
      while (i < 64) {
        if (SplitMix64Kernel.mix(salt * SplitMix64Kernel.Golden + j * 64 + i) < 0)
          m |= (1L << i)
        i += 1
      }
      m
    }
  }

  /** +1 where the mask bit is set, −1 where clear — the oracle
    * generator's view of the same constant. */
  def sign(masks: Array[Long], j: Int, i: Int): Int =
    if (((masks(j) >>> i) & 1L) == 1L) 1 else -1

  /** Unit-normalize a FLOAT embedding, micro-quantize, and project —
    * the fused q106 hot path (one codegen call, no HOF lambdas, the
    * norm computed once per row). Operation order is the oracle's:
    * left-assoc squared-norm sum, sqrt, (x/nrm)*1e6, round
    * half-away-from-zero. The rounding is exact on the TRUE double
    * value (trunc + exact fraction compare — valid for |v| < 2^52),
    * which is precisely DuckDB's round() semantics. */
  def normQuantProject(emb: ArrayData, masks: Array[Long]): ArrayData =
    project(new GenericArrayData(normQuant(emb)), masks)

  /** The normalize+quantize half of [[normQuantProject]], exposed for
    * operators that need the micro vector itself (q108 drift audit). */
  def normQuant(emb: ArrayData): Array[Long] = {
    val d = emb.numElements()
    var sq = 0.0
    var i = 0
    while (i < d) {
      val x = emb.getFloat(i).toDouble
      sq += x * x
      i += 1
    }
    val nrm = java.lang.Math.sqrt(sq)
    val q = new Array[Long](d)
    i = 0
    while (i < d) {
      val v = emb.getFloat(i).toDouble / nrm * 1000000.0
      val a = java.lang.Math.abs(v)
      val t = a.toLong
      // a - t is exact (both are multiples of ulp(a) for a < 2^52),
      // so the >= 0.5 tie test is the true-value half-away rounding
      val r = if (a - t >= 0.5) t + 1 else t
      q(i) = if (v < 0) -r else r
      i += 1
    }
    q
  }

  def normQuantArray(emb: ArrayData): ArrayData =
    new GenericArrayData(normQuant(emb))

  def project(q: ArrayData, masks: Array[Long]): ArrayData = {
    val d = q.numElements()
    val out = new Array[Long](masks.length)
    var j = 0
    while (j < masks.length) {
      val m = masks(j)
      var s = 0L
      var i = 0
      while (i < d) {
        val v = q.getLong(i)
        s += (if (((m >>> (i & 63)) & 1L) == 1L) v else -v)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** [[SignProjectKernel.project]] as a codegen'd expression over the
  * quantized embedding; the mask table rides along as a reference
  * object (one static array, no per-row allocation beyond the
  * output). */
case class SignProjectExpr(child: Expression, masks: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"signProject needs array<bigint>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    SignProjectKernel.project(input.asInstanceOf[ArrayData], masks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("masks", masks, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.SignProjectKernel.project($a, $m);")
  }
  override protected def withNewChildInternal(newChild: Expression): SignProjectExpr =
    copy(child = newChild)
}

object SignProject {
  /** Column form: array<long> quantized embedding → array<long> of k
    * signed projections. */
  def apply(quantized: Column, masks: Array[Long]): Column =
    graftbridge.toColumn(
      SignProjectExpr(graftbridge.toExpression(quantized), masks))
}

/** [[SignProjectKernel.normQuantProject]] as a single codegen'd
  * expression over the raw float embedding — normalize, quantize and
  * project fused so the norm is computed once per row (a two-step
  * Column formulation gets its norm subexpression inlined into the
  * per-element lambda by project collapse: 64× recomputation). */
case class NormSignProjectExpr(child: Expression, masks: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"normSignProject needs array<float>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    SignProjectKernel.normQuantProject(input.asInstanceOf[ArrayData], masks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("masks", masks, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.SignProjectKernel.normQuantProject($a, $m);")
  }
  override protected def withNewChildInternal(newChild: Expression): NormSignProjectExpr =
    copy(child = newChild)
}

object NormSignProject {
  /** Column form: array<float> raw embedding → array<long> of k
    * signed projections of the unit-normalized micro quantization. */
  def apply(embedding: Column, masks: Array[Long]): Column =
    graftbridge.toColumn(
      NormSignProjectExpr(graftbridge.toExpression(embedding), masks))
}

/** [[SignProjectKernel.normQuant]] as a codegen'd expression —
  * unit-normalized micro quantization of a float embedding, norm
  * computed once per row (same collapse-proofing as the projection). */
case class NormQuantExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"normQuant needs array<float>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    SignProjectKernel.normQuantArray(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.SignProjectKernel.normQuantArray($a);")
  override protected def withNewChildInternal(newChild: Expression): NormQuantExpr =
    copy(child = newChild)
}

object NormQuant {
  def apply(embedding: Column): Column =
    graftbridge.toColumn(NormQuantExpr(graftbridge.toExpression(embedding)))
}
