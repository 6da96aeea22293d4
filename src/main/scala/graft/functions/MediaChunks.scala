package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** The centered-sign-LSH fingerprint of an integer media-feature
  * vector as ONE custom Catalyst expression (r14 optimization round;
  * the 374s→4s house lesson applied to the media kernel).
  *
  * The relational formulation — explode features to (id, d, v),
  * broadcast-join the (j, d, coef) plane table (planes×dims rows) and
  * the center table, then two keyed aggregations — planned a
  * |features|·planes intermediate (6.08M rows per 5 000 images) and
  * two exchanges PER KERNEL EXECUTION, measured at ~3.5 s of the
  * q164 wall. This expression does the identical integer arithmetic
  * (dot_j = Σ_d coef(j,d)·(v_d − center_d); chunk j/16 gets bit
  * j mod 16 iff dot_j > 0 — exact 64-bit adds, order-independent) in
  * one tight JVM loop per row: no plane join, no dot exchange, no
  * chunk exchange.
  *
  * [[ChunkHamming]] and [[ArrL1]] are the pair-verify companions:
  * Hamming over two chunk arrays and exact L1 over two feature
  * arrays, replacing the per-chunk / per-dim re-join + aggregation
  * legs with candidate-row-local loops. All three produce the exact
  * integers of the relational forms they replace — the DuckDB oracle
  * SQL is unchanged.
  */
object MediaChunksKernel {
  /** Flatten a (j, d, coef) plane-literal table to row-major j·dims+d. */
  def coefArray(planeCoef: Seq[(Int, Int, Long)], dims: Int): Array[Long] = {
    val planes = planeCoef.map(_._1).max + 1
    val out = new Array[Long](planes * dims)
    planeCoef.foreach { case (j, d, c) => out(j * dims + d) = c }
    out
  }

  /** Ordered integer feature vector → packed 16-bit chunk values
    * (array of planes/16 longs). */
  def chunks(v: ArrayData, coef: Array[Long], center: Array[Long]): ArrayData = {
    val dims = center.length
    val planes = coef.length / dims
    val out = new Array[Long](planes / 16)
    var j = 0
    while (j < planes) {
      var s = 0L
      val base = j * dims
      var i = 0
      while (i < dims) {
        s += coef(base + i) * (v.getLong(i) - center(i))
        i += 1
      }
      if (s > 0) out(j / 16) |= (1L << (j % 16))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Σ popcount(a_c xor b_c) over two equal-length chunk arrays. */
  def hamming(a: ArrayData, b: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  /** Σ |a_d − b_d| over two equal-length integer feature arrays. */
  def l1(a: ArrayData, b: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      s += java.lang.Math.abs(a.getLong(i) - b.getLong(i))
      i += 1
    }
    s
  }
}

case class MediaChunksExpr(child: Expression, coef: Array[Long],
    center: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"mediaChunks needs array<bigint>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    MediaChunksKernel.chunks(input.asInstanceOf[ArrayData], coef, center)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("coef", coef, "long[]")
    val z = ctx.addReferenceObj("center", center, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.MediaChunksKernel.chunks($a, $c, $z);")
  }
  override protected def withNewChildInternal(newChild: Expression): MediaChunksExpr =
    copy(child = newChild)
}

object MediaChunks {
  /** Column form: ordered array<long> feature vector → array<long>
    * of 16-bit chunk values (length planes/16). */
  def apply(vec: Column, planeCoef: Seq[(Int, Int, Long)],
      center: Seq[Long]): Column =
    graftbridge.toColumn(MediaChunksExpr(graftbridge.toExpression(vec),
      MediaChunksKernel.coefArray(planeCoef, center.length),
      center.toArray))
}

case class ChunkHammingExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"chunkHamming needs two array<bigint>, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MediaChunksKernel.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MediaChunksKernel.hamming($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChunkHammingExpr =
    copy(left = newLeft, right = newRight)
}

object ChunkHamming {
  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(ChunkHammingExpr(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))
}

case class ArrL1Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"arrL1 needs two array<bigint>, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MediaChunksKernel.l1(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MediaChunksKernel.l1($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrL1Expr =
    copy(left = newLeft, right = newRight)
}

object ArrL1 {
  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(ArrL1Expr(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
