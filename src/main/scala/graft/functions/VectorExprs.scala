package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Cosine similarity over two numeric arrays as ONE custom Catalyst
  * expression: a single tight JVM loop accumulating dot product and
  * both norms.
  *
  * Why not the higher-order-function composition (zip_with +
  * aggregate, kept in [[Vectors]])? HOFs evaluate their lambda via
  * the interpreter per element — benchmarking showed the all-pairs
  * similarity query spending 83 s at sf0.1 in lambda dispatch. This
  * expression does the identical arithmetic (same element order, same
  * IEEE operation sequence — bit-identical results, which the DuckDB
  * oracle requires) at memory-bandwidth speed.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cosine requires array<float|double>, got $other")
  }

  private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aF = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bF = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aF); val y = elem(b, i, bF)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // same operation shape as dot/(sqrt(na)*sqrt(nb)) used by the
    // HOF formulation and the DuckDB oracle
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  def cosineFast(a: Column, b: Column): Column =
    graftbridge.toColumn(CosineSimilarity(
      graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
