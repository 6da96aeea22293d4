package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY.md §2.4 "arbitrary per-sample reduce" /
  * `Aggregator[IN, BUF, OUT]` row): the angular centroid of a set of
  * sky positions — mean of the unit vectors on the sphere, converted
  * back to (ra, dec). The natural per-sample reduction for cone
  * contents that naive averaging of ra/dec gets wrong at the 0/360
  * wrap and near poles.
  *
  * Spark's Aggregator machinery gives partial aggregation + merge for
  * free: `reduce` runs map-side per partition, `merge` combines
  * partials — the buffer is 4 doubles regardless of group size, so
  * the shuffle carries O(groups), not O(rows), at any scale.
  */
object CentroidAgg {

  final case class RaDec(ra: Double, dec: Double)
  final case class Buf(x: Double, y: Double, z: Double, n: Long)

  val aggregator: Aggregator[RaDec, Buf, RaDec] =
    new Aggregator[RaDec, Buf, RaDec] {
      override def zero: Buf = Buf(0.0, 0.0, 0.0, 0L)

      override def reduce(b: Buf, p: RaDec): Buf = {
        val raR = math.toRadians(p.ra)
        val decR = math.toRadians(p.dec)
        val c = math.cos(decR)
        Buf(b.x + c * math.cos(raR), b.y + c * math.sin(raR),
          b.z + math.sin(decR), b.n + 1)
      }

      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.x + b.x, a.y + b.y, a.z + b.z, a.n + b.n)

      override def finish(b: Buf): RaDec = {
        val norm = math.sqrt(b.x * b.x + b.y * b.y + b.z * b.z)
        val ra = math.toDegrees(math.atan2(b.y, b.x))
        RaDec(if (ra < 0) ra + 360.0 else ra,
          math.toDegrees(math.asin(b.z / norm)))
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[RaDec] = Encoders.product[RaDec]
    }

  /** Untyped-DataFrame registration-friendly form. */
  def udafColumn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(aggregator, Encoders.product[RaDec])
}
