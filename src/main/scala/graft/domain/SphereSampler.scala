package graft.domain

import graft.functions.Sphere
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rectangular sky region in degrees (ra ∈ [raMin, raMax],
  * dec ∈ [decMin, decMax]) — the `region_bounds` 4-vector of the
  * reference (/root/reference/src/cosmap/config/analysis.py:67). */
final case class SkyBounds(raMin: Double, raMax: Double,
                           decMin: Double, decMax: Double) {
  require(raMax > raMin && decMax > decMin, s"degenerate bounds $this")
}

/** The Monte-Carlo sample source: N circles drawn uniformly (by area)
  * on the sphere inside a rectangular region — the left input of the
  * reference's whole query
  * (/root/reference/src/cosmap/analysis/sampler.py:127-144).
  *
  * Area-correct sampling follows the reference's math ("dA = dθ
  * d(cosθ)", sampler.py:96-104): ra uniform, sin(dec) uniform.
  * The frame is shrunk so no circle crosses the region boundary
  * (sampler.py:48-85), with the RA shrink properly widened by
  * 1/cos(dec) — the reference shrinks RA by the raw diameter, which
  * under-shrinks off the equator.
  *
  * Scale: this is a `spark.range(n)` source — no data read, no
  * shuffle, embarrassingly parallel, and (via [[Sphere.hashUniform]])
  * identical output for any partitioning or cluster size.
  */
object SphereSampler {

  /** Shrink `bounds` so a circle of `radiusDeg` centered anywhere in
    * the result lies fully inside `bounds`. */
  def frame(bounds: SkyBounds, radiusDeg: Double): SkyBounds = {
    val maxAbsDec = math.max(math.abs(bounds.decMin), math.abs(bounds.decMax))
    val edge = math.min(89.9, maxAbsDec + radiusDeg)
    val raPad = radiusDeg / math.cos(math.toRadians(edge))
    if (bounds.raMax - bounds.raMin <= 2 * raPad ||
        bounds.decMax - bounds.decMin <= 2 * radiusDeg)
      throw new IllegalArgumentException(
        s"sampling region $bounds is too small for sample radius " +
          s"$radiusDeg° (needs > ${2 * raPad}° of RA and " +
          s"${2 * radiusDeg}° of Dec); the reference would silently " +
          "produce an inverted frame here")
    SkyBounds(bounds.raMin + raPad, bounds.raMax - raPad,
      bounds.decMin + radiusDeg, bounds.decMax - radiusDeg)
  }

  /** N sample circles: (sample_id, ra, dec, radius_deg). */
  def uniformCircles(spark: SparkSession, n: Long, bounds: SkyBounds,
                     radiusDeg: Double, seed: Long = 42L): DataFrame = {
    val f = frame(bounds, radiusDeg)
    val zLo = math.sin(math.toRadians(f.decMin))
    val zHi = math.sin(math.toRadians(f.decMax))
    spark.range(n).toDF("sample_id").select(
      col("sample_id"),
      (lit(f.raMin) +
        Sphere.hashUniform(col("sample_id"), seed) * lit(f.raMax - f.raMin))
        .as("ra"),
      degrees(asin(lit(zLo) +
        Sphere.hashUniform(col("sample_id"), seed + 1) * lit(zHi - zLo)))
        .as("dec"),
      lit(radiusDeg).as("radius_deg"))
  }
}
