package graft

import graft.functions.{SplitMix64, SplitMix64Kernel}
import org.apache.spark.sql.functions._

/** The splitmix64 uniform draw: JVM kernel vs an independent
  * BigInt mod-2^64 reference (the same arithmetic the DuckDB oracle
  * replay states in SQL — bit-exact agreement of the SQL form is
  * proven by the q32/q33 EXACT gates). */
class SplitMix64Spec extends SparkSpec {

  private val M = BigInt(1) << 64

  private def refMix(x0: BigInt): BigInt = {
    var z = x0.mod(M)
    z = ((z ^ (z >> 30)) * BigInt("BF58476D1CE4E5B9", 16)).mod(M)
    z = ((z ^ (z >> 27)) * BigInt("94D049BB133111EB", 16)).mod(M)
    z ^ (z >> 31)
  }

  private def refUniform(id: Long, salt: Long): Double = {
    val st = (BigInt(salt) * BigInt("9E3779B97F4A7C15", 16)).mod(M)
    (refMix(BigInt(id) + st) >> 11).toDouble / 9007199254740992.0
  }

  test("kernel matches the BigInt mod-2^64 reference bit for bit") {
    val ids = (0L until 500L) ++ Seq(Long.MaxValue, Long.MaxValue - 1, 1L << 62)
    for (salt <- Seq(0L, 1L, 42L, 43L, -7L); id <- ids) {
      val got = SplitMix64Kernel.uniform(id, salt * SplitMix64Kernel.Golden)
      assert(got === refUniform(id, salt), s"id=$id salt=$salt")
    }
  }

  test("column expression equals the kernel and is partitioning-independent") {
    val a = spark.range(2000).select(col("id"),
      SplitMix64.uniform(col("id"), 42L).as("u")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = spark.range(2000).repartition(17).select(col("id"),
      SplitMix64.uniform(col("id"), 42L).as("u")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(b))
    a.foreach { case (id, u) =>
      assert(u === SplitMix64Kernel.uniform(id, 42L * SplitMix64Kernel.Golden))
      assert(u >= 0.0 && u < 1.0)
    }
  }

  test("draws are uniform (mean within 4 sigma)") {
    val n = 10000
    val us = spark.range(n).select(
      SplitMix64.uniform(col("id"), 7L).as("u")).collect().map(_.getDouble(0))
    val mean = us.sum / n
    val sigma = 1.0 / math.sqrt(12.0 * n)
    assert(math.abs(mean - 0.5) < 4 * sigma, s"mean=$mean")
  }
}
