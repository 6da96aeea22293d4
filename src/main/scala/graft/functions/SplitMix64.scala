package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** splitmix64-keyed deterministic uniform draws — the engine's
  * cross-engine-replayable RNG.
  *
  * Replaces the previous xxhash64-based draw (and before that the
  * reference's `np.random.default_rng`,
  * /root/reference/src/cosmap/analysis/sampler.py:87-104) with a mixer
  * whose DuckDB replay is pure 64-bit integer arithmetic: three
  * xorshift-multiply rounds (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14 — the JDK
  * `SplittableRandom` finalizer). The same properties as the xxhash64
  * version hold — partitioning-independent (keyed by row id, not by
  * Spark's partition layout, so a 1000-executor run equals local[32]
  * bit for bit) — plus one more: the oracle side can now evaluate the
  * identical draw in SQL (HUGEINT intermediates, explicit mod-2^64),
  * so sampler-driven queries are EXACT-gated rather than rows-only.
  *
  * Uniform construction: top 53 bits of the mix → double in [0,1),
  * the standard `(z >>> 11) * 2^-53` ladder — both engines convert the
  * same integer to the same double (≤ 2^53 is exactly representable).
  */
object SplitMix64Kernel {
  /** 2^64 / φ — the Weyl increment; also folds the salt into the id. */
  final val Golden = 0x9E3779B97F4A7C15L

  def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform [0,1) draw for (id, saltTerm) with saltTerm pre-folded
    * (= salt * Golden, wrapping). */
  def uniform(id: Long, saltTerm: Long): Double =
    (mix(id + saltTerm) >>> 11).toDouble / 9007199254740992.0 // 2^53
}

/** `uniform(id, salt)` as a codegen'd Catalyst expression: one static
  * kernel call per row, no boxing, stays inside WholeStageCodegen. */
case class SplitMixUniform(child: Expression, saltTerm: Long)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"splitmix uniform needs an integral id, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val id = input match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    SplitMix64Kernel.uniform(id, saltTerm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SplitMix64Kernel.uniform((long) $a, ${saltTerm}L);")

  override protected def withNewChildInternal(newChild: Expression): SplitMixUniform =
    copy(child = newChild)
}

object SplitMix64 {
  import SplitMix64Kernel.Golden

  private def saltTerm(salt: Long): Long = salt * Golden

  /** Deterministic uniform draw in [0,1) keyed by (id, salt). */
  def uniform(id: Column, salt: Long): Column =
    graftbridge.toColumn(
      SplitMixUniform(graftbridge.toExpression(id), saltTerm(salt)))

  // ---- DuckDB replay (code-generated oracle SQL) -------------------
  //
  // The oracle side states the identical mixer over HUGEINT (128-bit)
  // intermediates. A 64x64 multiply overflows HUGEINT, so each
  // multiply-mod-2^64 is split into 32-bit halves:
  //   z*c mod 2^64 = (zl*cl + ((zh*cl + zl*ch) mod 2^32) << 32) mod 2^64
  // with every intermediate < 2^97. Bit-exactness vs the JVM kernel is
  // spec-checked (SplitMix64Spec) and gate-proven by q32/q33.

  private val M64 = "18446744073709551616" // 2^64

  private def mulModSql(z: String, c: Long): String = {
    val clo = c & 0xFFFFFFFFL
    val chi = c >>> 32
    s"(((($z) % 4294967296) * $clo + ((((($z) >> 32) * $clo + " +
      s"(($z) % 4294967296) * $chi) % 4294967296) << 32)) % $M64)"
  }

  private def xorShiftSql(z: String, s: Int): String =
    s"xor(($z), ($z) >> $s)"

  /** SQL for `uniform(idExpr, salt)` — idExpr must be a non-negative
    * integral SQL expression. */
  def uniformSql(idExpr: String, salt: Long): String = {
    val st = java.lang.Long.toUnsignedString(saltTerm(salt))
    val x = s"((CAST($idExpr AS HUGEINT) + $st) % $M64)"
    val z1 = mulModSql(xorShiftSql(x, 30), 0xBF58476D1CE4E5B9L)
    val z2 = mulModSql(xorShiftSql(z1, 27), 0x94D049BB133111EBL)
    val z3 = xorShiftSql(z2, 31)
    s"((($z3) >> 11) / 9007199254740992.0)"
  }
}
