package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** ENGINE-OWNED deterministic sketches (round-4 verdict #3): unlike
  * Spark's built-in HLL++/t-digest (whose internals no other engine
  * can replay — q55 stays the rows-only engine-specific variant),
  * these sketches are DEFINED over the splitmix64 hash family and
  * integer register arithmetic, so a DuckDB oracle replays them
  * bit-for-bit and the q55b gate checks them EXACT — the q45 sketch
  * playbook applied to aggregation state.
  *
  * Algorithms are the published classics, re-derived for
  * cross-engine determinism: HyperLogLog (Flajolet, Fusy, Gandouet,
  * Meunier, AofA 2007) with trailing-zero ranks; Count-Min (Cormode
  * & Muthukrishnan, J. Algorithms 2005); Bloom filters (Bloom, CACM
  * 1970). The reference engine has no sketch surface at all
  * (/root/reference/src/cosmap/analysis/runner.py computes exact
  * per-sample aggregates only) — this family is part of the
  * training-data-pipeline extension mandate.
  *
  * Both are `TypedImperativeAggregate`s: fixed-size byte-serialized
  * state, map-side partial aggregation, per-register/per-bucket merge
  * — the shuffle carries O(groups · sketch size) at any corpus scale,
  * and both merges are commutative + idempotent-max/add, so results
  * are partitioning- and order-independent by construction.
  */
object HllSketch {
  /** 2^P registers. */
  val P = 12
  val M: Int = 1 << P
  /** Register rank cap: rho = min(trailing-zeros(w)+1, MaxRho). The
    * cap costs nothing statistically (P(rho > 40) = 2^-40 per item)
    * and buys integer exactness: the harmonic digest
    * Σ 2^(MaxRho − reg) ≤ m·2^40 = 2^52 fits a BIGINT exactly AND a
    * double exactly, so the final estimate is one IEEE division of
    * bit-identical operands in both engines (house rule: division is
    * cross-engine exact; no quantization needed). */
  val MaxRho = 40
  /** alpha_m · m² · 2^MaxRho — the harmonic-estimate numerator,
    * emitted into the oracle as a shortest-round-trip double literal
    * so both engines hold the identical constant. */
  val EstNumerator: Double =
    (0.7213 / (1.0 + 1.079 / M)) * M.toDouble * M.toDouble * math.pow(2.0, MaxRho)

  def rho(w: Long): Int =
    if (w == 0L) MaxRho
    else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, MaxRho)

  /** User-facing cardinality estimate: the standard small-range
    * linear-counting correction over the digest. The GATE compares
    * the raw digest (integers + one IEEE-exact division); this
    * correction involves ln, which is transcendental and therefore
    * stays out of the cross-engine-exact surface — ApproxSpec bounds
    * it against exact counts instead. */
  def estimate(zeros: Int, rawEst: Double): Double =
    if (rawEst <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else rawEst

  val digestType: StructType = StructType(Seq(
    StructField("reg_sum", LongType, nullable = false),
    StructField("zeros", IntegerType, nullable = false),
    StructField("inv_num", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))
}

/** HLL with splitmix64-hashed inputs and trailing-zero ranks. Eval
  * emits the register DIGEST (reg_sum, zeros, inv_num, est) rather
  * than an opaque estimate, so the gate compares the full sketch
  * state, integer-exactly, plus the IEEE-exact harmonic estimate. */
case class HllSketchAgg(
    child: Expression,
    salt: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch._

  private val saltTerm = salt * SplitMix64Kernel.Golden

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_digest requires a BIGINT key, got $other")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SplitMix64Kernel.mix(v.asInstanceOf[Long] + saltTerm)
      val idx = (h & (M - 1)).toInt
      val r = rho(h >>> P)
      if (r > buf(idx)) buf(idx) = r.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var regSum = 0L
    var zeros = 0
    var invNum = 0L
    var i = 0
    while (i < M) {
      val r = buf(i)
      regSum += r
      if (r == 0) zeros += 1
      invNum += 1L << (MaxRho - r) // reg 0 contributes 2^MaxRho
      i += 1
    }
    // invNum ≤ m·2^40 = 2^52: the Long→Double conversion is exact,
    // the division correctly rounded — bit-identical to the replay
    InternalRow(regSum, zeros, invNum, EstNumerator / invNum.toDouble)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = digestType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Deterministic quantile sketch: a fixed-width histogram over integer
  * cents — idx = clamp(cents div width, 0, buckets−1), merge = vector
  * add, estimate(q) = LOWER BOUND of the bucket holding rank
  * ⌈q·n⌉ (rank arithmetic kept rational: q = num/den). Everything is
  * integer, so the replay is exact and the error bound is one bucket
  * width (ApproxSpec pins it). Unlike GK/t-digest, the state does not
  * depend on insertion order — the cluster-determinism property the
  * built-in approx_percentile cannot offer. */
case class HistQuantileAgg(
    child: Expression,
    widthCents: Long,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hist_quantile requires BIGINT cents, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val cents = v.asInstanceOf[Long]
      // negatives clamp to 0 on both sides regardless of the floor-vs-
      // truncate division difference, so the mapping is engine-exact
      val idx = math.min(math.max(cents / widthCents, 0L), (buckets - 1).toLong).toInt
      buf(idx) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  private def rankBucket(buf: Array[Long], rank: Long): Int = {
    var cum = 0L
    var i = 0
    while (i < buckets) {
      cum += buf(i)
      if (cum >= rank) return i
      i += 1
    }
    buckets - 1
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf.sum
    if (n == 0L) InternalRow(0L, null, null)
    else {
      val p50 = rankBucket(buf, (n + 1L) / 2L).toLong * widthCents
      val p90 = rankBucket(buf, (9L * n + 9L) / 10L).toLong * widthCents
      InternalRow(n, p50, p90)
    }
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buckets * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](buckets)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("p50_cents", LongType, nullable = true),
    StructField("p90_cents", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HistQuantileAgg =
    copy(child = newChild)
}

/** Deterministic Count-Min sketch over a token-array column: depth×width
  * integer counters, counter (j, mix(strHash(tok) + salt_j·φ) mod width)
  * incremented per token occurrence. Merge = matrix add — commutative,
  * so the sketch is order- and partitioning-independent, and every
  * counter is an integer the oracle can rebuild exactly. One map pass
  * estimates any token's frequency within εN without a token shuffle —
  * the fixed-memory heavy-hitter primitive at corpus scale.
  *
  * Eval emits (n_tokens, per-row position-weighted checksums
  * Σ (bucket+1)·count — a collision-sensitive integer digest of the
  * whole matrix — and min-over-rows estimates for the given probe
  * tokens). Estimates are one-sided: est ≥ true count always. */
case class CountMinAgg(
    child: Expression,
    saltBase: Long,
    depth: Int,
    width: Int,
    probes: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require((width & (width - 1)) == 0, "width must be a power of two")

  private def saltTerm(j: Int): Long = (saltBase + j) * SplitMix64Kernel.Golden

  /** Bucket of a pre-strHashed token in row j — also used at
    * plan/oracle time to embed the probe tokens' bucket constants. */
  def bucket(th: Long, j: Int): Int =
    (SplitMix64Kernel.mix(th + saltTerm(j)) & (width - 1)).toInt

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min requires array<string> tokens, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val th = SplitMix64Kernel.strHash(arr.getUTF8String(i))
        var j = 0
        while (j < depth) {
          buf(j * width + bucket(th, j)) += 1L
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < width) { n += buf(i); i += 1 } // every row sums to N
    val chk = new Array[Long](depth)
    var j = 0
    while (j < depth) {
      var s = 0L
      var b = 0
      while (b < width) { s += (b + 1L) * buf(j * width + b); b += 1 }
      chk(j) = s
      j += 1
    }
    val est = probes.map { t =>
      val th = SplitMix64Kernel.strHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until depth).map(j => buf(j * width + bucket(th, j))).min
    }.toArray
    InternalRow(n,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(chk),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(est))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](depth * width)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("chk", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("est", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Shared Bloom kernel: bit positions are
  * mix(strHash(elem) + (saltBase + j)·φ) masked to the power-of-two
  * bit count, j < k. Used by the aggregate (set bits), the map-side
  * membership expression (test bits), and the oracle generator
  * (embed probe constants) — one definition, three consumers. */
object BloomKernel {
  def position(th: Long, saltBase: Long, j: Int, bits: Int): Int =
    (SplitMix64Kernel.mix(th + (saltBase + j) * SplitMix64Kernel.Golden)
      & (bits - 1)).toInt

  /** Count of array elements whose k positions are ALL set in words. */
  def countHits(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      words: Array[Long], saltBase: Long, k: Int, bits: Int): Long = {
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val th = SplitMix64Kernel.strHash(arr.getUTF8String(i))
      var j = 0
      var all = true
      while (all && j < k) {
        val pos = position(th, saltBase, j, bits)
        if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) all = false
        j += 1
      }
      if (all) hits += 1L
      i += 1
    }
    hits
  }
}

/** Bloom filter over a string-array column: a fixed 2^b-bit set,
  * merge = word-wise OR — the one-sided membership sketch. At corpus
  * scale this is how decontamination runs: build the filter over the
  * benchmark's n-grams in one aggregate (bytes, not rows, cross the
  * shuffle), broadcast the bitset, and test corpus grams MAP-SIDE —
  * no gram-keyed join of the whole corpus. False positives only
  * (flagged docs are a superset); zero false negatives. */
case class BloomFilterAgg(
    child: Expression,
    saltBase: Long,
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require((bits & (bits - 1)) == 0, "bits must be a power of two")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_filter requires array<string> elements, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val th = SplitMix64Kernel.strHash(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val pos = BloomKernel.position(th, saltBase, j, bits)
          buf(pos >>> 6) |= 1L << (pos & 63)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bits / 64)
    java.nio.ByteBuffer.wrap(storage).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** Map-side Bloom membership count over a string-array column against
  * a plan-time bitset constant (the PrefixRarest Setup-block pattern:
  * one bounded broadcast object, zero shuffles, whole-stage codegen). */
case class BloomCountHits(child: Expression, words: Array[Long],
    saltBase: Long, k: Int, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_count_hits requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    BloomKernel.countHits(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      words, saltBase, k, bits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BloomKernel.countHits($a, $wordsRef, ${saltBase}L, $k, $bits);")
  }

  override def prettyName: String = "bloom_count_hits"
  // default toString would dump the whole bitset into explain output
  override def toString: String =
    s"bloom_count_hits($child, ${bits} bits, k=$k)"
  override protected def withNewChildInternal(newChild: Expression): BloomCountHits =
    copy(child = newChild)
}

object Sketches {
  /** HLL register digest of a BIGINT key column. */
  def hllDigest(c: Column, salt: Long): Column =
    graftbridge.toColumn(
      HllSketchAgg(graftbridge.toExpression(c), salt).toAggregateExpression())

  /** Histogram-quantile digest of an integer-cents column. */
  def histQuantiles(cents: Column, widthCents: Long, buckets: Int): Column =
    graftbridge.toColumn(
      HistQuantileAgg(graftbridge.toExpression(cents), widthCents, buckets)
        .toAggregateExpression())

  /** Count-Min digest of a token-array column. */
  def countMin(tokens: Column, saltBase: Long, depth: Int, width: Int,
               probes: Seq[String]): Column =
    graftbridge.toColumn(
      CountMinAgg(graftbridge.toExpression(tokens), saltBase, depth, width, probes)
        .toAggregateExpression())

  /** Bloom filter words over a string-array column. */
  def bloom(elems: Column, saltBase: Long, bits: Int, k: Int): Column =
    graftbridge.toColumn(
      BloomFilterAgg(graftbridge.toExpression(elems), saltBase, bits, k)
        .toAggregateExpression())

  /** Map-side membership count against a collected Bloom bitset. */
  def bloomCountHits(elems: Column, words: Array[Long], saltBase: Long,
                     k: Int, bits: Int): Column =
    graftbridge.toColumn(
      BloomCountHits(graftbridge.toExpression(elems), words, saltBase, k, bits))
}
