package graft.multimodal

import graft.functions.SplitMix64Kernel

/** Deterministic synthetic audio corpus — the q171/q172 generator
  * that ties the AUDIO dedup family to the SCALE FACTOR (round-10
  * verdict #1, the q164 pattern): one synthesized WAV clip per
  * `documents` row, waveform seeded by doc_id, near-dup pairs planted
  * for 1-in-[[PairMod]] id groups. The q161/q162 fixtures are
  * scale-independent (240 clips at every sf); this corpus is
  * 500/500/5000 clips at sf0.001/0.01/0.1, so the chunk-collision
  * candidate join sees real data growth.
  *
  * Every clip is [[Segments]] segments × [[SegFrames]] frames of
  * 16-bit mono PCM at [[Rate]] Hz: a square wave with ONE per-clip
  * period (4..35 samples per cycle) and a per-SEGMENT amplitude
  * (2000..18000), all parameters from the splitmix64 stream. The odd
  * member of a planted pair nudges segment 3's amplitude by ~1% (the
  * fixture generator's perturbation — it moves the energy-profile
  * FEATURES, per the round-9 shift-vs-grow lesson).
  *
  * THE ORACLE SEAM IS CLOSED-FORM (the q164 upgrade, generalized to
  * audio — the round-10 verdict asked exactly this: "a
  * fixed-frequency tone's windowed energy is region arithmetic"):
  * because |sample| = amp(segment) at every frame of a square wave,
  * the decoded clip's 16-segment energy profile is segLen·amp per
  * segment, and the zero-crossing count of a fixed-period square wave
  * is a floor-division formula of the period — so the integer
  * features ([[Multimodal.audioIntFeatures]]: ppm energy shares +
  * ppm zero-crossing rate) are a pure integer FORMULA of doc_id that
  * DuckDB evaluates directly ([[featureSql]]). The engine path stays
  * fully real (synthesize → RIFF/WAVE encode → javax.sound.sampled
  * decode → PCM loop); the oracle replays the arithmetic.
  * [[featuresOfScaled]] is the Scala mirror, and MultimodalSpec
  * asserts decoded ≡ closed-form on real synthesized clips.
  *
  * Composition space: 16 independent amplitudes × 16001 values plus
  * 32 periods (~10⁶⁷ compositions) — organic near-dup collisions need
  * every energy share within the verify bound simultaneously, so the
  * gate output tracks the ~n planted pairs (ScaleProbe measures the
  * pair growth; the round-10 advice-#3 saturation concern designed
  * out from the start).
  */
object AudioGen {
  val Segments = 16
  val SegFrames = 160
  val NFrames: Int = Segments * SegFrames // 2560
  val Rate = 8000

  /** Fresh salt bases for the scaled audio corpus. */
  val PairBase = 0x171A0D10L
  val UniqBase = 0x171B0EE1L
  val PairMod = 4L

  private def p(key: Long, base: Long, salt: Long, mod: Int): Int = {
    val m = SplitMix64Kernel.mix(base + key * 131L + salt)
    (((m % mod) + mod) % mod).toInt
  }

  /** 44-byte RIFF/WAVE header + 16-bit LE mono PCM (the fixture
    * generator's layout — bit-deterministic, javax.sound decode is
    * exact). */
  def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(Rate).putInt(Rate * 2)    // byte rate
      .putShort(2).putShort(16)         // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** (key, base, nudge) → the 17 per-clip parameters: 16 segment
    * amplitudes (nudge: segment 3 grows by amp div 100) + the global
    * square-wave period. */
  private def params(key: Long, base: Long, nudge: Int)
      : (Array[Int], Int) = {
    val amps = Array.tabulate(Segments) { s =>
      val a = 2000 + p(key, base, s + 1, 16001)
      if (nudge == 1 && s == 3) a + a / 100 else a
    }
    (amps, 4 + p(key, base, 17, 32))
  }

  private def branch(id: Long): (Long, Long, Int) = {
    val g = id / 2
    if (g % PairMod == 0) (g, PairBase, (id % 2).toInt)
    else (id, UniqBase, 0)
  }

  /** The scaled-corpus synthesis: a real WAV byte payload per id. The
    * square wave's phase runs GLOBALLY (f mod period over the whole
    * clip), so the zero-crossing census is a single floor-division
    * formula — the closed-form seam. */
  def synthScaled(id: Long): Array[Byte] = {
    val (key, base, nudge) = branch(id)
    val (amps, period) = params(key, base, nudge)
    val samples = new Array[Short](NFrames)
    var f = 0
    while (f < NFrames) {
      val amp = amps(f / SegFrames)
      samples(f) = (if ((f % period) * 2 < period) amp else -amp).toShort
      f += 1
    }
    wavBytes(samples)
  }

  /** Closed-form integer features of [[synthScaled]] — MUST equal
    * `Multimodal.audioIntFeatures(decode(synthScaled(id)))`
    * (spec-pinned): d 0–15 ppm energy shares (segment Σ|sample| =
    * SegFrames·amp exactly, since the amplitude is constant within a
    * segment and never zero), d 16 the ppm zero-crossing rate (sign
    * flips at f ≡ 0 and f ≡ ceil(period/2) (mod period), f ≥ 1). */
  def featuresOfScaled(id: Long): Seq[(Int, Long)] = {
    val (key, base, nudge) = branch(id)
    val (amps, period) = params(key, base, nudge)
    val segAbs = amps.map(a => SegFrames.toLong * a)
    val tot = math.max(segAbs.sum, 1L)
    val shares = segAbs.toSeq.zipWithIndex.map { case (a, s) =>
      (s, a * 1000000L / tot)
    }
    val c = (period + 1) / 2
    val n1 = (NFrames - 1).toLong
    val zc = n1 / period + (n1 - c) / period + 1
    shares :+ ((Segments, zc * 1000000L / NFrames))
  }

  // ---- generated DuckDB replay of the closed form ------------------

  /** CTE chain (no leading WITH) ending at `f(id, d, v)` — the
    * closed-form integer features of [[synthScaled]] over every
    * `documents` doc_id, evaluated entirely in SQL: the identical
    * splitmix64 parameter stream, the identical share and
    * zero-crossing arithmetic (all operands nonnegative, so trunc ≡
    * floor across engines). */
  def featureSql: String = {
    val mixes = (1 to 17)
      .map(s => s"${ImageGen.mixCol(s.toLong)} AS m$s").mkString(",\n    ")
    val ampCols = (0 until Segments)
      .map(s => s"2000 + ${ImageGen.modSql(s"m${s + 1}", 16001)} AS a$s")
      .mkString(",\n    ")
    val structs = (0 until Segments)
      .map(s => s"struct_pack(s := $s, a := a$s)").mkString(", ")
    val n1 = NFrames - 1
    s"""gk AS (
       |  SELECT doc_id AS id,
       |    CASE WHEN (doc_id // 2) % $PairMod = 0
       |         THEN doc_id // 2 ELSE doc_id END AS key,
       |    CASE WHEN (doc_id // 2) % $PairMod = 0
       |         THEN CAST($PairBase AS HUGEINT)
       |         ELSE CAST(${UniqBase} AS HUGEINT) END AS base,
       |    CASE WHEN (doc_id // 2) % $PairMod = 0
       |         THEN doc_id % 2 ELSE 0 END AS sh
       |  FROM documents),
       |mixes AS MATERIALIZED (
       |  SELECT id, sh,
       |    $mixes
       |  FROM gk),
       |par AS MATERIALIZED (
       |  SELECT id, sh,
       |    $ampCols,
       |    4 + ${ImageGen.modSql("m17", 32)} AS pd
       |  FROM mixes),
       |amps AS MATERIALIZED (
       |  SELECT id, u.s AS s,
       |    CASE WHEN sh = 1 AND u.s = 3 THEN u.a + u.a // 100
       |         ELSE u.a END AS amp
       |  FROM (SELECT id, sh, unnest([$structs]) AS u FROM par)),
       |tot AS MATERIALIZED (
       |  SELECT id, sum($SegFrames * amp) AS tot FROM amps GROUP BY id),
       |f AS MATERIALIZED (
       |  SELECT a.id, a.s AS d,
       |    CAST(($SegFrames * a.amp * 1000000)
       |      // greatest(t.tot, 1) AS BIGINT) AS v
       |  FROM amps a JOIN tot t ON a.id = t.id
       |  UNION ALL
       |  SELECT id, $Segments AS d,
       |    CAST(((($n1 // pd) + (($n1 - (pd + 1) // 2) // pd) + 1)
       |      * 1000000) // $NFrames AS BIGINT) AS v
       |  FROM par)""".stripMargin
  }
}
