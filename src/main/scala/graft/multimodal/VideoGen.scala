package graft.multimodal

/** Deterministic synthetic video corpus — the q173/q174 generator
  * that ties the VIDEO dedup family to the SCALE FACTOR (round-10
  * verdict #1, the q164 pattern): one synthesized AVI clip per
  * `documents` row ([[Segments]] temporal segments × 2 frames each),
  * frame compositions seeded by doc_id, near-dup pairs planted for
  * 1-in-[[PairMod]] id groups. The q165/q166 fixtures are
  * scale-independent (240 clips at every sf); this corpus is
  * 500/500/5000 clips at sf0.001/0.01/0.1.
  *
  * Each frame is the 4-fill [[ImageGen.draw2]] drawing (composition
  * key = branch-key·Segments + segment, so the two frames of a
  * segment are byte-identical and segments differ); the odd member of
  * a planted pair grows the rectangle of ONE deterministic segment's
  * SECOND frame by one pixel — so exactly one temporal segment's
  * pooled features move, by half the frame-level delta (the q165
  * perturb-the-FEATURES design carried over). The container is the
  * same hand-rolled RIFF/AVI layout the fixtures use
  * ([[aviBytes]] — LIST hdrl avih + LIST movi of 00dc chunks, the
  * exact structure `Multimodal.aviVideoFrames` walks), with PNG frame
  * payloads instead of JPEG: PNG is LOSSLESS, which is what upgrades
  * the oracle seam from a pinned feature fixture (q165 — JPEG's
  * quantization is decoder-deterministic but not region arithmetic)
  * to a CLOSED FORM — the decoded pixel census of every frame is the
  * [[ImageGen]] region arithmetic, and the temporal pooling is one
  * integer mean over the two frames of each segment. The engine path
  * stays fully real (draw → PNG encode → AVI container → RIFF walk →
  * javax.imageio decode per frame → pixel loop → pooling); the oracle
  * replays the geometry + the pooling division ([[featureSql]]).
  * [[featuresOfScaled]] is the Scala mirror, and MultimodalSpec
  * asserts decoded ≡ closed-form on real synthesized clips.
  */
object VideoGen {
  val Segments = 4
  val FramesPerSeg = 2
  val Frames: Int = Segments * FramesPerSeg // 8
  val Dims: Int = Segments * 19 // 76

  /** Fresh salt bases for the scaled video corpus. */
  val PairBase = 0x173A11CEL
  val UniqBase = 0x173B22DFL
  val PairMod = 4L
  /** Salt selecting which segment the odd pair member perturbs. */
  val PertSalt = 97L

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def le32(v: Int): Seq[Byte] =
    Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Minimal-but-real AVI container: RIFF(AVI LIST(hdrl avih)
    * LIST(movi 00dc...)). Chunk sizes little-endian, frames padded to
    * even length (the RIFF rule aviVideoFrames honors). Moved to main
    * scope from the fixture generator (round 11);
    * graft.tools.GenVideoFixture delegates here. */
  def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = new Array[Byte](56) // zeroed header struct is valid enough
    val bbh = java.nio.ByteBuffer.wrap(avih)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbh.putInt(0, 66666)            // dwMicroSecPerFrame (~15 fps)
    bbh.putInt(16, 0x10)            // AVIF_HASINDEX off, flags minimal
    bbh.putInt(24, frames.length)   // dwTotalFrames
    val moviBody = frames.flatMap { f =>
      val pad = f.length & 1
      fourcc("00dc").toSeq ++ le32(f.length) ++ f.toSeq ++
        Seq.fill(pad)(0.toByte)
    }
    val hdrlBody = fourcc("hdrl").toSeq ++
      fourcc("avih").toSeq ++ le32(56) ++ avih.toSeq
    val moviList = fourcc("LIST").toSeq ++ le32(4 + moviBody.length) ++
      fourcc("movi").toSeq ++ moviBody
    val hdrlList = fourcc("LIST").toSeq ++ le32(hdrlBody.length) ++ hdrlBody
    val body = fourcc("AVI ").toSeq ++ hdrlList ++ moviList
    (fourcc("RIFF").toSeq ++ le32(body.length) ++ body).toArray
  }

  private def branch(id: Long): (Long, Long, Boolean) = {
    val g = id / 2
    if (g % PairMod == 0) (g, PairBase, id % 2 == 1)
    else (id, UniqBase, false)
  }

  /** Which segment the odd pair member perturbs (drawn from the GROUP
    * key so both members agree on where they differ). */
  private def pertSegment(g: Long): Int =
    ImageGen.p(g, PairBase, PertSalt, Segments)

  /** The scaled-corpus synthesis: a real AVI byte payload per id —
    * Segments segments × 2 identical PNG frames per segment (the odd
    * pair member's perturbed segment has its SECOND frame's rectangle
    * one pixel wider). */
  def synthScaled(id: Long): Array[Byte] = {
    val (key, base, odd) = branch(id)
    val sp = if (odd) pertSegment(id / 2) else -1
    val frames = for {
      s <- 0 until Segments
      fi <- 0 until FramesPerSeg
    } yield ImageGen.draw2(key * Segments + s, base,
      if (odd && s == sp && fi == 1) 1 else 0)
    aviBytes(frames)
  }

  /** Closed-form pooled integer features of [[synthScaled]] — MUST
    * equal `Multimodal.videoIntFeatures(decode(synthScaled(id)))`
    * (spec-pinned): per segment, the per-dim integer mean of its two
    * frames' [[ImageGen.featuresOf2]] censuses (identical frames
    * pool to themselves; the perturbed segment pools
    * (v0 + v1) div 2). */
  def featuresOfScaled(id: Long): Seq[(Int, Long)] = {
    val (key, base, odd) = branch(id)
    val sp = if (odd) pertSegment(id / 2) else -1
    (0 until Segments).flatMap { s =>
      val v0 = ImageGen.featuresOf2(key * Segments + s, base, 0)
      val v1 =
        if (odd && s == sp) ImageGen.featuresOf2(key * Segments + s, base, 1)
        else v0
      v0.zip(v1).map { case ((d, a), (_, b)) =>
        (s * 19 + d, (a + b) / 2)
      }
    }
  }

  // ---- generated DuckDB replay of the closed form ------------------

  import graft.functions.SplitMix64

  /** CTE chain (no leading WITH) ending at `f(id, d, v)` — the
    * closed-form pooled features of [[synthScaled]] over every
    * `documents` doc_id: one gk row per (doc, segment, frame), the
    * shared [[ImageGen.featureChainSql]] region arithmetic, then the
    * pooling mean (sum over the segment's 2 frames div 2 — all
    * nonnegative, trunc ≡ floor). */
  def featureSql: String = {
    val gMix = SplitMix64.mixSql(
      s"(CAST($PairBase AS HUGEINT) + (doc_id // 2)*131 + $PertSalt)")
    s"""vg0 AS MATERIALIZED (
       |  SELECT doc_id, $gMix AS pm FROM documents),
       |gk AS (
       |  SELECT doc_id AS id, sg.s AS s, fr.fi AS fi,
       |    (CASE WHEN (doc_id // 2) % $PairMod = 0
       |          THEN doc_id // 2 ELSE doc_id END) * $Segments + sg.s AS key,
       |    CASE WHEN (doc_id // 2) % $PairMod = 0
       |         THEN CAST($PairBase AS HUGEINT)
       |         ELSE CAST(${UniqBase} AS HUGEINT) END AS base,
       |    CASE WHEN (doc_id // 2) % $PairMod = 0 AND doc_id % 2 = 1
       |          AND fr.fi = 1
       |          AND sg.s = ${ImageGen.modSql("pm", Segments)}
       |         THEN 1 ELSE 0 END AS sh
       |  FROM vg0
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${Segments - 1}))
       |              AS s) sg
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${FramesPerSeg - 1}))
       |              AS fi) fr),
       |${ImageGen.featureChainSql(Seq("id", "s", "fi"), "ff")},
       |f AS MATERIALIZED (
       |  SELECT id, s * 19 + d AS d,
       |    CAST(sum(v) // $FramesPerSeg AS BIGINT) AS v
       |  FROM ff GROUP BY id, s, d)""".stripMargin
  }
}
