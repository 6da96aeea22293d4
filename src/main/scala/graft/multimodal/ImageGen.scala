package graft.multimodal

import graft.functions.SplitMix64Kernel

/** Deterministic synthetic image corpus — the q164 generator that
  * ties the multimodal dedup family to the SCALE FACTOR (round-9
  * verdict #2): one drawn PNG per `documents` row, composition seeded
  * by doc_id, near-dup pairs planted for a fixed fraction of groups.
  * The q156/q160 fixtures were scale-independent (240 images at every
  * sf); this corpus is 500/500/5000 images at sf0.001/0.01/0.1, so
  * the chunk-collision candidate join is exercised at real data
  * growth.
  *
  * Every image is three deterministic fills on a 32×24 RGB canvas
  * (background, one rectangle, one 2-row full-width stripe drawn
  * last), all parameters from the splitmix64 stream — the SAME
  * drawing the checked-in q156 fixtures use
  * (graft.tools.GenImageFixture delegates to [[drawPair]], so the
  * fixtures are byte-identical across the refactor; MultimodalSpec's
  * fixture-parity test pins it).
  *
  * THE ORACLE SEAM IS CLOSED-FORM, NOT A PINNED FIXTURE: because the
  * composition is three axis-aligned fills, the exact pixel census of
  * the decoded image is region arithmetic — stripe rows × width, the
  * rectangle minus its stripe overlap, background = rest — so the
  * integer features ([[Multimodal.imageIntFeatures]]: milli-level
  * channel means + ppm luminance histogram) are a pure integer
  * FORMULA of doc_id that DuckDB evaluates directly
  * ([[featureSql]]). The engine path stays fully real (draw → PNG
  * encode → javax.imageio decode → pixel loop); the oracle replays
  * the geometry. [[featuresOf]] is the Scala mirror of the same
  * closed form, and MultimodalSpec asserts decoded ≡ closed-form on
  * real drawn images — the seam is therefore VERIFIED, not assumed
  * (the q50/q156 honest-seam line, upgraded from "replay a pinned
  * file" to "replay the math").
  */
object ImageGen {
  val W = 32
  val H = 24
  private val NPix = W * H // 768

  /** Salt base for the grouped (pair) stream — the q156 fixture's
    * historical constant (GenImageFixture round 9). */
  val PairBase = 0x1336F00DL
  /** Salt base for unique (unpaired) images in the scaled corpus. */
  val UniqBase = 0x164C0DEEL

  /** Planted-pair fraction: group g = id div 2 is a near-dup pair iff
    * g % PairMod == 0 (both members drawn from the group key, the odd
    * one's rectangle one pixel wider); all other images draw an
    * independent composition keyed by their own id. */
  val PairMod = 4L

  /** Deterministic parameter draw: floorMod(mix(base + key·131 +
    * salt), mod) — Java's ((m % mod) + mod) % mod on the SIGNED mixed
    * long (the fixture's historical convention; [[pSql]] replays the
    * sign handling explicitly because the oracle's mix is unsigned). */
  def p(key: Long, base: Long, salt: Long, mod: Int): Int = {
    val m = SplitMix64Kernel.mix(base + key * 131L + salt)
    (((m % mod) + mod) % mod).toInt
  }

  /** The drawing, parameterized by (key, base, shift): background
    * fill, one rectangle (width +shift — the near-dup perturbation
    * that moves the FEATURES, per the round-9 shift-vs-grow lesson),
    * one 2-row stripe on top. */
  def draw(key: Long, base: Long, shift: Int): Array[Byte] = {
    def q(salt: Long, mod: Int): Int = p(key, base, salt, mod)
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(q(1, 256), q(2, 256), q(3, 256)))
    g2.fillRect(0, 0, W, H)
    g2.setColor(new java.awt.Color(q(4, 256), q(5, 256), q(6, 256)))
    g2.fillRect(2 + q(7, W / 2), 2 + q(8, H / 2),
      4 + q(9, W / 4) + shift, 4 + q(10, H / 4))
    g2.setColor(new java.awt.Color(q(11, 256), q(12, 256), q(13, 256)))
    g2.fillRect(0, q(14, H), W, 2)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The q156 fixture drawing: group key = id div 2, the odd member's
    * rectangle one pixel wider. */
  def drawPair(id: Long): Array[Byte] =
    draw(id / 2, PairBase, (id % 2).toInt)

  /** The q164 scaled-corpus drawing: planted pair groups draw from
    * the group key; everything else is an independent composition. */
  def drawScaled(id: Long): Array[Byte] = {
    val g = id / 2
    if (g % PairMod == 0) drawPair(id) else draw(id, UniqBase, 0)
  }

  // ---- closed-form features (the oracle side of the seam) ---------

  /** Exact region census of the drawn image: (area, r, g, b) for the
    * three visible regions — stripe (drawn last, full width, height
    * min(2, H−ys)), rectangle minus its stripe overlap, background. */
  private def regions(key: Long, base: Long, shift: Int)
      : Seq[(Long, Int, Int, Int)] = {
    def q(salt: Long, mod: Int): Int = p(key, base, salt, mod)
    // x0 plays no role in the census: x0 ≤ 17 and w ≤ 13, so the
    // rectangle never clips horizontally (nor vertically: y0 ≤ 13,
    // h ≤ 9) — only the stripe can clip, at the bottom edge
    val y0 = 2 + q(8, H / 2)
    val w = 4 + q(9, W / 4) + shift; val h = 4 + q(10, H / 4)
    val ys = q(14, H)
    val rs = math.min(2, H - ys) // stripe rows actually drawn
    val ov = math.max(0, math.min(y0 + h, ys + rs) - math.max(y0, ys))
    val sa = (W * rs).toLong            // stripe area
    val rv = (w * (h - ov)).toLong      // rectangle visible area
    val bg = NPix - sa - rv
    Seq(
      (bg, q(1, 256), q(2, 256), q(3, 256)),
      (rv, q(4, 256), q(5, 256), q(6, 256)),
      (sa, q(11, 256), q(12, 256), q(13, 256)))
  }

  /** Closed-form integer features of the drawn image — MUST equal
    * `Multimodal.imageIntFeatures(decode(draw(...)))` (spec-pinned):
    * d 0–2 milli-level channel means, d 3–18 ppm luminance histogram
    * (Rec.601 integer weights, 16 bins). */
  def featuresOf(key: Long, base: Long, shift: Int): Seq[(Int, Long)] = {
    val rs = regions(key, base, shift)
    val means = (0 to 2).map { c =>
      val s = rs.map { case (a, r, g, b) =>
        a * Seq(r, g, b)(c).toLong }.sum
      (c, s * 1000L / NPix)
    }
    val hist = new Array[Long](16)
    rs.foreach { case (a, r, g, b) =>
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      hist(lum * 16 / 256) += a
    }
    val shares = hist.toSeq.zipWithIndex.map { case (c, i) =>
      (3 + i, c * 1000000L / NPix)
    }
    means ++ shares
  }

  /** Closed-form features for the scaled corpus by id. */
  def featuresOfScaled(id: Long): Seq[(Int, Long)] = {
    val g = id / 2
    if (g % PairMod == 0) featuresOf(g, PairBase, (id % 2).toInt)
    else featuresOf(id, UniqBase, 0)
  }

  // ---- generated DuckDB replay of the closed form ------------------

  import graft.functions.SplitMix64

  /** floorMod of the SIGNED mix value: the oracle's mix is a HUGEINT
    * in [0, 2^64), so re-sign it before the Java-convention mod. The
    * mix column `mc` must be a short column reference (one mix per
    * CTE column, the mixSql contract). */
  private def modSql(mc: String, mod: Int): String =
    s"(((CASE WHEN $mc >= 9223372036854775808 THEN $mc - " +
      s"18446744073709551616 ELSE $mc END % $mod) + $mod) % $mod)"

  private def mixCol(salt: Long): String =
    SplitMix64.mixSql(s"(base + key*131 + $salt)")

  /** CTE chain (no leading WITH) ending at `f(id, d, v)` — the
    * closed-form integer features of [[drawScaled]] over every
    * `documents` doc_id, evaluated entirely in SQL: the identical
    * splitmix64 parameter stream (q83's shared-literal playbook,
    * upgraded to a shared FORMULA), the identical region arithmetic,
    * the identical integer divisions (all operands nonnegative, so
    * trunc ≡ floor across engines). */
  def featureSql: String = {
    val mixes = (1 to 14).map(s => s"${mixCol(s.toLong)} AS m$s").mkString(",\n    ")
    val mods = Seq(
      "r0" -> (1, 256), "g0" -> (2, 256), "b0" -> (3, 256),
      "r1" -> (4, 256), "g1" -> (5, 256), "b1" -> (6, 256),
      "px" -> (7, W / 2), "py" -> (8, H / 2),
      "pw" -> (9, W / 4), "ph" -> (10, H / 4),
      "r2" -> (11, 256), "g2" -> (12, 256), "b2" -> (13, 256),
      "ys" -> (14, H))
      .map { case (n, (s, m)) => s"${modSql(s"m$s", m)} AS $n" }
      .mkString(",\n    ")
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
       |    $mods
       |  FROM mixes),
       |geo AS MATERIALIZED (
       |  SELECT id, r0, g0, b0, r1, g1, b1, r2, g2, b2,
       |    least(2, $H - ys) AS rs,
       |    greatest(0, least((2 + py) + (4 + ph),
       |                      ys + least(2, $H - ys))
       |               - greatest(2 + py, ys)) AS ov,
       |    (4 + pw + sh) AS w, (4 + ph) AS h, (2 + py) AS y0, ys
       |  FROM par),
       |areas AS MATERIALIZED (
       |  SELECT id, r0, g0, b0, r1, g1, b1, r2, g2, b2,
       |    $W * rs AS sa, w * (h - ov) AS rv,
       |    $NPix - $W * rs - w * (h - ov) AS bg,
       |    ((r0*299 + g0*587 + b0*114) // 1000) * 16 // 256 AS lb,
       |    ((r1*299 + g1*587 + b1*114) // 1000) * 16 // 256 AS lr,
       |    ((r2*299 + g2*587 + b2*114) // 1000) * 16 // 256 AS ls
       |  FROM geo),
       |f AS MATERIALIZED (
       |  SELECT id, 0 AS d, (bg*r0 + rv*r1 + sa*r2) * 1000 // $NPix AS v
       |  FROM areas
       |  UNION ALL
       |  SELECT id, 1, (bg*g0 + rv*g1 + sa*g2) * 1000 // $NPix FROM areas
       |  UNION ALL
       |  SELECT id, 2, (bg*b0 + rv*b1 + sa*b2) * 1000 // $NPix FROM areas
       |  UNION ALL
       |  SELECT id, 3 + b.b AS d,
       |    (CASE WHEN lb = b.b THEN bg ELSE 0 END
       |     + CASE WHEN lr = b.b THEN rv ELSE 0 END
       |     + CASE WHEN ls = b.b THEN sa ELSE 0 END) * 1000000 // $NPix
       |  FROM areas CROSS JOIN (
       |    SELECT unnest(generate_series(0, 15)) AS b) b)""".stripMargin
  }
}
