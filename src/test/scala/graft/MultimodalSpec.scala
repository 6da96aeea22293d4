package graft

import graft.multimodal.{AudioGen, Media, Multimodal, VideoGen}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticFromDocuments(Tables.load(spark, sf0001, "documents"))

  test("binary payload schema: payload is BinaryType, meta is map") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "map")
    assert(media.count() === 500)
  }

  test("feature extraction: deterministic, normalized, batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.id)
    assert(f1.length === 500)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.id === b.id && a.features.sameElements(b.features))
    }
    f1.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, s"histogram not normalized for ${f.id}")
      assert(f.n_bytes > 0)
    }
  }

  test("resize truncates/pads payloads to fixed size") {
    val r = Multimodal.resize(media, 64).collect()
    assert(r.forall(_.payload.length === 64))
  }

  test("frame sampling explodes payloads and keeps every Nth frame") {
    val frames = Multimodal.frameSample(media, frameBytes = 32, everyN = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 === 0))
    // reconstructable: ids map back to media
    val ids = media.collect().map(_.id).toSet
    assert(frames.forall(f => ids.contains(f.id)))
  }

  // ---- real javax.imageio codec path (round-2 verdict item #3) ----

  /** Draw a real PNG in memory: pixel (x,y) = f(x,y) packed RGB. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    rows.map { case (id, p) => Media(id, "image/png", p, Map.empty) }.toDS()
  }

  test("real codec: decodes drawn PNGs pixel-exactly (dims, channel means, histogram)") {
    val solid = png(8, 5)((_, _) => (200 << 16) | (100 << 8) | 50)
    val twoTone = png(4, 4)((x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val feats = Multimodal.extractImageFeatures(mediaOf(1L -> solid, 2L -> twoTone))
      .collect().sortBy(_.id)
    assert(feats.length === 2)
    val s = feats(0)
    assert(s.width === 8 && s.height === 5 && s.n_pixels === 40)
    assert(s.mean_r === 200.0 && s.mean_g === 100.0 && s.mean_b === 50.0)
    val t = feats(1)
    // half pure black (lum 0 -> bin 0), half pure white (lum 255 -> bin 15)
    assert(t.lum_hist(0) === 0.5 && t.lum_hist(15) === 0.5)
    assert(t.lum_hist.sum === 1.0)
  }

  test("real codec: non-image payloads skip cleanly in a mixed corpus") {
    val mixed = mediaOf(
      1L -> png(2, 2)((_, _) => 0x808080),
      2L -> "not an image".getBytes("UTF-8"))
    val feats = Multimodal.extractImageFeatures(mixed).collect()
    assert(feats.map(_.id).toSeq === Seq(1L))
  }

  test("real codec: nearest-neighbor resize re-encodes decodable PNG") {
    val solid = png(16, 16)((_, _) => (10 << 16) | (20 << 8) | 30)
    val resized = Multimodal.resizeImage(mediaOf(7L -> solid), 4, 4).collect()
    val redecoded = Multimodal.extractImageFeatures(mediaOf(7L -> resized(0).payload))
      .collect()(0)
    // solid color survives any interpolation exactly
    assert(redecoded.width === 4 && redecoded.height === 4)
    assert(redecoded.mean_r === 10.0 && redecoded.mean_g === 20.0 && redecoded.mean_b === 30.0)
    assert(resized(0).meta("resized") === "4x4")
    // non-image passes through untouched
    val raw = "plain bytes".getBytes("UTF-8")
    val through = Multimodal.resizeImage(mediaOf(9L -> raw), 4, 4).collect()(0)
    assert(through.payload.toSeq === raw.toSeq)
  }

  test("real codec: distributed determinism across partitionings") {
    val imgs = (0L until 20L).map(i =>
      i -> png(6, 6)((x, y) => (((i * 37 + x * 11 + y * 7) % 256).toInt * 0x010101)))
    val a = Multimodal.extractImageFeatures(mediaOf(imgs: _*)).collect().sortBy(_.id)
    val b = Multimodal.extractImageFeatures(mediaOf(imgs: _*).repartition(7))
      .collect().sortBy(_.id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.id === y.id && x.width === y.width && x.height === y.height &&
        x.mean_r === y.mean_r && x.mean_g === y.mean_g && x.mean_b === y.mean_b &&
        x.lum_hist.sameElements(y.lum_hist))
    }
  }

  /** Write a real WAV in memory: mono 16-bit PCM sine wave. */
  private def wav(sampleRate: Int, freqHz: Double, amplitude: Double,
      nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)
        * 32767).toInt.toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio codec: decodes drawn WAV exactly (rate, frames, rms, zero crossings)") {
    val tone = wav(sampleRate = 8000, freqHz = 440, amplitude = 0.25, nFrames = 1600)
    val silence = wav(8000, 440, 0.0, 800)
    val mixed = mediaOf(1L -> tone, 2L -> silence, 3L -> "not audio".getBytes("UTF-8"))
    val feats = Multimodal.extractAudioFeatures(mixed).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq === Seq(1L, 2L))
    val t = feats(0)
    assert(t.sample_rate === 8000 && t.channels === 1 && t.n_frames === 1600L)
    assert(t.duration_ms === 200.0)
    // sine RMS = amplitude/sqrt(2); quantization keeps it within 1%
    assert(math.abs(t.rms - 0.25 / math.sqrt(2.0)) < 0.0025, t.rms)
    // 440 Hz over 0.2 s: 88 full periods -> 2 sign flips each
    assert(math.abs(t.zero_crossings - 176L) <= 1, t.zero_crossings)
    val s = feats(1)
    assert(s.rms === 0.0 && s.zero_crossings === 0L && s.n_frames === 800L)
  }

  /** Encode a JPEG in memory. */
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal-but-well-formed MJPEG AVI: RIFF('AVI ' LIST('hdrl' avih)
    * LIST('movi' 00dc...)) with little-endian sizes + even padding. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    val avih = chunk("avih", new Array[Byte](56))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  test("real video path: MJPEG AVI frames parse, sample, and decode to pixels") {
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF, 0x000000)
    val avi = mjpegAvi(colors.map(c => jpeg(8, 8, c)))
    // container walk finds every frame in order
    val frames = Multimodal.aviVideoFrames(avi)
    assert(frames.length === 5)
    // distributed sampling keeps every 2nd frame with its index
    val sampled = Multimodal.frameSampleVideo(mediaOf(3L -> avi), everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    // frames are real JPEGs: decode one and check the dominant color
    // (JPEG is lossy — solid red decodes near (255, 0, 0))
    val feats = Multimodal.extractImageFeatures(
      mediaOf(sampled.map(f => f.frame_idx.toLong -> f.frame): _*))
      .collect().sortBy(_.id)
    assert(feats.length === 3)
    val red = feats(0)
    assert(red.width === 8 && red.height === 8)
    assert(red.mean_r > 220 && red.mean_g < 40 && red.mean_b < 40,
      s"(${red.mean_r}, ${red.mean_g}, ${red.mean_b})")
    // non-AVI payloads produce no frames
    assert(Multimodal.aviVideoFrames("not a riff".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.frameSampleVideo(
      mediaOf(9L -> "junk".getBytes("UTF-8")), 1).collect().isEmpty)
  }

  test("q156 integer features: decode → (id, d, v) bit-exact on drawn images") {
    val solid = png(8, 5)((_, _) => (200 << 16) | (100 << 8) | 50)
    val twoTone = png(4, 4)((x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val f = Multimodal.imageIntFeatures(mediaOf(1L -> solid, 2L -> twoTone))
      .collect().map(r => (r.id, r.d) -> r.v).toMap
    assert(f.size === 38) // 2 images × 19 dims
    // solid: exact milli-level means
    assert(f((1L, 0)) === 200000L && f((1L, 1)) === 100000L &&
      f((1L, 2)) === 50000L)
    // solid lum = (200*299+100*587+50*114)/1000 = 124 -> bin 7 at 1e6 ppm
    assert(f((1L, 3 + 124 * 16 / 256)) === 1000000L)
    // two-tone: half black (bin 0), half white (bin 15)
    assert(f((2L, 3)) === 500000L && f((2L, 18)) === 500000L)
    assert(f((2L, 0)) === 127500L) // (0+255)/2 in milli = 127500
  }

  test("q156 fixture parity: checked-in feature table ≡ live recompute from checked-in images, row for row") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val live = Multimodal.imageIntFeatures(
      spark.read.parquet(graft.operators.ImageDedup.ImagesPath)
        .select(col("id"), lit("image/png").as("media_type"),
          col("payload"), map().cast("map<string,string>").as("meta"))
        .as[Media]).toDF()
    val pinned = spark.read.parquet(graft.operators.ImageDedup.FeaturesPath)
    assert(pinned.count() === 240L * 19)
    assert(live.exceptAll(pinned).count() === 0)
    assert(pinned.exceptAll(live).count() === 0)
  }

  test("q156 gate: exactly the planted near-dup pairs, with nonzero feature distance") {
    val out = graft.operators.ImageDedup.imageNearDups(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every planted pair (2g, 2g+1), nothing else
    assert(out.length === 120, s"${out.length} pairs")
    assert(out.forall { case (a, b, _, _) => a % 2 == 0 && b == a + 1 })
    // true near-dups, not byte-identical twins: L1 > 0 (the 1-px size
    // perturbation moves the features) and within the verify bound
    assert(out.forall { case (_, _, h, l1) =>
      h <= graft.operators.ImageDedup.HammingMax &&
        l1 > 0 && l1 <= graft.operators.ImageDedup.L1Max })
  }

  test("q164 closed form: analytic features ≡ decoded features across pair and unique ids") {
    import graft.multimodal.ImageGen
    // covers both branches: pair groups (g%4==0) and unique images,
    // through the REAL draw → PNG → decode → pixel-loop path
    val ids = (0L until 64L) ++ (490L until 500L)
    val media = mediaOf(ids.map(id => id -> ImageGen.drawScaled(id)): _*)
    val live = Multimodal.imageIntFeatures(media)
      .collect().map(r => (r.id, r.d) -> r.v).toMap
    assert(live.size === ids.size * 19)
    ids.foreach { id =>
      ImageGen.featuresOfScaled(id).foreach { case (d, v) =>
        assert(live((id, d)) === v,
          s"id=$id d=$d closed-form $v != decoded ${live((id, d))}")
      }
    }
  }

  test("q164 gate: planted pairs recovered on the sf0.001-scaled corpus") {
    val pairs = graft.operators.ImageDedup
      .scaledImageNearDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: (2g, 2g+1) for g % 4 == 0, ids < 500 → 63 pairs
    val planted = (0L until 250L).filter(_ % 4 == 0)
      .map(g => (2 * g, 2 * g + 1)).toSet
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).take(5)}")
  }

  test("q171 closed form: analytic audio features ≡ decoded features across pair and unique ids") {
    import graft.multimodal.AudioGen
    // covers both branches (pair groups g%4==0 and unique clips)
    // through the REAL synth → WAV → javax.sound decode → PCM loop
    val ids = (0L until 64L) ++ (490L until 500L)
    val media = ids.map(id =>
      Media(id, "audio/wav", AudioGen.synthScaled(id), Map.empty))
    import spark.implicits._
    val live = Multimodal.audioIntFeatures(media.toDS())
      .collect().map(r => (r.id, r.d) -> r.v).toMap
    assert(live.size === ids.size * 17)
    ids.foreach { id =>
      AudioGen.featuresOfScaled(id).foreach { case (d, v) =>
        assert(live((id, d)) === v,
          s"id=$id d=$d closed-form $v != decoded ${live((id, d))}")
      }
    }
  }

  test("q173 closed form: analytic pooled video features ≡ decoded features across pair and unique ids") {
    import graft.multimodal.VideoGen
    // the REAL path: draw2 → PNG → AVI container → RIFF walk →
    // imageio decode per frame → pixel loop → temporal pooling
    val ids = (0L until 32L) ++ (490L until 500L)
    val media = ids.map(id =>
      Media(id, "video/avi", VideoGen.synthScaled(id), Map.empty))
    import spark.implicits._
    val live = Multimodal.videoIntFeatures(media.toDS(),
      VideoGen.Segments).collect().map(r => (r.id, r.d) -> r.v).toMap
    assert(live.size === ids.size * 76)
    ids.foreach { id =>
      VideoGen.featuresOfScaled(id).foreach { case (d, v) =>
        assert(live((id, d)) === v,
          s"id=$id d=$d closed-form $v != decoded ${live((id, d))}")
      }
    }
  }

  test("q171/q173 gates: planted pairs recovered on the sf0.001-scaled corpora") {
    val planted = (0L until 250L).filter(_ % 4 == 0)
      .map(g => (2 * g, 2 * g + 1)).toSet
    val aud = graft.operators.AudioDedup
      .scaledAudioNearDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(aud),
      s"missing planted audio pairs: ${(planted -- aud).take(5)}")
    val vid = graft.operators.VideoDedup
      .scaledVideoNearDups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(vid),
      s"missing planted video pairs: ${(planted -- vid).take(5)}")
  }

  test("q161 integer audio features: decode → (id, d, v) bit-exact on a drawn clip") {
    // 16 segments × 400 frames; constant-amplitude square waves —
    // every segment carries the same |sample| mass, so each of the
    // 16 profile shares is exactly 10⁶/16 = 62500 ppm
    val clip = graft.tools.GenAudioFixture.wavBytes(
      Array.tabulate(16 * 400)(i => (if (i % 2 == 0) 1000 else -1000).toShort))
    val f = Multimodal.audioIntFeatures(mediaOf(1L -> clip))
      .collect().map(r => r.d -> r.v).toMap
    assert(f.size === 17)
    (0 to 15).foreach(d => assert(f(d) === 62500L, s"dim $d = ${f(d)}"))
    // alternating sign every frame → a crossing at every frame but
    // the first: zc = nFrames − 1 → ppm = (6399 · 10⁶) div 6400
    assert(f(16) === 6399L * 1000000L / 6400L)
  }

  test("q161 fixture parity: checked-in audio features ≡ live recompute from checked-in clips") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val live = Multimodal.audioIntFeatures(
      spark.read.parquet(graft.operators.AudioDedup.AudioPath)
        .select(col("id"), lit("audio/wav").as("media_type"),
          col("payload"), map().cast("map<string,string>").as("meta"))
        .as[Media]).toDF()
    val pinned = spark.read.parquet(graft.operators.AudioDedup.FeaturesPath)
    assert(pinned.count() === 240L * 17)
    assert(live.exceptAll(pinned).count() === 0)
    assert(pinned.exceptAll(live).count() === 0)
  }

  test("q161/q162 gates: exactly the planted audio pairs with nonzero distance; manifest census conserved") {
    val pairs = graft.operators.AudioDedup.audioNearDups(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.length === 120)
    assert(pairs.forall { case (a, b, _, _) => a % 2 == 0 && b == a + 1 })
    assert(pairs.forall { case (_, _, h, l1) =>
      h <= graft.operators.ImageDedup.HammingMax &&
        l1 > 0 && l1 <= graft.operators.AudioDedup.L1Max })
    val man = graft.operators.ImageDedup.manifestFrom(
      spark.read.parquet(graft.operators.AudioDedup.AudioPath).select(col("id")),
      graft.operators.AudioDedup.audioNearDups(spark)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(man.length === 120 && man.map(_._2).sum === 240L)
  }

  test("q165 pooled video features: AVI walk → frame decode → per-segment integer means, bit-exact") {
    // a 2-frame clip of solid colors: segment pooling with segLen =
    // ceil(2/4) = 1 puts one frame per segment, segments 2-3 empty
    val f0 = png(8, 4)((_, _) => (200 << 16) | (100 << 8) | 50)
    val f1 = png(8, 4)((_, _) => (40 << 16) | (80 << 8) | 120)
    def jpeg(p: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    val j0 = jpeg(f0); val j1 = jpeg(f1)
    val avi = graft.tools.GenVideoFixture.aviBytes(Seq(j0, j1))
    val out = Multimodal.videoIntFeatures(mediaOf(7L -> avi), segments = 4)
      .collect().map(r => (r.d, r.v)).toMap
    // FULL dim coverage: the empty trailing segments (2-3) zero-fill
    // instead of dropping out, so clips with differing frame counts
    // compare every dim in the L1 verify (round-10 advice #1)
    assert(out.size === 76, s"${out.size} rows")
    // each segment's pooled mean over ONE frame = that frame's own
    // integer features (JPEG decode included — replay the same path)
    val exp0 = Multimodal.imageIntFeatures(mediaOf(1L -> j0)).collect()
      .map(r => r.d -> r.v).toMap
    val exp1 = Multimodal.imageIntFeatures(mediaOf(1L -> j1)).collect()
      .map(r => r.d -> r.v).toMap
    (0 until 19).foreach { d =>
      assert(out(d) === exp0(d), s"seg0 d=$d")
      assert(out(19 + d) === exp1(d), s"seg1 d=$d")
      assert(out(38 + d) === 0L, s"empty seg2 d=$d zero-fills")
      assert(out(57 + d) === 0L, s"empty seg3 d=$d zero-fills")
    }
    // non-AVI payloads emit no rows
    assert(Multimodal.videoIntFeatures(
      mediaOf(9L -> "junk".getBytes("UTF-8"))).collect().isEmpty)
  }

  test("q165 fixture parity: checked-in video features ≡ live recompute from checked-in clips") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val live = Multimodal.videoIntFeatures(
      spark.read.parquet(graft.operators.VideoDedup.VideoPath)
        .select(col("id"), lit("video/avi").as("media_type"),
          col("payload"), map().cast("map<string,string>").as("meta"))
        .as[Media]).toDF()
    val pinned = spark.read.parquet(graft.operators.VideoDedup.FeaturesPath)
    assert(pinned.count() === 240L * 76)
    assert(live.exceptAll(pinned).count() === 0)
    assert(pinned.exceptAll(live).count() === 0)
  }

  test("q165/q166 gates: exactly the planted video pairs with nonzero distance; manifest census conserved") {
    val out = graft.operators.VideoDedup.videoNearDups(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 120, s"${out.length} pairs")
    assert(out.forall { case (a, b, _, _) => a % 2 == 0 && b == a + 1 })
    assert(out.forall { case (_, _, h, l1) =>
      h <= graft.operators.ImageDedup.HammingMax &&
        l1 > 0 && l1 <= graft.operators.VideoDedup.L1Max })
    val man = graft.operators.VideoDedup
      .queries("q166_video_dedup_manifest")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(man.length === 120 && man.map(_._2).sum === 240L)
    assert(man.forall(_._2 === 2L)) // every clip in a planted pair
  }

  test("q160 manifest: one canonical per planted pair, census conserved") {
    val out = graft.operators.ImageDedup.imageManifest(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 120 planted pairs → 120 canonicals (the even id of each pair),
    // each carrying multiplicity 2; Σ multiplicity = |images|
    assert(out.length === 120)
    assert(out.map(_._2).sum === 240L)
    assert(out.forall { case (id, m) => id % 2 == 0 && m == 2L })
  }

  test("q171/q173 separation: planted L1 within the scaled bounds, organic compositions an order of magnitude farther (round-11 advice #4)") {
    // the ADVICE gap: ScaledL1Max (audio 20000, video 40000) had ~9x
    // headroom over the documented planted delta, but no assertion
    // pinned the ORGANIC side of the gap. This sweep measures the
    // ground truth over ALL pairs of the gate corpus (ids 0..499 — the
    // sf0.001/sf0.01 universe) from the closed-form features: every
    // planted pair's L1 must sit within the verify bound, and the
    // NEAREST pair of independent compositions must clear it by >10x,
    // so the bound can never admit an organic pair (ScaleProbe's r11
    // section asserts the same census at n = 5000, the sf0.1 size).
    def sweep(name: String, feat: Long => Array[Long], bound: Long)
        : (Long, Long) = {
      val n = 500
      val fs = Array.tabulate(n)(i => feat(i.toLong))
      var plantedMax = 0L; var plantedMin = Long.MaxValue
      var organicMin = Long.MaxValue
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var s = 0L; var d = 0
          val a = fs(i); val b = fs(j)
          while (d < a.length) { s += math.abs(a(d) - b(d)); d += 1 }
          if (j == i + 1 && i % 2 == 0 && (i / 2) % 4 == 0) {
            plantedMax = math.max(plantedMax, s)
            plantedMin = math.min(plantedMin, s)
          } else organicMin = math.min(organicMin, s)
          j += 1
        }
        i += 1
      }
      assert(plantedMin > 0L, s"$name: a planted pair is byte-identical")
      assert(plantedMax <= bound,
        s"$name planted max L1 $plantedMax exceeds the bound $bound")
      assert(organicMin > 10L * bound,
        s"$name organic min L1 $organicMin within 10x of the bound $bound")
      (plantedMax, organicMin)
    }
    val (apm, aom) = sweep("audio",
      id => AudioGen.featuresOfScaled(id).map(_._2).toArray,
      graft.operators.AudioDedup.ScaledL1Max)
    val (vpm, vom) = sweep("video",
      id => VideoGen.featuresOfScaled(id).map(_._2).toArray,
      graft.operators.VideoDedup.ScaledL1Max)
    info(s"audio: planted max $apm vs organic min $aom (bound 10000)")
    info(s"video: planted max $vpm vs organic min $vom (bound 40000)")
  }

  test("features flow back into DataFrame surface for downstream joins") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(
      Tables.load(spark, sf0001, "documents"),
      feats("id") === col("doc_id"))
    assert(joined.count() === 500)
  }
}
