package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque binary payload + typed metadata.
  * At 100 TB this is the row shape of an image/audio/video corpus:
  * the payload stays an un-decoded `binary` column until a compute
  * stage explicitly materializes features from it. */
final case class Media(id: Long, media_type: String,
                       payload: Array[Byte], meta: Map[String, String])

final case class MediaFeatures(id: Long, media_type: String,
                               n_bytes: Int, features: Array[Double])

final case class MediaFrame(id: Long, frame_idx: Int,
                            frame: Array[Byte])

final case class ImageFeatures(id: Long, width: Int, height: Int,
                               n_pixels: Int,
                               mean_r: Double, mean_g: Double, mean_b: Double,
                               lum_hist: Array[Double])

final case class AudioFeatures(id: Long, sample_rate: Int, channels: Int,
                               n_frames: Long, duration_ms: Double,
                               rms: Double, zero_crossings: Long)

/** One integer image-feature component: dims 0–2 are per-channel
  * means in MILLI-levels (sum·1000 div n_pixels), dims 3–18 the
  * 16-bin Rec.601 luminance histogram in PPM — all integer division,
  * so any engine replays the values bit-for-bit (q156's seam). */
final case class ImageFeatRow(id: Long, d: Int, v: Long)

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over `binary` payload columns.
  *
  * The heavy stages run as `mapPartitions` over typed Datasets — the
  * Scala analog of `mapInPandas`: per-partition batch iteration, so a
  * real decoder would amortize codec/model initialization once per
  * partition (see `decoderInit` below), and Spark streams partitions
  * without materializing them.
  *
  * Two codec paths coexist:
  *  - REAL image path (`decodeImage` / `extractImageFeatures` /
  *    `resizeImage`): PNG/JPEG/GIF/BMP via `javax.imageio`, which
  *    ships with the JDK — actual pixel decode, exact per-channel
  *    means and a luminance histogram, and a real nearest-neighbor
  *    resize re-encoded to PNG. MultimodalSpec decodes real PNGs it
  *    draws itself and checks pixel-exact results.
  *  - STUB byte path (`decodeStub`, q50): a deterministic byte
  *    histogram kept ALONGSIDE the real codec because the driver's
  *    DuckDB oracle can replay it (`hex(encode(text))`) — it is the
  *    oracle-checkable projection of the pipeline, not a placeholder
  *    for missing capability.
  *  - REAL audio path (`decodeAudio` / `extractAudioFeatures`):
  *    WAV/AIFF/AU 16-bit PCM via `javax.sound.sampled` (also
  *    JDK-native) — sample rate, duration, RMS, zero crossings.
  *  - REAL video path (`aviVideoFrames` / `frameSampleVideo`):
  *    MJPEG-in-AVI — pure-JVM RIFF container walk, frames decoded by
  *    the imageio JPEG path. (Inter-frame codecs like H.264 have no
  *    JDK decoder; for those the byte-chunk `frameSample` remains the
  *    plumbing shape.)
  */
object Multimodal {

  /** Synthetic media corpus from `documents` (payload = utf-8 bytes):
    * exercises the binary-column plumbing without real media files. */
  def syntheticFromDocuments(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("id"),
      concat(lit("media/"), pmod(col("doc_id"), lit(3)).cast("string"))
        .as("media_type"),
      col("text").cast("binary").as("payload"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[Media]
  }

  /** Per-partition "decoder" initialization — in a real pipeline this
    * loads the codec / feature model once per partition. */
  private def decoderInit(): Int => Array[Double] = {
    // STUB: a real implementation would return e.g. a JPEG decoder +
    // embedding model closure here.
    bins => new Array[Double](bins)
  }

  /** STUB decode: deterministic 16-bin normalized byte histogram. */
  private def decodeStub(payload: Array[Byte], scratch: Array[Double]): Array[Double] = {
    java.util.Arrays.fill(scratch, 0.0)
    var i = 0
    while (i < payload.length) {
      scratch((payload(i) & 0xFF) >>> 4) += 1.0
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    scratch.map(_ / n)
  }

  /** Batch feature extraction (mapInPandas-shaped). */
  def extractFeatures(media: Dataset[Media], bins: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      val init = decoderInit()           // once per partition (batch shape)
      val scratch = init(bins)
      iter.map { m =>
        MediaFeatures(m.id, m.media_type, m.payload.length,
          decodeStub(m.payload, scratch))
      }
    }
  }

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/GIF/BMP).
    * Returns None for payloads no registered reader understands —
    * the distributed operators treat those as pass-through rows, so a
    * mixed media corpus never throws mid-job. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  /** Real pixel features: exact width/height, per-channel means, and
    * a `bins`-bucket luminance histogram (integer Rec.601 weights —
    * deterministic across JVMs). Per-partition init disables
    * ImageIO's temp-file cache once, the batch-shape seam where a
    * heavier model would load. */
  def extractImageFeatures(media: Dataset[Media], bins: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)   // once per partition
      iter.flatMap { m =>
        decodeImage(m.payload).map { img =>
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          val hist = new Array[Double](bins)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
              sr += r; sg += g; sb += b
              val lum = (r * 299 + g * 587 + b * 114) / 1000
              hist(lum * bins / 256) += 1.0
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          ImageFeatures(m.id, w, h, w * h, sr / n, sg / n, sb / n, hist.map(_ / n))
        }
      }
    }
  }

  /** ALL-INTEGER image features, exploded to (id, d, v) rows — the
    * quantized form q156 fingerprints: v is exact integer arithmetic
    * on the decoded pixels (channel sums → milli-level means, Rec.601
    * luminance histogram → ppm shares), so the checked-in feature
    * fixture replays bit-identically on any engine while the decode
    * itself stays a JVM-only step (DuckDB cannot read PNG — the q50
    * honest-seam precedent, with MultimodalSpec pinning
    * decode → features bit-exact). Undecodable payloads emit no
    * rows. */
  /** The per-image integer feature vector (length bins+3): dims 0–2
    * milli-level channel means, dims 3.. the ppm luminance histogram —
    * the shared pixel loop of [[imageIntFeatures]] and the per-frame
    * step of [[videoIntFeatures]]. */
  private[graft] def intFeatureVec(img: java.awt.image.BufferedImage,
      bins: Int = 16): Array[Long] = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](bins)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        sr += r; sg += g; sb += b
        val lum = (r * 299 + g * 587 + b * 114) / 1000
        hist(lum * bins / 256) += 1L
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val out = new Array[Long](bins + 3)
    out(0) = sr * 1000L / n; out(1) = sg * 1000L / n; out(2) = sb * 1000L / n
    var i = 0
    while (i < bins) { out(3 + i) = hist(i) * 1000000L / n; i += 1 }
    out
  }

  def imageIntFeatures(media: Dataset[Media], bins: Int = 16): Dataset[ImageFeatRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)   // once per partition
      iter.flatMap { m =>
        decodeImage(m.payload).toSeq.flatMap { img =>
          intFeatureVec(img, bins).zipWithIndex.map { case (v, d) =>
            ImageFeatRow(m.id, d, v)
          }
        }
      }
    }
  }

  /** ALL-INTEGER per-clip VIDEO features (q165's seam): decode the
    * MJPEG-AVI frames ([[aviVideoFrames]] + the imageio JPEG path),
    * extract each frame's integer image features, then TEMPORAL-POOL
    * — per segment s of the frame sequence (ceil-split like the audio
    * segmenter), the per-dim integer MEAN (sum div count) of the
    * frame features, exploded to (id, d = s·(bins+3)+dim, v). This is
    * the coarse "feature silhouette over time" that video
    * fingerprinters hash — robust to single-frame noise, sensitive to
    * content. Pure integer arithmetic above the (deterministic) JPEG
    * decode, so a checked-in feature fixture replays bit-identically
    * (the q156/q161 honest-seam pattern — DuckDB cannot parse AVI).
    * Non-AVI payloads emit no rows.
    *
    * Empty temporal segments (clips shorter than `segments` frames,
    * or frame counts that leave trailing ceil-split segments unfilled)
    * emit ZERO rows for every dim — full-dim coverage, so the L1
    * verify between clips of DIFFERENT frame counts compares a real
    * silhouette against zeros (a large distance) instead of silently
    * dropping the unshared dims and deflating the distance (round-10
    * advice #1; latent before because every checked-in clip is
    * uniformly 8 frames). */
  def videoIntFeatures(media: Dataset[Media], segments: Int = 4,
      bins: Int = 16): Dataset[ImageFeatRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dims = bins + 3
    media.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)   // once per partition
      iter.flatMap { m =>
        val frames = aviVideoFrames(m.payload).flatMap(decodeImage(_))
        if (frames.isEmpty) Seq.empty
        else {
          val n = frames.length
          val segLen = (n + segments - 1) / segments
          val sums = Array.ofDim[Long](segments, dims)
          val cnts = new Array[Long](segments)
          frames.zipWithIndex.foreach { case (img, f) =>
            val s = f / segLen
            val fv = intFeatureVec(img, bins)
            var d = 0
            while (d < dims) { sums(s)(d) += fv(d); d += 1 }
            cnts(s) += 1
          }
          (0 until segments).flatMap { s =>
            if (cnts(s) == 0)
              (0 until dims).map(d => ImageFeatRow(m.id, s * dims + d, 0L))
            else (0 until dims).map(d =>
              ImageFeatRow(m.id, s * dims + d, sums(s)(d) / cnts(s)))
          }
        }
      }
    }
  }

  /** Real image resize: nearest-neighbor scale to (width, height),
    * re-encoded as PNG (deterministic: PNG is lossless and the
    * interpolation is pinned). Non-image payloads pass through
    * unchanged. */
  def resizeImage(media: Dataset[Media], width: Int, height: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map { m =>
        decodeImage(m.payload) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            g2.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g2.drawImage(img, 0, 0, width, height, null)
            g2.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            m.copy(payload = bos.toByteArray,
              meta = m.meta + ("resized" -> s"${width}x$height"))
          case None => m
        }
      }
    }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * containers, PCM payloads). None for undecodable payloads. */
  def decodeAudio(payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
    try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload)))
    catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Real audio features for 16-bit PCM: sample rate, channel count,
    * frame count, duration, RMS amplitude (normalized to [-1, 1]) and
    * zero-crossing count over channel 0 — the standard cheap audio
    * quality/energy profile. Non-audio and non-16-bit-PCM payloads
    * skip (None), so a mixed corpus never throws. */
  def extractAudioFeatures(media: Dataset[Media]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        decodeAudio(m.payload).flatMap { in =>
          val fmt = in.getFormat
          val ok = fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!ok) { in.close(); None }
          else {
            val bytes = in.readAllBytes(); in.close()
            val ch = fmt.getChannels
            val frameBytes = 2 * ch
            val nFrames = bytes.length / frameBytes
            val big = fmt.isBigEndian
            def sample(frame: Int, channel: Int): Int = {
              val o = frame * frameBytes + channel * 2
              if (big) (bytes(o) << 8) | (bytes(o + 1) & 0xFF)
              else (bytes(o + 1) << 8) | (bytes(o) & 0xFF)
            }
            var sumSq = 0.0
            var zc = 0L
            var prevSign = 0
            var f = 0
            while (f < nFrames) {
              var c = 0
              while (c < ch) {
                val v = sample(f, c) / 32768.0
                sumSq += v * v
                c += 1
              }
              val s0 = sample(f, 0)
              val sign = if (s0 > 0) 1 else if (s0 < 0) -1 else 0
              if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
              if (sign != 0) prevSign = sign
              f += 1
            }
            val rms =
              if (nFrames == 0) 0.0
              else math.sqrt(sumSq / (nFrames.toLong * ch))
            Some(AudioFeatures(m.id, fmt.getSampleRate.toInt, ch,
              nFrames.toLong, nFrames * 1000.0 / fmt.getSampleRate, rms, zc))
          }
        }
      }
    }
  }

  /** ALL-INTEGER audio features, exploded to (id, d, v) rows — the
    * audio analog of [[imageIntFeatures]] (q161's seam): dims 0–15
    * are the 16-segment energy profile (per-segment Σ|sample| of
    * channel 0 as a PPM share of the total — the coarse "loudness
    * silhouette" audio fingerprinters hash), dim 16 the
    * zero-crossing rate in PPM of frames. Pure integer arithmetic on
    * the decoded PCM, so a checked-in feature fixture replays
    * bit-identically (DuckDB cannot decode WAV — the q156 honest-seam
    * pattern). Non-audio / non-16-bit-PCM payloads emit no rows. */
  def audioIntFeatures(media: Dataset[Media],
                       segments: Int = 16): Dataset[ImageFeatRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        decodeAudio(m.payload).toSeq.flatMap { in =>
          val fmt = in.getFormat
          val ok = fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          if (!ok) { in.close(); Seq.empty }
          else {
            val bytes = in.readAllBytes(); in.close()
            val ch = fmt.getChannels
            val frameBytes = 2 * ch
            val nFrames = bytes.length / frameBytes
            val big = fmt.isBigEndian
            def sample(frame: Int): Int = {
              val o = frame * frameBytes // channel 0
              if (big) (bytes(o) << 8) | (bytes(o + 1) & 0xFF)
              else (bytes(o + 1) << 8) | (bytes(o) & 0xFF)
            }
            if (nFrames == 0) Seq.empty
            else {
              val segLen = (nFrames + segments - 1) / segments
              val segAbs = new Array[Long](segments)
              var zc = 0L
              var prevSign = 0
              var f = 0
              while (f < nFrames) {
                val s0 = sample(f)
                segAbs(f / segLen) += math.abs(s0.toLong)
                val sign = if (s0 > 0) 1 else if (s0 < 0) -1 else 0
                if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
                if (sign != 0) prevSign = sign
                f += 1
              }
              val tot = math.max(segAbs.sum, 1L)
              val shares = segAbs.zipWithIndex.map { case (a, i) =>
                ImageFeatRow(m.id, i, a * 1000000L / tot)
              }
              shares.toSeq :+
                ImageFeatRow(m.id, segments, zc * 1000000L / nFrames)
            }
          }
        }
      }
    }
  }

  /** REAL video container path: MJPEG-in-AVI. AVI is a RIFF file —
    * fourcc + little-endian size chunks, video frames in the 'movi'
    * LIST as 'NNdc'/'NNdb' chunks whose payloads are plain JPEGs for
    * the MJPEG codec — so a pure-JVM RIFF walk plus the imageio JPEG
    * decoder gives real frame extraction with zero new dependencies.
    * Undecodable payloads yield Nil (mixed corpora never throw). */
  def aviVideoFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    def u32(o: Int): Long =
      (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
        ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def isVideoChunk(cc: String): Boolean =
      cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
        (cc.substring(2) == "dc" || cc.substring(2) == "db")
    // walk a run of sibling chunks in [from, until)
    def walk(from: Int, until: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val cc = fourcc(o)
        val size = u32(o + 4).toInt
        val dataStart = o + 8
        val dataEnd = math.min(dataStart + size, until)
        if (dataEnd < dataStart) return  // corrupt size: stop cleanly
        if (cc == "LIST" && size >= 4) {
          walk(dataStart + 4, dataEnd) // skip the 4-byte list type
        } else if (isVideoChunk(cc) && size > 0) {
          frames += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
        }
        o = dataStart + size + (size & 1) // chunks pad to even
      }
    }
    if (payload.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      walk(12, math.min(payload.length, 8 + u32(4).toInt + 8))
    frames.toSeq
  }

  /** Real video frame-sampling: parse the AVI container, keep every
    * `everyN`-th frame as its raw JPEG payload (decodable downstream
    * by [[extractImageFeatures]]). Non-AVI payloads emit no rows. */
  def frameSampleVideo(media: Dataset[Media], everyN: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      aviVideoFrames(m.payload).zipWithIndex.collect {
        case (jpeg, idx) if idx % everyN == 0 => MediaFrame(m.id, idx, jpeg)
      }
    }
  }

  /** STUB resize: truncate/pad payload to `size` bytes (stands in for
    * an image resize; preserves schema + determinism). */
  def resize(media: Dataset[Media], size: Int): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(payload = java.util.Arrays.copyOf(m.payload, size)))
  }

  /** Frame sampling: split payload into fixed-size chunks and keep
    * every `everyN`-th — the plumbing shape of video frame-sampling
    * (explode one row into many, preserving the id for downstream
    * joins). */
  def frameSample(media: Dataset[Media], frameBytes: Int,
                  everyN: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => MediaFrame(m.id, idx, chunk)
      }
    }
  }
}
