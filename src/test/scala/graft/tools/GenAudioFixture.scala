package graft.tools

import graft.functions.SplitMix64Kernel
import graft.multimodal.{Media, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the q161/q162 audio fixtures (spec-pinned
  * run):
  *
  *   fixtures/audio.parquet          (id, payload) — 240 WAV clips
  *   fixtures/audio_features.parquet (id, d, v)    — their integer
  *                                   features via the SAME
  *                                   Multimodal.audioIntFeatures the
  *                                   live gate path runs
  *
  * Each clip is 16 segments × 400 frames of 16-bit mono PCM at
  * 8 kHz: per-segment square-ish waves whose amplitude and period
  * come from splitmix64(group). Pair (2g, 2g+1): identical except
  * the odd clip's segment-3 amplitude is nudged ~1% — a true small
  * perturbation of the energy profile. WAV is raw PCM in a RIFF
  * container (hand-rolled 44-byte header — bit-deterministic), and
  * javax.sound.sampled decode is exact, so the checked-in feature
  * table replays bit-identically from the checked-in clips
  * (MultimodalSpec pins it).
  *
  *   sbt "Test/runMain graft.tools.GenAudioFixture"
  */
object GenAudioFixture {

  val NumClips = 240
  val Segments = 16
  val SegFrames = 400
  val Rate = 8000

  private def p(g: Long, salt: Long, mod: Int): Int = {
    val m = SplitMix64Kernel.mix(0x0A0D10F1L + g * 131L + salt)
    (((m % mod) + mod) % mod).toInt
  }

  /** 44-byte RIFF/WAVE header + 16-bit LE mono PCM. */
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

  def drawWav(id: Long): Array[Byte] = {
    val g = id / 2
    val nudge = (id % 2).toInt
    val samples = new Array[Short](Segments * SegFrames)
    var seg = 0
    while (seg < Segments) {
      // per-segment square wave: amplitude 2000..18000, period 4..35
      var amp = 2000 + p(g, seg * 3 + 1, 16001)
      if (nudge == 1 && seg == 3) amp += amp / 100 // the ~1% perturbation
      val period = 4 + p(g, seg * 3 + 2, 32)
      var f = 0
      while (f < SegFrames) {
        val phase = f % period
        samples(seg * SegFrames + f) =
          (if (phase * 2 < period) amp else -amp).toShort
        f += 1
      }
      seg += 1
    }
    wavBytes(samples)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/fixtures")
    val spark = SparkSession.builder().master("local[4]")
      .appName("gen-audio-fixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val media = (0L until NumClips.toLong)
      .map(id => Media(id, "audio/wav", drawWav(id), Map.empty))
    val mediaDs = media.toDS().repartition(4)
    mediaDs.select(col("id"), col("payload"))
      .coalesce(1).sort(col("id"))
      .write.mode("overwrite").parquet(s"$out/audio.parquet")
    Multimodal.audioIntFeatures(mediaDs).toDF()
      .coalesce(1).sort(col("id"), col("d"))
      .write.mode("overwrite").parquet(s"$out/audio_features.parquet")
    val n = spark.read.parquet(s"$out/audio.parquet").count()
    val nf = spark.read.parquet(s"$out/audio_features.parquet").count()
    println(s"[gen-audio-fixture] wrote $n clips, $nf feature rows to $out")
    spark.stop()
  }
}
