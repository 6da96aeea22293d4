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

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over `binary` payload columns.
  *
  * The heavy stages run as `mapPartitions` over typed Datasets — the
  * Scala analog of `mapInPandas`: per-partition batch iteration, so a
  * real decoder would amortize codec/model initialization once per
  * partition (see `decoderInit` below), and Spark streams partitions
  * without materializing them.
  *
  * ======================= STUB BOUNDARY =======================
  * This container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake: a normalized byte histogram stands in for
  * pixel features, and payload length stands in for decoded
  * dimensions. Swapping in a real codec changes ONLY the marked
  * function bodies — schema, partitioning, batch shape, and the
  * pipeline wiring are real and tested (MultimodalSpec).
  * =============================================================
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
