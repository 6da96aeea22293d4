package graft

import graft.multimodal.{Media, Multimodal}
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

  test("features flow back into DataFrame surface for downstream joins") {
    val feats = Multimodal.extractFeatures(media).toDF()
    val joined = feats.join(
      Tables.load(spark, sf0001, "documents"),
      feats("id") === col("doc_id"))
    assert(joined.count() === 500)
  }
}
