package graft.tools

import graft.multimodal.{Media, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the q156 image fixtures (spec-pinned run):
  *
  *   fixtures/images.parquet          (id, payload)  — 240 PNGs
  *   fixtures/image_features.parquet  (id, d, v)     — their integer
  *                                    features via the SAME
  *                                    Multimodal.imageIntFeatures the
  *                                    live gate path runs
  *
  * Drawing is fully deterministic from splitmix64(group): each group
  * g yields a pair (2g, 2g+1) — same background/rectangle/stripe
  * composition, the odd image's rectangle shifted one pixel (a true
  * near-dup: features move by a few pixels' worth). Distinct groups
  * get independent colors/geometry. PNG is lossless and
  * javax.imageio decode is pixel-deterministic, so the checked-in
  * feature table replays bit-exactly from the checked-in images
  * (MultimodalSpec pins it).
  *
  *   sbt "Test/runMain graft.tools.GenImageFixture"
  */
object GenImageFixture {

  val NumImages = 240

  /** The drawing moved to main scope in round 10 (q164 shares it):
    * [[graft.multimodal.ImageGen.drawPair]] is byte-identical to the
    * round-9 in-file version — the odd image's rectangle one pixel
    * WIDER (a shift would leave every pixel count, hence every
    * feature, identical; the size change is a true near-dup
    * perturbation). MultimodalSpec's fixture-parity test pins the
    * checked-in parquet against this function. */
  def drawPng(id: Long): Array[Byte] =
    graft.multimodal.ImageGen.drawPair(id)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/fixtures")
    val spark = SparkSession.builder().master("local[4]")
      .appName("gen-image-fixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val media = (0L until NumImages.toLong)
      .map(id => Media(id, "image/png", drawPng(id), Map.empty))
    val mediaDs = media.toDS().repartition(4)
    mediaDs.select(col("id"), col("payload"))
      .coalesce(1).sort(col("id"))
      .write.mode("overwrite").parquet(s"$out/images.parquet")
    Multimodal.imageIntFeatures(mediaDs).toDF()
      .coalesce(1).sort(col("id"), col("d"))
      .write.mode("overwrite").parquet(s"$out/image_features.parquet")
    val n = spark.read.parquet(s"$out/images.parquet").count()
    val nf = spark.read.parquet(s"$out/image_features.parquet").count()
    println(s"[gen-image-fixture] wrote $n images, $nf feature rows to $out")
    spark.stop()
  }
}
