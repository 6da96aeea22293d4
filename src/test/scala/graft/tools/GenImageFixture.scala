package graft.tools

import graft.functions.SplitMix64Kernel
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
  val W = 32
  val H = 24

  /** Deterministic parameter stream for group g. */
  private def p(g: Long, salt: Long, mod: Int): Int = {
    val m = SplitMix64Kernel.mix(0x1336F00DL + g * 131L + salt)
    (((m % mod) + mod) % mod).toInt
  }

  def drawPng(id: Long): Array[Byte] = {
    val g = id / 2
    val shift = (id % 2).toInt // the near-dup perturbation
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(p(g, 1, 256), p(g, 2, 256), p(g, 3, 256)))
    g2.fillRect(0, 0, W, H)
    g2.setColor(new java.awt.Color(p(g, 4, 256), p(g, 5, 256), p(g, 6, 256)))
    // the odd image's rectangle is one pixel WIDER — a shift would
    // leave every pixel count (hence every feature) identical; the
    // size change moves the features by one pixel-column's worth, a
    // true small-but-nonzero perturbation
    g2.fillRect(2 + p(g, 7, W / 2), 2 + p(g, 8, H / 2),
      4 + p(g, 9, W / 4) + shift, 4 + p(g, 10, H / 4))
    g2.setColor(new java.awt.Color(p(g, 11, 256), p(g, 12, 256), p(g, 13, 256)))
    g2.fillRect(0, p(g, 14, H), W, 2)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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
