package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the Scala source for Centroids86 — the checked-in IVF
  * coarse-quantizer codebook: deterministic Lloyd's k-means (k=16,
  * 10 iterations, cosine assignment) on the first 256 embeddings of
  * the sf0.001 corpus, entries quantized to the 0.001 grid so the
  * DuckDB oracle replays the identical constants from 3-decimal
  * literals. Run after any intentional change to the training recipe
  * and paste the output over the table in Centroids86.scala:
  *
  *   sbt "Test/runMain graft.tools.RegenCentroids"        # k=16 (q86)
  *   sbt "Test/runMain graft.tools.RegenCentroids 64"     # k=64 (q94b)
  */
object RegenCentroids {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sample = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .orderBy(col("vec_id")).limit(256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    val cents = graft.functions.Vectors.kmeansCentroids(sample, k = k, iters = 10)
    val quantized = cents.map(_.map(v => math.rint(v * 1000) / 1000))
    println("  val table: Seq[Seq[Double]] = Seq(")
    quantized.foreach { c =>
      println(c.map(v => f"$v%.3f").mkString("    Seq(", ", ", "),"))
    }
    println("  )")
    spark.stop()
  }
}
