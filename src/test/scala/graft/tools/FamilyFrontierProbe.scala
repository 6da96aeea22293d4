package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupQuality}

/** Dev tool: the measurements behind the q197 cross-family dedup
  * frontier design — per sf dir:
  *   1. RAW-corpus candidate cost per family: exact prefix-filtered
  *      candidates (the q44 chain's scan volume), MinHash b16r4
  *      bucket-collision candidates (the q180 knee row), SimHash
  *      64/128 chunk-collision candidates (the q182 cost column);
  *   2. PLANTED-corpus quality (the q193 census): cluster-pair
  *      precision/recall per family;
  *   3. PLANTED-corpus candidate costs (the alternative cost axis).
  */
object FamilyFrontierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01").map("/root/testdata/" + _)
    dirs.foreach { dir =>
      val d = graft.Tables.load(spark, dir, "documents")
      def costs(tag: String, c: org.apache.spark.sql.DataFrame): Unit = {
        val exact = Dedup.jaccardCandidates(c).count()
        val mh = graft.dedup.MinHashLSH.candidatePairs(
          graft.dedup.MinHashLSH.bandBuckets(c, "doc_id", "text", 64, 16, 3))
          .count()
        val s64 = Dedup.simhashPairs(c).count()
        val s128 = Dedup.simhashPairsWide(c).count()
        println(s"[fam] $dir $tag exactCand=$exact b16r4Cand=$mh " +
          s"sim64Cand=$s64 sim128Cand=$s128")
      }
      costs("raw", d)
      val planted = DedupQuality.plantedVariants(d).localCheckpoint(true)
      costs("planted", planted)
      DedupQuality.qualityTable(d).collect().foreach { r =>
        println(s"[fam] $dir quality ${r.mkString(" ")}")
      }
    }
    spark.stop()
  }
}
