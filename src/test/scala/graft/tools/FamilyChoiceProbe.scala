package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AutoConfig, DedupQuality}

/** Dev tool: the q201 design measurement — what does the q197
  * cross-family frontier SELECT when measured on the mod-2
  * calibration slice (the q194 sampling convention), per sf dir? */
object FamilyChoiceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
    dirs.foreach { dir =>
      val d = graft.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % AutoConfig.CalibSampleMod === 0)
      val fr = AutoConfig.dedupFamilyFrontier(d)
      fr.collect().foreach(r => println(s"[fchoice] $dir row ${r.mkString(" ")}"))
      val sel = AutoConfig.selectConfig(fr,
        AutoConfig.FamilyRecallFloorPpm, AutoConfig.CandidateBudgetMax).head()
      println(s"[fchoice] $dir SELECTED ${sel.mkString(" ")}")
    }
    spark.stop()
  }
}
