package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{AutoConfig, RepeatedSpans, TextAnalysis}

/** Dev tool: print the v8 auto_banding calibration per sf dir — the
  * sampled q180 frontier table, the q192 selection the compiled q194
  * dedup stage will be built with, and the near-dup-signal survival
  * through the prep stages (the round-13 finding that fixed v8's
  * stage ORDER: raw truth 25/256 pairs at sf0.01/sf0.1, but 0 after
  * the span scrub and 0 after the quality clean — dedup must run
  * FIRST on this corpus or it tunes nothing). */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
    dirs.foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents")
      val scrubbed = RepeatedSpans.scrubKeep(docs).localCheckpoint(true)
      val cleaned = TextAnalysis.cleanKeep(scrubbed).localCheckpoint(true)
      println(s"[calib] $dir J>=0.5 truth: " +
        s"raw=${graft.operators.Dedup.jaccardPairs(docs).count()} " +
        s"scrubbed=${graft.operators.Dedup.jaccardPairs(scrubbed).count()} " +
        s"cleaned=${graft.operators.Dedup.jaccardPairs(cleaned).count()}")
      graft.operators.Dedup.minhashFrontier(docs.filter(
          org.apache.spark.sql.functions
            .expr(s"doc_id % ${AutoConfig.CalibSampleMod} = 0")))
        .collect().foreach(r => println(s"[calib]   sampled-frontier $r"))
      println(s"[calib] $dir v8 selection -> " +
        s"${AutoConfig.sampledBandingChoice(docs).head}")
    }
    spark.stop()
  }
}
