package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool (r14 optimization round): stage-by-stage wall timing of
  * the scaled media kernels at a given sf dir — isolates synth+decode
  * vs chunking vs candidate join vs verify so optimization effort
  * lands where the time is (guide §1.1). Usage:
  *   Test/runMain graft.tools.MediaProfile /root/testdata/sf0.1 [cpus]
  */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.operators._
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count() // warm footer caches

    // image chain, stage by stage (the q164 shape)
    val feats = t("img synth+decode+feat") {
      graft.multimodal.Multimodal
        .imageIntFeatures(ImageDedup.scaledImagesFrom(docs)).toDF()
        .localCheckpoint(true)
    }
    val chunks = t("img chunksOf") {
      ImageDedup.chunksOf(feats, ImageDedup.PlaneCoef, ImageDedup.Center)
        .localCheckpoint(true)
    }
    val cand = t("img cand join+distinct") {
      chunks.as("a").join(chunks.as("b"),
          col("a.chunk_id") === col("b.chunk_id") &&
            col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct().localCheckpoint(true)
    }
    println(s"[profile] cand rows = ${cand.count()}")
    t("img full q164 noop") {
      ImageDedup.scaledNearDupsFrom(docs)
        .write.mode("overwrite").format("noop").save()
    }
    t("audio full q171 noop") {
      AudioDedup.scaledNearDupsFrom(docs)
        .write.mode("overwrite").format("noop").save()
    }
    t("video full q173 noop") {
      VideoDedup.scaledNearDupsFrom(docs)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}

/** Dump the COMPOSED (materialize=false) kernel plan — the shipped
  * query checkpoints collapse the visible plan, so the plans/r14
  * after-evidence uses this builder variant (the PlanShapeSpec view). */
object MediaPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("===== q164 composed kernel plan (materialize=false) =====")
    println(graft.operators.ImageDedup
      .scaledImageNearDups(spark, "/root/testdata/sf0.001", materialize = false)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println("===== q178 composed ingest plan (materialize=false) =====")
    println(graft.operators.ImageDedup
      .imageIncremental(spark, "/root/testdata/sf0.001", materialize = false)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
