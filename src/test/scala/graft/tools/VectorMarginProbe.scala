package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.{Centroids94, Similarity, VectorQuality}

/** Dev tool: the q196 variant corpus's cross-engine stability margins
  * per sf dir — the checks that gate whether the sign-LSH and
  * cell-argmax families can be oracle-replayed over PLANTED vectors
  * (a zeroed tail changes every dot, so the base corpus's margin
  * assertions do not transfer):
  *   1. min |dot(variant, plane)| over the q87 PlanesA family;
  *   2. min (top1 − top2) cell-cosine gap vs the adaptive
  *      Centroids94 prefix;
  *   3. the planted-pair cosine spread per (j_a, j_b) class and the
  *      max ORGANIC (cross-base) cosine — locating the shipped
  *      VectorQuality.CosThreshold (0.70) in the gap. */
object VectorMarginProbe {
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
      val e = graft.Tables.load(spark, dir, "embeddings")
      val v = VectorQuality.plantedVecVariants(e).localCheckpoint(true)
      val n = v.count()
      // 1. sign margins against every PlanesA plane
      val dots = Similarity.PlanesA.map(p =>
        abs(VectorExprs.cosineFast(col("embedding"), typedlit(p))))
      val minDot = v.select(explode(array(dots: _*)).as("d"))
        .agg(min(col("d"))).head.getDouble(0)
      // 2. adaptive-cell argmax gap (top1 - top2)
      val cents = Centroids94.table.take(Similarity.adaptiveCells(n))
      val sims = array(cents.map(c =>
        VectorExprs.cosineFast(col("embedding"), typedlit(c))): _*)
      val minGap = v.select(sims.as("s"))
        .select((element_at(array_sort(col("s")), cents.length)
          - element_at(array_sort(col("s")), cents.length - 1)).as("g"))
        .agg(min(col("g"))).head.getDouble(0)
      // 3. planted vs organic cosine spread
      val ea = v.select(col("vec_id").as("a"), col("embedding").as("emb_a"))
      val eb = v.select(col("vec_id").as("b"), col("embedding").as("emb_b"))
      val pairs = ea.join(eb, col("a") < col("b"))
        .select(col("a"), col("b"),
          expr("a div 4").as("pa"), expr("b div 4").as("pb"),
          round(VectorExprs.cosineFast(col("emb_a"), col("emb_b")), 6).as("c"))
      val planted = pairs.filter(col("pa") === col("pb"))
        .agg(min(col("c")), max(col("c"))).head
      val thr = VectorQuality.CosThreshold
      val organic = pairs.filter(col("pa") =!= col("pb"))
        .agg(max(col("c")), count(when(col("c") >= thr, 1))).head
      println(s"[vmargin] $dir n=$n minPlaneDot=$minDot minCellGap=$minGap " +
        s"plantedCos=[${planted.get(0)}, ${planted.get(1)}] " +
        s"organicMax=${organic.get(0)} organic>=$thr: ${organic.get(1)}")
    }
    spark.stop()
  }
}
