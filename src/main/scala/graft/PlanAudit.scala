package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for representative queries so the
  * physical plans can be audited (pushdown, pruning, join strategy,
  * codegen coverage). Findings + iteration notes live in PLANS.md. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_agg", "q02_filter_project", "q04_join_multi_broadcast",
      "q13_sort_limit_topk", "q31_cone_join_agg", "q44_ngram_jaccard",
      "q45_minhash_lsh", "q47_cosine_topk", "q65_edit_distance",
      "q75_rect_join_agg", "q93_corpus_prep_pipeline",
      "q55b_owned_sketches")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
