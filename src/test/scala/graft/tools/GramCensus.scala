package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r15 optimization round, verdict item 6): skew census of
  * the span-scrub gram key distribution — is the repeated-gram
  * exchange (q97/q99/q104/q143/q153) skew-bound? Reports total window
  * occurrences, distinct grams, the top-20 gram occurrence counts,
  * and the max-key share, at a given sf dir. Guide §2.5: a salted
  * two-level aggregate only pays when one key owns a large share of
  * the shuffle. Usage:
  *   Test/runMain graft.tools.GramCensus /root/testdata/sf0.1 [cpus]
  */
object GramCensus {
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

    import graft.functions.{NGrams, Text}
    val w = graft.operators.RepeatedSpans.W
    val docs = graft.Tables.load(spark, dir, "documents")
    val win = docs.select(col("doc_id"),
        posexplode(NGrams.wordNGramsAll(Text.tokens(col("text")), w)))
      .select(col("doc_id"), col("col").as("g"))
    val occ = win.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .localCheckpoint(true)
    val tot = occ.agg(sum(col("occ")).as("n"), count(lit(1)).as("d"),
      max(col("occ")).as("mx")).head
    val (n, d, mx) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    println(s"[census] window occurrences total = $n, distinct grams = $d")
    println(f"[census] max gram occ = $mx (share ${100.0 * mx / n}%.3f%% of shuffle rows)")
    val top = occ.orderBy(col("occ").desc).limit(20).collect()
    top.zipWithIndex.foreach { case (r, i) =>
      println(f"[census] top${i + 1}%-3d occ=${r.getLong(1)}%8d  g='${r.getString(0).take(60)}'")
    }
    val repeated = occ.filter(col("occ") >= 2)
      .agg(count(lit(1)).as("k"), sum(col("occ")).as("rows")).head
    println(s"[census] repeated grams = ${repeated.getLong(0)}, their occurrences = ${repeated.getLong(1)}")
    // reduce-side rows per gram after map-side partial aggregation are
    // bounded by the map task count; report it for the count exchange
    println(s"[census] scan partitions (map tasks) = ${win.rdd.getNumPartitions}")
    spark.stop()
  }
}
