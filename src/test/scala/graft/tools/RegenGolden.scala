package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates src/test/resources/golden_q33_sf0001.csv from the RAW
  * quickstart pipeline (CosmapDomain.quickstartRaw) — run after any
  * intentional change to the sampler hash / frame math / aggregate,
  * then eyeball the diff before committing (FIXTURES.md §B).
  *
  *   sbt "Test/runMain graft.tools.RegenGolden"
  */
object RegenGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.operators.CosmapDomain
      .quickstartRaw(spark, "/root/testdata/sf0.001")
      .orderBy("sample_id").collect()
    val sb = new StringBuilder("sample_id,ra,dec,n,inv\n")
    rows.foreach { r =>
      sb.append(r.getLong(0)).append(',').append(r.getDouble(1)).append(',')
        .append(r.getDouble(2)).append(',').append(r.getLong(3)).append(',')
        .append(r.getDouble(4)).append('\n')
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("src/test/resources/golden_q33_sf0001.csv"),
      sb.toString)
    println(s"[regen-golden] wrote ${rows.length} rows")
    spark.stop()
  }
}
