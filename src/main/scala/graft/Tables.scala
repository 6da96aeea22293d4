package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. At 100 TB each of these
  * would be a partitioned parquet directory; `spark.read.parquet`
  * handles both shapes identically, so nothing here is small-scale
  * specific. Filters/projections applied by callers push down into
  * the scan (Catalyst `PushDownPredicates` + column pruning).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as raw long and convert to a
    * microsecond TimestampType with integral division (`div`, not
    * double `/` — an int64 epoch-nanos value overflows a double's
    * 53-bit mantissa). */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every corpus table as a temp view so query authors can
    * use `spark.sql(...)` with the same table names the DuckDB oracle
    * sees. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
