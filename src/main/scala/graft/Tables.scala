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

  /** Normalize `events.ts` to a microsecond TimestampType regardless
    * of how the driver generated the file. Two generations exist:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so it
    *    arrives as raw long (legacy nanosAsLong) — convert with
    *    integral division (`div`, not double `/`: an int64 epoch-nanos
    *    value overflows a double's 53-bit mantissa).
    *  - timestamp[us] (isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ — cast to TimestampType (session tz is pinned
    *    UTC everywhere, so the instant is unchanged and DuckDB reads
    *    the identical value).
    * Dispatch on the observed dtype so the same engine code runs on
    * either generation of the corpus. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df // already the canonical micro-second dtype
      case other =>
        // a new corpus generation must surface HERE at load time, not
        // downstream as oracle hash mismatches
        throw new IllegalArgumentException(
          s"events.ts arrived as unsupported dtype $other — known generations: " +
            "TIMESTAMP(NANOS) (read as long via nanosAsLong), timestamp[us] " +
            "(read as TIMESTAMP_NTZ), or TIMESTAMP; handle the new dtype in " +
            "Tables.normalizeEventTs")
    }
  }

  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Register every corpus table as a temp view so query authors can
    * use `spark.sql(...)` with the same table names the DuckDB oracle
    * sees. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
