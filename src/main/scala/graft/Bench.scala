package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on
  * SPARK_GRAFT_SF_DIR, forcing full plan execution through the noop
  * sink (a `count()` would let Catalyst prune projection work), and
  * prints ONE JSON line with per-query wall seconds.
  *
  * Session config mirrors the 100 TB posture scaled to one node:
  * AQE on (runtime re-planning, skew joins, coalesced shuffle
  * partitions), shuffle partitions = cores (not the 200 default).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // queries that persist intermediates (q44 family) are scoped to
      // their own action: drop the cache so no cached relation
      // outlives its query and later queries aren't cross-subsidized
      spark.sharedState.cacheManager.clearCache()
      sec
    }

    // warmup: JIT + codegen + parquet footer caches
    execute("q01_agg")
    execute("q04_join_multi_broadcast")

    // optional arg: comma-separated query-name filter (local iteration)
    val names = args.headOption match {
      case Some(f) => f.split(',').toSeq.filter(SparkEntry.queries.contains)
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // best-of-2: the environment is shared/noisy; min wall time is
    // the standard robust estimator of a query's actual cost
    val results = names.map { n =>
      val a = execute(n); val b = execute(n)
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
