package graft.cli

import graft.config.ConfigTree
import graft.output.Sinks
import graft.pipeline.{AnalysisRunner, TransformRegistry}
import graft.registry.AnalysisRegistry
import graft.run.RunObservability
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The `cosmap run <config.json>` entry point
  * (/root/reference/src/cosmap/entrypoint.py:46-60 →
  * /root/reference/src/cosmap/api/cmds.py:20-47), end to end:
  * registry lookup of `base-analysis`, config merge, sampler, cone
  * join, compiled DAG, append sink, progress + count accounting.
  *
  * Usage: RunAnalysis <runConfig.json> <catalogParquet> [registryDir]
  * The run config's "output" key names the sink path; "write_format"
  * under output_parameters picks the writer (csv default).
  */
object RunAnalysis {

  /** Testable core: returns (output DataFrame, rows written).
    * Accepts `.json` or `.toml` run configs (cmds.py:21-29 parity —
    * dispatch in ConfigTree.parseFile). */
  def execute(spark: SparkSession, runConfigPath: String,
              catalogPath: String, registryDir: String,
              registry: TransformRegistry): (DataFrame, Long) = {
    val runConfig = ConfigTree.parseFile(Paths.get(runConfigPath))
    val analysisName = runConfig.get("base-analysis").map(_.toString)
      .getOrElse(throw new IllegalArgumentException(
        "run config missing 'base-analysis'"))
    val reg = new AnalysisRegistry(Paths.get(registryDir))
    val dir = reg.locate(analysisName)
    val defaults =
      if (Files.exists(dir.resolve("parameters.json")))
        Files.readString(dir.resolve("parameters.json"))
      else "{}"
    val transformations = Files.readString(dir.resolve("transformations.json"))

    val progress = RunObservability.attachProgress(spark)
    try {
      val catalog = spark.read.parquet(catalogPath)
      val out = AnalysisRunner.runParsed(spark, runConfig,
        ConfigTree.parse(defaults), transformations, registry, catalog,
        useBandJoin = false, plugins = graft.pipeline.PluginManager.empty)
      val expected = AnalysisRunner.parseSampling(
        AnalysisRunner.effectiveConfig(runConfig, ConfigTree.parse(defaults)))
        .nSamples
      // cache before write + count: otherwise the whole analysis plan
      // executes twice, and the counted result is a recomputation that
      // could diverge from what was written (round-1 advice)
      out.persist()
      try {
        runConfig.get("output").map(_.toString) match {
          case Some(path) =>
            val fmt = ConfigTree.getPath(runConfig, "output_parameters.write_format")
              .map(_.toString).getOrElse("csv")
            Sinks.write(out, path, fmt)
          case None => ()
        }
        val n = RunObservability.expectCount(out, expected)
        (out, n)
      } finally out.unpersist()
    } finally spark.sparkContext.removeSparkListener(progress)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunAnalysis <runConfig.json> <catalogParquet> [registryDir]")
    val registryDir = if (args.length > 2) args(2)
      else sys.props("user.home") + "/.graft/analyses"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-run")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, n) = execute(spark, args(0), args(1), registryDir,
      graft.cli.StandardTransforms.registry)
    Console.err.println(s"[graft.run] analysis complete: $n samples")
    spark.stop()
  }
}

/** The quickstart analysis' transforms, registered under the names
  * its transformations.json uses (README.md:82-103 semantics,
  * vectorized: per-sample loops become grouped aggregation). */
object StandardTransforms {
  import org.apache.spark.sql.functions._

  val registry: TransformRegistry = TransformRegistry(
    "compute_distances" -> graft.pipeline.Transform { args =>
      args("catalog").asInstanceOf[DataFrame]
        .withColumn("distances_arcsec", col("sep_deg") * 3600.0)
    },
    "compute_result" -> graft.pipeline.Transform { args =>
      val catalog = args("catalog").asInstanceOf[DataFrame]
      val samples = args("samples").asInstanceOf[DataFrame]
      val minRadiusArcsec =
        ConfigTree.parseQuantityDeg(args("min_radius")) * 3600.0
      val agg = catalog
        .filter(col("distances_arcsec") > minRadiusArcsec)
        .groupBy(col("sample_id"))
        .agg(count(lit(1)).as("n"),
          // milli-arcsec quantization matches quickstartAggregate
          sum(round(col("distances_arcsec"), 3).cast("decimal(28,3)"))
            .cast("double").as("inv"))
      samples.select(col("sample_id"), col("ra"), col("dec"))
        .join(agg, Seq("sample_id"), "left")
        .select(col("sample_id"), col("ra"), col("dec"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("inv"), lit(0.0)).as("inv"))
    })
}
