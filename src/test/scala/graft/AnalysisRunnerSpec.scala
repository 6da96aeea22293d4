package graft

import graft.config.ConfigTree
import graft.output.Sinks
import graft.pipeline._
import org.apache.spark.sql.functions._

/** End-to-end parity: the README quickstart
  * (/root/reference/README.md:55-174) expressed as run-config JSON +
  * transformations JSON + two registered transforms, executed by
  * AnalysisRunner — and required to equal the hand-built native
  * pipeline (q33) row for row. */
class AnalysisRunnerSpec extends SparkSpec {

  private val runConfig =
    """{
      |  "base-analysis": "quickstart",
      |  "threads": 4,
      |  "sampling_parameters": {
      |    "region_type": "Rectangle",
      |    "region_bounds": {"value": [31.0, -11.0, 38, -4], "units": "degree"},
      |    "sample_type": "Random",
      |    "n_samples": 1000,
      |    "seed": 42
      |  },
      |  "radius": {"value": 2, "units": "arcmin"},
      |  "min_radius": {"value": 5, "units": "arcsec"}
      |}""".stripMargin

  private val analysisDefaults =
    """{
      |  "sampling_parameters": {
      |    "sample_shape": "Circle",
      |    "sample_dimensions": "@Main.radius"
      |  },
      |  "output_parameters": {
      |    "output_formats": "dataframe",
      |    "write_format": "csv"
      |  }
      |}""".stripMargin

  private val transformations =
    """{
      |  "Main": {
      |    "compute_distances": {
      |      "needed-data": ["catalog"]
      |    },
      |    "compute_result": {
      |      "dependencies": {"compute_distances": "catalog"},
      |      "needed-data": ["samples"],
      |      "needed-parameters": ["Main.min_radius"],
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  private val registry = TransformRegistry(
    "compute_distances" -> Transform { args =>
      args("catalog").asInstanceOf[org.apache.spark.sql.DataFrame]
        .withColumn("distances_arcsec", col("sep_deg") * 3600.0)
    },
    "compute_result" -> Transform { args =>
      val catalog = args("catalog").asInstanceOf[org.apache.spark.sql.DataFrame]
      val samples = args("samples").asInstanceOf[org.apache.spark.sql.DataFrame]
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

  private def catalog = Tables.load(spark, sf0001, "lineitem").select(
    col("l_orderkey").as("object_id"),
    (lit(31.0) + (col("l_orderkey") % 7000).cast("double") / 1000.0).as("ra"),
    (lit(-11.0) + (col("l_partkey") % 7000).cast("double") / 1000.0).as("dec"))

  test("quickstart config+spec pipeline equals the native q33 pipeline exactly") {
    val declared = AnalysisRunner.run(spark, runConfig, analysisDefaults,
      transformations, registry, catalog)
      .orderBy("sample_id").collect()
    // compare against the RAW pipeline (no display rounding) so the
    // parity check stays bit-strength; the q33 gate query is this
    // plus round-6 on dec for cross-engine oracle determinism
    val native = graft.operators.CosmapDomain.quickstartRaw(spark, sf0001)
      .orderBy("sample_id").collect()
    assert(declared.length === 1000)
    assert(declared.sameElements(native))
  }

  test("band-join execution of the same analysis gives identical results") {
    val broadcastPlan = AnalysisRunner.run(spark, runConfig, analysisDefaults,
      transformations, registry, catalog).orderBy("sample_id").collect()
    val bandPlan = AnalysisRunner.run(spark, runConfig, analysisDefaults,
      transformations, registry, catalog, useBandJoin = true)
      .orderBy("sample_id").collect()
    assert(bandPlan.sameElements(broadcastPlan))
  }

  test("non-Circle/Rectangle sample shape is a hard error (task.py:76-77)") {
    val badDefaults = analysisDefaults.replace("\"Circle\"", "\"Square\"")
    val e = intercept[DagCompiler.PipelineError] {
      AnalysisRunner.run(spark, runConfig, badDefaults, transformations,
        registry, catalog)
    }
    assert(e.getMessage.contains("Square"))
  }

  test("Rectangle sample shape runs the same analysis end-to-end (beyond the reference)") {
    val rectDefaults = analysisDefaults.replace("\"Circle\"", "\"Rectangle\"")
    val rectConfig = runConfig.replace(
      """"radius": {"value": 2, "units": "arcmin"}""",
      """"radius": {"value": [4, 2], "units": "arcmin"}""")
    val out = AnalysisRunner.run(spark, rectConfig, rectDefaults,
      transformations, registry, catalog).orderBy("sample_id").collect()
    assert(out.length === 1000)
    // per-sample aggregation ran on rectangle contents: some samples
    // see objects, every sample emits a row
    assert(out.map(_.getLong(3)).sum > 0)
    // band plan ≡ broadcast plan for rectangles too
    val band = AnalysisRunner.run(spark, rectConfig, rectDefaults,
      transformations, registry, catalog, useBandJoin = true)
      .orderBy("sample_id").collect()
    assert(band.sameElements(out))
  }

  test("run config overrides analysis defaults right-biased") {
    val cfg = AnalysisRunner.effectiveConfig(
      ConfigTree.parse(runConfig), ConfigTree.parse(analysisDefaults))
    // @Main.radius resolved through the merged tree: 2 arcmin
    val dims = ConfigTree.getPath(cfg, "sampling_parameters.sample_dimensions").get
    assert(ConfigTree.parseQuantityDeg(dims) === 2.0 / 60.0)
  }

  test("appendCsv: header only on create, rows accumulate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toFile
    dir.delete()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.appendCsv(df, dir.getAbsolutePath, singleFile = true)
    Sinks.appendCsv(df, dir.getAbsolutePath, singleFile = true)
    val back = spark.read.option("header", "true").csv(dir.getAbsolutePath)
    // 4 data rows; second write must not add a header row
    assert(back.count() === 4)
    assert(back.columns.toSeq === Seq("id", "v"))
  }

  test("Sinks.write honors SaveMode for csv (overwrite no longer silently appends)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcsvmode").toFile
    dir.delete()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.write(df, dir.getAbsolutePath, "csv") // append (default)
    Sinks.write(df, dir.getAbsolutePath, "csv") // append again -> 4 rows
    assert(spark.read.option("header", "true")
      .csv(dir.getAbsolutePath).count() === 4)
    Sinks.write(df, dir.getAbsolutePath, "csv",
      org.apache.spark.sql.SaveMode.Overwrite) // replaces, not accumulates
    assert(spark.read.option("header", "true")
      .csv(dir.getAbsolutePath).count() === 2)
  }

  test("multiSink routes column subsets to separate destinations") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graftsink").toFile
    val df = Seq((1L, "x", 3.0)).toDF("id", "name", "score")
    Sinks.multiSink(df, Map(
      "ids" -> (Seq("id", "name"), s"$base/ids", "parquet"),
      "scores" -> (Seq("id", "score"), s"$base/scores", "parquet")))
    assert(spark.read.parquet(s"$base/ids").columns.toSeq === Seq("id", "name"))
    assert(spark.read.parquet(s"$base/scores").columns.toSeq === Seq("id", "score"))
  }
}

/** Demand-driven data pruning: an analysis whose DAG never declares
  * needed-data "catalog" must not execute the cone join at all
  * (analysis.py:71-77 semantics). */
class DemandPruningSpec extends SparkSpec {
  test("samples-only analysis never touches the catalog") {
    val transformations =
      """{"Main": {
        |  "count_samples": {
        |    "needed-data": ["samples"],
        |    "is-output": true}}}""".stripMargin
    val registry = graft.pipeline.TransformRegistry(
      "count_samples" -> graft.pipeline.Transform { args =>
        assert(!args.contains("catalog"))
        args("samples").asInstanceOf[org.apache.spark.sql.DataFrame]
          .groupBy().count().withColumnRenamed("count", "n_samples")
      })
    // a catalog whose read would throw if ever executed
    val poisonCatalog = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey as object_id",
        "assert_true(false) as ra", "1.0 as dec")
    val out = graft.pipeline.AnalysisRunner.run(spark,
      """{"sampling_parameters": {
        |  "region_bounds": {"value": [31.0, -11.0, 38, -4], "units": "degree"},
        |  "n_samples": 50, "seed": 1},
        | "radius": {"value": 2, "units": "arcmin"}}""".stripMargin,
      """{"sampling_parameters": {"sample_shape": "Circle",
        |  "sample_dimensions": "@Main.radius"}}""".stripMargin,
      transformations, registry, poisonCatalog)
    assert(out.head().getLong(0) === 50L)
  }
}
