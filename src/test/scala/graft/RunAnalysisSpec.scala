package graft

import graft.cli.{RunAnalysis, StandardTransforms}
import graft.registry.AnalysisRegistry
import java.nio.file.Files

/** End-to-end `cosmap run` lifecycle: install analysis → run config
  * → output file on disk. */
class RunAnalysisSpec extends SparkSpec {

  test("full run lifecycle: install, run, append csv output") {
    val analysisDir = Files.createTempDirectory("graft_quickstart")
    Files.writeString(analysisDir.resolve("parameters.json"),
      """{"name": "quickstart",
        | "sampling_parameters": {
        |   "sample_shape": "Circle",
        |   "sample_dimensions": "@Main.radius"}}""".stripMargin)
    Files.writeString(analysisDir.resolve("transformations.json"),
      """{"Main": {
        |  "compute_distances": {"needed-data": ["catalog"]},
        |  "compute_result": {
        |    "dependencies": {"compute_distances": "catalog"},
        |    "needed-data": ["samples"],
        |    "needed-parameters": ["Main.min_radius"],
        |    "is-output": true}}}""".stripMargin)
    val registryDir = Files.createTempDirectory("graft_reg")
    new AnalysisRegistry(registryDir).install(analysisDir)

    // synthetic catalog parquet inside the quickstart region
    val catalogPath = Files.createTempDirectory("graft_cat").resolve("cat").toString
    Tables.load(spark, sf0001, "lineitem").selectExpr(
      "l_orderkey as object_id",
      "31.0 + (l_orderkey % 7000) / 1000.0 as ra",
      "-11.0 + (l_partkey % 7000) / 1000.0 as dec")
      .write.parquet(catalogPath)

    val outPath = Files.createTempDirectory("graft_out").resolve("result.csv").toString
    val cfgPath = Files.createTempDirectory("graft_cfg").resolve("run.json")
    Files.writeString(cfgPath,
      s"""{"base-analysis": "quickstart",
         | "output": "$outPath",
         | "output_parameters": {"write_format": "csv"},
         | "sampling_parameters": {
         |   "region_bounds": {"value": [31.0, -11.0, 38, -4], "units": "degree"},
         |   "n_samples": 200, "seed": 42},
         | "radius": {"value": 2, "units": "arcmin"},
         | "min_radius": {"value": 5, "units": "arcsec"}}""".stripMargin)

    val (_, n) = RunAnalysis.execute(spark, cfgPath.toString, catalogPath,
      registryDir.toString, StandardTransforms.registry)
    assert(n === 200)
    val back = spark.read.option("header", "true").csv(outPath)
    assert(back.count() === 200)
    assert(back.columns.toSeq === Seq("sample_id", "ra", "dec", "n", "inv"))

    // the SAME run expressed as TOML (cmds.py:21-29 parity) produces
    // the identical result rows
    val tomlPath = cfgPath.getParent.resolve("run.toml")
    val outPath2 = Files.createTempDirectory("graft_out2").resolve("result.csv").toString
    Files.writeString(tomlPath,
      s"""'base-analysis' = "quickstart"
         |output = "$outPath2"
         |
         |[output_parameters]
         |write_format = "csv"
         |
         |[sampling_parameters]
         |region_bounds = { value = [31.0, -11.0, 38, -4], units = "degree" }
         |n_samples = 200
         |seed = 42
         |
         |[radius]
         |value = 2
         |units = "arcmin"
         |
         |[min_radius]
         |value = 5
         |units = "arcsec"
         |""".stripMargin)
    val (_, n2) = RunAnalysis.execute(spark, tomlPath.toString, catalogPath,
      registryDir.toString, StandardTransforms.registry)
    assert(n2 === 200)
    val backToml = spark.read.option("header", "true").csv(outPath2)
      .orderBy("sample_id").collect()
    val backJson = spark.read.option("header", "true").csv(outPath)
      .orderBy("sample_id").collect()
    assert(backToml.sameElements(backJson))
  }
}
