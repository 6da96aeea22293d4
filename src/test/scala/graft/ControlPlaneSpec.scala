package graft

import graft.config.ConfigTree
import graft.registry.AnalysisRegistry
import graft.run.RunObservability
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ControlPlaneSpec extends SparkSpec {

  private def mkAnalysis(transforms: String, params: Option[String]): java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_an")
    Files.writeString(dir.resolve("transformations.json"), transforms)
    params.foreach(p => Files.writeString(dir.resolve("parameters.json"), p))
    dir
  }

  test("registry: install/list/locate/uninstall; duplicate and missing-file errors") {
    val root = Files.createTempDirectory("graft_reg")
    val reg = new AnalysisRegistry(root)
    val a = mkAnalysis("""{"Main": {}}""", Some("""{"name": "quickstart"}"""))
    assert(reg.install(a) === "quickstart") // name from parameters.json
    assert(reg.list() === Seq("quickstart"))
    assert(reg.locate("quickstart") === a.toAbsolutePath)
    // duplicate
    intercept[IllegalArgumentException](reg.install(a))
    // missing required file
    val bad = Files.createTempDirectory("graft_bad")
    intercept[IllegalArgumentException](reg.install(bad))
    // broken JSON fails at install (stronger than reference)
    val broken = mkAnalysis("""{"Main": """, None)
    intercept[Exception](reg.install(broken))
    reg.uninstall("quickstart")
    assert(reg.list().isEmpty)
    intercept[IllegalArgumentException](reg.uninstall("quickstart"))
  }

  test("registry: name falls back to folder name; variant overlay merges right-biased") {
    val root = Files.createTempDirectory("graft_reg2")
    val reg = new AnalysisRegistry(root)
    val base = mkAnalysis(
      """{"Main": {"a": {"is-output": true}}}""",
      Some("""{"radius": 1.0, "nested": {"x": 1, "y": 2}}"""))
    val name = reg.install(base)
    assert(name === base.getFileName.toString)

    val variant = Files.createTempDirectory("graft_var")
    Files.writeString(variant.resolve("parameters.json"),
      """{"nested": {"y": 99}, "extra": true}""")
    val (params, transforms) = reg.loadVariant(name, variant)
    assert(ConfigTree.getPath(params, "nested.y") === Some(99L))
    assert(ConfigTree.getPath(params, "nested.x") === Some(1L))
    assert(params("radius") === 1.0)
    assert(params("extra") === true)
    assert(transforms.contains("Main")) // untouched by variant
  }

  test("validSplit: null-safe predicate split, nothing lost") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (3L, null)).toDF("id", "v")
    val (good, bad) = RunObservability.validSplit(df, col("v") > 0)
    assert(good.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(bad.select("id").collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("expectCount warns on mismatch but does not fail") {
    import spark.implicits._
    var warned: Option[String] = None
    val n = RunObservability.expectCount(
      Seq(1, 2, 3).toDF("x"), expected = 5, warn = m => warned = Some(m))
    assert(n === 3)
    assert(warned.exists(_.contains("expected 5")))
    warned = None
    RunObservability.expectCount(Seq(1).toDF("x"), 1, m => warned = Some(m))
    assert(warned.isEmpty)
  }

  test("progress listener observes task and stage completions") {
    val logs = new scala.collection.mutable.ArrayBuffer[String]
    val l = RunObservability.attachProgress(spark, m => logs.synchronized { logs += m })
    try {
      Tables.load(spark, sf0001, "lineitem").groupBy("l_returnflag").count().collect()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (l.tasksCompleted.get() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(l.tasksCompleted.get() > 0)
      assert(logs.exists(_.contains("stage")))
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
