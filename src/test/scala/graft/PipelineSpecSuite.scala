package graft

import graft.config.ConfigTree
import graft.pipeline._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpecSuite extends AnyFunSuite {

  private def node(name: String, deps: Map[String, String] = Map.empty,
                   isOutput: Boolean = false, needed: Seq[String] = Nil,
                   optional: Seq[String] = Nil, outputName: Option[String] = None) =
    TransformSpec(name, deps, Nil, needed, optional, isOutput, outputName, None)

  test("topoSort orders dependencies first; deterministic") {
    val specs = Seq(
      node("c", Map("b" -> "b"), isOutput = true),
      node("a"), node("b", Map("a" -> "a")))
    assert(DagCompiler.topoSort(specs).map(_.name) === Seq("a", "b", "c"))
  }

  test("cycles are rejected") {
    val specs = Seq(node("a", Map("b" -> "b")), node("b", Map("a" -> "a")))
    val e = intercept[DagCompiler.PipelineError](DagCompiler.topoSort(specs))
    assert(e.getMessage.contains("cycle"))
  }

  test("unknown dependency is rejected") {
    val e = intercept[DagCompiler.PipelineError](
      DagCompiler.topoSort(Seq(node("a", Map("ghost" -> "g")))))
    assert(e.getMessage.contains("unknown node"))
  }

  test("output node must be final (reference task.py:104-107 semantics)") {
    val notLast = Seq(
      node("a", isOutput = true), node("b", Map("a" -> "a")))
    val e = intercept[DagCompiler.PipelineError](
      DagCompiler.validateOutput(DagCompiler.topoSort(notLast)))
    assert(e.getMessage.contains("not the final node"))
    intercept[DagCompiler.PipelineError](
      DagCompiler.validateOutput(DagCompiler.topoSort(Seq(node("a"))))) // none
    val twoOutputs = Seq(node("a", isOutput = true),
      node("b", Map("a" -> "a"), isOutput = true))
    val e2 = intercept[DagCompiler.PipelineError](
      DagCompiler.validateOutput(DagCompiler.topoSort(twoOutputs)))
    assert(e2.getMessage.contains("multiple"))
  }

  test("spec↔impl agreement") {
    val specs = Seq(node("implemented"), node("missing_impl", Map("implemented" -> "x")))
    val reg = TransformRegistry("implemented" -> Transform(_ => 1))
    val e = intercept[DagCompiler.PipelineError](DagCompiler.checkSpecImpl(specs, reg))
    assert(e.getMessage.contains("missing_impl"))
  }

  test("v6 multimodal spec: parses, topo-orders, and carries the diamond over load_documents") {
    val blocks = PipelineSpec.fromJson(
      graft.operators.CorpusPipeline.specJsonV6)
    val specs = blocks("Main")
    val ordered = DagCompiler.topoSort(specs).map(_.name)
    assert(ordered.head === "load_documents")
    assert(ordered.last === "effective_mix")
    DagCompiler.validateOutput(DagCompiler.topoSort(specs))
    // the DAG's first diamond: BOTH modality branches and the merge
    // bind the same loaded table (text via scrub; image directly;
    // merge for the source map) — three consumers of one node
    val consumers = specs.filter(_.dependencies.contains("load_documents"))
    assert(consumers.map(_.name).toSet ===
      Set("scrub", "image_neardups", "image_manifest", "manifest_merge"))
    // output aliasing: image_manifest binds the table as `ids` and
    // the pair node as `pairs` (the utils.py dict-form contract)
    val im = specs.find(_.name == "image_manifest").get
    assert(im.argNameFor("load_documents") === "ids")
    assert(im.argNameFor("image_neardups") === "pairs")
    val mm = specs.find(_.name == "manifest_merge").get
    assert(mm.argNameFor("text_manifest") === "text_man")
    assert(mm.argNameFor("image_manifest") === "img_man")
  }

  test("v7 quad-modal spec: parses, topo-orders, widest diamond and five-way merge") {
    val blocks = PipelineSpec.fromJson(
      graft.operators.CorpusPipeline.specJsonV7)
    val specs = blocks("Main")
    val ordered = DagCompiler.topoSort(specs).map(_.name)
    assert(ordered.head === "load_documents")
    assert(ordered.last === "effective_mix")
    DagCompiler.validateOutput(DagCompiler.topoSort(specs))
    // the widest diamond: every media branch, the scrub, the three
    // manifest id-universes and the merge all bind load_documents
    val consumers = specs.filter(_.dependencies.contains("load_documents"))
    assert(consumers.map(_.name).toSet === Set("scrub",
      "image_neardups", "image_manifest", "audio_neardups",
      "audio_manifest", "video_neardups", "video_manifest",
      "manifest_merge_quad"))
    // the five-way merge binds every manifest under its alias
    val mm = specs.find(_.name == "manifest_merge_quad").get
    assert(mm.argNameFor("load_documents") === "docs")
    assert(mm.argNameFor("text_manifest") === "text_man")
    assert(mm.argNameFor("image_manifest") === "img_man")
    assert(mm.argNameFor("audio_manifest") === "aud_man")
    assert(mm.argNameFor("video_manifest") === "vid_man")
  }

  test("v8 auto-tuned spec: parses, topo-orders, and the dedup stage binds the measured selection") {
    val blocks = PipelineSpec.fromJson(
      graft.operators.CorpusPipeline.specJsonV8)
    val specs = blocks("Main")
    val ordered = DagCompiler.topoSort(specs).map(_.name)
    assert(ordered.head === "load_documents")
    assert(ordered.last === "chunk_out")
    DagCompiler.validateOutput(DagCompiler.topoSort(specs))
    // dedup runs FIRST: the calibration node and the dedup stage
    // BOTH bind the raw corpus — the dedup consumes the measurement
    // alongside the data (a second DAG diamond over load_documents)
    val dk = specs.find(_.name == "dedup_keep_lsh").get
    assert(dk.argNameFor("load_documents") === "df")
    assert(dk.argNameFor("auto_banding") === "sel")
    val ab = specs.find(_.name == "auto_banding").get
    assert(ab.argNameFor("load_documents") === "df")
    // scrub and clean now run on the DEDUPED state
    assert(specs.find(_.name == "scrub").get
      .argNameFor("dedup_keep_lsh") === "df")
    // auto_banding must topo-sort BEFORE the dedup stage that reads it
    assert(ordered.indexOf("auto_banding") < ordered.indexOf("dedup_keep_lsh"))
  }

  test("dependency aliasing binds outputs under the alias (utils.py:195-199)") {
    val s = node("consumer", Map("compute_radius" -> "catalog"))
    val args = DagCompiler.bindArgs(s, Map("compute_radius" -> 42), Map.empty, Map.empty, Map.empty)
    assert(args("catalog") === 42)
  }

  test("parameter binding: dotted path, bare name, 'all', optional-missing → null, required-missing → error") {
    val params: ConfigTree.Tree = Map(
      "Main" -> Map("radius" -> 2.5),
      "analysis_parameters" -> Map("min_radius" -> 0.1))
    val s = node("t", needed = Seq("Main.radius", "min_radius"), optional = Seq("absent"))
    val args = DagCompiler.bindArgs(s, Map.empty, Map.empty, params, Map.empty)
    assert(args("radius") === 2.5)
    assert(args("min_radius") === 0.1)
    assert(args("absent") == null)

    val all = node("t2", needed = Seq("all"))
    assert(DagCompiler.bindArgs(all, Map.empty, Map.empty, params, Map.empty)("parameters") === params)

    val bad = node("t3", needed = Seq("Main.nope"))
    val e = intercept[DagCompiler.PipelineError](
      DagCompiler.bindArgs(bad, Map.empty, Map.empty, params, Map.empty))
    assert(e.getMessage.contains("required parameter"))
  }

  test("extras (sample_region analog) are injected into every call (task.py:185)") {
    val s = node("t")
    val args = DagCompiler.bindArgs(s, Map.empty, Map.empty, Map.empty,
      extras = Map("sample_region" -> "CIRCLE"))
    assert(args("sample_region") === "CIRCLE")
  }

  test("setup pre-pass: sinks become parameters, output-name renames (setup.py:12-55)") {
    val specs = Seq(
      node("compute_lut", isOutput = false, outputName = Some("lut")),
      node("intermediate"),
      node("consumer", Map("intermediate" -> "x")))
    val reg = TransformRegistry(
      "compute_lut" -> Transform(_ => Seq(1, 2, 3)),
      "intermediate" -> Transform(_ => 10),
      "consumer" -> Transform(a => a("x").asInstanceOf[Int] * 2))
    val updated = DagCompiler.runSetup(specs, reg, Map.empty, Map.empty)
    // compute_lut and consumer have no downstream → sinks
    assert(ConfigTree.getPath(updated, "analysis_parameters.lut") === Some(Seq(1, 2, 3)))
    assert(ConfigTree.getPath(updated, "analysis_parameters.consumer") === Some(20))
    // intermediate has a consumer → not spliced
    assert(ConfigTree.getPath(updated, "analysis_parameters.intermediate") === None)
  }

  test("setup output-name with dotted path splices at that path (analysis.py:56-67 Main routing)") {
    val specs = Seq(node("c", outputName = Some("Main.radius")))
    val reg = TransformRegistry("c" -> Transform(_ => 7.0))
    val updated = DagCompiler.runSetup(specs, reg, Map.empty,
      Map("Main" -> Map("other" -> 1)))
    assert(ConfigTree.getPath(updated, "Main.radius") === Some(7.0))
    assert(ConfigTree.getPath(updated, "Main.other") === Some(1))
  }

  test("pipeline JSON parsing: list and dict dependency forms") {
    val blocks = PipelineSpec.fromJson(
      """{"Main": {
        |  "a": {},
        |  "b": {"dependencies": ["a"], "needed-parameters": ["Main.r"]},
        |  "c": {"dependencies": {"b": "table"}, "is-output": true}
        |}}""".stripMargin)
    val byName = blocks("Main").map(s => s.name -> s).toMap
    assert(byName("b").dependencies === Map("a" -> "a"))
    assert(byName("c").dependencies === Map("b" -> "table"))
    assert(byName("c").isOutput)
    assert(byName("b").neededParams === Seq("Main.r"))
  }
}

class ConfigTreeSuite extends AnyFunSuite {

  test("deep merge is right-biased and recursive (manage.py:335-351)") {
    val base: ConfigTree.Tree = Map("a" -> 1L, "nest" -> Map("x" -> 1L, "y" -> 2L))
    val over: ConfigTree.Tree = Map("nest" -> Map("y" -> 99L, "z" -> 3L), "b" -> 2L)
    val m = ConfigTree.deepMerge(base, over)
    assert(m("a") === 1L && m("b") === 2L)
    assert(m("nest") === Map("x" -> 1L, "y" -> 99L, "z" -> 3L))
  }

  test("@-references resolve, chain, and fail on unknown/cyclic (block.py:37-69)") {
    val t = ConfigTree.parse(
      """{"Main": {"radius": 2.5},
        | "sampling": {"sample_dimensions": "@Main.radius"},
        | "chained": "@sampling.sample_dimensions"}""".stripMargin)
    val r = ConfigTree.resolveRefs(t)
    assert(ConfigTree.getPath(r, "sampling.sample_dimensions") === Some(2.5))
    assert(r("chained") === 2.5)

    intercept[IllegalArgumentException](
      ConfigTree.resolveRefs(ConfigTree.parse("""{"x": "@no.such.path"}""")))
    intercept[IllegalArgumentException](
      ConfigTree.resolveRefs(ConfigTree.parse("""{"a": "@b", "b": "@a"}""")))
  }

  test("Quantity parses with unit normalization to degrees (sky.py:10-41)") {
    assert(ConfigTree.parseQuantityDeg(Map("value" -> 120L, "units" -> "arcmin")) === 2.0)
    assert(ConfigTree.parseQuantityDeg(Map("value" -> 7200L, "units" -> "arcsec")) === 2.0)
    assert(ConfigTree.parseQuantityDeg(Map("value" -> math.Pi, "units" -> "rad")) === 180.0)
    assert(ConfigTree.parseQuantityDeg(3.5) === 3.5)
    intercept[IllegalArgumentException](
      ConfigTree.parseQuantityDeg(Map("value" -> 1L, "units" -> "parsec")))
  }

  test("SkyCoord parses coordinate pairs with per-axis units (sky.py:44-86)") {
    assert(ConfigTree.parseSkyCoordDeg(
      Map("coordinate" -> Seq(34.5, -7.5), "units" -> Seq("deg", "deg"))) === (34.5, -7.5))
    assert(ConfigTree.parseSkyCoordDeg(
      Map("coordinate" -> Seq(60L, 30L), "units" -> "arcmin")) === (1.0, 0.5))
    intercept[IllegalArgumentException](
      ConfigTree.parseSkyCoordDeg(Map("coordinate" -> Seq(1L))))
  }

  test("TOML quickstart config parses to the identical tree as the JSON form (cmds.py:21-29)") {
    val json = ConfigTree.parse(
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
        |}""".stripMargin)
    val toml = graft.config.Toml.parse(
      """# cosmap quickstart run config, TOML form
        |"base-analysis" = "quickstart"
        |threads = 4
        |
        |[sampling_parameters]
        |region_type = "Rectangle"
        |region_bounds = { value = [31.0, -11.0, 38, -4], units = "degree" }
        |sample_type = "Random"
        |n_samples = 1_000
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
    assert(toml === json)
  }

  test("TOML parser: strings, numbers, arrays, nested/dotted tables, array-of-tables") {
    val t = graft.config.Toml.parse(
      """title = "basic \"quoted\" string"
        |lit = 'C:\no\escape'
        |neg = -17
        |hexv = 0xFF
        |big = 1e3
        |frac = 0.25
        |flag = false
        |multi = [
        |  1, 2,   # trailing comment
        |  3,
        |]
        |nested = [[1, 2], ["a"]]
        |[outer.inner]
        |x = 1
        |dotted.key = "v"
        |[[items]]
        |n = 1
        |[[items]]
        |n = 2
        |""".stripMargin)
    assert(t("title") === "basic \"quoted\" string")
    assert(t("lit") === """C:\no\escape""")
    assert(t("neg") === -17L)
    assert(t("hexv") === 255L)
    assert(t("big") === 1000.0)
    assert(t("frac") === 0.25)
    assert(t("flag") === false)
    assert(t("multi") === Seq(1L, 2L, 3L))
    assert(t("nested") === Seq(Seq(1L, 2L), Seq("a")))
    assert(ConfigTree.getPath(t, "outer.inner.x") === Some(1L))
    assert(ConfigTree.getPath(t, "outer.inner.dotted.key") === Some("v"))
    assert(t("items") === Seq(Map("n" -> 1L), Map("n" -> 2L)))
    // errors are loud
    intercept[IllegalArgumentException](graft.config.Toml.parse("k = "))
    intercept[IllegalArgumentException](graft.config.Toml.parse("k = 1\nk = 2"))
  }

  test("parseFile dispatches .json/.toml and rejects other extensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_toml")
    val j = dir.resolve("c.json"); java.nio.file.Files.writeString(j, """{"a": 1}""")
    val m = dir.resolve("c.toml"); java.nio.file.Files.writeString(m, "a = 1")
    val bad = dir.resolve("c.yaml"); java.nio.file.Files.writeString(bad, "a: 1")
    assert(ConfigTree.parseFile(j) === ConfigTree.parseFile(m))
    intercept[IllegalArgumentException](ConfigTree.parseFile(bad))
  }
}
