package graft.pipeline

import graft.config.ConfigTree.Tree
import graft.pipeline.AnalysisRunner.SamplingParams
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Replaceable hook surface for the analysis runner, mirroring the
  * reference's pluggy specs
  * (/root/reference/src/cosmap/analysis/plugins.py:8-45) and registry
  * semantics (/root/reference/src/cosmap/plugins/manage.py:19-58):
  * a fixed set of named hook slots, each marked unique; registering
  * into an occupied unique slot WARNS and overwrites (last wins,
  * manage.py:33-38); registering an unknown name is an error; and
  * requesting a slot with no implementation is an error.
  *
  * The three reference hooks, re-typed for the Spark execution model
  * (each `firstresult=True` in the reference → exactly one active
  * implementation here):
  *  - `generate_samples`: replace the sample draw — returns the
  *    samples DataFrame (ref: returns the sample list).
  *  - `initialize_sampler`: adjust sampling state from the full
  *    parameter block before sampling (ref: mutates the sampler
  *    object; here: SamplingParams → SamplingParams, pure).
  *  - `generate_tasks`: replace per-sample task generation — given
  *    (catalog, samples, params) produce the per-sample joined
  *    catalog the Main DAG consumes (ref: emits scheduler tasks; the
  *    Spark analog of "the tasks" is the joined distributed plan).
  */
final class PluginSlot[A] private[pipeline] (val name: String, val unique: Boolean) {
  override def toString: String = s"PluginSlot($name)"
}

final case class GraftPluginException(msg: String) extends RuntimeException(msg)

object PluginSlots {
  val GenerateSamples =
    new PluginSlot[(SparkSession, SamplingParams) => DataFrame]("generate_samples", unique = true)
  val InitializeSampler =
    new PluginSlot[(SamplingParams, Tree) => SamplingParams]("initialize_sampler", unique = true)
  val GenerateTasks =
    new PluginSlot[(DataFrame, DataFrame, SamplingParams) => DataFrame]("generate_tasks", unique = true)

  val all: Map[String, PluginSlot[_]] =
    Seq(GenerateSamples, InitializeSampler, GenerateTasks).map(s => s.name -> s).toMap
}

/** Mutable hook registry (one per run context). */
final class PluginManager(warn: String => Unit =
    m => Console.err.println(s"[graft.plugins] WARN: $m")) {

  private val impls = scala.collection.mutable.Map.empty[String, Any]
  private val warningsBuf = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Register an implementation for a slot; unique-slot last-wins
    * with a warning (manage.py:33-38). */
  def register[A](slot: PluginSlot[A], impl: A): Unit = {
    if (slot.unique && impls.contains(slot.name)) {
      val msg = s"Plugin `${slot.name}` is already registered!" +
        " The new plugin will overwrite the old one!"
      warningsBuf += msg
      warn(msg)
    }
    impls(slot.name) = impl
  }

  /** Register a name→impl bundle (the analog of the reference's
    * `register_plugins(plugins_object)` attribute scan): every name
    * must be a known slot (manage.py:29-32). Implementations are
    * cast to the slot's function type at call site. */
  def registerAll(bundle: Map[String, Any]): Unit =
    bundle.foreach { case (name, impl) =>
      val slot = PluginSlots.all.getOrElse(name,
        throw GraftPluginException(s"Plugin `$name` is not a valid graft plugin!"))
      register(slot.asInstanceOf[PluginSlot[Any]], impl)
    }

  def get[A](slot: PluginSlot[A]): Option[A] =
    impls.get(slot.name).map(_.asInstanceOf[A])

  /** Fetch a required hook (manage.py:47-58 `request`). */
  def request[A](slot: PluginSlot[A]): A =
    get(slot).getOrElse(throw GraftPluginException(
      s"Plugin '${slot.name}' has no hook implementations!"))

  /** Warnings emitted so far (observable unique-slot overwrites). */
  def warnings: Seq[String] = warningsBuf.toSeq
}

object PluginManager {
  /** An empty manager: every hook falls back to the built-in path. */
  def empty: PluginManager = new PluginManager()
}
