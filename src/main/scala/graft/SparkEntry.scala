package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's registry; each
  * entry has a matching DuckDB oracle in `oracleSql` unless the
  * operator is not SQL-expressible (then the driver records a weaker
  * rows-only check).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalCore.queries, RelationalCore.oracles),
      (Analytic.queries, Analytic.oracles),
      (ScalarFns.queries, ScalarFns.oracles),
      (CosmapDomain.queries, CosmapDomain.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (MultimodalOps.queries, MultimodalOps.oracles),
      (PipelineOps.queries, PipelineOps.oracles),
      (Sessionize.queries, Sessionize.oracles),
      (AdvancedJoins.queries, AdvancedJoins.oracles),
      (ExtendedRelational.queries, ExtendedRelational.oracles),
      (CollectionFns.queries, CollectionFns.oracles),
      (ApproxAggs.queries, ApproxAggs.oracles),
      (Workloads.queries, Workloads.oracles),
      (CorpusStats.queries, CorpusStats.oracles),
      (TextModels.queries, TextModels.oracles),
      (Mixing.queries, Mixing.oracles),
      (Curation.queries, Curation.oracles),
      (GraphRank.queries, GraphRank.oracles),
      (Compression.queries, Compression.oracles),
      (DriftAudit.queries, DriftAudit.oracles),
      (CorpusPipeline.queries, CorpusPipeline.oracles),
      (RepeatedSpans.queries, RepeatedSpans.oracles),
      (BpeTrainer.queries, BpeTrainer.oracles),
      (Winnow.queries, Winnow.oracles),
      (KMeansTrain.queries, KMeansTrain.oracles),
      (Profiling.queries, Profiling.oracles),
      (DupCoverage.queries, DupCoverage.oracles),
      (LexicalStats.queries, LexicalStats.oracles),
      (Motifs.queries, Motifs.oracles),
      (Perceptron.queries, Perceptron.oracles),
      (HashedVectors.queries, HashedVectors.oracles),
      (UnigramLM.queries, UnigramLM.oracles),
      (ImageDedup.queries, ImageDedup.oracles),
      (AudioDedup.queries, AudioDedup.oracles),
      (VideoDedup.queries, VideoDedup.oracles),
      (CrossModal.queries, CrossModal.oracles),
      (AutoConfig.queries, AutoConfig.oracles),
      (DedupQuality.queries, DedupQuality.oracles),
      (VectorQuality.queries, VectorQuality.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The flagship is the round-8 north star: the modern
    * curation pipeline (scrub → clean → CCNet head-keep → SemDeDup →
    * mix → pack → chunk) compiled from a declarative pipeline spec —
    * the DAG compiler driving a two-input quality-filter chain. */
  def entry(spark: SparkSession): DataFrame =
    queries("q143_corpus_prep_v3")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
