package graft.operators

import graft.Tables
import graft.functions.SplitMix64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus MIXING operators — the pretraining-prep steps between
  * cleaning/dedup and the trainer: stratified downsampling,
  * temperature-based source rebalancing, and deterministic
  * shard + token-budget packing. (The reference stops at per-sample
  * analysis output, /root/reference/src/cosmap/analysis/runner.py —
  * these extend the engine the same way the dedup/similarity family
  * does, per the brief's training-data-pipeline mandate.)
  *
  * All three are driven by the splitmix64 draw keyed on `doc_id`
  * ([[graft.functions.SplitMix64]]), so they are partitioning- and
  * cluster-size-independent AND replayable by the DuckDB oracle — the
  * same determinism contract as the q32/q33 sampler.
  *
  * Scale shapes:
  *  - q88 is a pure map-side filter (one scan, zero shuffles);
  *  - q89 adds only a 5-row aggregate broadcast back onto the scan;
  *  - q90 is ONE hash shuffle by shard + an in-partition sort — the
  *    shard count is the parallelism knob (16 here; 2^16 at 100 TB
  *    keeps partitions executor-sized), and packing never needs a
  *    global order, only a per-shard one.
  */
object Mixing {
  type Q = (SparkSession, String) => DataFrame

  /** q88/q89/q90/q91 draw salts — distinct streams per operator. */
  private val SaltStrat = 88L
  private val SaltTemp = 89L
  private val SaltPack = 90L
  private val SaltGroupK = 91L

  /** q88 explicit per-stratum keep rates: downsample over-represented
    * English to 50%, Chinese to 75%, keep the rest whole. The rates
    * are dyadic doubles (0.5, 0.75), exactly representable, so the
    * `<` comparison is the same boundary in both engines. */
  private val RateEn = 0.5
  private val RateZh = 0.75

  /** q90 packing parameters. */
  private val NumShards = 16
  private val TokenBudget = 512L

  /** q91 parameters: exactly K docs per language (the "k random
    * examples per domain for eval" operator), pre-pruned through B
    * buckets so no executor ever sorts a whole language. */
  private val GroupK = 20
  private val PreBuckets = 32

  /** Whitespace token count — the q40-established tokenization, kept
    * textually identical so the oracle's `string_split_regex` agrees. */
  private def nTokens = expr("CAST(size(split(text, '\\\\s+')) AS BIGINT)")

  val queries: Map[String, Q] = Map(
    // -- stratified downsampling: Bernoulli per-stratum keep with
    //    explicit target rates — the "rebalance the language mix"
    //    operator. Map-side only: the draw is a codegen'd expression
    //    on doc_id, so the filter runs inside the scan stage. --
    "q88_stratified_sample" -> { (s, dir) =>
      val u = SplitMix64.uniform(col("doc_id"), SaltStrat)
      val rate = when(col("lang") === "en", lit(RateEn))
        .when(col("lang") === "zh", lit(RateZh))
        .otherwise(lit(1.0))
      Tables.load(s, dir, "documents")
        .filter(u < rate)
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // -- temperature rebalancing (multilingual-sampling style): keep
    //    rate per language = sqrt(n_min / n_lang), i.e. temperature
    //    τ = 1/2 applied to the empirical distribution — the rarest
    //    language keeps 100%, a 4×-bigger one keeps 50%. sqrt and the
    //    long→double division are IEEE-correctly-rounded in BOTH
    //    engines, so the rate doubles are bit-identical and the
    //    comparison against the splitmix64 draw is exact — no round-6
    //    quantization needed (house determinism rules: this is the
    //    one transcendental with a cross-engine exactness guarantee). --
    "q89_temperature_mix" -> { (s, dir) =>
      temperatureKeep(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          floor(col("rate") * lit(1000000.0)).as("rate_ppm"))
    },

    // -- deterministic shard + sequence packing: every doc gets a
    //    shard (top bits of its draw) and a position in the shard's
    //    deterministic shuffle order (the draw itself); docs then fill
    //    fixed token-budget bins greedily in that order — bin =
    //    (tokens before this doc) div budget, so a doc that straddles
    //    a boundary belongs to the bin it starts in. This is the
    //    "shuffle + pack into training sequences" step; one shuffle
    //    keyed by shard, sort local to the shard. --
    "q90_shard_pack" -> { (s, dir) =>
      shardPack(Tables.load(s, dir, "documents"))
        .select("doc_id", "shard", "n_tokens", "bin")
    },
    // -- sequence-pack boundary audit: per (shard, bin) — i.e. per
    //    training sequence — how many docs START here, their token
    //    mass, how many straddle the next boundary (a doc crosses iff
    //    its start bin differs from its end bin: attention-mask /
    //    document-truncation exposure, the thing a packing config is
    //    tuned to minimize), and the spill carried into the following
    //    sequence. Pure integer arithmetic over q90's pack; the
    //    groupBy needs NO new exchange — rows are already partitioned
    //    by shard, and {shard} ⊆ {shard, bin} satisfies the clustered
    //    distribution, so the audit rides q90's single shuffle. --
    "q107_pack_audit" -> { (s, dir) =>
      shardPackFull(Tables.load(s, dir, "documents"))
        .withColumn("end_bin", expr(s"(cum - 1) div $TokenBudget"))
        .groupBy(col("shard"), col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("toks_started"),
          sum(when(col("end_bin") =!= col("bin"), 1L).otherwise(0L))
            .as("n_cross"),
          max(col("cum")).as("max_cum"))
        .withColumn("carry_out", greatest(
          col("max_cum") - (col("bin") + 1) * lit(TokenBudget), lit(0L)))
        .drop("max_cum")
    },

    // -- exact-k-per-group sampling: the K docs with the smallest
    //    draws per language — a uniform without-replacement sample of
    //    exactly min(K, n) per group, deterministic and engine-
    //    independent. TWO-PHASE so it scales: a language is one
    //    window partition, and at 100 TB a per-language sort is a
    //    single-executor scale-killer — so rank first within
    //    (lang, bucket) and keep each bucket's top K (the global
    //    per-language top K must survive: every member is top-K even
    //    within its own bucket), then rank the ≤ B·K survivors per
    //    language. The oracle states the single global ranking — same
    //    result by the superset argument, independently derived. --
    "q91_per_group_sample" -> { (s, dir) =>
      val u = SplitMix64.uniform(col("doc_id"), SaltGroupK)
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), u.as("u"),
          pmod(col("doc_id"), lit(PreBuckets)).as("bucket"))
      val wb = Window.partitionBy(col("lang"), col("bucket"))
        .orderBy(col("u"), col("doc_id"))
      val survivors = d.withColumn("rb", row_number().over(wb))
        .filter(col("rb") <= GroupK).drop("rb", "bucket")
      val wg = Window.partitionBy(col("lang")).orderBy(col("u"), col("doc_id"))
      survivors.withColumn("sample_rank", row_number().over(wg).cast("long"))
        .filter(col("sample_rank") <= GroupK)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
    },
  )

  // ---- composable stage forms (shared with the q93 pipeline) -------

  /** Temperature filter over any documents-shaped frame (needs
    * `doc_id`, `lang`), keeping the input's full rows plus `rate` —
    * q89 is this over the raw table plus the rate_ppm projection; the
    * q93 pipeline chains it after cleaning + dedup. The rate dim stays
    * a broadcast onto the scan at any input size (it has one row per
    * language). */
  private[graft] def temperatureKeep(d: DataFrame): DataFrame = {
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val nmin = counts.agg(min(col("n_lang")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_lang")))
      .select(col("lang"), col("rate"))
    val u = SplitMix64.uniform(col("doc_id"), SaltTemp)
    d.join(broadcast(rates), "lang").filter(u < col("rate"))
  }

  /** Shard + token-budget packing over any documents-shaped frame
    * (needs `doc_id`, `text`), keeping the input's full rows plus
    * (n_tokens, shard, bin). q90 projects the skinny 4-column gate
    * output (Catalyst prunes `text` out of the shard shuffle there);
    * the q93 pipeline keeps `text` aboard because the chunk stage
    * consumes it next — one shuffle moving the text once beats a
    * skinny pack plus a second full join shuffle to re-attach text. */
  private[graft] def shardPack(d: DataFrame): DataFrame =
    shardPackFull(d).drop("cum")

  /** [[shardPack]] with the running token total kept aboard — the
    * q107 audit needs each doc's end offset to see bin boundaries. */
  private[graft] def shardPackFull(d: DataFrame): DataFrame = {
    val u = SplitMix64.uniform(col("doc_id"), SaltPack)
    val t = d.withColumn("n_tokens", nTokens).withColumn("u", u)
      .withColumn("shard", floor(col("u") * NumShards).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("u"), col("doc_id"))
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $TokenBudget"))
      .drop("u")
  }

  // ---- code-generated DuckDB oracles (the q32/q33 replay playbook) --

  private def u(idExpr: String, salt: Long): String =
    SplitMix64.uniformSql(idExpr, salt)

  /** Parameterized oracle for [[temperatureKeep]] over relation
    * `src`; `select` picks the output columns (alias `d` = src rows,
    * `r` = the per-language rate). q89's oracle and the q93 composed
    * oracle both come from here, so engine and replay stay in
    * lockstep. */
  private[operators] def temperatureSql(src: String, select: String): String =
    s"""WITH tn AS (SELECT lang, count(*) AS n_lang FROM $src GROUP BY lang),
       |tm AS (SELECT min(n_lang) AS n_min FROM tn),
       |tr AS (SELECT lang, sqrt(CAST(n_min AS DOUBLE) / n_lang) AS rate FROM tn, tm)
       |SELECT $select
       |FROM $src d JOIN tr r USING (lang)
       |WHERE ${u("d.doc_id", SaltTemp)} < r.rate""".stripMargin

  /** Parameterized oracle for [[shardPack]] over relation `src`;
    * `select` picks the pass-through columns (bin is appended). */
  private[operators] def shardPackSql(src: String, select: String): String =
    s"""WITH pt AS (
       |  SELECT *,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
       |    ${u("doc_id", SaltPack)} AS u
       |  FROM $src),
       |ps AS (SELECT *, CAST(floor(u * $NumShards) AS INTEGER) AS shard FROM pt),
       |pc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY u, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM ps)
       |SELECT $select, CAST((cum - n_tokens) // $TokenBudget AS BIGINT) AS bin
       |FROM pc""".stripMargin

  val oracles: Map[String, String] = Map(
    "q88_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${u("doc_id", SaltStrat)} <
         |  (CASE lang WHEN 'en' THEN $RateEn WHEN 'zh' THEN $RateZh ELSE 1.0 END)""".stripMargin,

    "q89_temperature_mix" -> temperatureSql("documents",
      "d.doc_id, d.lang, CAST(floor(r.rate * 1000000.0) AS BIGINT) AS rate_ppm"),

    "q90_shard_pack" -> shardPackSql("documents", "doc_id, shard, n_tokens"),

    "q107_pack_audit" ->
      s"""WITH pt AS (
         |  SELECT
         |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
         |    ${u("doc_id", SaltPack)} AS u, doc_id
         |  FROM documents),
         |ps AS (SELECT *, CAST(floor(u * $NumShards) AS INTEGER) AS shard FROM pt),
         |pc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY u, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM ps),
         |pb AS (SELECT shard, (cum - n_tokens) // $TokenBudget AS bin,
         |    (cum - 1) // $TokenBudget AS end_bin, n_tokens, cum FROM pc)
         |SELECT shard, CAST(bin AS BIGINT) AS bin,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS toks_started,
         |  CAST(sum(CASE WHEN end_bin <> bin THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
         |  CAST(greatest(max(cum) - (bin + 1) * $TokenBudget, 0) AS BIGINT) AS carry_out
         |FROM pb GROUP BY shard, bin""".stripMargin,

    // the oracle ranks globally per language — deliberately NOT the
    // engine's two-phase plan, so the bucketed pre-prune is checked
    // against an independent derivation
    "q91_per_group_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, ${u("doc_id", SaltGroupK)} AS u FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS sample_rank
         |  FROM t)
         |SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
         |FROM r WHERE sample_rank <= $GroupK""".stripMargin,
  )
}
