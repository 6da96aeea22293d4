package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q192 — plan-time auto-configuration from the frontier decision
  * tables: the argmin a knee-reading human performs over the q180
  * MinHash-banding and q175 IVF tables, as a relational operator.
  *
  * The engine MEASURES every knob a dedup/ANN deployment tunes
  * (q175/q177/q180/q182, the round-12 frontier family); this closes
  * the loop — given a recall floor and a candidate budget (the two
  * numbers a deployment actually states up front), select the
  * CHEAPEST satisfying config from a frontier table. Selection is a
  * single deterministic total order, identical on both engines:
  *
  *   ORDER BY meets-constraints DESC,              -- feasible first
  *     (feasible ? candidates : 0) ASC,            -- cheapest feasible
  *     recall_ppm DESC,                            -- infeasible: max recall
  *     candidates ASC, pref ASC, config ASC        -- deterministic ties
  *
  * so when no config meets the floor the operator degrades to the
  * max-recall fallback rather than returning nothing (a planner must
  * always emit a config). `pref` is the per-family margin tie-break,
  * supplied WITH the frontier because only the family knows its own
  * safety direction:
  *   - bandings: rows_per_band ASC — at equal cost and measured
  *     recall, fewer rows per band means a higher collision
  *     probability at the operating threshold J = 0.5 (b16r4's
  *     per-pair candidate probability at the threshold is 0.645 vs
  *     b8r8's 0.031 — a 20× recall-margin difference the gate corpus
  *     cannot see because its planted pairs sit well above 0.5);
  *   - IVF: the adaptive √-ladder config first — it is the rule that
  *     scales (nprobe grows as √ncells), so at a measurement tie with
  *     a fixed-nprobe row the LADDER is the config a deployment ships.
  *
  * At the gate corpus (sf0.01) the selection IS the documented knee:
  * b16r4 (25 candidates, 100% recall; b8r8 ties on both measurements
  * and loses on margin) and ivfA_sqrt (the ≥0.60-recall argmin; it
  * ties ivfA_p6 at 16 cells where the ladder IS p6, and wins as the
  * ladder). At sf0.1 the ANN floor forces ivf16_p6 — the adaptive
  * codebook tops out at 0.48 recall there — which is exactly the
  * corpus-dependence the operator exists to automate (AutoConfigSpec
  * pins both selections).
  *
  * Scale shape: the frontier inputs are the audited q180/q175 plans
  * unchanged (one signature + one truth pass shared across bandings;
  * ~3 corpus scans for 9 IVF configs); the selection itself is a
  * 4-to-9-row TakeOrdered — plan-time state, never data-scale.
  * Reference for the surveyed semantics: the reference engine's
  * parameter blocks fix these knobs statically in config
  * (/root/reference/README.md:82-103); the frontier tables + argmin
  * replace that static choice with a measured one.
  */
object AutoConfig {
  type Q = (SparkSession, String) => DataFrame

  /** Text-dedup recall floor: lossless at the operating threshold —
    * a banding may not miss any J ≥ 0.5 pair the exact verify would
    * keep. (The measured tables show losslessness is purchasable: the
    * knee config achieves it at 1/17th of b32r2's candidate volume.) */
  private[graft] val TextRecallFloorPpm = 1000000L

  /** ANN recall floor: recall@5 ≥ 0.60 — the q169 operating datum the
    * frontier family reproduces (ivf16_p6's 0.62). */
  private[graft] val AnnRecallFloorPpm = 600000L

  /** Candidate budget: a deployment-wide cap on pairs/probes scanned
    * per frontier measurement. Non-binding on the gate corpora (the
    * recall floor dominates); it exists so the operator's contract
    * states BOTH constraints a deployment does. */
  private[graft] val CandidateBudgetMax = 1000000L

  /** The relational argmin over any frontier frame carrying
    * (config, candidates, recall_ppm, pref). Total order documented
    * in the object Scaladoc; LIMIT 1 compiles to TakeOrderedAndProject
    * over the ≤|grid|-row frontier — driver state is one row. */
  private[graft] def selectConfig(frontier: DataFrame, floorPpm: Long,
      budget: Long): DataFrame = {
    val qual = frontier.withColumn("qual",
      (col("recall_ppm") >= floorPpm && col("candidates") <= budget)
        .cast("int"))
    qual.orderBy(col("qual").desc,
        when(col("qual") === 1, col("candidates")).otherwise(lit(0L)).asc,
        col("recall_ppm").desc, col("candidates").asc,
        col("pref").asc, col("config").asc)
      .limit(1)
      .select(col("config"), col("candidates"), col("recall_ppm"),
        lit(floorPpm).as("floor_ppm"), lit(budget).as("budget_max"),
        col("qual").cast("long").as("meets_floor"))
  }

  /** The q180 frontier with its margin tie-break attached. */
  private[graft] def bandingChoice(docs: DataFrame): DataFrame =
    selectConfig(
      Dedup.minhashFrontier(docs).withColumn("pref", col("rows_per_band")),
      TextRecallFloorPpm, CandidateBudgetMax)

  /** Calibration-sample modulus for the v8 pipeline's auto_banding
    * node: the frontier (including its exact-truth pass) runs on a
    * deterministic 1-in-2 id slice of the stage input, never the
    * full corpus — at 100 TB you measure the knee on a sample and
    * apply the selected banding to everything (computing the exact
    * truth corpus-wide to tune the approximation would defeat it).
    * PAIR statistics sample as p² (both endpoints must survive the
    * slice), so the modulus is set where the sampled truth stays
    * O(10) at the gate corpora (measured: 12/6/67 truth pairs across
    * the three scales at mod 2; mod 4 already starves sf0.01 down to
    * 1) — at 100 TB, with millions of true pairs, the same rule picks
    * a much harder sample. */
  private[graft] val CalibSampleMod = 2L

  /** The v8 auto_banding node: [[bandingChoice]] over the calibration
    * sample of the stage input (v8 runs it on the RAW corpus — its
    * dedup stage is the pipeline's FIRST transform; see
    * CorpusPipeline.specJsonV8 for why order matters on this corpus).
    * If the sample carried zero truth pairs every recall would be
    * 0 ppm and the fallback order (recall DESC, candidates ASC, pref
    * ASC) would degrade to the cheapest maximum-margin banding — the
    * conservative choice under no evidence, by construction
    * (AutoConfigSpec pins the regime); at the gate corpora the mod-2
    * sample MEASURES, and selects the knee with meets_floor = 1. */
  private[graft] def sampledBandingChoice(d: DataFrame): DataFrame =
    bandingChoice(d.filter(col("doc_id") % CalibSampleMod === 0))

  /** Bands encoded in a selection row's config name ("b16r4" → 16) —
    * how the v8 dedup stage decodes its plan-time collect. */
  private[graft] def bandsOf(config: String): Int =
    config.stripPrefix("b").takeWhile(_.isDigit).toInt

  /** The sampled-frontier + selection replay over relation `src`
    * (already the calibration sample) — a self-contained SELECT for
    * nesting as the v8 oracle's `sel` CTE. The frontier subquery is
    * MATERIALIZED (read by the pref projection and the ORDER BY). */
  private[operators] def bandingChoiceSqlOver(src: String): String =
    s"""WITH fr AS MATERIALIZED (
       |${Dedup.bandingFrontierSqlOver(src)}
       |),
       |frp AS (
       |  SELECT config, candidates, recall_ppm, rows_per_band AS pref
       |  FROM fr)
       |${selectSql("frp", "minhash_banding", TextRecallFloorPpm, CandidateBudgetMax)}""".stripMargin

  /** The q175 frontier with its margin tie-break attached. */
  private[graft] def ivfChoice(emb: DataFrame): DataFrame =
    selectConfig(
      Similarity.recallFrontier(emb)
        .withColumn("pref",
          when(col("config") === "ivfA_sqrt", lit(0L)).otherwise(lit(1L))),
      AnnRecallFloorPpm, CandidateBudgetMax)

  /** The q195 dispatch: instantiate the q94-family batch kNN at a
    * selection row's config — the ANN side of what q194's
    * dedup_keep_lsh does for bandings. Config names are engine-owned
    * (the q175 grid), so the parse is total over the grid. */
  private[graft] def knnAt(e: DataFrame, config: String): DataFrame = {
    val cells = Similarity.adaptiveCells(e.count())
    config match {
      case c if c.startsWith("ivf16_p") =>
        Similarity.knnJoinQuery(e, Centroids86.table,
          c.stripPrefix("ivf16_p").toInt)
      case "ivfA_sqrt" =>
        Similarity.knnJoinQuery(e, Centroids94.table.take(cells),
          Similarity.adaptiveNProbe(cells))
      case c =>
        Similarity.knnJoinQuery(e, Centroids94.table.take(cells),
          c.stripPrefix("ivfA_p").toInt)
    }
  }

  val queries: Map[String, Q] = Map(
    // -- q192 (round 13): plan-time auto-configuration — the cheapest
    //    frontier config meeting the stated recall floor, per family,
    //    from the measured q180/q175 tables. EXACT-gated: the oracle
    //    replays both frontier derivations and the same total order. --
    "q192_autoconfig" -> { (s, dir) =>
      val mh = bandingChoice(Tables.load(s, dir, "documents"))
        .select(lit("minhash_banding").as("family"), col("*"))
      val ivf = ivfChoice(Tables.load(s, dir, "embeddings"))
        .select(lit("ivf").as("family"), col("*"))
      mh.unionByName(ivf)
    },

    // -- q195 (round 13): the AUTO-TUNED batch kNN — the q194 pattern
    //    for the ANN family: measure the q175 frontier, select by the
    //    q192 total order (a 1-row plan-time collect), then run the
    //    q94-family kNN at the SELECTED (codebook, nprobe). The
    //    selection genuinely switches plans per corpus: ivf16_p6 at
    //    sf0.001/sf0.1, ivfA_sqrt at sf0.01 (see AutoConfigSpec).
    //    EXACT-gated: the oracle reuses the whole q175 derivation —
    //    frontier for the selection, per-config candidate sets for
    //    the top-5 — gated by the selection scalar. --
    "q195_autotuned_knn" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val cfg = ivfChoice(e).head.getString(0)
      knnAt(e, cfg).select(lit(cfg).as("config"), col("q_id"),
        col("vec_id"), col("cos_sim"), col("rank"))
    },
  )

  /** The selection SQL over a frontier CTE `<src>(config, candidates,
    * recall_ppm, pref)` — the same total order as [[selectConfig]],
    * shared by oracle192 and the composed v8 pipeline oracle. */
  private[operators] def selectSql(src: String, family: String,
      floorPpm: Long, budget: Long): String =
    s"""SELECT '$family' AS family, config,
       |  CAST(candidates AS BIGINT) AS candidates,
       |  CAST(recall_ppm AS BIGINT) AS recall_ppm,
       |  CAST($floorPpm AS BIGINT) AS floor_ppm,
       |  CAST($budget AS BIGINT) AS budget_max,
       |  CAST(CASE WHEN recall_ppm >= $floorPpm AND candidates <= $budget
       |       THEN 1 ELSE 0 END AS BIGINT) AS meets_floor
       |FROM $src
       |ORDER BY (CASE WHEN recall_ppm >= $floorPpm AND candidates <= $budget
       |          THEN 1 ELSE 0 END) DESC,
       |  (CASE WHEN recall_ppm >= $floorPpm AND candidates <= $budget
       |   THEN candidates ELSE 0 END) ASC,
       |  recall_ppm DESC, candidates ASC, pref ASC, config ASC
       |LIMIT 1""".stripMargin

  /** oracle192: both frontier oracles nested as MATERIALIZED scoped
    * subqueries (each is read once by its pref-projection, which is
    * read by the selection — the q144 CTE-inlining rule), then the
    * shared total order per family. */
  private def oracle192: String =
    s"""WITH mh AS MATERIALIZED (
       |${Dedup.oracles("q180_minhash_frontier")}
       |),
       |ivf AS MATERIALIZED (
       |${Similarity.oracles("q175_ann_frontier")}
       |),
       |mhp AS (
       |  SELECT config, candidates, recall_ppm, rows_per_band AS pref
       |  FROM mh),
       |ivfp AS (
       |  SELECT config, candidates, recall_ppm,
       |    CASE WHEN config = 'ivfA_sqrt' THEN 0 ELSE 1 END AS pref
       |  FROM ivf),
       |sel_mh AS (
       |${selectSql("mhp", "minhash_banding", TextRecallFloorPpm, CandidateBudgetMax)}
       |),
       |sel_ivf AS (
       |${selectSql("ivfp", "ivf", AnnRecallFloorPpm, CandidateBudgetMax)}
       |)
       |SELECT * FROM sel_mh
       |UNION ALL
       |SELECT * FROM sel_ivf""".stripMargin

  /** oracle195: the full q175 derivation (scaffold + 9 config chains,
    * each ending at its MATERIALIZED `<p>cand`), the frontier table
    * as a CTE feeding the q192 selection, then one gated top-5 leg
    * per config — only the selected config's leg survives the scalar
    * gate; every leg reads its config's existing candidate set, so
    * the kNN ranking replays the engine's (cos DESC, vec_id) window
    * exactly. */
  private def oracle195: String = {
    val (body, frontierSelect) = Similarity.ivfFrontierSqlParts
    val cfgPrefixes =
      Similarity.FrontierProbes.zipWithIndex.map { case (np, i) =>
        s"f$i" -> s"ivf16_p$np"
      } ++ Similarity.FrontierProbes.zipWithIndex.map { case (np, i) =>
        s"a$i" -> s"ivfA_p$np"
      } :+ ("asq" -> "ivfA_sqrt")
    val legs = cfgPrefixes.map { case (p, label) =>
      s"""${p}top AS (
         |  SELECT (SELECT config FROM sel) AS config, q_id, vec_id,
         |    cos_sim, CAST(rank AS BIGINT) AS rank
         |  FROM (
         |    SELECT q_id, vec_id, cos_sim,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY cos_sim DESC, vec_id) AS rank
         |    FROM ${p}cand)
         |  WHERE rank <= 5 AND (SELECT config FROM sel) = '$label')"""
        .stripMargin
    }
    val union = cfgPrefixes.map { case (p, _) => s"SELECT * FROM ${p}top" }
      .mkString("\nUNION ALL\n")
    s"""WITH $body,
       |fr AS MATERIALIZED (
       |${frontierSelect}),
       |frp AS (
       |  SELECT config, candidates, recall_ppm,
       |    CASE WHEN config = 'ivfA_sqrt' THEN 0 ELSE 1 END AS pref
       |  FROM fr),
       |sel AS MATERIALIZED (
       |${selectSql("frp", "ivf", AnnRecallFloorPpm, CandidateBudgetMax)}
       |),
       |${legs.mkString(",\n")}
       |$union""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q192_autoconfig" -> oracle192,
    "q195_autotuned_knn" -> oracle195,
  )
}
