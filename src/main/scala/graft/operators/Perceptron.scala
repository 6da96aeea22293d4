package graft.operators

import graft.Tables
import graft.functions.{NGrams, SplitMix64, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q144 — in-engine discriminative quality classifier: an ALL-INTEGER
  * cost-sensitive batch POCKET perceptron (Rosenblatt 1958; batch
  * mistake-driven updates so each epoch is pure relational algebra;
  * Gallant 1990's pocket rule — keep the epoch snapshot with the
  * fewest corpus mistakes — as the non-separable-data stabilizer the
  * perceptron family is known to need; class-ratio update weighting
  * per the importance-weighted learning literature) over
  * hashed-bigram presence features — the fastText-style quality
  * filter of GPT-3/CCNet-era pipelines (positive class = a curated
  * reference domain, negative = the rest of the crawl), the one
  * named curation stage q110's generative Naive Bayes and q101's
  * DSIR importance weights did not cover.
  *
  * Setup: features are whitespace-bigram PRESENCE bits at bucket
  * b = (splitmix64(g) >>> 11) % 65536 plus a constant bias bucket
  * B = 65536, positive domain = q101's DsirTarget ('src7'). Two
  * measured design points (this corpus, sf0.1):
  *  - q101's 1024-bucket space SATURATES as presence features (every
  *    long doc hits most buckets → near-identical vectors, and the
  *    whole corpus swings sign together); 2^16 buckets keep presence
  *    informative and the weight dim is still a ~1 MB broadcast.
  *  - the unweighted batch update freezes at the all-negative
  *    majority classifier (the 5% minority never climbs out of
  *    epoch 1's negative prior); the integer cost r = max(1,⌊N₋/N₊⌋)
  *    on positive updates restores learning.
  *
  * Training (K = 8 epochs, unrolled): w⁰ = 0, per epoch the batch
  * update
  *
  *   s_e(d) = Σ_b x_d[b]·w^{e-1}[b],   M_e = {d : y_d·s_e(d) ≤ 0},
  *   w^e = w^{e-1} + Σ_{d ∈ M_e} y_d·c_d·x_d,  c_d = r if y_d = +1 else 1
  *
  * and the POCKET pick w* = w^{e*}, e* = argmin_e |M(w^e)| (ties →
  * earliest epoch). Every quantity is an integer (presence bits, ±1
  * labels, the floor ratio, mistake counts), so the replay is
  * bit-exact on any engine and partitioning. On separable data some
  * epoch reaches zero mistakes and the pocket returns the separator
  * (PerceptronSpec's planted proof); on this deliberately
  * homogeneous synthetic corpus (all 20 sources share one token
  * generator; max per-source token lift ≈ 1.07) the small scales are
  * memorized (498/500, 496/500, full positive recall) while at sf0.1
  * the pocket honestly returns the majority classifier rather than
  * an overfit oscillation state — the correct answer for an
  * unseparable domain, and exactly the failure the pocket rule
  * exists to prevent.
  *
  * Scale shape (the 100 TB posture): the feature table is built ONCE
  * — explode → repartition(doc_id) → (doc_id, y, b) distinct that
  * REUSES the doc_id partitioning (partitioning on a subset of the
  * grouping keys already co-locates the groups), persisted, and
  * every epoch rides it: the per-doc score groupBy and the
  * mistake-set semi-join add ZERO exchanges, weights and the 1-row
  * class ratio are dims that only ever BROADCAST, and the single
  * per-epoch keyed exchange is the update groupBy(b) whose map-side
  * partials compress the corpus to ≤B rows per task. Per-epoch
  * weights are localCheckpoint'd (the CLAUDE.md iterative-loop rule
  * — persist does not cut the logical plan). Driver-side state is K
  * mistake-count integers — bounded. K is a constant: training is K
  * linear passes, exactly like q114/q118. At true 100 TB the only
  * change is DECIMAL(38,0) update sums (weight magnitudes here stay
  * far below 2^60 at any gate scale).
  */
object Perceptron {
  type Q = (SparkSession, String) => DataFrame

  /** Epochs (unrolled identically in the generated oracle). */
  private[operators] val Epochs = 8

  /** Feature space: 2^16 hash buckets + the bias bucket (presence at
    * q101's 1024 saturates — see object scaladoc). */
  private[graft] val Buckets = 65536

  /** (doc_id, y, b) hashed-bigram presence features + the bias row —
    * every doc carries the bias feature, so every doc is scored even
    * with < 2 tokens. Caller repartitions/persists. */
  private[graft] def features(d: DataFrame): DataFrame = {
    val y = when(col("source") === Curation.DsirTarget, 1L).otherwise(-1L)
    val grams = d.select(col("doc_id"), y.as("y"),
      explode(NGrams.wordNGramsAll(Text.tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"), col("y"),
        (shiftrightunsigned(SplitMix64.strHash(col("g")), 11)
          % Buckets).as("b"))
      .distinct()
    val bias = d.select(col("doc_id"), y.as("y"), lit(Buckets.toLong).as("b"))
    grams.unionByName(bias)
  }

  /** Unlabeled feature buckets (doc_id, b) + the bias row over ANY
    * documents-shaped frame (needs `doc_id`, `text`) — the SCORING
    * side of the classifier (q153 scores pipeline survivors that
    * carry no `source` column). Same hash, same bias bucket. */
  private def featureBits(d: DataFrame): DataFrame = {
    val grams = d.select(col("doc_id"),
      explode(NGrams.wordNGramsAll(Text.tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"),
        (shiftrightunsigned(SplitMix64.strHash(col("g")), 11)
          % Buckets).as("b"))
      .distinct()
    val bias = d.select(col("doc_id"), lit(Buckets.toLong).as("b"))
    grams.unionByName(bias)
  }

  /** Train K epochs over the labeled frame; returns the PERSISTED
    * feature table (caller must unpersist) and the pocket weight
    * snapshot. The shared core of [[trainScore]] and
    * [[trainPocket]]. */
  private def trainOn(d: DataFrame, epochs: Int): (DataFrame, DataFrame) = {
    // repartition BEFORE the distinct: the (doc_id, y, b) dedup,
    // every epoch's per-doc score groupBy and the mistake semi-join
    // all reuse this one doc_id exchange
    val feats = features(d.repartition(col("doc_id"))).persist()
    feats.count()
    // integer class-imbalance cost on positive updates: a 1-row dim
    val ratio = d.agg(
      sum(when(col("source") === Curation.DsirTarget, 1L).otherwise(0L))
        .as("np"), count(lit(1)).as("n"))
      .selectExpr("greatest((n - np) div greatest(np, 1L), 1L) AS r")
    val cost = when(col("y") === 1L, col("r")).otherwise(1L)

    def scoresWith(w: DataFrame): DataFrame =
      feats.join(broadcast(w), "b")
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("w")).as("s"))
    def mistakesOf(w: DataFrame): DataFrame =
      scoresWith(w).filter(col("y") * col("s") <= 0).select(col("doc_id"))

    // epoch 1: w⁰ = 0 scores every doc at 0, so M₁ = all docs and
    // w¹ = Σ_d y_d·c_d·x_d — no join needed
    var w = feats.crossJoin(broadcast(ratio))
      .groupBy(col("b")).agg(sum(col("y") * cost).as("w"))
      .localCheckpoint(true)
    val snaps = scala.collection.mutable.Buffer(w)
    val mcounts = scala.collection.mutable.Buffer.empty[Long]
    (2 to epochs).foreach { _ =>
      // r14 optimization (guide §1.2 actions-per-iteration): the
      // mistake COUNT |M(w^{e-1})| rides the weight checkpoint instead
      // of its own action — the update's bias-bucket row count IS the
      // mistake count (every doc carries exactly ONE bias row b = B,
      // and gram buckets live in [0, B) — disjoint), read off the
      // materialized ≤(B+1)-row frame for free. The separate
      // mistakes.count() ran the feats⋈w score pass a SECOND time per
      // epoch (the semi-join recompute below is the first); fusing
      // halves the per-epoch passes over the cached feature table.
      // The mistakes frame itself stays NOT checkpointed: the un-cut
      // frame keeps the doc_id partitioning the semi-join rides
      // (A/B'd round 9: checkpointing here was wall-neutral and loses
      // the partitioning).
      val mistakes = mistakesOf(w)
      val upd = feats.join(mistakes, Seq("doc_id"), "left_semi")
        .crossJoin(broadcast(ratio))
        .groupBy(col("b"))
        .agg(sum(col("y") * cost).as("du"), count(lit(1)).as("mb"))
      val merged = w.join(upd, Seq("b"), "full_outer")
        .select(col("b"),
          (coalesce(col("w"), lit(0L)) + coalesce(col("du"), lit(0L))).as("w"),
          col("mb"))
        .localCheckpoint(true)
      // |M| = the bias row's update count (0 when M was empty — the
      // bias WEIGHT row still exists from epoch 1, mb null)
      mcounts += merged.filter(col("b") === Buckets.toLong)
        .agg(coalesce(max(col("mb")), lit(0L))).head.getLong(0)
      w = merged.select(col("b"), col("w"))
      snaps += w
    }
    mcounts += mistakesOf(w).count() // the last snapshot's own measure
    // pocket: fewest corpus mistakes, ties to the EARLIEST epoch
    val pocket = snaps(mcounts.zipWithIndex.minBy { case (m, i) => (m, i) }._2)
    (feats, pocket)
  }

  /** Train K epochs, pick the pocket snapshot, score every doc.
    * Returns (doc_id, y, score, pred); `materialize = false` leaves
    * the scorer plan visible for PlanShapeSpec — and INTENTIONALLY
    * keeps the feature cache alive, because the returned plan reads
    * it (unpersisting would silently turn the audited broadcast-over-
    * cache shape into a recompute; round-8 advice #2, documented
    * option). Exposed for the spec's planted separable-corpus
    * proof. */
  private[graft] def trainScore(d: DataFrame, epochs: Int = Epochs,
      materialize: Boolean = true): DataFrame = {
    val (feats, pocket) = trainOn(d, epochs)
    val out = feats.join(broadcast(pocket), "b")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("w")).as("s"))
      .select(col("doc_id"), col("y"), col("s").as("score"),
        when(col("s") > 0, 1L).otherwise(-1L).as("pred"))
    if (!materialize) out
    else { val r = out.localCheckpoint(true); feats.unpersist(false); r }
  }

  /** Train on the labeled corpus and return only the POCKET WEIGHT
    * table (b, w) — the trained state the q153 pipeline carries
    * between DAG nodes. Weight snapshots are localCheckpoint'd by the
    * train loop, so the feature cache is released before returning
    * (nothing downstream reads it). */
  private[graft] def trainPocket(d: DataFrame,
      epochs: Int = Epochs): DataFrame = {
    val (feats, pocket) = trainOn(d, epochs)
    feats.unpersist(false)
    pocket
  }

  /** q163 — SAMPLED training, the 100 TB posture for the trained
    * gate: q144/q153 train over the FULL corpus features for K
    * epochs (8 corpus scans to fit a ≤2¹⁶-row model); production
    * quality filters fit on ~10⁵–10⁶ SAMPLED docs and spend the
    * corpus-linear budget once, on scoring. The sample is a
    * deterministic splitmix64 keep (the q70/q88 replay contract —
    * the oracle replays the identical draw) targeting a FIXED count
    * of ~[[SampleTarget]] docs: rate = T/n off a 1-row count dim.
    * The rate is corpus-ADAPTIVE (the q153 bin-width lesson applied
    * prospectively) — a fixed FRACTION would still scan corpus/K per
    * epoch at 100 TB, a fixed TARGET makes the training wall ~flat
    * in corpus size (ScaleProbe r10) with scoring the only linear
    * pass. T/n is one integer-by-integer IEEE division, exact on
    * both engines (the division-needs-no-quantization contract), and
    * at tiny scales rate ≥ 1 degrades gracefully to full-corpus
    * training. */
  private[graft] val SampleTarget = 256L
  private[graft] val SampleSalt = 163L

  /** Deterministic doc sample: keep where uniform(doc_id, salt) <
    * T/n. The 1-row count dim broadcasts; the draw is keyed by
    * doc_id, so the sample is partitioning-independent. */
  private[graft] def sampleDocs(d: DataFrame): DataFrame = {
    val n = broadcast(d.agg(count(lit(1)).as("n_all")))
    d.crossJoin(n)
      .filter(SplitMix64.uniform(col("doc_id"), SampleSalt) <
        lit(SampleTarget.toDouble) / col("n_all").cast("double"))
      .drop("n_all")
  }

  /** Train the pocket on the deterministic sample — the q163
    * pipeline's `train_quality_sampled` node. Per-epoch work is
    * sample-sized (~[[SampleTarget]] docs); the full corpus is only
    * ever touched by the downstream scoring pass. */
  private[graft] def trainPocketSampled(d: DataFrame): DataFrame =
    trainPocket(sampleDocs(d))

  /** Score ANY documents-shaped frame with a trained weight table:
    * (doc_id, score), every doc scored (the bias bucket guarantees a
    * feature row). Scale shape: feature explode is map-side; one
    * doc_id repartition feeds both the distinct and the score
    * groupBy; the ≤(B+1)-row weight table only ever broadcasts. */
  private[graft] def scoreDocs(docs: DataFrame, w: DataFrame): DataFrame =
    featureBits(docs.repartition(col("doc_id")))
      .join(broadcast(w), "b")
      .groupBy(col("doc_id")).agg(sum(col("w")).as("score"))

  /** q153's classifier-keep: score `docs` with the pocket weights
    * trained on `labeled`, keep the TOP HALF by score at SCORE-BIN
    * granularity — the q123 binned-threshold pattern: the global-
    * order step runs over a bounded bin table (≤ 2¹⁴+1 rows),
    * never a corpus-sized sort, and every doc in a bin gets the same
    * verdict, so the rule is deterministic on any engine and
    * partitioning. Top-fraction rather than sign(score): on a
    * non-separable corpus the pocket honestly returns the majority
    * classifier (all scores ≤ 0), and a hard sign threshold would
    * empty the pipeline — keep-the-best-X%-by-classifier-score is
    * the GPT-3/fastText-filter materialization. Bin width is
    * CORPUS-ADAPTIVE: (hi − lo) div 2¹⁴ (floored at 1), derived from
    * a 1-row min/max dim — the bin table stays ≤ 2¹⁴+1 rows at ANY
    * corpus scale (a fixed width cannot: score magnitudes grow with
    * the corpus, and a width that resolves one scale collapses or
    * explodes at another — measured: 4096-wide bins put the whole
    * sf0.01 score range, span ~4100, into 2 bins and kept
    * everything). Scores are shifted by −lo before the integer div
    * so both engines bin nonnegative values (Spark `div` truncates
    * toward zero, DuckDB `//` floors — they only agree on
    * nonnegative operands). */
  private[graft] val ScoreBins = 16384L
  private[graft] def classifierKeep(docs: DataFrame, weights: DataFrame,
      materialize: Boolean = true): DataFrame = {
    // checkpointed: read by the bin census AND the keep filter
    val scoredRaw = scoreDocs(docs, weights)
    val scored =
      if (materialize) scoredRaw.localCheckpoint(true) else scoredRaw
    val ext = scored.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    val binned = scored.crossJoin(broadcast(ext))
      .select(col("doc_id"),
        expr(s"(score - lo) div greatest((hi - lo) div ${ScoreBins}L, 1L)")
          .as("sb"))
    val bins = binned.groupBy(col("sb")).agg(count(lit(1)).as("nb"))
    // bounded-table global order (the q123 shape): cum from the TOP
    // bin down; threshold = highest bin where the cum reaches half
    val thr = bins
      .withColumn("cum", expr("sum(nb) OVER (ORDER BY sb DESC)"))
      .withColumn("tot", expr("sum(nb) OVER ()"))
      .agg(expr("max(CASE WHEN cum >= (tot + 1) div 2 THEN sb END)").as("t"))
    // the keep set is ~half the corpus — scale-growing, never broadcast
    val keepIds = binned.crossJoin(broadcast(thr))
      .filter(col("sb") >= col("t")).select(col("doc_id"))
    docs.join(keepIds.hint("shuffle_merge"), Seq("doc_id"), "left_semi")
  }

  val queries: Map[String, Q] = Map(
    "q144_quality_perceptron" -> { (s, dir) =>
      trainScore(Tables.load(s, dir, "documents"))
    },

    // -- classifier calibration table (round 9): the q144 scores
    //    binned into ≤ [[CalBins]] adaptive-width score bins with the
    //    per-bin positive rate — the reliability diagram every
    //    quality-filter paper reports before picking a keep
    //    threshold, and the q152-style evaluation harness for the
    //    trained classifier (does a higher score actually mean more
    //    likely curated-domain?). --
    "q158_classifier_calibration" -> { (s, dir) =>
      calibration(Tables.load(s, dir, "documents"))
    },
  )

  /** q158: per-score-bin census over the trained classifier's own
    * training corpus — (sb, n_docs, n_pos, pos_rate_ppm). Bin width
    * is corpus-adaptive like [[classifierKeep]]'s ((hi−lo) div 16,
    * floored at 1 — a ≤17-row report at any scale); counts and the
    * flooring ppm rate are pure integers. Scale shape: rides the
    * q144 training (K bounded epochs) + ONE extra map-side pass over
    * the checkpointed scored table; the 1-row extent dim
    * broadcasts. */
  private[graft] val CalBins = 16L
  private[graft] def calibration(d: DataFrame): DataFrame = {
    val scored = trainScore(d) // localCheckpoint'd by trainScore
    val ext = scored.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    scored.crossJoin(broadcast(ext))
      .select(
        expr(s"(score - lo) div greatest((hi - lo) div ${CalBins}L, 1L)")
          .as("sb"),
        col("y"))
      .groupBy(col("sb"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .selectExpr("sb", "n_docs", "n_pos",
        "(1000000L * n_pos) div n_docs AS pos_rate_ppm")
  }

  /** Calibration table over a labeled frame and a GIVEN weight table
    * — the q158 harness generalized so PerceptronSpec can ask the
    * q163 question directly: do the SAMPLED weights' scores still
    * RANK the positive class on the full corpus? Same adaptive bins,
    * same integer census as [[calibration]]. */
  private[graft] def calibrationOf(d: DataFrame, w: DataFrame): DataFrame = {
    val labels = d.select(col("doc_id"),
      when(col("source") === Curation.DsirTarget, 1L).otherwise(-1L).as("y"))
    val scored = scoreDocs(d, w).join(labels, "doc_id").localCheckpoint(true)
    val ext = scored.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    scored.crossJoin(broadcast(ext))
      .select(
        expr(s"(score - lo) div greatest((hi - lo) div ${CalBins}L, 1L)")
          .as("sb"),
        col("y"))
      .groupBy(col("sb"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"))
      .selectExpr("sb", "n_docs", "n_pos",
        "(1000000L * n_pos) div n_docs AS pos_rate_ppm")
  }

  /** Generated oracle: the SAME K epochs unrolled as a CTE chain
    * (the q114/q118 playbook) — shared feature CTEs, per epoch
    * scores → mistakes → bucket update → merged weights, one extra
    * scoring pass to measure the last snapshot, then the pocket pick
    * (min mistakes, earliest epoch) and the final scorer. feats and
    * the per-epoch mistake/weight tables are MATERIALIZED: DuckDB
    * inlines CTEs by default, and each of the ~2K references would
    * otherwise re-derive the whole upstream chain (measured: the
    * inlined form never finishes at sf0.01; the materialized form
    * runs in seconds — the engine's persist + localCheckpoint,
    * mirrored). Pure integer relational algebra: bit-exact replay by
    * construction. */
  /** CTE chain (no leading WITH) training the pocket weights on the
    * RAW `documents` table, ending at `wp(b, w)` — shared by the q144
    * oracle and the q153 composed-pipeline oracle (whose
    * classifier_keep stage scores with exactly these weights). */
  private[operators] def trainCtes: String = trainCtesOver("documents")

  /** The q163 sample predicate, replayed: the identical splitmix64
    * draw against the identical corpus-adaptive rate T/n (both
    * divisions IEEE-exact). */
  private[operators] def sampleWhereSql: String =
    s"${SplitMix64.uniformSql("doc_id", SampleSalt)} < " +
      s"CAST($SampleTarget AS DOUBLE) / " +
      s"CAST((SELECT count(*) FROM documents) AS DOUBLE)"

  /** [[trainCtes]] over the deterministic q163 doc sample. */
  private[operators] def trainCtesSampled: String =
    trainCtesOver(s"(SELECT * FROM documents WHERE $sampleWhereSql)")

  private def trainCtesOver(src: String): String = {
    val ph = SplitMix64.polyHashSql("g")
    val mx = SplitMix64.mixSql("p")
    val cost = "CASE WHEN y = 1 THEN (SELECT r FROM ratio) ELSE 1 END"
    val epochCtes = (2 to Epochs).map { e =>
      s"""s$e AS (
         |  SELECT doc_id, y, CAST(sum(w) AS BIGINT) AS s
         |  FROM feats JOIN w${e - 1} USING (b) GROUP BY doc_id, y),
         |m$e AS MATERIALIZED (SELECT doc_id FROM s$e WHERE y * s <= 0),
         |u$e AS (
         |  SELECT b, CAST(sum(y * ($cost)) AS BIGINT) AS du
         |  FROM feats JOIN m$e USING (doc_id) GROUP BY b),
         |w$e AS MATERIALIZED (
         |  SELECT coalesce(a.b, u.b) AS b,
         |    coalesce(a.w, 0) + coalesce(u.du, 0) AS w
         |  FROM w${e - 1} a FULL JOIN u$e u ON a.b = u.b)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val k1 = Epochs + 1
    val wtag = (1 to Epochs)
      .map(e => s"SELECT $e AS e, b, w FROM w$e").mkString(" UNION ALL ")
    val mc = (1 to Epochs)
      .map(e => s"SELECT $e AS e, (SELECT count(*) FROM m${e + 1}) AS m")
      .mkString(" UNION ALL ")
    s"""tok AS (
       |  SELECT doc_id,
       |    CASE WHEN source = '${Curation.DsirTarget}' THEN 1 ELSE -1 END AS y,
       |    string_split_regex(text, '\\s+') AS t
       |  FROM $src),
       |gi AS (
       |  SELECT doc_id, y, t,
       |    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
       |  FROM tok),
       |occ AS (SELECT doc_id, y, t[i] || ' ' || t[i+1] AS g FROM gi),
       |phx AS (SELECT doc_id, y, $ph AS p FROM occ),
       |bkx AS (SELECT doc_id, y, (($mx) >> 11) % $Buckets AS b FROM phx),
       |feats AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, y, b FROM bkx
       |  UNION ALL
       |  SELECT doc_id, y, $Buckets AS b FROM tok),
       |ratio AS (
       |  SELECT greatest((count(*) - sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))
       |      // greatest(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END), 1), 1) AS r
       |  FROM tok),
       |w1 AS MATERIALIZED (
       |  SELECT b, CAST(sum(y * ($cost)) AS BIGINT) AS w
       |  FROM feats GROUP BY b)$epochCtes,
       |s$k1 AS (
       |  SELECT doc_id, y, CAST(sum(w) AS BIGINT) AS s
       |  FROM feats JOIN w$Epochs USING (b) GROUP BY doc_id, y),
       |m$k1 AS (SELECT doc_id FROM s$k1 WHERE y * s <= 0),
       |mc AS ($mc),
       |best AS (SELECT e FROM mc ORDER BY m, e LIMIT 1),
       |wp AS MATERIALIZED (SELECT b, w FROM ($wtag) t JOIN best USING (e))""".stripMargin
  }

  private def oracle144: String =
    s"""WITH $trainCtes
       |SELECT doc_id, CAST(y AS BIGINT) AS y,
       |  CAST(sum(w) AS BIGINT) AS score,
       |  CAST(CASE WHEN sum(w) > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
       |FROM feats JOIN wp USING (b) GROUP BY doc_id, y""".stripMargin

  /** The q153 classifier-keep doc_ids over relation `src` (needs
    * `doc_id`, `text`): the engine's [[scoreDocs]] + binned top-half
    * threshold, replayed — unlabeled bigram featurization, score =
    * Σ w over matched buckets (the bias bucket guarantees every doc
    * one row), then the q123-style bounded-bin global order. Assumes
    * `wp` from [[trainCtes]] in an enclosing scope; cf_-prefixed CTE
    * names compose without collisions. */
  private[operators] def classifierKeepIdsSql(src: String): String = {
    val ph = SplitMix64.polyHashSql("g")
    val mx = SplitMix64.mixSql("p")
    s"""WITH cf_tok AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM $src),
       |cf_gi AS (
       |  SELECT doc_id, t,
       |    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
       |  FROM cf_tok),
       |cf_occ AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g FROM cf_gi),
       |cf_phx AS (SELECT doc_id, $ph AS p FROM cf_occ),
       |cf_bkx AS (SELECT doc_id, (($mx) >> 11) % $Buckets AS b FROM cf_phx),
       |cf_feats AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, b FROM cf_bkx
       |  UNION ALL
       |  SELECT doc_id, $Buckets AS b FROM cf_tok),
       |cf_score AS MATERIALIZED (
       |  SELECT f.doc_id, CAST(sum(w) AS BIGINT) AS score
       |  FROM cf_feats f JOIN wp USING (b) GROUP BY f.doc_id),
       |cf_ext AS (SELECT min(score) AS lo, max(score) AS hi FROM cf_score),
       |cf_binned AS (
       |  SELECT doc_id,
       |    (score - lo) // greatest((hi - lo) // ${ScoreBins}, 1) AS sb
       |  FROM cf_score, cf_ext),
       |cf_bins AS (SELECT sb, count(*) AS nb FROM cf_binned GROUP BY sb),
       |cf_thr AS (
       |  SELECT max(CASE WHEN cum >= (tot + 1) // 2 THEN sb END) AS t
       |  FROM (SELECT sb, sum(nb) OVER (ORDER BY sb DESC) AS cum,
       |               sum(nb) OVER () AS tot FROM cf_bins))
       |SELECT doc_id FROM cf_binned, cf_thr WHERE sb >= t""".stripMargin
  }

  /** q158: the q144 scored table re-binned — the same adaptive-width
    * formula as the engine (shifted nonnegative div, the
    * trunc ≡ floor contract). */
  private def oracle158: String =
    s"""WITH $trainCtes,
       |scored AS MATERIALIZED (
       |  SELECT doc_id, y, CAST(sum(w) AS BIGINT) AS score
       |  FROM feats JOIN wp USING (b) GROUP BY doc_id, y),
       |ext AS (SELECT min(score) AS lo, max(score) AS hi FROM scored)
       |SELECT
       |  (score - lo) // greatest((hi - lo) // $CalBins, 1) AS sb,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST((1000000 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)) // count(*)
       |    AS BIGINT) AS pos_rate_ppm
       |FROM scored, ext
       |GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q144_quality_perceptron" -> oracle144,
    "q158_classifier_calibration" -> oracle158,
  )
}
