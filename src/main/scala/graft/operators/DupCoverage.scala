package graft.operators

import graft.Tables
import graft.functions.{NGrams, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher-style duplicated-n-gram coverage (Rae et al. 2021, Table
  * A1: `dup_ngram_frac` — the fraction of a document covered by
  * n-grams that occur more than once IN that document). q76 reports
  * the single hottest n-gram's share; this measures the UNION of all
  * duplicated n-gram spans — the repetition signal the Gopher/
  * MassiveText filter chain actually thresholds on (and the
  * within-doc analog of q97's cross-corpus repeated spans). The
  * reference's analysis layer
  * (/root/reference/src/cosmap/analysis/runner.py) has per-sample
  * scoring only — this extends the engine per the brief's
  * training-data mandate.
  *
  * Semantics: for n ∈ {5, 10}, a token position is COVERED iff it
  * lies inside some occurrence of an n-gram whose within-doc
  * occurrence count is ≥ 2. Reported as integer ppm of tokens and of
  * token characters (whitespace excluded) — the cross-engine-exact
  * ratio form (q40 note).
  *
  * Scale shape (100 TB posture): everything after the scan is keyed
  * by doc_id. The gram-occurrence stream is repartitioned by doc_id
  * ONCE per n; the within-doc gram count rides it as a WINDOW
  * ({doc_id} ⊆ {doc_id, g} — the q107 clustered-distribution
  * argument, no second exchange, and no gram-keyed join: a hot
  * boilerplate gram never becomes a shuffle key), the interval union
  * is a bounded ≤ n-row explode + doc-local distinct, and the
  * length join is doc_id-keyed with every corpus-scale side hinted
  * off broadcast. Per-doc state is the doc itself — the operator is
  * embarrassingly doc-parallel, like the reference's per-sample
  * transforms.
  */
object DupCoverage {
  type Q = (SparkSession, String) => DataFrame

  /** Shared engine/oracle constants: the two Gopher n-gram widths. */
  private[graft] val NLo = 5
  private[graft] val NHi = 10

  val queries: Map[String, Q] = Map(
    "q124_dup_ngram_coverage" -> { (s, dir) =>
      coverage(Tables.load(s, dir, "documents"))
    },
  )

  /** The coverage frame over any (doc_id, text) frame — exposed for
    * the spec's inline-corpus replay. */
  private[graft] def coverage(d: DataFrame): DataFrame = {
      // (doc_id, idx, len): one row per token position. A cheap
      // scan-stage projection (split + posexplode), recomputed per
      // reference rather than checkpointed — the house checkpoint rule
      // is for EXPENSIVE multiply-referenced inputs, and a scan
      // re-read is cheaper than materializing the exploded table
      val toks = d
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("idx"),
          length(col("col")).cast("long").as("len"))
      val base = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("len")).as("tok_chars"))
      // covered-position stats for one n: gram occurrences → within-doc
      // count window → duplicated occurrences → span union → lengths
      def cov(n: Int, ct: String, cc: String): DataFrame = {
        val occ = d
          .select(col("doc_id"),
            posexplode(NGrams.wordNGramsAll(Text.tokens(col("text")), n)))
          .select(col("doc_id"), col("pos").cast("long").as("i"),
            col("col").as("g"))
          .repartition(col("doc_id"))
        occ
          .withColumn("c", count(lit(1)).over(
            Window.partitionBy(col("doc_id"), col("g"))))
          .filter(col("c") >= 2)
          .select(col("doc_id"),
            explode(sequence(col("i"), col("i") + lit(n - 1))).as("idx"))
          .distinct()
          // both sides corpus-scale → hinted off broadcast (the house
          // rule for scale-growing join sides)
          .join(toks.hint("shuffle_merge"), Seq("doc_id", "idx"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as(ct), sum(col("len")).as(cc))
      }
      base
        .join(cov(NLo, "ct5", "cc5").hint("shuffle_merge"), Seq("doc_id"), "left")
        .join(cov(NHi, "ct10", "cc10").hint("shuffle_merge"), Seq("doc_id"), "left")
        .selectExpr("doc_id", "n_tokens", "tok_chars",
          "coalesce(ct5, 0L) * 1000000 div greatest(n_tokens, 1) AS dup5_tok_ppm",
          "coalesce(cc5, 0L) * 1000000 div greatest(tok_chars, 1) AS dup5_char_ppm",
          "coalesce(ct10, 0L) * 1000000 div greatest(n_tokens, 1) AS dup10_tok_ppm",
          "coalesce(cc10, 0L) * 1000000 div greatest(tok_chars, 1) AS dup10_char_ppm")
  }

  // ---- code-generated DuckDB oracle (same widths, 1-based) ---------

  /** The per-n CTE chain: occurrences with position, window count,
    * duplicated-span union, covered-length aggregation. */
  private def covSql(n: Int): String = {
    val gram = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""occ$n AS (
       |  SELECT doc_id, i, $gram AS g
       |  FROM (SELECT doc_id, t,
       |          unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS i
       |        FROM tok)),
       |dup$n AS (
       |  SELECT doc_id, i FROM (
       |    SELECT doc_id, i,
       |      count(*) OVER (PARTITION BY doc_id, g) AS c
       |    FROM occ$n)
       |  WHERE c >= 2),
       |idx$n AS (
       |  SELECT DISTINCT doc_id, idx
       |  FROM (SELECT doc_id, unnest(generate_series(i, i + ${n - 1})) AS idx
       |        FROM dup$n)),
       |cov$n AS (
       |  SELECT doc_id, count(*) AS ct, sum(len) AS cc
       |  FROM idx$n JOIN tl USING (doc_id, idx)
       |  GROUP BY doc_id)""".stripMargin
  }

  private def oracle124: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       |tl AS (
       |  SELECT doc_id, i AS idx, CAST(length(t[i]) AS BIGINT) AS len
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
       |        FROM tok)),
       |base AS (
       |  SELECT doc_id, count(*) AS n_tokens, sum(len) AS tok_chars
       |  FROM tl GROUP BY doc_id),
       |${covSql(NLo)},
       |${covSql(NHi)}
       |SELECT base.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(tok_chars AS BIGINT) AS tok_chars,
       |  CAST(coalesce(cov$NLo.ct, 0) * 1000000
       |    // greatest(n_tokens, 1) AS BIGINT) AS dup5_tok_ppm,
       |  CAST(coalesce(cov$NLo.cc, 0) * 1000000
       |    // greatest(tok_chars, 1) AS BIGINT) AS dup5_char_ppm,
       |  CAST(coalesce(cov$NHi.ct, 0) * 1000000
       |    // greatest(n_tokens, 1) AS BIGINT) AS dup10_tok_ppm,
       |  CAST(coalesce(cov$NHi.cc, 0) * 1000000
       |    // greatest(tok_chars, 1) AS BIGINT) AS dup10_char_ppm
       |FROM base
       |LEFT JOIN cov$NLo ON base.doc_id = cov$NLo.doc_id
       |LEFT JOIN cov$NHi ON base.doc_id = cov$NHi.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q124_dup_ngram_coverage" -> oracle124,
  )
}
