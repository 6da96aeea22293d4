package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level statistics: vocabulary building and TF-IDF — the
  * term-weighting primitives of a text-training pipeline. Both are
  * single explode + aggregations; at 100 TB the explode is map-side
  * and the shuffles are keyed by term (vocab-sized, not corpus-sized)
  * after map-side partial aggregation.
  */
object CorpusStats {
  type Q = (SparkSession, String) => DataFrame

  // -- generator / UDTF surface: one row per (doc, position, token) --
  private val explodeTokens: Q = { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(Text.tokens(col("text"))).as(Seq("pos", "term")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("term"))
  }

  val queries: Map[String, Q] = Map(
    // -- vocabulary with frequencies: top 100 terms --
    "q71_vocab" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term"))
        .limit(100)
    },

    "q73_explode_tokens" -> explodeTokens,

    // -- TF-IDF per (doc, term): tf = in-doc count, idf = ln(N/df) --
    "q72_tfidf" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nDocs = d.agg(count(lit(1)).as("n_docs"))
      val terms = d.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df_ = terms.select(col("doc_id"), col("term")).distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(df_, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("tf") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6)
            .as("tfidf"))
        .filter(col("tfidf") > 0)
    },

    // -- q119 vocabulary coverage curve: what share of all token
    //    OCCURRENCES the top-k vocabulary TYPES cover, and how many
    //    types reach 50% / 90% coverage — the tokenizer-budget sizing
    //    numbers a vocab plan is drawn from. Computed entirely on the
    //    count-of-counts (frequency-of-frequencies) table, which is
    //    tiny, so the answer is tie-break independent by construction
    //    (all types in a frequency class contribute the same count,
    //    so "top k" needs no ordering among ties). --
    "q119_vocab_coverage" -> { (s, dir) =>
      vocabCoverage(Tables.load(s, dir, "documents"))
    },
  )

  /** q119 cutoffs, shared with the generated oracle. */
  private[graft] val CovCuts = Seq(10, 100, 1000, 10000)

  /** Coverage curve over any documents-shaped frame. Scale shape:
    * one token-keyed vocab groupBy (map-side partials), one groupBy
    * on the frequency VALUE collapsing the vocabulary to its distinct
    * frequencies (m distinct values satisfy m(m+1)/2 <= N_tokens, so
    * m <= sqrt(2N) — a few million rows at 100 TB where the
    * vocabulary itself is billions), then one ordered cumsum window
    * and a single-row aggregate over that tiny table. */
  private[graft] def vocabCoverage(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = d.select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val fof = vocab.groupBy(col("c")).agg(count(lit(1)).as("nt"))
    val tot = fof.agg(sum(col("nt")).as("n_types"),
      sum(col("c") * col("nt")).as("n_tokens"))
    // prev-cumulative types/occurrences walking frequencies downward;
    // c is unique after the groupBy, so the RANGE frame is exact
    val w = Window.orderBy(col("c").desc)
    val cum = fof.select(col("c"), col("nt"),
      (sum(col("nt")).over(w) - col("nt")).as("pt"),
      (sum(col("c") * col("nt")).over(w) - col("c") * col("nt")).as("po"))
    val covs = CovCuts.map(k => expr(
      s"sum(c * least(nt, greatest($k - pt, 0L))) * 1000000 div max(n_tokens)")
      .as(s"cov${k}_ppm"))
    val pcts = Seq("t50" -> "types_p50", "t90" -> "types_p90").map {
      case (t, alias) => expr(
        s"min(CASE WHEN po < $t AND $t <= po + c * nt " +
          s"THEN pt + ($t - po + c - 1) div c END)").as(alias)
    }
    val aggs = Seq(max(col("n_types")).as("n_types"),
      max(col("n_tokens")).as("n_tokens")) ++ covs ++ pcts
    cum.crossJoin(broadcast(tot))
      .withColumn("t50", expr("(n_tokens + 1) div 2"))
      .withColumn("t90", expr("(9 * n_tokens + 9) div 10"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val oracles: Map[String, String] = Map(
    "q73_explode_tokens" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents)
        |SELECT doc_id,
        |  unnest(generate_series(1, len(t))) AS pos,
        |  t[unnest(generate_series(1, len(t)))] AS term
        |FROM tok""".stripMargin,

    "q71_vocab" ->
      """SELECT term, count(*) AS freq
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS term
        |      FROM documents) t
        |GROUP BY term
        |ORDER BY freq DESC, term
        |LIMIT 100""".stripMargin,

    "q72_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM terms GROUP BY doc_id, term),
        |df AS (
        |  SELECT term, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, term FROM terms) x
        |  GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |FROM tf JOIN df USING (term), n
        |WHERE round(tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) > 0""".stripMargin,

    "q119_vocab_coverage" -> oracle119,
  )

  /** Code-generated from [[CovCuts]] — same integer arithmetic. */
  private def oracle119: String = {
    val covSel = CovCuts.map(k =>
      s"  CAST(sum(c * least(nt, greatest($k - pt, 0))) * 1000000 " +
        s"// max(n_tokens) AS BIGINT) AS cov${k}_ppm").mkString(",\n")
    val pctSel = Seq("t50" -> "types_p50", "t90" -> "types_p90").map {
      case (t, alias) =>
        s"  CAST(min(CASE WHEN po < $t AND $t <= po + c * nt " +
          s"THEN pt + ($t - po + c - 1) // c END) AS BIGINT) AS $alias"
    }.mkString(",\n")
    s"""WITH tok AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS term
       |  FROM documents),
       |voc AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
       |fof AS (SELECT c, count(*) AS nt FROM voc GROUP BY c),
       |tot AS (
       |  SELECT sum(nt) AS n_types, sum(c * nt) AS n_tokens FROM fof),
       |cum AS (
       |  SELECT c, nt,
       |    sum(nt) OVER (ORDER BY c DESC) - nt AS pt,
       |    sum(c * nt) OVER (ORDER BY c DESC) - c * nt AS po
       |  FROM fof),
       |j AS (
       |  SELECT cum.*, n_types, n_tokens,
       |    (n_tokens + 1) // 2 AS t50, (9 * n_tokens + 9) // 10 AS t90
       |  FROM cum, tot)
       |SELECT CAST(max(n_types) AS BIGINT) AS n_types,
       |  CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       |$covSel,
       |$pctSel
       |FROM j""".stripMargin
  }
}
