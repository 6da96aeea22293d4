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
  )

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
  )
}
