package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus: token
  * counting, quality scoring, stopword language-ID, exact dedup by
  * normalized fingerprint. All single-pass projections/aggregations —
  * at 100 TB each is one map stage (+ one shuffle for the dedup
  * groupBy), fully codegen'd, no UDFs.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private val stopEn = Seq("the", "a", "of", "in", "to", "is")
  private val stopEs = Seq("el", "la", "de", "que", "y", "los")
  private val stopFr = Seq("le", "les", "des", "et", "une", "dans")
  private val stopDe = Seq("der", "die", "und", "das", "ist", "ein")

  val queries: Map[String, Q] = Map(
    // -- token counting (whitespace + BPE-ish regex) & shape stats --
    "q40_text_stats" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        size(Text.bpeTokens(col("text"))).as("n_bpe_tokens"),
        round(Text.typeTokenRatio(col("text")), 6).as("ttr"),
        round(Text.punctRatio(col("text")), 6).as("punct_ratio"),
        round(length(regexp_replace(col("text"), "\\s", "")).cast("double") /
          greatest(Text.tokenCount(col("text")), lit(1)).cast("double"), 6)
          .as("avg_token_len"))
    },

    // -- quality score: diversity + stopword density + length prior --
    "q41_quality_score" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nTok = greatest(Text.tokenCount(col("text")), lit(1)).cast("double")
      val stopRatio = Text.wordSetCount(col("text"), stopEn).cast("double") / nTok
      val lenScore = least(lit(1.0), col("n_chars").cast("double") / 500.0)
      d.select(col("doc_id"),
        round(Text.typeTokenRatio(col("text")), 6).as("ttr"),
        round(stopRatio, 6).as("stop_ratio"),
        round(lenScore, 6).as("len_score"),
        round(Text.typeTokenRatio(col("text")) * 0.5 + stopRatio * 0.3 +
          lenScore * 0.2, 6).as("quality"))
    },

    // -- stopword-profile language ID with deterministic tie-break --
    "q42_langid" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val sEn = Text.wordSetCount(col("text"), stopEn)
      val sEs = Text.wordSetCount(col("text"), stopEs)
      val sFr = Text.wordSetCount(col("text"), stopFr)
      val sDe = Text.wordSetCount(col("text"), stopDe)
      d.select(col("doc_id"), col("lang").as("labeled_lang"),
        sEn.as("s_en"), sEs.as("s_es"), sFr.as("s_fr"), sDe.as("s_de"),
        when(sEn + sEs + sFr + sDe === 0, "und")
          .when(sEn >= sEs && sEn >= sFr && sEn >= sDe, "en")
          .when(sEs >= sFr && sEs >= sDe, "es")
          .when(sFr >= sDe, "fr")
          .otherwise("de").as("pred_lang"))
    },

    // -- deterministic train/val/test split: md5-of-key thresholds
    //    (fixed-length lowercase hex compares lexicographically =
    //    numerically), reproducible on any engine, partitioning, or
    //    cluster size — the standard reproducible-split operator for
    //    training corpora. 80/10/10. --
    "q70_deterministic_split" -> { (s, dir) =>
      val h = substring(md5(col("doc_id").cast("string")), 1, 8)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          when(h < "cccccccc", "train")
            .when(h < "e6666666", "val")
            .otherwise("test").as("split"))
    },

    // -- exact dedup: normalized-md5 fingerprint groups --
    "q43_dedup_exact" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(Text.fingerprint(col("text")).as("fingerprint"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("rep_doc_id"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q40_text_stats" ->
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
        |  round(CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
        |    / greatest(len(string_split_regex(text, '\s+')), 1), 6) AS ttr,
        |  round(CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS punct_ratio,
        |  round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / greatest(len(string_split_regex(text, '\s+')), 1), 6) AS avg_token_len
        |FROM documents""".stripMargin,

    "q41_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    string_split_regex(text, '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
        |    CAST(len(list_filter(toks,
        |      x -> x IN ('the','a','of','in','to','is'))) AS DOUBLE)
        |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS stop_ratio,
        |    least(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS len_score
        |  FROM t)
        |SELECT doc_id, round(ttr, 6) AS ttr, round(stop_ratio, 6) AS stop_ratio,
        |  round(len_score, 6) AS len_score,
        |  round(ttr * 0.5 + stop_ratio * 0.3 + len_score * 0.2, 6) AS quality
        |FROM c""".stripMargin,

    "q42_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    len(list_filter(toks, x -> x IN ('the','a','of','in','to','is'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','de','que','y','los'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','et','une','dans'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','ein'))) AS s_de
        |  FROM t)
        |SELECT doc_id, labeled_lang, s_en, s_es, s_fr, s_de,
        |  CASE WHEN s_en + s_es + s_fr + s_de = 0 THEN 'und'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
        |       WHEN s_fr >= s_de THEN 'fr'
        |       ELSE 'de' END AS pred_lang
        |FROM sc""".stripMargin,

    "q70_deterministic_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
        |         THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "q43_dedup_exact" ->
      """SELECT md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  count(*) AS n_copies, min(doc_id) AS rep_doc_id
        |FROM documents
        |GROUP BY 1""".stripMargin,
  )
}
