package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Array/collection scalar-function surface (SURVEY.md §2.8's
  * "array/map library" row), exercised over tokenized documents.
  * Array-valued intermediates are reduced to scalars/strings in the
  * output so the cross-engine comparison is representation-free. */
object CollectionFns {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q36_array_fns" -> { (s, dir) =>
      val toks = split(col("text"), "\\s+")
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_toks"),
        array_join(slice(toks, 1, 3), " ").as("first3"),
        array_contains(toks, "spark").as("has_spark"),
        size(array_distinct(toks)).as("n_unique"),
        array_max(toks).as("max_tok"),
        array_min(toks).as("min_tok"),
        array_join(sort_array(array_distinct(toks)), " ").as("vocab"),
        size(flatten(array(toks, toks))).as("n_doubled"),
        element_at(toks, -1).as("last_tok"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q36_array_fns" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_toks,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  list_contains(toks, 'spark') AS has_spark,
        |  len(list_distinct(toks)) AS n_unique,
        |  list_max(toks) AS max_tok,
        |  list_min(toks) AS min_tok,
        |  array_to_string(list_sort(list_distinct(toks)), ' ') AS vocab,
        |  len(flatten([toks, toks])) AS n_doubled,
        |  toks[-1] AS last_tok
        |FROM t""".stripMargin,
  )
}
