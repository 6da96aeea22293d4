package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling: per-column quality metrics in ONE pass over the
  * table (counts, null counts, distincts, ranges) — the standard
  * pre-ingestion audit for a training corpus. Stacked as one row per
  * column so adding columns never changes the schema. */
object Profiling {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q74_profile" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      def prof(colName: String, valueExpr: org.apache.spark.sql.Column) = struct(
        lit(colName).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(valueExpr.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(valueExpr).as("n_distinct"),
        min(valueExpr.cast("string")).as("min_str"),
        max(valueExpr.cast("string")).as("max_str"))
      o.agg(
        prof("o_orderstatus", col("o_orderstatus")).as("a"),
        prof("o_orderpriority", col("o_orderpriority")).as("b"),
        prof("o_custkey", col("o_custkey")).as("c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("p"))
        .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct",
          "p.min_str", "p.max_str")
    },
  )

  val oracles: Map[String, String] = Map(
    "q74_profile" ->
      """SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT o_orderstatus) AS n_distinct,
        |  min(CAST(o_orderstatus AS VARCHAR)) AS min_str,
        |  max(CAST(o_orderstatus AS VARCHAR)) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  min(CAST(o_orderpriority AS VARCHAR)), max(CAST(o_orderpriority AS VARCHAR))
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_custkey),
        |  min(CAST(o_custkey AS VARCHAR)), max(CAST(o_custkey AS VARCHAR))
        |FROM orders""".stripMargin,
  )
}
