package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the generic relational surface: multiset set
  * operations, null semantics, and the remaining window-function
  * family. */
object ExtendedRelational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- INTERSECT ALL / EXCEPT ALL (multiset semantics) --
    "q37_setops_all" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val p = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersectAll(p).withColumn("op", lit("intersect_all"))
        .union(c.exceptAll(p).withColumn("op", lit("except_all")))
        .groupBy(col("op"), col("nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // -- null semantics: nullif / coalesce / null-safe equality /
    //    null-aware aggregation --
    "q38_null_semantics" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .withColumn("maybe_priority",
          nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")))
      o.groupBy(col("o_orderstatus"))
        .agg(
          count(col("maybe_priority")).as("n_with_priority"), // nulls excluded
          count(lit(1)).as("n_rows"),
          sum(when(col("maybe_priority").isNull, 1L).otherwise(0L)).as("n_null"),
          count(when(col("maybe_priority") <=> lit(null), 1)).as("n_nullsafe_eq_null"),
          max(coalesce(col("maybe_priority"), lit("(none)"))).as("max_or_none"))
    },

    // -- remaining window family: ntile / percent_rank / cume_dist /
    //    first & last value over a frame --
    "q39_win_misc" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          first(col("o_orderkey")).over(wf).as("cheapest_key"),
          last(col("o_orderkey")).over(wf).as("priciest_key"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q37_setops_all" ->
      """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        |p AS (SELECT s_nationkey AS nationkey FROM supplier),
        |u AS (
        |  SELECT nationkey, 'intersect_all' AS op FROM (
        |    SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM p)
        |  UNION ALL
        |  SELECT nationkey, 'except_all' AS op FROM (
        |    SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM p))
        |SELECT op, nationkey, count(*) AS n
        |FROM u GROUP BY op, nationkey""".stripMargin,

    "q38_null_semantics" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |    nullif(o_orderpriority, '4-NOT SPECIFIED') AS maybe_priority
        |  FROM orders)
        |SELECT o_orderstatus,
        |  count(maybe_priority) AS n_with_priority,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN maybe_priority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(CASE WHEN maybe_priority IS NOT DISTINCT FROM NULL
        |             THEN 1 END) AS n_nullsafe_eq_null,
        |  max(coalesce(maybe_priority, '(none)')) AS max_or_none
        |FROM o GROUP BY o_orderstatus""".stripMargin,

    "q39_win_misc" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER wf AS cheapest_key,
        |  last_value(o_orderkey) OVER wf AS priciest_key
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
  )
}
