package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact and approximate statistical aggregates (SURVEY.md §2.4's
  * distinct/HLL row).
  *
  * q54: exact interpolated percentiles — `percentile` matches
  * DuckDB's `quantile_cont` definition, so it's oracle-checkable
  * (rounded to absorb interpolation-arithmetic ulps).
  * q55: sketch aggregates (HLL count-distinct, t-digest-style
  * approximate percentile). Sketches are engine-specific → rows-only
  * for the driver; ApproxSpec bounds them against exact values.
  * At 100 TB the sketches are the operative path: fixed-size state,
  * mergeable across partitions, single shuffle of sketch bytes.
  */
object ApproxAggs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q54_percentiles" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
    },

    "q55_sketch_aggs" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q54_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
  )
}
