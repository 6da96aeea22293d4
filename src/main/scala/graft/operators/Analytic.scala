package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic surface: window functions, multi-dimensional aggregation
  * (cube / rollup / grouping sets), pivot.
  *
  * Absent from the reference (SURVEY.md §2.5: full-source check found no
  * ranking/lag/frame logic) — this is north-star engine surface, built
  * directly on Spark's native window/grouping machinery.
  *
  * Determinism note: every window ORDER BY and top-k ends in a unique
  * key (orderkey / linenumber) so results are reproducible across any
  * partitioning — required both for the DuckDB oracle and for stable
  * re-runs on a real cluster.
  */
object Analytic {
  type Q = (SparkSession, String) => DataFrame

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // -- ranking window: top-3 orders per customer --
    "q10_win_topn" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    },

    // -- running-total frame (rows unbounded preceding .. current) --
    "q11_win_running" -> { (s, dir) =>
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("running_qty"))
    },

    // -- lag / lead / rank over a per-customer order history --
    "q12_win_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          row_number().over(w).as("order_seq"))
    },

    // -- dense_rank with real ties (priority within status) --
    "q12b_win_dense_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          dense_rank().over(w).as("prio_rank"))
    },

    // -- CUBE with grouping indicators --
    "q19_cube" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
    },

    // -- ROLLUP over a derived column --
    "q20_rollup" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
        .agg(sum(dec2(col("o_totalprice"))).cast("double").as("total"),
          count(lit(1)).as("n"))
    },

    // -- GROUPING SETS --
    "q21_grouping_sets" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
    },

    // -- pivot (wide aggregation over a known key domain) --
    "q30_pivot" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
    },
  )

  val oracles: Map[String, String] = Map(
    "q10_win_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q11_win_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem""".stripMargin,

    "q12_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  row_number() OVER w AS order_seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q12b_win_dense_rank" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  dense_rank() OVER (PARTITION BY o_orderstatus
        |                     ORDER BY o_orderpriority) AS prio_rank
        |FROM orders""".stripMargin,

    "q19_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n,
        |  GROUPING(l_returnflag) AS g_rf,
        |  GROUPING(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q20_rollup" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)""".stripMargin,

    "q21_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin,

    "q30_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS F,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
  )
}
