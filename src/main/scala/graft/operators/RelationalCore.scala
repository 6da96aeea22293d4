package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scans, filters/projections, every join
  * family, grouped aggregation, sort/limit, set operations.
  *
  * Derived from the reference's operator inventory (SURVEY.md §2.1-2.7;
  * cosmap implements the cone theta-join at
  * /root/reference/src/cosmap/dataset/opencosmo.py:38-54 and delegates
  * the generic relational surface — here it's first-class).
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation) are broadcast explicitly; the
  *    big-big joins (lineitem⋈orders) are left to Catalyst + AQE which
  *    picks shuffled hash/sort-merge and handles skew at runtime.
  *  - money aggregates are summed as DECIMAL so results are exact and
  *    independent of partition/accumulation order — a correctness
  *    property that must survive any re-partitioning at scale.
  *  - every filter/projection is expressed on base columns so Catalyst
  *    pushes it into the parquet scan (PushedFilters / ReadSchema).
  */
object RelationalCore {
  type Q = (SparkSession, String) => DataFrame

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec4(c: Column): Column = c.cast("decimal(18,4)")

  val queries: Map[String, Q] = Map(
    // -- grouped aggregation over a pushed-down filter (TPC-H Q1 shape) --
    "q01_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // -- projection + conjunctive filter, all pushed to the scan --
    "q02_filter_project" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30 &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice")
    },

    // -- inner equi-join + aggregate --
    "q03_join_inner_agg" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_spent"))
    },

    // -- 4-way join, dimension broadcast, revenue rollup by nation --
    "q04_join_multi_broadcast" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // -- left-semi join (EXISTS) --
    "q05_join_semi" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // -- left-anti join (NOT EXISTS) --
    "q06_join_anti" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    },

    // -- left outer join preserving zero-order customers --
    "q07_join_left_count" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // -- full outer join of two aggregates --
    "q08_join_full_outer" -> { (s, dir) =>
      val sup = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cus = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cus, col("nk_s") === col("nk_c"), "full_outer")
        .select(
          coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
    },

    // -- cross join (small × small; BroadcastNestedLoopJoin) --
    "q09_join_cross" -> { (s, dir) =>
      Tables.load(s, dir, "region")
        .crossJoin(Tables.load(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
    },

    // -- global sort + limit (TakeOrderedAndProject; no full sort at scale) --
    "q13_sort_limit_topk" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // -- distinct projection --
    "q14_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
    },

    // -- count(distinct) per group (expands to two-phase agg) --
    "q15_count_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // -- UNION ALL of two heterogeneous sources, schema-aligned --
    "q16_union_all" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"),
        lit("customer").as("kind"))
      val p = Tables.load(s, dir, "supplier").select(
        col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"), lit("supplier"))
      c.union(p)
    },

    // -- INTERSECT (distinct semantics) --
    "q17_intersect" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(
          Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },

    // -- EXCEPT (distinct semantics) --
    "q18_except" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(
          Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },
  )

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount > 0.05""".stripMargin,

    "q03_join_inner_agg" ->
      """SELECT c_custkey, c_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,

    "q04_join_multi_broadcast" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q05_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q06_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q07_join_left_count" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q08_join_full_outer" ->
      """SELECT coalesce(nk_s, nk_c) AS nationkey,
        |  coalesce(n_suppliers, 0) AS n_suppliers,
        |  coalesce(n_customers, 0) AS n_customers
        |FROM (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
        |      FROM supplier GROUP BY s_nationkey) sup
        |FULL OUTER JOIN
        |     (SELECT c_nationkey AS nk_c, count(*) AS n_customers
        |      FROM customer GROUP BY c_nationkey) cus
        |ON nk_s = nk_c""".stripMargin,

    "q09_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "q13_sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q14_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",

    "q15_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q16_union_all" ->
      """SELECT c_custkey AS key, c_name AS name, c_nationkey AS nationkey,
        |       c_acctbal AS acctbal, 'customer' AS kind
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, s_nationkey, s_acctbal, 'supplier'
        |FROM supplier""".stripMargin,

    "q17_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    "q18_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
  )
}
