package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite workload queries — classic TPC-H shapes plus analytic
  * patterns (correlated subqueries, regression aggregates, edit
  * distance, time-range frames). Each bundles several operators the
  * way real reporting queries do; all are DuckDB-oracle-checked.
  */
object Workloads {
  type Q = (SparkSession, String) => DataFrame

  private def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** PassJoin candidates at the q84 gate configuration — kept as the
    * probe/spec entry point; the implementation lives in the unified
    * [[EditDistanceJoin]] surface (round-3 verdict #6). */
  def passJoinCandidates(d: DataFrame): DataFrame =
    EditDistanceJoin.candidatesPassJoin(d, 2)

  val queries: Map[String, Q] = Map(
    // -- TPC-H Q3 shape: shipping priority --
    "q61_shipping_priority" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },

    // -- TPC-H Q5 shape: volume by nation via region --
    "q62_regional_volume" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    },

    // -- TPC-H Q10 shape: returned-item customers --
    "q63_returned_items" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // -- correlated scalar subquery: orders above the customer's own
    //    average (window reformulation on the Spark side) --
    "q64_correlated_subquery" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
      o.withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // -- edit distance (levenshtein) for fuzzy matching. Semantics:
    //    same source, |Δn_chars| <= 100 (the standard ER length
    //    filter), head edit distance <= 10. Routed through the unified
    //    EditDistanceJoin surface, which picks length-band blocking
    //    for this large-k regime (see its scaladoc). --
    "q65_edit_distance" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          substring(col("text"), 1, 30).as("head"))
      EditDistanceJoin(d, k = 10, lengthTolerance = Some(("n_chars", 100)))
    },

    // -- whole-string edit distance <= 2 via the same unified surface,
    //    which picks PassJoin segment signatures for the small-k
    //    regime where length-band blocking cannot prune (all heads
    //    share one band) --
    "q84_passjoin_edit2" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          substring(col("text"), 1, 40).as("head"))
      EditDistanceJoin(d, k = 2)
    },

    // -- regression/correlation aggregates per group --
    "q66_regression_aggs" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("price_per_qty"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_cov"))
    },

    // -- time-range window frame: rolling 1-hour event count/sum --
    "q67_time_range_frame" -> { (s, dir) =>
      Tables.load(s, dir, "events").createOrReplaceTempView("graft_events")
      s.sql("""
        SELECT event_id, user_id, ts,
          count(*) OVER w AS n_last_hour,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        FROM graft_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")
    },
  )

  val oracles: Map[String, String] = Map(
    "q61_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,

    "q62_regional_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q63_returned_items" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS lost_revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY lost_revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q64_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
        |                      WHERE i.o_custkey = o.o_custkey)""".stripMargin,

    // the oracle states the pure declarative semantics — the Spark
    // side's band equi-join is lossless w.r.t. the length predicate,
    // so outputs match exactly
    "q65_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars, substring(text, 1, 30) AS head
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.head, b.head) AS edit_dist
        |FROM d a JOIN d b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |  AND abs(a.n_chars - b.n_chars) <= 100
        |WHERE levenshtein(a.head, b.head) <= 10""".stripMargin,

    "q84_passjoin_edit2" ->
      """WITH d AS (
        |  SELECT doc_id, source, substring(text, 1, 40) AS head
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.head, b.head) AS edit_dist
        |FROM d a JOIN d b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 2""".stripMargin,

    "q66_regression_aggs" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q67_time_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  count(*) OVER w AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin,
  )
}
