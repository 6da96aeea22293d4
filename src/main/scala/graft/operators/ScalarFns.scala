package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: string / date / math / JSON functions,
  * CASE, HAVING, scalar subqueries, time-bucketed event aggregation.
  *
  * The reference's only scalar library is numpy-in-user-space plus unit
  * conversion at call edges (SURVEY.md §2.8); here the engine exposes
  * Spark's codegen'd built-ins directly — no UDFs in any of these
  * plans, so every expression stays inside WholeStageCodegen.
  *
  * Cross-engine determinism: transcendentals (ln) are rounded to 6
  * decimals (libm vs java.lang.Math may differ in the last ulp);
  * round() on doubles is avoided at representable .5 boundaries
  * (Spark rounds the shortest decimal repr, C engines round the binary
  * value — they disagree at exact midpoints).
  */
object ScalarFns {
  type Q = (SparkSession, String) => DataFrame

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, Q] = Map(
    // -- string functions --
    "q22_string_fns" -> { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "@").as("name_sub"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          split(col("p_type"), " ").getItem(0).as("type_first"))
    },

    // -- date/time functions --
    "q23_date_fns" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          quarter(col("o_orderdate")).as("o_quarter"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).cast("timestamp").as("due_date"),
          datediff(lit("2000-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_y2k"))
    },

    // -- math functions --
    "q24_math_fns" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          abs(col("l_discount") - lit(0.05)).as("disc_dev"),
          (col("l_orderkey") % 7).as("key_mod"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
    },

    // -- HAVING over exact integer-valued sums --
    "q25_having" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"))
        .filter(col("total_qty") > 500)
    },

    // -- CASE WHEN bucketing + aggregate --
    "q26_case_when" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("bal_bucket"),
          col("c_acctbal"))
        .groupBy(col("bal_bucket"))
        .agg(count(lit(1)).as("n"), max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"))
    },

    // -- scalar subquery: orders above global average price.
    // Spark plan: single-row aggregate broadcast into a filter —
    // no driver-side collect, works at any scale. --
    "q27_subquery_scalar" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val avgPrice = o.agg(avg(col("o_totalprice")).as("ap"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // -- JSON extraction (events.props is a JSON string column) --
    "q28_json_extract" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .filter(col("k_val") > 50)
    },

    // -- time-bucketed (tumbling-window equivalent) event aggregation --
    "q29_events_hourly" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("total_value"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q22_string_fns" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  length(p_name) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, 'a', '@', 'g') AS name_sub,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  split_part(p_type, ' ', 1) AS type_first
        |FROM part""".stripMargin,

    "q23_date_fns" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  day(o_orderdate) AS o_day,
        |  quarter(o_orderdate) AS o_quarter,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
        |FROM orders""".stripMargin,

    "q24_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  l_orderkey % 7 AS key_mod,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem""".stripMargin,

    "q25_having" ->
      """SELECT l_partkey, sum(l_quantity) AS total_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(l_quantity) > 500""".stripMargin,

    "q26_case_when" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS bal_bucket,
        |  count(*) AS n, max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal
        |FROM customer
        |GROUP BY 1""".stripMargin,

    "q27_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,

    "q28_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin,

    "q29_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
  )
}
