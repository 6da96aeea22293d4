package graft.operators

import graft.Tables
import graft.functions.{HllSketch, Sketches, SplitMix64}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact and approximate statistical aggregates (SURVEY.md §2.4's
  * distinct/HLL row).
  *
  * q54: exact interpolated percentiles — `percentile` matches
  * DuckDB's `quantile_cont` definition, so it's oracle-checkable
  * (rounded to absorb interpolation-arithmetic ulps).
  *
  * q55: Spark's built-in sketch aggregates (HLL++ count-distinct,
  * t-digest-style approximate percentile). Their internals are
  * engine-specific — replaying them in SQL would test Spark against
  * itself — so q55 stays rows-only; ApproxSpec bounds the outputs
  * against exact values.
  *
  * q55b (round-4 verdict #3): the engine OWNS the sketches instead —
  * [[graft.functions.HllSketchAgg]] (splitmix64-hashed registers,
  * merge = per-register max) and [[graft.functions.HistQuantileAgg]]
  * (fixed-width integer-cents histogram, merge = vector add), both
  * `TypedImperativeAggregate`s with fixed-size mergeable state. Their
  * definitions are pure 64-bit integer arithmetic plus one IEEE-exact
  * division, so the generated oracle below replays the FULL register
  * state and the gate checks them EXACT — deterministic across
  * engines, partitionings, and cluster sizes.
  *
  * At 100 TB the sketches are the operative path: fixed-size state,
  * mergeable across partitions, single shuffle of sketch bytes.
  */
object ApproxAggs {
  type Q = (SparkSession, String) => DataFrame

  /** q55b sketch parameters. */
  private val HllSalt = 55L
  private val WidthCents = 8192L // ≈ $82 buckets; error bound = 1 bucket
  private val Buckets = 2048 // covers cents up to 2048·8192 ≈ $167k

  /** Integer-cents projection of l_extendedprice — through
    * DECIMAL(15,2) on BOTH engines (the q01-proven conversion). */
  private val CentsSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)"

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

    "q55b_owned_sketches" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          Sketches.hllDigest(col("l_partkey"), HllSalt).as("h"),
          Sketches.histQuantiles(expr(CentsSql), WidthCents, Buckets).as("q"))
        .select(col("l_returnflag"),
          col("h.reg_sum").as("hll_reg_sum"),
          col("h.zeros").as("hll_zeros"),
          col("h.inv_num").as("hll_inv_num"),
          col("h.est").as("hll_estimate"),
          col("q.n").as("n_rows"),
          col("q.p50_cents").as("p50_cents"),
          col("q.p90_cents").as("p90_cents"))
    },
  )

  /** Code-generated replay of BOTH owned sketches: the HLL register
    * table is rebuilt in SQL (mix through a CTE column; trailing-zero
    * rank via an integer bit-probe list — no floating-point log), the
    * histogram via integer bucket GROUP BY + window cumsum. The one
    * double, hll_estimate, is a division of bit-identical operands
    * (shortest-round-trip numerator literal / exact ≤2^52 integer). */
  private def oracle55b: String = {
    val m = HllSketch.M
    val p = HllSketch.P
    val maxRho = HllSketch.MaxRho
    val estNum = HllSketch.EstNumerator.toString
    s"""WITH h0 AS (
       |  SELECT l_returnflag AS flag,
       |    ${SplitMix64.saltedSql("CAST(l_partkey AS HUGEINT)", HllSalt)} AS x
       |  FROM lineitem),
       |h1 AS (SELECT flag, ${SplitMix64.mixSql("x")} AS h FROM h0),
       |hr AS (SELECT flag, CAST(h % $m AS INTEGER) AS idx, (h >> $p) AS w FROM h1),
       |rr AS (SELECT flag, idx,
       |  CASE WHEN w = 0 THEN $maxRho
       |       ELSE least(list_position(list_transform(range(0, ${64 - p}),
       |         t -> CAST((w >> t) % 2 AS INTEGER)), 1), $maxRho) END AS r
       |  FROM hr),
       |regs AS (SELECT flag, idx, max(r) AS mr FROM rr GROUP BY flag, idx),
       |dig AS (SELECT flag, sum(mr) AS reg_sum, count(*) AS present,
       |  sum(CAST(1 AS HUGEINT) << ($maxRho - mr)) AS inv_present
       |  FROM regs GROUP BY flag),
       |hll AS (SELECT flag,
       |  CAST(reg_sum AS BIGINT) AS hll_reg_sum,
       |  CAST($m - present AS INTEGER) AS hll_zeros,
       |  CAST(inv_present + ($m - present) * (CAST(1 AS HUGEINT) << $maxRho)
       |    AS BIGINT) AS hll_inv_num,
       |  $estNum / CAST(inv_present + ($m - present) * (CAST(1 AS HUGEINT) << $maxRho)
       |    AS DOUBLE) AS hll_estimate
       |  FROM dig),
       |hq AS (SELECT l_returnflag AS flag,
       |  least(greatest($CentsSql // $WidthCents, 0), ${Buckets - 1}) AS idx
       |  FROM lineitem),
       |hc AS (SELECT flag, idx, count(*) AS c FROM hq GROUP BY flag, idx),
       |hn AS (SELECT flag, idx,
       |  sum(c) OVER (PARTITION BY flag ORDER BY idx) AS cs,
       |  sum(c) OVER (PARTITION BY flag) AS n FROM hc),
       |q50 AS (SELECT flag, CAST(min(n) AS BIGINT) AS n_rows, min(idx) AS i
       |  FROM hn WHERE cs >= (n + 1) // 2 GROUP BY flag),
       |q90 AS (SELECT flag, min(idx) AS i
       |  FROM hn WHERE cs >= (9 * n + 9) // 10 GROUP BY flag)
       |SELECT hll.flag AS l_returnflag, hll_reg_sum, hll_zeros, hll_inv_num,
       |  hll_estimate, q50.n_rows,
       |  CAST(q50.i * $WidthCents AS BIGINT) AS p50_cents,
       |  CAST(q90.i * $WidthCents AS BIGINT) AS p90_cents
       |FROM hll
       |JOIN q50 ON hll.flag = q50.flag
       |JOIN q90 ON hll.flag = q90.flag""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q54_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q55b_owned_sketches" -> oracle55b,
  )
}
