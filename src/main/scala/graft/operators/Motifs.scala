package graft.operators

import graft.Tables
import graft.functions.SplitMix64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bipartite-motif census over the customer↔supplier trade graph —
  * butterfly (2×2-biclique) counting, the bipartite analog of
  * triangle counting and the standard cohesion diagnostic for
  * bipartite link graphs (doc↔host, user↔item, query↔url; Wang, Fu,
  * Cheng & Xu 2014; Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018).
  * A crawl-curation pipeline reads it next to q105/q127/q130/q131:
  * high butterfly density marks templated/mirrored link structure
  * the way q124's dup-n-gram coverage marks templated text. The
  * reference's analysis layer (/root/reference/src/cosmap/analysis/
  * runner.py) has no graph ops at all — this extends the engine per
  * the brief's training-data mandate.
  *
  *  - q133: EXACT census — edges, wedges, max co-degree, butterflies
  *    = Σ_pairs C(shared, 2) over supplier pairs.
  *  - q134: the scale twin — one-shot sparsification (ESpar): keep
  *    each edge with probability 1/8 by a deterministic splitmix64
  *    coin on the edge key, count exactly on the sample, estimate
  *    butterflies as count·8⁴ (each butterfly survives with p⁴).
  *
  * Cross-engine exactness: every number is an integer count; the
  * q134 coin is the splitmix64 uniform replayed bit-exactly in SQL
  * (the q70/q101/q116 contract). The butterfly sum rides
  * DECIMAL(38,0)/HUGEINT internally (Σ C(shared,2) approaches 1e14
  * on a 1e9-edge graph — inside BIGINT for the OUTPUT, but the
  * partial-sum headroom is free) and C(cnt,2) uses `div` (cnt·(cnt−1)
  * is even, but floor-vs-truncate must still agree — both engines
  * state it identically on non-negatives).
  *
  * Scale shape (the 100 TB posture): exact butterfly counting is
  * inherently wedge-bounded — every known exact algorithm pays
  * Θ(Σ_side min d²) — so the decisive choices are (a) WHICH side's
  * wedges to enumerate and (b) when to stop being exact. (a): wedges
  * are enumerated per-CUSTOMER (supplier pairs sharing a customer):
  * measured at sf0.1 the customer side has 12.5M wedges vs the
  * supplier side's 172M — a structural 14× (suppliers are the
  * high-degree side; the published vertex-priority rule, §4 of
  * Sanei-Mehri 2018). The edge list is built once (eager
  * localCheckpoint feeding its three references); the self-join is
  * hinted off broadcast (both sides corpus-scale) and pays two
  * E-sized customer-keyed exchanges — linear, keyed — and the pair
  * groupBy's map-side partials reduce the wedge stream to the
  * distinct-pair table before it shuffles.
  * (b): q133 is the DECLARED wedge-bound baseline (the q82/q83
  * pattern); q134 is the gated scale path — sparsifying at p keeps
  * p²·wedges (64× fewer here) with relative error O(1/(p²·√bf)),
  * and p tunes against the wedge budget at any corpus size. Driver
  * state: both gates return ONE row.
  */
object Motifs {
  type Q = (SparkSession, String) => DataFrame

  /** q134 constants: the splitmix salt and the keep modulus (keep
    * probability 1/SampleMod, estimator multiplies by SampleMod⁴). */
  private[graft] val SampleSalt = 133L
  private[graft] val SampleMod = 8L
  private[graft] val EstScale = SampleMod * SampleMod * SampleMod * SampleMod

  val queries: Map[String, Q] = Map(
    // -- exact butterfly census of the distinct trade graph: one row
    //    (n_edges, n_wedges, max_shared, n_butterflies). --
    "q133_butterflies" -> { (s, dir) =>
      census(edges(Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "lineitem")), est = false)
    },
    // -- ESpar estimate on the 1-in-8 deterministic edge sample: the
    //    same census over the sample + the p⁻⁴-scaled estimator. --
    "q134_butterflies_espar" -> { (s, dir) =>
      census(sample(edges(Tables.load(s, dir, "orders"),
        Tables.load(s, dir, "lineitem"))), est = true)
    },
  )

  /** The distinct bipartite edge list (c, s) of the trade graph —
    * the q105 construction without the node-id folding. */
  private[graft] def edges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        col("l_suppkey").cast("long").as("s"))
      .distinct()

  /** The deterministic 1-in-SampleMod edge sample: a splitmix64
    * uniform on the collision-free edge key c·2³² + s (the q116
    * floor-shard contract — bit-exact in both engines). */
  private[graft] def sample(e: DataFrame): DataFrame =
    e.withColumn("u", SplitMix64.uniform(
        col("c") * lit(4294967296L) + col("s"), SampleSalt))
      .where(floor(col("u") * SampleMod) === 0)
      .select(col("c"), col("s"))

  /** The one-row butterfly census over any (c, s) edge frame. The
    * edge list is localCheckpoint'd (eager) so the orders⋈lineitem
    * build runs ONCE for its three references (edge count + both
    * self-join sides). A pre-partitioning cannot be carried into the
    * self-join on this Spark: a cached AQE plan hides its output
    * partitioning from the outer planner (InMemoryRelation wraps an
    * AdaptiveSparkPlan) and an eager localCheckpoint of an adaptive
    * plan lands as UnknownPartitioning — both re-exchange anyway
    * (measured, not guessed) — so the census accepts the join's own
    * two E-sized customer-keyed exchanges: linear, keyed, the
    * natural distributed shape. */
  private[graft] def census(e: DataFrame, est: Boolean): DataFrame = {
    val ec = e.localCheckpoint(true)
    censusPlan(ec, est).localCheckpoint(true)
  }

  /** The census plan, un-checkpointed (plan-shape-testable): the
    * customer-keyed wedge self-join rides the caller's partitioning,
    * the pair groupBy map-side-combines to the distinct-pair table,
    * and the edge count attaches as a broadcast scalar. */
  private[graft] def censusPlan(ec: DataFrame, est: Boolean): DataFrame = {
    val wedges = ec.as("a")
      .join(ec.as("b").hint("shuffle_merge"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
      .agg(count(lit(1)).as("cnt"))
    val bf = wedges.agg(
      sum(col("cnt")).as("n_wedges"),
      max(col("cnt")).as("max_shared"),
      sum(expr("CAST(cnt * (cnt - 1) div 2 AS DECIMAL(38,0))"))
        .as("bfd"))
    val base = broadcast(ec.agg(count(lit(1)).as("n_edges"))).crossJoin(bf)
      .select(col("n_edges"), col("n_wedges"), col("max_shared"),
        col("bfd").cast("long").as("n_butterflies"))
    if (est) base.withColumn("est_butterflies",
      col("n_butterflies") * lit(EstScale))
    else base
  }

  // ---- code-generated DuckDB oracle (same constants) ---------------

  private def edgeSql: String =
    """e AS MATERIALIZED (
      |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
      |    CAST(l_suppkey AS BIGINT) AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""".stripMargin

  private def censusSql(src: String, est: Boolean): String = {
    val estCol =
      if (est) s",\n  CAST(bfd AS BIGINT) * $EstScale AS est_butterflies"
      else ""
    s"""w AS (
       |  SELECT a.s AS s1, b.s AS s2, count(*) AS cnt
       |  FROM $src a JOIN $src b ON a.c = b.c AND a.s < b.s
       |  GROUP BY a.s, b.s),
       |bf AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_wedges,
       |    CAST(max(cnt) AS BIGINT) AS max_shared,
       |    sum(CAST(cnt * (cnt - 1) // 2 AS HUGEINT)) AS bfd
       |  FROM w)
       |SELECT (SELECT count(*) FROM $src) AS n_edges, n_wedges,
       |  max_shared, CAST(bfd AS BIGINT) AS n_butterflies$estCol
       |FROM bf""".stripMargin
  }

  private def oracle133: String =
    s"WITH $edgeSql,\n${censusSql("e", est = false)}"

  private def oracle134: String = {
    val keyU = SplitMix64.uniformSql("k", SampleSalt)
    s"""WITH $edgeSql,
       |ek AS (SELECT c, s, CAST(c AS HUGEINT) * 4294967296 + s AS k FROM e),
       |eu AS (SELECT c, s, $keyU AS u FROM ek),
       |es AS MATERIALIZED (SELECT c, s FROM eu WHERE floor(u * $SampleMod) = 0),
       |${censusSql("es", est = true)}""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q133_butterflies" -> oracle133,
    "q134_butterflies_espar" -> oracle134,
  )
}
