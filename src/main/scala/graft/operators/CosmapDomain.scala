package graft.operators

import graft.Tables
import graft.domain.{SkyBounds, SphereSampler}
import graft.plans.{ConeJoin, RectJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The cosmap-shaped domain queries, run against the driver corpus.
  *
  * q31 derives deterministic ra/dec from TPC-H keys so the full cone
  * join (theta-join on spherical separation) is SQL-expressible and
  * DuckDB-oracle-checked — the radius (19.97°) is chosen off the 0.1°
  * coordinate lattice so no pair lands within float-ulp distance of
  * the predicate boundary (Java vs libm trig differ in the last ulp).
  *
  * q32/q33 exercise the seeded sampler and the full quickstart
  * pipeline (sampler → cone join → per-sample aggregate,
  * /root/reference/README.md:55-174). Their oracles are
  * CODE-GENERATED (the q83 playbook): the sampler's splitmix64 draw
  * is replayed in pure 64-bit DuckDB arithmetic
  * (SplitMix64.uniformSql) and the frame/z-span constants are emitted
  * as shortest-round-trip double literals computed by the very same
  * Scala code path the Spark plan uses — so both engines evaluate
  * bit-identical sample positions. Per the house determinism rules,
  * the one transcendental output column (dec, through asin) is
  * rounded to 6 decimals on both sides; ra is pure IEEE arithmetic
  * and stays raw.
  */
object CosmapDomain {
  type Q = (SparkSession, String) => DataFrame

  /** orders → pseudo-catalog: ra ∈ [0,360) and dec ∈ [-60,60) on an
    * exact 0.1° lattice (integer-derived doubles — identical in any
    * engine). */
  private def derivedCatalog(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey").as("object_id"),
      ((col("o_orderkey") % 3600).cast("double") / 10.0).as("ra"),
      ((col("o_custkey") % 1200).cast("double") / 10.0 - 60.0).as("dec"))

  private def derivedSamples(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "region").select(
      col("r_regionkey").cast("long").as("sample_id"),
      (col("r_regionkey").cast("double") * 60.0 + 30.0).as("ra"),
      (col("r_regionkey").cast("double") * 25.0 - 50.0).as("dec"),
      lit(19.97).as("radius_deg"))

  /** Quickstart region: RA ∈ [31,38], Dec ∈ [−11,−4]
    * (/root/reference/README.md:146-150), 2-arcmin circles. */
  val QuickstartBounds: SkyBounds = SkyBounds(31, 38, -11, -4)
  val QuickstartRadiusDeg: Double = 2.0 / 60.0

  val queries: Map[String, Q] = Map(
    // -- cone theta-join via the dec-band equi-join rewrite, + per-
    //    sample aggregate. The oracle states the same query as a raw
    //    theta-join: band rewrite ≡ theta join is thereby gate-checked.
    "q31_cone_join_agg" -> { (s, dir) =>
      val joined = ConeJoin.bandJoin(
        derivedCatalog(s, dir), derivedSamples(s, dir), bandDeg = 5.0)
      joined.groupBy(col("sample_id"))
        .agg(count(lit(1)).as("n_objects"),
          sum(col("sep_deg").cast("decimal(18,6)")).cast("double").as("sum_sep"))
    },

    // -- seeded area-uniform sampler, EXACT-gated: the oracle replays
    //    the splitmix64 draw; dec (the one asin-derived column) is
    //    round-6 on both sides --
    "q32_sampler" -> { (s, _) =>
      SphereSampler.uniformCircles(s, 1000, QuickstartBounds,
        QuickstartRadiusDeg, seed = 42L)
        .select(col("sample_id"), col("ra"),
          round(col("dec"), 6).as("dec"), col("radius_deg"))
    },

    // -- full quickstart parity pipeline: sampler → cone join →
    //    min-separation filter → per-sample (n, inv) with empty
    //    samples preserved. EXACT-gated: the oracle replays the
    //    sampler draw + the identical haversine join/aggregate in SQL
    //    (dec round-6 on both sides; n/inv already decimal-summed per
    //    house rules; golden spec additionally pins the raw run) --
    "q33_quickstart_pipeline" -> { (s, dir) =>
      quickstartRaw(s, dir)
        .select(col("sample_id"), col("ra"),
          round(col("dec"), 6).as("dec"), col("n"), col("inv"))
    },

    "q68_cone_centroid" -> coneCentroid,

    // -- Rectangle sample join (EXCEEDS the reference, which errors
    //    on non-Circle shapes — verdict stretch item #9): dec-band
    //    equi-join rewrite gate-checked against the raw declarative
    //    predicate in DuckDB. Half-extents 19.97/9.97 sit off the
    //    0.1° lattice (same ulp-safety reasoning as q31). --
    "q75_rect_join_agg" -> { (s, dir) =>
      val samples = Tables.load(s, dir, "region").select(
        col("r_regionkey").cast("long").as("sample_id"),
        (col("r_regionkey").cast("double") * 60.0 + 30.0).as("ra"),
        (col("r_regionkey").cast("double") * 25.0 - 50.0).as("dec"),
        lit(39.94).as("width_deg"),
        lit(19.94).as("height_deg"))
      RectJoin.bandJoin(derivedCatalog(s, dir), samples, bandDeg = 5.0)
        .groupBy(col("sample_id"))
        .agg(count(lit(1)).as("n_objects"),
          sum((col("dec") - col("s_dec")).cast("decimal(18,6)"))
            .cast("double").as("sum_ddec"))
    },
  )

  /** The unrounded quickstart pipeline (sampler → band cone join →
    * min-separation filter → per-sample aggregate). The q33 gate
    * query is this plus display round-6 on dec; AnalysisRunnerSpec
    * proves the declared config+DAG pipeline equals THIS raw form row
    * for row, so the parity check stays bit-strength.
    *
    * Band plan: the broadcast nested-loop plan evaluates
    * |catalog| x |samples| separations and is bound by the scan's
    * partition count; the 0.25-degree band equi-join prunes pairs and
    * parallelizes on the shuffle key (band==broadcast equivalence is
    * property-tested in ConeJoinSpec). */
  def quickstartRaw(s: SparkSession, dir: String): DataFrame = {
    val catalog = quickstartCatalog(s, dir)
    val samples = SphereSampler.uniformCircles(s, 1000, QuickstartBounds,
      QuickstartRadiusDeg, seed = 42L)
    val joined = ConeJoin.bandJoin(catalog, samples, bandDeg = 0.25)
    ConeJoin.quickstartAggregate(joined, samples, minSepArcsec = 5.0)
  }

  /** The quickstart pseudo-catalog (lineitem keys → a 0.001° lattice
    * inside the quickstart region). Shared with ConeJoinSpec's
    * boundary-margin probe so the probe measures the shipped data. */
  private[graft] def quickstartCatalog(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      col("l_orderkey").as("object_id"),
      (lit(31.0) + (col("l_orderkey") % 7000).cast("double") / 1000.0).as("ra"),
      (lit(-11.0) + (col("l_partkey") % 7000).cast("double") / 1000.0).as("dec"))

  /** The q31/q68 derived inputs, exposed for the same margin probe. */
  private[graft] def derivedCatalogFor(s: SparkSession, dir: String): DataFrame =
    derivedCatalog(s, dir)
  private[graft] def derivedSamplesFor(s: SparkSession, dir: String): DataFrame =
    derivedSamples(s, dir)

  /** q68: per-sample angular centroid of cone contents via the typed
    * CentroidAgg UDAF (partial+merge aggregation; buffer is 4 doubles
    * per group). Same derived geometry as q31 so DuckDB can state the
    * centroid directly with unit-vector sums. */
  private def coneCentroid: Q = { (s, dir) =>
    import graft.functions.CentroidAgg
    val joined = ConeJoin.bandJoin(
      derivedCatalog(s, dir), derivedSamples(s, dir), bandDeg = 5.0)
    joined.select(col("sample_id"), col("ra"), col("dec"))
      .groupBy(col("sample_id"))
      .agg(CentroidAgg.udafColumn(col("ra"), col("dec")).as("c"))
      .select(col("sample_id"),
        round(col("c.ra"), 6).as("centroid_ra"),
        round(col("c.dec"), 6).as("centroid_dec"))
  }

  // ---- code-generated sampler oracles (q32/q33) --------------------
  //
  // Every constant below is computed by the SAME Scala code path the
  // Spark plan uses (frame shrink, z-span) and emitted as a shortest-
  // round-trip double literal — DuckDB parses decimal literals to the
  // nearest double, and shortest-round-trip reprs round-trip, so both
  // engines hold bit-identical constants. The draw itself is the
  // splitmix64 replay (integer-exact, SplitMix64.uniformSql).

  /** CTE body producing (sample_id, ra, dec[raw]) exactly as
    * SphereSampler.uniformCenters does. */
  private def samplerSql(n: Long, bounds: SkyBounds, radiusDeg: Double,
                         seed: Long): String = {
    import graft.functions.SplitMix64
    val f = SphereSampler.frame(bounds, radiusDeg)
    val zLo = math.sin(math.toRadians(f.decMin))
    val zHi = math.sin(math.toRadians(f.decMax))
    val raSpan = f.raMax - f.raMin
    val zSpan = zHi - zLo
    val uRa = SplitMix64.uniformSql("range", seed)
    val uDec = SplitMix64.uniformSql("range", seed + 1)
    s"""SELECT CAST(range AS BIGINT) AS sample_id,
       |  ${f.raMin} + $uRa * $raSpan AS ra,
       |  degrees(asin($zLo + $uDec * $zSpan)) AS dec
       |FROM range(0, $n)""".stripMargin
  }

  private def oracle32: String =
    s"""WITH smp AS (
       |${samplerSql(1000, QuickstartBounds, QuickstartRadiusDeg, 42L)})
       |SELECT sample_id, ra, round(dec, 6) AS dec,
       |  $QuickstartRadiusDeg AS radius_deg
       |FROM smp""".stripMargin

  /** Full quickstart replay: sampler CTE + the identical haversine
    * join (operand order mirrored from Sphere.angularSepDeg so both
    * engines evaluate the same IEEE expression tree) + decimal-summed
    * aggregate with empty samples preserved. */
  private def oracle33: String = {
    val sep =
      """degrees(asin(least(1.0, sqrt(
        |      sin(radians(s.dec - c.dec) / 2) * sin(radians(s.dec - c.dec) / 2)
        |      + cos(radians(c.dec)) * cos(radians(s.dec))
        |        * sin(radians(s.ra - c.ra) / 2) * sin(radians(s.ra - c.ra) / 2)))) * 2)"""
        .stripMargin
    s"""WITH smp AS (
       |${samplerSql(1000, QuickstartBounds, QuickstartRadiusDeg, 42L)}),
       |cat AS (
       |  SELECT l_orderkey AS object_id,
       |         31.0 + (l_orderkey % 7000) / 1000.0 AS ra,
       |         -11.0 + (l_partkey % 7000) / 1000.0 AS dec
       |  FROM lineitem),
       |matched AS (
       |  SELECT s.sample_id, $sep AS sep_deg
       |  FROM cat c, smp s
       |  WHERE $sep <= $QuickstartRadiusDeg),
       |agg AS (
       |  SELECT sample_id, count(*) AS n,
       |    CAST(sum(CAST(round(sep_deg * 3600.0, 3) AS DECIMAL(28,3))) AS DOUBLE) AS inv
       |  FROM matched
       |  WHERE sep_deg * 3600.0 > 5.0
       |  GROUP BY sample_id)
       |SELECT s.sample_id, s.ra, round(s.dec, 6) AS dec,
       |  coalesce(a.n, 0) AS n, coalesce(a.inv, 0.0) AS inv
       |FROM smp s LEFT JOIN agg a USING (sample_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q32_sampler" -> oracle32,
    "q33_quickstart_pipeline" -> oracle33,

    "q75_rect_join_agg" ->
      """WITH cat AS (
        |  SELECT o_orderkey AS object_id,
        |         (o_orderkey % 3600) / 10.0 AS ra,
        |         (o_custkey % 1200) / 10.0 - 60.0 AS dec
        |  FROM orders),
        |smp AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS sample_id,
        |         r_regionkey * 60.0 + 30.0 AS ra,
        |         r_regionkey * 25.0 - 50.0 AS dec,
        |         39.94 AS width_deg, 19.94 AS height_deg
        |  FROM region)
        |SELECT s.sample_id,
        |  count(*) AS n_objects,
        |  CAST(sum(CAST(c.dec - s.dec AS DECIMAL(18,6))) AS DOUBLE) AS sum_ddec
        |FROM cat c, smp s
        |WHERE abs(c.dec - s.dec) <= s.height_deg / 2
        |  AND least(abs(c.ra - s.ra), 360.0 - abs(c.ra - s.ra))
        |        * cos(radians(s.dec)) <= s.width_deg / 2
        |GROUP BY s.sample_id""".stripMargin,

    "q31_cone_join_agg" ->
      """WITH cat AS (
        |  SELECT o_orderkey AS object_id,
        |         (o_orderkey % 3600) / 10.0 AS ra,
        |         (o_custkey % 1200) / 10.0 - 60.0 AS dec
        |  FROM orders),
        |smp AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS sample_id,
        |         r_regionkey * 60.0 + 30.0 AS ra,
        |         r_regionkey * 25.0 - 50.0 AS dec,
        |         19.97 AS radius_deg
        |  FROM region)
        |SELECT s.sample_id,
        |  count(*) AS n_objects,
        |  CAST(sum(CAST(
        |    degrees(2 * asin(least(1.0, sqrt(
        |      sin(radians(c.dec - s.dec) / 2) * sin(radians(c.dec - s.dec) / 2)
        |      + cos(radians(s.dec)) * cos(radians(c.dec))
        |        * sin(radians(c.ra - s.ra) / 2) * sin(radians(c.ra - s.ra) / 2)))))
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_sep
        |FROM cat c, smp s
        |WHERE degrees(2 * asin(least(1.0, sqrt(
        |        sin(radians(c.dec - s.dec) / 2) * sin(radians(c.dec - s.dec) / 2)
        |        + cos(radians(s.dec)) * cos(radians(c.dec))
        |          * sin(radians(c.ra - s.ra) / 2) * sin(radians(c.ra - s.ra) / 2)))))
        |      <= s.radius_deg
        |GROUP BY s.sample_id""".stripMargin,

    "q68_cone_centroid" ->
      """WITH cat AS (
        |  SELECT o_orderkey AS object_id,
        |         (o_orderkey % 3600) / 10.0 AS ra,
        |         (o_custkey % 1200) / 10.0 - 60.0 AS dec
        |  FROM orders),
        |smp AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS sample_id,
        |         r_regionkey * 60.0 + 30.0 AS ra,
        |         r_regionkey * 25.0 - 50.0 AS dec,
        |         19.97 AS radius_deg
        |  FROM region),
        |joined AS (
        |  SELECT s.sample_id, c.ra, c.dec
        |  FROM cat c, smp s
        |  WHERE degrees(2 * asin(least(1.0, sqrt(
        |          sin(radians(c.dec - s.dec) / 2) * sin(radians(c.dec - s.dec) / 2)
        |          + cos(radians(s.dec)) * cos(radians(c.dec))
        |            * sin(radians(c.ra - s.ra) / 2) * sin(radians(c.ra - s.ra) / 2)))))
        |        <= s.radius_deg),
        |sums AS (
        |  SELECT sample_id,
        |    sum(cos(radians(dec)) * cos(radians(ra))) AS x,
        |    sum(cos(radians(dec)) * sin(radians(ra))) AS y,
        |    sum(sin(radians(dec))) AS z
        |  FROM joined GROUP BY sample_id)
        |SELECT sample_id,
        |  round(CASE WHEN degrees(atan2(y, x)) < 0
        |             THEN degrees(atan2(y, x)) + 360.0
        |             ELSE degrees(atan2(y, x)) END, 6) AS centroid_ra,
        |  round(degrees(asin(z / sqrt(x*x + y*y + z*z))), 6) AS centroid_dec
        |FROM sums""".stripMargin,
  )
}
