package graft.operators

import graft.Tables
import graft.functions.NormQuant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding domain-shift audit — the per-domain centroid drift
  * matrix a curation pipeline watches when mixing sources: how far
  * apart the domains sit in embedding space, which pair is closest
  * (mix candidates), which dimension separates them most (probe for
  * a collapsed/rogue feature). The reference's analysis layer
  * (/root/reference/src/cosmap/analysis/runner.py) has no
  * cross-domain statistics — this extends the engine per the brief's
  * training-data mandate.
  *
  *  - q108 pairwise label-centroid distances: embeddings are
  *    unit-normalized and micro-quantized (the q106 fused kernel, so
  *    drift measures direction, not magnitude), per-label integer
  *    centroids are floor-divided means, and each label pair gets
  *    the squared L2 distance and the max per-dimension gap.
  *
  * Cross-engine exactness: quantization is the shared kernel/round()
  * contract; centroid sums are integer; the floor division is made
  * engine-agnostic by SHIFTING each coordinate by +1e6 before the
  * mean — sums become non-negative, where truncating (Spark `div`)
  * and flooring (DuckDB `//`) division agree, and the constant shift
  * cancels in every centroid DIFFERENCE (floor(S/n + 1e6) =
  * floor(S/n) + 1e6). Distances are then pure integer arithmetic.
  *
  * Scale shape: one map-side explode (×64) + ONE keyed shuffle for
  * the (label, pos) aggregation (map-side partials — 64·|labels|
  * groups); the centroid table is dimension-sized, so the pair join
  * is a broadcast of a tiny frame; nothing downstream touches the
  * corpus again.
  */
object DriftAudit {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val Shift = 1000000L

  val queries: Map[String, Q] = Map(
    "q108_label_drift" -> { (s, dir) =>
      driftMatrix(Tables.load(s, dir, "embeddings"))
    },
  )

  /** The dimension-sized (label, pos, c, n) centroid table — the one
    * corpus-touching job, exposed un-checkpointed so the plan guard
    * can pin its shape. */
  private[graft] def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(NormQuant(col("embedding"))))
      .select(col("label"), col("pos"),
        (col("col") + lit(Shift)).as("vs"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("vs")).as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), expr("sv div n").as("c"), col("n"))

  /** The pairwise centroid-drift matrix over any (label, embedding)
    * frame — exposed for the spec's synthetic-corpus proofs. */
  private[graft] def driftMatrix(e: DataFrame): DataFrame = {
      // materialize the tiny centroid table once: a self-join of the
      // un-cut frame would re-run the corpus aggregation per side
      val ct = centroids(e).localCheckpoint(true)
      val a = ct.select(col("label").as("label_a"), col("pos"),
        col("c").as("ca"), col("n").as("n_a"))
      val b = ct.select(col("label").as("label_b"), col("pos"),
        col("c").as("cb"), col("n").as("n_b"))
      val d = col("ca") - col("cb")
      a.join(b, a("pos") === b("pos") && col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"), col("n_a"), col("n_b"))
        .agg(sum(d * d).as("l2sq"), max(abs(d)).as("max_dim_gap"))
  }

  val oracles: Map[String, String] = Map(
    "q108_label_drift" -> {
      val nrm = "sqrt(" + (1 to 64).map(i =>
        s"CAST(embedding[$i] AS DOUBLE) * CAST(embedding[$i] AS DOUBLE)")
        .mkString(" + ") + ")"
      s"""WITH nn AS (SELECT label, embedding, $nrm AS nrm FROM embeddings),
         |qv AS (
         |  SELECT label, CAST(i - 1 AS INTEGER) AS pos,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) / nrm * 1000000.0) AS BIGINT)
         |      + $Shift AS vs
         |  FROM nn, (SELECT unnest(generate_series(1, 64)) AS i) ii),
         |ct AS (
         |  SELECT label, pos, CAST(sum(vs) // count(*) AS BIGINT) AS c,
         |    count(*) AS n
         |  FROM qv GROUP BY label, pos)
         |SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
         |  CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS l2sq,
         |  CAST(max(abs(a.c - b.c)) AS BIGINT) AS max_dim_gap
         |FROM ct a JOIN ct b ON a.pos = b.pos AND a.label < b.label
         |GROUP BY 1, 2, 3, 4""".stripMargin
    },
  )
}
