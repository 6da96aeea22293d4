package graft.operators

import graft.Tables
import graft.functions.NormQuant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means training (Lloyd's algorithm, fixed
  * iterations) — the codebook-training step behind every IVF/PQ
  * index and the classic embedding-space clustering pass of a
  * curation pipeline (FAISS trains exactly this before
  * coarse-quantizing; q86/q94's checked-in Centroids86/94 codebooks
  * were trained OFFLINE — this query runs the training IN the
  * engine, the "train a model as a groupBy" family alongside q105's
  * PageRank, q110's Naive Bayes and q114's BPE). The reference
  * analysis layer (/root/reference/src/cosmap/analysis/runner.py)
  * has no clustering at all.
  *
  * Cross-engine exactness: vectors are unit-normalized and
  * micro-quantized by the shared NormQuant kernel (the q106/q108
  * contract), after which EVERYTHING is integer arithmetic —
  * squared-L2 distances, the (dist, cluster) argmin tie-break, and
  * the centroid mean via the q108 +1e6-shift floor division (each
  * quantized coordinate is ≥ -1e6, so the shifted sum is
  * non-negative, where Spark's truncating `div` and DuckDB's
  * flooring `//` agree; the shift cancels after division). The
  * fixed-iteration result is bit-stable on any engine, partitioning
  * or summation order; floor losses are part of the DEFINITION the
  * oracle replays. Empty clusters carry their previous centroid
  * (deterministic on both engines via the same LEFT JOIN).
  *
  * Scale shape (100 TB posture): the quantized-coordinate table is
  * exploded ONCE, repartitioned by vec_id and persisted — every
  * iteration reuses that exchange. Per iteration: the K·d-row
  * centroid table BROADCASTS into the coordinate scan (model state
  * is tiny, corpus never moves for it); the per-(vector, cluster)
  * distance groupBy and the vec-partitioned argmin window both ride
  * the vec_id partitioning ({vec_id} ⊆ {vec_id, cluster} — the q107
  * clustered-distribution argument, so the window adds NO exchange);
  * the centroid update is one (cluster, pos) groupBy whose map-side
  * partials reduce the shuffle to K·d rows per partition. Per-round
  * localCheckpoint cuts the iterate's lineage (the CC house rule).
  */
object KMeansTrain {
  type Q = (SparkSession, String) => DataFrame

  /** Shared engine/oracle constants: K centroids, T Lloyd rounds,
    * embedding dimensionality, the floor-division shift. */
  private[graft] val KmK = 8
  private[graft] val KmIters = 3
  private[graft] val Dim = 64
  private[graft] val Shift = 1000000L

  val queries: Map[String, Q] = Map(
    // -- T=3 integer-exact Lloyd rounds from the K smallest vec_ids;
    //    output the final codebook, one row per (cluster, pos), with
    //    the final membership counts. --
    "q118_kmeans_train" -> { (s, dir) =>
      train(Tables.load(s, dir, "embeddings"))
    },
  )

  /** The trained codebook over any (vec_id, embedding) frame:
    * (cluster, pos, c, n). Exposed for the spec's replay. */
  private[graft] def train(e: DataFrame): DataFrame = {
    // quantized coordinates, exploded once, reused 2x per round
    val qv = e.select(col("vec_id"), posexplode(NormQuant(col("embedding"))))
      .select(col("vec_id"), col("pos"), col("col").as("q"))
      .repartition(col("vec_id"))
      .persist()
    // deterministic init: the K smallest vec_ids, cluster = their
    // rank (TakeOrdered — K rows of driver state at any corpus size)
    val ids = e.select(col("vec_id")).orderBy(col("vec_id")).limit(KmK)
      .withColumn("cluster",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
    var cent = qv.join(broadcast(ids), "vec_id")
      .select(col("cluster"), col("pos"), col("q").as("c"),
        lit(0L).as("n"))
      .localCheckpoint(true)
    for (_ <- 1 to KmIters)
      cent = round(qv, cent).localCheckpoint(true)
    qv.unpersist()
    cent
  }

  /** One Lloyd round, un-checkpointed (plan-shape-testable):
    * assign-to-nearest + recompute means + empty-cluster carry. */
  private[graft] def round(qv: DataFrame, prev: DataFrame): DataFrame = {
    val cent = prev.select(col("cluster"), col("pos"), col("c"))
    val asg = qv.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("cluster"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("dist"), col("cluster"))))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("cluster"))
    val sums = qv.join(asg.hint("shuffle_merge"), "vec_id")
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("q") + lit(Shift)).as("sq"), count(lit(1)).as("n"))
    cent.join(sums, Seq("cluster", "pos"), "left")
      .select(col("cluster"), col("pos"),
        coalesce(expr(s"(sq div n) - $Shift"), col("c")).as("c"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  // ---- code-generated DuckDB oracle (same constants, unrolled —
  //      the q105/q114 playbook) ------------------------------------

  private def oracle118: String = {
    val nrm = "sqrt(" + (1 to Dim).map(i =>
      s"CAST(embedding[$i] AS DOUBLE) * CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ") + ")"
    val iters = (1 to KmIters).map { i =>
      s"""d$i AS (
         |  SELECT qv.vec_id, cc.cluster, sum((q - c) * (q - c)) AS dist
         |  FROM qv JOIN c${i - 1} cc USING (pos)
         |  GROUP BY qv.vec_id, cc.cluster),
         |a$i AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist, cluster) AS rk
         |    FROM d$i)
         |  WHERE rk = 1),
         |s$i AS (
         |  SELECT cluster, pos, sum(q + $Shift) AS sq, count(*) AS n
         |  FROM qv JOIN a$i USING (vec_id) GROUP BY cluster, pos),
         |c$i AS (
         |  SELECT p.cluster, p.pos,
         |    coalesce((sq // s.n) - $Shift, p.c) AS c, coalesce(s.n, 0) AS n
         |  FROM c${i - 1} p
         |  LEFT JOIN s$i s ON p.cluster = s.cluster AND p.pos = s.pos)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT vec_id, embedding, $nrm AS nrm FROM embeddings),
       |qv AS (
       |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
       |    CAST(round(CAST(embedding[i] AS DOUBLE) / nrm * 1000000.0) AS BIGINT) AS q
       |  FROM nn, (SELECT unnest(generate_series(1, $Dim)) AS i) ii),
       |ids AS (
       |  SELECT vec_id,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster
       |  FROM embeddings ORDER BY vec_id LIMIT $KmK),
       |c0 AS (SELECT cluster, pos, q AS c, 0 AS n FROM ids JOIN qv USING (vec_id)),
       |$iters
       |SELECT cluster, pos, CAST(c AS BIGINT) AS c, CAST(n AS BIGINT) AS n
       |FROM c$KmIters""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q118_kmeans_train" -> oracle118,
  )
}
