package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: every
  * document gets the minimum doc_id of its component as cluster id —
  * the canonical-representative assignment that greedy pair-dropping
  * (q53) approximates.
  *
  * Algorithm: iterative min-label propagation. Each round joins the
  * current labels across the (symmetrized) edge list and takes the
  * min of neighbor labels; terminates when no label changes.
  * Rounds needed = graph diameter (near-dup clusters are tiny, so
  * 2-4 in practice); each round is one shuffle join keyed by vertex —
  * the standard large-scale CC shape (large-star/small-star is the
  * same idea with better worst-case rounds). The driver-side loop
  * only checks a scalar convergence count per round — no data is
  * collected.
  */
object ConnectedComponents {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_id = component min). */
  def clusterLabels(pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    // symmetric edge list
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id"))
      .persist()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val updated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .persist()
      val changed = updated.alias("u")
        .join(labels.alias("l"), col("u.doc_id") === col("l.doc_id"))
        .filter(col("u.cluster_id") =!= col("l.cluster_id"))
        .count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      round += 1
    }
    edges.unpersist()
    labels
  }
}
