package graft.operators

import graft.Tables
import graft.functions.{VectorExprs, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>):
  * brute-force cosine top-k as the exactness baseline, all-pairs
  * near-dup detection, and sign-LSH bucketed ANN as the scale path.
  *
  * Scale posture: brute force is one broadcast of the query vector +
  * a map pass + TakeOrderedAndProject — linear and shuffle-free, the
  * right baseline even at 10⁹ rows. The LSH variant buckets vectors
  * by hyperplane sign bits so queries probe ~1/2^H of the corpus
  * (with Hamming-1 multi-probe for recall); bucketing is one narrow
  * shuffle, amortized over all queries.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val Planes = Vectors.randomPlanes(nPlanes = 4, dim = 64, seed = 7L)

  val queries: Map[String, Q] = Map(
    // -- brute-force cosine top-10 for query vector vec_id = 0 --
    "q47_cosine_topk" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(VectorExprs.cosineFast(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },

    // -- all-pairs near-duplicate vectors (cosine ≥ 0.4) --
    "q48_embedding_neardup" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(VectorExprs.cosineFast(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
    },

    // -- semantic-dedup clustering: connected components over the
    //    cosine near-dup graph (the embedding analog of q69) — every
    //    vector labeled with its component's min vec_id. Composes the
    //    oracle-checked q48 pair generation with the pointer-doubling
    //    CC operator; oracle = recursive-CTE closure. Like q48, the
    //    all-pairs edge generation is the ORACLE BASELINE shape; at
    //    100 TB the same clusterLabels call composes over the
    //    LSH-bucketed candidates (q49 path) instead — the CC operator
    //    is agnostic to how the pair list was produced. --
    "q82_embedding_clusters" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      val pairs = a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
          round(VectorExprs.cosineFast(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
        .select("doc_a", "doc_b")
      graft.dedup.ConnectedComponents.clusterLabels(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
    },

    // -- ANN via sign-LSH buckets + Hamming-1 multi-probe (rows-only;
    //    SimilaritySpec pins recall vs the brute-force baseline) --
    "q49_ann_lsh" -> { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val bucketed = e.select(col("vec_id"), col("label"), col("embedding"),
        Vectors.lshBucket(col("embedding"), Planes).as("bucket"))
      val q = bucketed.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"),
          explode(Vectors.probeBuckets(col("bucket"), Planes.length))
            .as("probe"))
      bucketed.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("probe"))
        .select(col("vec_id"), col("label"),
          round(VectorExprs.cosineFast(col("embedding"), col("q_emb")), 6)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },
  )

  val oracles: Map[String, String] = Map(
    "q47_cosine_topk" ->
      """WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(
        |    list_sum(list_transform(list_zip(embedding, q_emb),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(q_emb,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |FROM embeddings, q
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q82_embedding_clusters" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |pairs AS (SELECT vec_a, vec_b FROM p WHERE cos_sim >= 0.4),
        |edges AS (
        |  SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION SELECT vec_b, vec_a FROM pairs),
        |walk AS (
        |  SELECT src AS vec_id, src AS reach FROM edges
        |  UNION
        |  SELECT w.vec_id, e.dst
        |  FROM walk w JOIN edges e ON w.reach = e.src)
        |SELECT vec_id, min(reach) AS cluster_id
        |FROM walk GROUP BY vec_id""".stripMargin,

    "q48_embedding_neardup" ->
      """WITH p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cos_sim FROM p WHERE cos_sim >= 0.4""".stripMargin,
  )
}
