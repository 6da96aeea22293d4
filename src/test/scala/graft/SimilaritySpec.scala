package graft

import graft.functions.Vectors
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine column fn matches driver-side computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("cos"))
    val got = df.head().getDouble(0)
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("brute-force top-10 is ordered and bounded") {
    val rows = Similarity.queries("q47_cosine_topk")(spark, sf0001).collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("ANN LSH results are a subset of corpus with correct scores; recall vs brute force") {
    val brute = Similarity.queries("q47_cosine_topk")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ann = Similarity.queries("q49_ann_lsh")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // scores for ids ANN returns must equal brute-force scores exactly
    ann.foreach { case (id, s) =>
      brute.get(id).foreach(bs => assert(bs === s, s"score mismatch for $id"))
    }
    val recall = ann.keySet.intersect(brute.keySet).size / 10.0
    assert(recall >= 0.3, s"multi-probe LSH recall too low: $recall")
  }

  test("IVF ANN: scores exact for returned ids; recall 0.9 vs brute force") {
    val brute = Similarity.queries("q47_cosine_topk")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = Similarity.queries("q86_ann_ivf")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    ivf.foreach { case (id, s) =>
      brute.get(id).foreach(bs => assert(bs === s, s"score mismatch for $id"))
    }
    val recall = ivf.keySet.intersect(brute.keySet).size / 10.0
    // measured 0.9 with K=16/nprobe=4 at every scale (deterministic
    // centroids: sequential Lloyd's, first-K init); floor just below
    assert(recall >= 0.8, s"IVF recall too low: $recall")
  }

  test("kmeansCentroids: deterministic, normalized, covers the sample") {
    val rng = new scala.util.Random(11)
    val sample = Seq.fill(64)(Array.fill(8)(rng.nextGaussian()))
    val a = graft.functions.Vectors.kmeansCentroids(sample, k = 4, iters = 5)
    val b = graft.functions.Vectors.kmeansCentroids(sample.map(_.clone()), k = 4, iters = 5)
    assert(a === b)
    assert(a.length === 4)
    a.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    }
  }

  test("probeBuckets covers hamming-1 neighborhood") {
    import spark.implicits._
    val buckets = Seq(0b1010).toDF("b")
      .select(explode(Vectors.probeBuckets(col("b"), 4)).as("p"))
      .collect().map(_.getInt(0)).toSet
    assert(buckets === Set(0b1010, 0b1011, 0b1000, 0b1110, 0b0010))
  }
}
class VectorExprsSpec extends SparkSpec {
  import graft.functions.{VectorExprs, Vectors}
  import org.apache.spark.sql.functions._

  test("custom CosineSimilarity expression is bit-identical to the HOF composition") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val both = e.crossJoin(broadcast(q)).select(
      Vectors.cosine(col("embedding"), col("q_emb")).as("hof"),
      VectorExprs.cosineFast(col("embedding"), col("q_emb")).as("fast"))
    assert(both.filter(col("hof") =!= col("fast")).count() === 0)
  }
}
