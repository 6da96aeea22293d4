package graft

import graft.dedup.MinHashLSH
import graft.functions.{SimHash, Text}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("minhash LSH finds exactly the J>=0.5 pairs (vs exact jaccard)") {
    val exact = graft.operators.Dedup.queries("q44_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLSH.nearDupPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh === exact)
  }

  test("minhash verify reports jaccard equal to exact computation") {
    val lsh = MinHashLSH.nearDupPairs(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exact = Dedup.queries("q44_ngram_jaccard")(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(lsh === exact)
  }

  test("simhash is deterministic, order-insensitive in token multiset, and separates near-dups") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token swap
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), SimHash.simhash64(Text.tokens(col("text"))).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)),
      s"near-dup pair should be closer: ${ham(fps(1L), fps(2L))} vs ${ham(fps(1L), fps(3L))}")
    // re-evaluation is stable
    val again = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === fps)
  }

  test("simhash chunk-join candidates are complete for hamming <= 3") {
    // brute-force all-pairs hamming on the corpus fingerprints
    val fps = docs
      .select(col("doc_id"), SimHash.simhash64(Text.tokens(col("text"))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ida, fa) <- fps; (idb, fb) <- fps
      if ida < idb && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ida, idb)).toSet
    val got = Dedup.queries("q46_simhash_pairs")(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("exact dedup fingerprint normalizes whitespace and case") {
    import spark.implicits._
    val fp = Seq("Hello  World", "hello world", " hello\tworld ")
      .toDF("text").select(Text.fingerprint(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(fp.size === 1)
  }
}
