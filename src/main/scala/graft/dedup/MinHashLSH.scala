package graft.dedup

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket-join → exact verify).
  *
  * Scale design, stage by stage:
  *  1. Signatures are computed *per row with zero shuffle*: the
  *     shingle set is an array column, and sig[k] = min over shingles
  *     of xxhash64(shingle, k) is a nested higher-order expression —
  *     no explode, no groupBy. A 100 TB corpus signs in one map pass.
  *  2. Banding emits `bands` rows per doc (the only row expansion),
  *     keyed by (band, band-signature-hash) — the classic LSH
  *     bucket key. The following self-join is an *equi-join* Catalyst
  *     executes as a shuffled hash join on the bucket key; candidate
  *     generation never goes quadratic in corpus size, only within
  *     buckets (AQE's skew handling covers pathological buckets).
  *  3. Exact Jaccard verification runs only on candidate pairs.
  *
  * With b bands of r rows: P(candidate | J) = 1 - (1 - J^r)^b —
  * b=16, r=4 gives ~0.96 recall at J=0.8, ~0.007 at J=0.2.
  */
object MinHashLSH {

  /** (doc_id, band, bucket) — one row per band per doc. Signatures
    * come from the [[graft.functions.MinHashSignature]] expression
    * (one tight loop per row — see its scaladoc for why not HOFs).
    * The bucket key is the splitmix64 foldMix chain over the band's
    * signature slice seeded by the band index — the same family the
    * signature uses, and (unlike xxhash64's internal array protocol)
    * replayable by the DuckDB oracle. */
  def bandBuckets(docs: DataFrame, idCol: String, textCol: String,
                  numHashes: Int, bands: Int, shingleN: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val bandCols = (0 until bands).map(b =>
      graft.functions.SplitMix64.mixFold(slice(col("sig"), b * r + 1, r), b))
    docs.select(col(idCol).as("doc_id"),
        Text.tokens(col(textCol)).as("toks"))
      // docs with < shingleN tokens have ZERO shingles: they would all
      // carry the identical all-sentinel signature and collide pairwise
      // in every band — quadratic candidate growth in the short-doc
      // count at scale, for pairs the verify stage nulls out anyway
      // (0-gram jaccard). Drop them up front, mirroring the oracle's
      // sh3 prefilter (round-4 advice #2).
      .filter(size(col("toks")) >= shingleN)
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSignature(
          col("toks"), numHashes, shingleN).as("sig"))
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Distinct candidate pairs (doc_a < doc_b) sharing any band bucket. */
  def candidatePairs(buckets: DataFrame): DataFrame =
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Exact word-n-gram Jaccard for given pairs only: join the
    * candidate pairs against the per-doc gram ARRAYS and intersect
    * per row — two keyed joins sized by the (small) candidate set,
    * no gram-level explode/shuffle (same verify shape as the
    * prefix-filtered exact join in graft.operators.Dedup). */
  def verify(docs: DataFrame, pairs: DataFrame, idCol: String,
             textCol: String, shingleN: Int, threshold: Double): DataFrame =
    verifySided(pairs,
      gramSide(docs, idCol, textCol, shingleN, "a"),
      gramSide(docs, idCol, textCol, shingleN, "b"), threshold)

  /** One side's (doc_X, grams_X, ng_X) table for [[verifySided]] —
    * exposed so a stream can verify its micro-batch against a
    * PRE-BUILT static corpus gram table (graft.streaming.DocStreams)
    * instead of re-shingling the corpus per trigger. */
  def gramSide(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int, side: String): DataFrame =
    docs.select(col(idCol).as(s"doc_$side"),
        Text.wordNGrams(col(textCol), shingleN).as(s"grams_$side"))
      .withColumn(s"ng_$side", size(col(s"grams_$side")))

  /** Exact-Jaccard verify with independently-supplied sides. */
  def verifySided(pairs: DataFrame, ga: DataFrame, gb: DataFrame,
                  threshold: Double): DataFrame =
    pairs.join(ga, "doc_a").join(gb, "doc_b")
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      // exact ppm integer jaccard (cross-engine-stable; see Dedup)
      .selectExpr("doc_a", "doc_b",
        "CAST(inter AS BIGINT) * 1000000 div (CAST(ng_a AS BIGINT) + ng_b - inter) AS jaccard_ppm")
      .filter(col("jaccard_ppm") >= math.round(threshold * 1e6))

  /** Full pipeline: near-dup pairs with exact Jaccard ≥ threshold. */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", numHashes: Int = 64,
                   bands: Int = 16, shingleN: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    // widen single-file inputs before the compute-heavy sketch stage;
    // gated on the file count (the planner's own lower bound on scan
    // parallelism) so an already-wide source pays no unconditional
    // shuffle — and, unlike .rdd.getNumPartitions, reading it never
    // materializes the RDD lineage (same fix as Dedup.widen)
    val target = docs.sparkSession.sparkContext.defaultParallelism
    val files = docs.inputFiles.length
    // files == 0 means a non-file-backed plan (in-memory frame, post-
    // transform view): partitioning is unreadable without materializing,
    // so leave it alone rather than force a full shuffle (round-4
    // advice #4, same fix as Dedup.widen)
    val wide =
      if (files == 0 || files >= target) docs
      else docs.repartition(target)
    val buckets = bandBuckets(wide, idCol, textCol, numHashes, bands, shingleN)
    verify(wide, candidatePairs(buckets), idCol, textCol, shingleN, threshold)
  }
}
