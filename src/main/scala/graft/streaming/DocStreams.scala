package graft.streaming

import graft.dedup.MinHashLSH
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental-ingest dedup — the §2.9 form of q145: a
  * stream of arriving documents is flagged per MICRO-BATCH against a
  * pre-built static index of the standing corpus (band buckets + gram
  * arrays, computed once and persisted). Each trigger is one "daily
  * increment" of the batch operator: the per-doc flags depend only on
  * the doc and the STATIC corpus — never on other streamed docs — so
  * the union of micro-batch outputs equals the batch q145 report over
  * the same doc set BY CONSTRUCTION (StreamingIncrementSpec proves it
  * batch-for-batch), and the stream needs NO cross-trigger state at
  * all: the classic stream-static enrichment shape, with foreachBatch
  * carrying the multi-stage candidate+verify plan a single
  * stream-static join cannot express.
  *
  * 100 TB posture: the index is the big side and lives partitioned on
  * the cluster (never broadcast — the q145 argument); per trigger the
  * batch side is small, so the band join and the two verify joins are
  * batch-sized probes into it. Index refresh = rebuild + swap, the
  * standard reference-data pattern. */
object DocStreams {

  /** The standing corpus's LSH index: (band, bucket, corp_id) +
    * (doc_b, grams_b, ng_b), both persisted — built ONCE, probed by
    * every micro-batch. */
  final case class CorpusIndex(buckets: DataFrame, grams: DataFrame) {
    def unpersist(): Unit = { buckets.unpersist(false); grams.unpersist(false) }
  }

  def buildIndex(corpus: DataFrame): CorpusIndex = {
    val b = MinHashLSH.bandBuckets(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3)
      .select(col("band"), col("bucket"), col("doc_id").as("corp_id"))
      .persist()
    val g = MinHashLSH.gramSide(corpus, "doc_id", "text", 3, "b").persist()
    b.count(); g.count()
    CorpusIndex(b, g)
  }

  /** One micro-batch flagged against the index — the q145 semantics
    * verbatim: band-collision candidates (batch×index, never a
    * self-join), exact 3-gram Jaccard verify, increment-sided report
    * via the SAME [[graft.operators.Dedup.incrementReport]]. */
  def flagBatch(batch: DataFrame, idx: CorpusIndex): DataFrame = {
    val ib = MinHashLSH.bandBuckets(batch, "doc_id", "text",
        numHashes = 64, bands = 16, shingleN = 3)
      .select(col("band"), col("bucket"), col("doc_id").as("inc_id"))
    val cand = ib.join(idx.buckets, Seq("band", "bucket"))
      .select(col("inc_id").as("doc_a"), col("corp_id").as("doc_b"))
      .distinct()
    val verified = MinHashLSH.verifySided(cand,
      MinHashLSH.gramSide(batch, "doc_id", "text", 3, "a"),
      idx.grams, threshold = 0.5)
    graft.operators.Dedup.incrementReport(
      batch.select(col("doc_id")), verified)
  }

  /** Run the stream: every trigger's docs are flagged and handed to
    * `sink` (write to the ingest ledger, alerting, ...). */
  def run(docStream: DataFrame, idx: CorpusIndex,
          sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, idx), id)
      }
      .start()
}
