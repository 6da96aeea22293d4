package graft

import graft.streaming.DocStreams
import org.apache.spark.sql.functions._

/** The streaming form of q145: increment docs arriving as
  * micro-batches, flagged per trigger against the static corpus
  * index. Because per-doc flags depend only on the doc and the
  * STATIC corpus, the union of micro-batch outputs must equal the
  * batch q145 report over the same docs — proven here doc-for-doc
  * against the gate operator itself. */
class DocStreamsSpec extends SparkSpec {

  test("streaming incremental dedup ≡ batch q145, across micro-batch boundaries") {
    val d = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val h = substring(md5(col("doc_id").cast("string")), 1, 8)
    val corpus = d.filter(h < "cccccccc")
    val inc = d.filter(h >= "cccccccc")

    // the batch gate's answer for the same increment
    val want = graft.operators.Dedup.incrementalDedup(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    val idx = DocStreams.buildIndex(corpus)
    // increment arrives as TWO micro-batches (one file per trigger)
    val tmp = java.nio.file.Files.createTempDirectory("graftincstream")
    val watch = tmp.resolve("in"); java.nio.file.Files.createDirectories(watch)
    val ids = inc.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    inc.filter(col("doc_id") <= cut).coalesce(1)
      .write.parquet(watch.resolve("b0").toString)
    inc.filter(col("doc_id") > cut).coalesce(1)
      .write.parquet(watch.resolve("b1").toString)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    val stream = spark.readStream
      .schema(inc.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString + "/*")
    val q = DocStreams.run(stream, idx, (flags, _) =>
      got.synchronized {
        got ++= flags.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
      })
    q.processAllAvailable()
    q.stop()
    idx.unpersist()

    assert(got.toSet === want, "streamed flags diverged from batch q145")
    assert(want.exists(_._5 == 1L), "corpus should contain cross-split dups")
    assert(got.size === ids.length, "every streamed doc must be flagged once")
  }
}
