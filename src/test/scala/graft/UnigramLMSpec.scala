package graft

import graft.operators.UnigramLM
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** q155 unigram-LM tokenizer training: the Viterbi kernel's DP
  * contract, the classic toy-corpus recovery, and determinism under
  * repartitioning. */
class UnigramLMSpec extends SparkSpec {

  private def seg(w: String, edges: Seq[(Int, Int, Long)],
      maxPiece: Int = 4): Seq[String] = {
    val rows = edges.map { case (e, k, c) =>
      org.apache.spark.sql.catalyst.InternalRow(e, k, c)
    }
    graft.functions.ViterbiKernel
      .segment(UTF8String.fromString(w),
        new GenericArrayData(rows.toArray[Any]), maxPiece)
      .array.map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  test("Viterbi kernel: picks the min-cost segmentation") {
    // chars cost 10 each; "ab" costs 12 — "ab"+"c" (22) beats a+b+c (30)
    val edges = Seq((1, 1, 10L), (2, 1, 10L), (3, 1, 10L), (2, 2, 12L))
    assert(seg("abc", edges) === Seq("ab", "c"))
  }

  test("Viterbi kernel: cost ties break to the SMALLER piece (the oracle's row_number order)") {
    // "ab" costs exactly a+b: tie at position 2 → k=1 path wins
    val edges = Seq((1, 1, 10L), (2, 1, 10L), (2, 2, 20L))
    assert(seg("ab", edges) === Seq("a", "b"))
  }

  test("Viterbi kernel: unreachable end and empty word yield empty (total function)") {
    assert(seg("abc", Seq((1, 1, 10L), (2, 1, 10L))) === Seq.empty) // no edge at 3
    assert(seg("", Seq.empty) === Seq.empty)
  }

  test("toy corpus: EM recovers the obvious segmentation") {
    import spark.implicits._
    // a corpus built from one repeated trigram plus noise chars: the
    // trained model must segment abcabc(abc)* into 'abc' pieces
    val docs = (0 until 40).map { i =>
      (i.toLong, ("abcabc abcabcabc abc " + ("xy " * (i % 3))).trim)
    }.toDF("doc_id", "text")
    val (sp, voc) = UnigramLM.train(docs)
    val pieces = UnigramLM.segmentWith(sp, voc)
      .groupBy(col("w")).agg(collect_list(col("piece")).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(pieces("abcabc") === Seq("abc", "abc"))
    assert(pieces("abcabcabc") === Seq("abc", "abc", "abc"))
    assert(pieces("abc") === Seq("abc"))
    // and 'abc' carries the dominant count in the trained vocab
    val top = voc.orderBy(col("cnt").desc).limit(1).head.getString(0)
    assert(top === "abc", s"dominant piece was $top")
  }

  test("training is invariant under input partitioning") {
    val d = Tables.load(spark, sf0001, "documents")
    val a = UnigramLM.queries("q155_unigram_lm")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (_, voc) = UnigramLM.train(d.repartition(13))
    val b = voc.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("q157 segment stats: piece budgets bounded by words and chars; toy corpus compresses to the trigram rate") {
    import spark.implicits._
    val docs = (0 until 30).map(i => (i.toLong, "abcabc abcabcabc", "s0"))
      .toDF("doc_id", "text", "source")
    val stats = UnigramLM.segmentStats(docs).collect()
    assert(stats.length === 1)
    val r = stats(0)
    val (nw, np, nc, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
    assert(nw === 60L)            // 2 words × 30 docs
    assert(np === 30L * (2 + 3))  // 'abc' pieces: 2 + 3 per doc
    assert(nc === 30L * (6 + 9))
    assert(ppm === 1000000L * np / nc) // = 333333: 1 piece per 3 chars
    // real corpus: every eligible occurrence segments, and piece
    // counts sit between word count and char count
    val real = UnigramLM.segmentStats(Tables.load(spark, sf0001, "documents"))
      .collect()
    assert(real.nonEmpty)
    real.foreach { s =>
      assert(s.getLong(2) >= s.getLong(1) && s.getLong(2) <= s.getLong(3))
    }
  }

  test("char smoothing keeps every word segmentable across rounds (no word ever drops)") {
    import spark.implicits._
    val docs = Seq((1L, "zzzz qqq zq"), (2L, "zzzz zzzz qqq"))
      .toDF("doc_id", "text")
    val (sp, voc) = UnigramLM.train(docs)
    val segged = UnigramLM.segmentWith(sp, voc)
      .select(col("w")).distinct().collect().map(_.getString(0)).toSet
    assert(segged === Set("zzzz", "qqq", "zq"))
  }
}
