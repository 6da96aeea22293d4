package graft

import graft.operators.BpeTrainer

/** Hand-corpus proofs of q114 BPE merge training: exact merge rules
  * with tie-breaks, the canonical left-to-right non-overlap semantics
  * on symbol runs (the case a delimiter-consuming string replace gets
  * wrong), and the non-alnum word filter. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merges replay the classic low/lower example with tie-breaks, exactly") {
    val d = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val out = BpeTrainer.bpeMerges(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: pairs {l o: 3, o w: 3, w e: 1, e r: 1} — count tie
    // between "l o" and "o w", pair-ascending breaks it to "l o"
    // round 2: {lo w: 3, w e: 1, e r: 1}
    // round 3: {low e: 1, e r: 1} — tie again, "e r" < "low e"
    assert(out.toSeq === Seq(
      (1L, "l o", "lo", 3L),
      (2L, "lo w", "low", 3L),
      (3L, "e r", "er", 1L)))
  }

  test("runs merge canonically left-to-right: 'bbbb' becomes [bb bb], never [bb b b]") {
    val d = Seq((1L, "bbbb bbbb"), (2L, "bbb")).toDF("doc_id", "text")
    val out = BpeTrainer.bpeMerges(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: "b b" appears 3x per "bbbb" (x2 words... "bbbb" has
    // count 2? no — two docs: "bbbb" count 2, "bbb" count 1) →
    // overlapping count 3*2 + 2*1 = 8
    assert(out(0) === (1L, "b b", "bb", 8L))
    // canonical merge: bbbb → [bb, bb] (greedy pairs 0&2), bbb →
    // [bb, b] — so round 2 must see "bb bb" (count 2) and "bb b"
    // (count 1): argmax "bb bb". A delimiter-consuming replace would
    // have produced bbbb → [bb, b, b] and picked "b b" again.
    assert(out(1) === (2L, "bb bb", "bbbb", 2L))
  }

  test("only lowercase-alnum word shapes train the merges") {
    val d = Seq((1L, "AB AB AB cd! cd! ee ee ee")).toDF("doc_id", "text")
    val out = BpeTrainer.bpeMerges(d, k = 1).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    // "AB" (uppercase) and "cd!" (punctuation) are filtered; only
    // "ee" (count 3) contributes the pair "e e"
    assert(out.toSeq === Seq(("e e", 3L)))
  }

  test("round plans: pair count is a two-phase keyed agg; the merge rewrite shuffles ONCE on w") {
    // the per-round plans are separate executions (q105 precedent) —
    // audit them directly; counts run on the FormattedMode tree
    // section only (details repeat every node)
    def tree(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.takeWhile(_.nonEmpty).mkString("\n")
    val seqs = Seq(("ab", 2L, Seq("a", "b")), ("abc", 1L, Seq("a", "b", "c")))
      .toDF("w", "c", "sym")
    val pc = tree(BpeTrainer.pairCounts(seqs))
    assert("HashAggregate".r.findAllIn(pc).length >= 2, pc) // map-side partials
    assert(!pc.contains("Join"), pc)
    val best = Seq(("a b", "ab")).toDF("pair", "merged")
    val mr = tree(BpeTrainer.mergeRound(seqs, best))
    // ONE w-keyed shuffle feeds all three windows and the rebuild
    // groupBy ({w} ⊆ {w, island} / {w, c}); the only join is the
    // broadcast of the 1-row merge decision
    assert("(?<!Broadcast)Exchange \\(".r.findAllIn(mr).length === 1, mr)
    assert("BroadcastNestedLoopJoin".r.findAllIn(mr).length <= 1, mr)
    assert(!mr.contains("SortMergeJoin") && !mr.contains("CartesianProduct"), mr)
  }

  test("q115 segmentation stats replay the hand corpus exactly") {
    val d = Seq((1L, "low low lower", "s1"), (2L, "low", "s2"))
      .toDF("doc_id", "text", "source")
    val out = BpeTrainer.segmentStats(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // merges (same chain as above): l o → lo, lo w → low, then the
    // "e r"/"low e" tie broken to "e r": low → [low], lower → [low, er]
    // s1: words {low, low, lower}: symbols 1+1+2 = 4, chars 3+3+5 = 11
    // s2: words {low}: symbols 1, chars 3
    assert(out.toSeq === Seq(
      ("s1", 3L, 4L, 11L, 1000000L * 4 / 11),
      ("s2", 1L, 1L, 3L, 1000000L / 3)))
  }

  test("q185 merge-count frontier replays the hand corpus; real-corpus monotonicity and q115 agreement") {
    val d = Seq((1L, "low low lower", "s1"), (2L, "low", "s2"))
      .toDF("doc_id", "text", "source")
    val out = BpeTrainer.bpeFrontier(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // occurrences: low ×3, lower ×1 → n_words 4, n_chars 3·3+5 = 14
    // k=0 chars: 14 symbols; after "l o"→lo: 3·2+4 = 10; after
    // "lo w"→low: 3·1+3 = 6; after "e r"→er: 3·1+2 = 5
    assert(out.toSeq === Seq(
      (0L, 4L, 14L, 14L, 1000000L),
      (1L, 4L, 10L, 14L, 1000000L * 10 / 14),
      (2L, 4L, 6L, 14L, 1000000L * 6 / 14),
      (3L, 4L, 5L, 14L, 1000000L * 5 / 14)))
    // real corpus: one row per k, n_words/n_chars constant, k=0 is the
    // char split by definition, symbols monotone non-increasing (a
    // merge can only shorten), and the k=3 row is exactly q115's
    // per-source stats rolled up — the frontier ends at the gate datum
    val real = Tables.load(spark, sf0001, "documents")
    val fr = BpeTrainer.bpeFrontier(real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(fr.length === 4)
    assert(fr.map(_._2).distinct.length === 1)
    assert(fr.map(_._4).distinct.length === 1)
    assert(fr.head._3 === fr.head._4 && fr.head._5 === 1000000L)
    fr.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"symbols must not grow: $a vs $b") }
    val q115 = BpeTrainer.segmentStats(real).collect()
    assert(fr.last._2 === q115.map(_.getLong(1)).sum)
    assert(fr.last._3 === q115.map(_.getLong(2)).sum)
    assert(fr.last._4 === q115.map(_.getLong(3)).sum)
  }

  test("pair exhaustion degrades to fewer rows, deterministically") {
    val d = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = BpeTrainer.bpeMerges(d).collect()
    // round 1 merges "a b" → "ab"; rounds 2-3 have no pairs left
    assert(out.length === 1)
    assert(out(0).getString(1) === "a b" && out(0).getLong(3) === 2L)
  }
}
