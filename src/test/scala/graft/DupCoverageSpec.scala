package graft

import graft.operators.DupCoverage

/** q124 duplicated-n-gram coverage: driver-side brute-force replay on
  * an inline corpus with planted repetition, plus the edge shapes
  * (short docs, fully-repetitive docs, overlap union semantics). */
class DupCoverageSpec extends SparkSpec {

  /** Brute-force reference: covered token indices for width n. */
  private def bruteCov(toks: Array[String], n: Int): Set[Int] = {
    val grams = toks.sliding(n).map(_.mkString(" ")).toArray
    val counts = grams.groupBy(identity).map { case (g, o) => (g, o.length) }
    grams.zipWithIndex.collect {
      case (g, i) if counts(g) >= 2 => (i until i + n)
    }.flatten.toSet
  }

  private def ppm(num: Long, den: Long): Long =
    num * 1000000L / math.max(den, 1L)

  test("q124 coverage matches a driver-side brute force on planted repetition") {
    import spark.implicits._
    val docs = Seq(
      // the 5-gram "a b c d e" repeats; its two occurrences overlap
      // nothing else — 10 covered positions of 13
      (1L, "a b c d e x y z a b c d e"),
      // fully repetitive: every 5-gram (and 10-gram) duplicated
      (2L, ("w1 w2 w3 w4 w5 " * 4).trim),
      // overlapping occurrences of "p p p p p" — union, not sum
      (3L, "p p p p p p q r s t"),
      // no repetition at all
      (4L, "one two three four five six seven eight nine ten eleven"),
      // shorter than n = 5: zero coverage by definition
      (5L, "tiny doc here"),
    ).toDF("doc_id", "text")
    val out = DupCoverage.coverage(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq(1L -> "a b c d e x y z a b c d e",
        2L -> ("w1 w2 w3 w4 w5 " * 4).trim,
        3L -> "p p p p p p q r s t",
        4L -> "one two three four five six seven eight nine ten eleven",
        5L -> "tiny doc here")) {
      val toks = text.split("\\s+")
      val chars = toks.map(_.length.toLong).sum
      val r = out(id)
      assert(r.getLong(1) === toks.length.toLong, s"doc $id n_tokens")
      for ((n, tokCol, charCol) <- Seq((5, 3, 4), (10, 5, 6))) {
        val cov = bruteCov(toks, n)
        val covChars = cov.toSeq.map(i => toks(i).length.toLong).sum
        assert(r.getLong(tokCol) === ppm(cov.size.toLong, toks.length.toLong),
          s"doc $id dup${n}_tok_ppm")
        assert(r.getLong(charCol) === ppm(covChars, chars),
          s"doc $id dup${n}_char_ppm")
      }
    }
    // pinned expectations: doc 2 is fully covered at both widths, doc 4
    // and doc 5 fully uncovered
    assert(out(2L).getLong(3) === 1000000L && out(2L).getLong(5) === 1000000L)
    assert(out(4L).getLong(3) === 0L && out(5L).getLong(3) === 0L)
    // doc 1: exactly the two 5-gram spans, 10/13 tokens
    assert(out(1L).getLong(3) === 10L * 1000000L / 13L)
    // doc 3: positions 0..5 covered by the two overlapping runs of
    // "p p p p p" — 6 of 10 tokens, counted once
    assert(out(3L).getLong(3) === 600000L)
  }
}
