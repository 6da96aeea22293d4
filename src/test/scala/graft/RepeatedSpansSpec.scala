package graft

import graft.operators.RepeatedSpans
import org.apache.spark.sql.functions._

/** Hand-built-corpus proofs of the ExactSubstr-style span marking and
  * the source containment matrix — span boundaries, island merging,
  * within-doc repeats, short-doc guards, and exact ppm arithmetic. */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("cross-doc shared phrase: one merged span with exact bounds") {
    // p1..p10 shared between docs 1 and 2; every other token unique.
    // 10 shared tokens -> 3 repeated 8-windows (starts 3,4,5 in doc 1;
    // 2,3,4 in doc 2) -> ONE island each, span_tokens = 10.
    val d = docs(
      (1L, "A", "u1 u2 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 u3 u4"),
      (2L, "A", "v1 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 v2 v3"))
    val got = RepeatedSpans.repeatedSpans(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      (1L, 3L, 12L, 10L, 3L),
      (2L, 2L, 11L, 10L, 3L)))
  }

  test("within-doc repetition marks both occurrences as separate islands") {
    // the 8-gram a1..a8 occurs twice in ONE doc, 12 tokens apart
    // (gap > W) -> two spans of exactly one window each
    val mid = (1 to 12).map(i => s"x$i").mkString(" ")
    val eight = (1 to 8).map(i => s"a$i").mkString(" ")
    val d = docs((1L, "A", s"$eight $mid $eight"))
    val got = RepeatedSpans.repeatedSpans(d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    assert(got === Set((1L, 8L, 1L), (21L, 28L, 1L)))
  }

  test("adjacent repeated windows merge into one span (gap == W)") {
    // A = a1..a8 and B = b1..b8 each repeated elsewhere; doc 1 holds
    // them back-to-back -> marked starts 1 and 9, 9-1 = W -> ONE span
    // covering tokens 1..16
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      (1L, "A", s"$a $b"),
      (2L, "A", s"c1 c2 c3 $a"),
      (3L, "A", s"d1 d2 d3 $b"))
    val got = RepeatedSpans.repeatedSpans(d).filter(col("doc_id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 16L, 16L, 2L)))
  }

  test("gap just past W starts a new island") {
    // marked starts 1 and 10 (9 = W+1 apart) -> two spans
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      (1L, "A", s"$a z1 $b"),
      (2L, "A", s"c1 c2 c3 $a"),
      (3L, "A", s"d1 d2 d3 $b"))
    val got = RepeatedSpans.repeatedSpans(d).filter(col("doc_id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 8L), (10L, 17L)))
  }

  test("randomized corpora match a driver-side brute-force reference") {
    // 10 seeded corpora over a 12-token vocabulary (small enough that
    // repeated 8-windows actually occur), each checked against an
    // independent O(n²) reference: count every window by value, mark,
    // merge islands with the same gap rule, compare exactly. Both the
    // gate width (8) and a non-default width (4) exercise the
    // parameterized form.
    for (seed <- 1 to 10; W <- Seq(RepeatedSpans.W, 4)) {
      val rng = new scala.util.Random(seed)
      val corpus = (1L to 12L).map { id =>
        val n = 8 + rng.nextInt(30)
        (id, "A", Seq.fill(n)(s"w${rng.nextInt(12)}").mkString(" "))
      }
      // reference: windows per doc -> global occurrence counts ->
      // marked starts -> islands
      val winsByDoc = corpus.map { case (id, _, text) =>
        val t = text.split("\\s+")
        id -> (1 to t.length - W + 1).map(i =>
          i.toLong -> t.slice(i - 1, i - 1 + W).mkString(" "))
      }.toMap
      val occ = winsByDoc.values.flatten.groupBy(_._2).view.mapValues(_.size).toMap
      val want = winsByDoc.flatMap { case (id, ws) =>
        val marked = ws.collect { case (i, g) if occ(g) >= 2 => i }.sorted
        if (marked.isEmpty) Seq.empty
        else {
          val islands = marked.tail.foldLeft(Vector(Vector(marked.head))) {
            case (acc, i) =>
              if (i - acc.last.last <= W) acc.init :+ (acc.last :+ i)
              else acc :+ Vector(i)
          }
          islands.map(is => (id, is.head, is.last + W - 1,
            is.last - is.head + W, is.size.toLong))
        }
      }.toSet
      val got = RepeatedSpans.repeatedSpans(docs(corpus: _*), W)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === want, s"seed $seed w $W")
      // structural invariant: spans within a doc are disjoint and
      // separated by more than W tokens (else they'd have merged)
      got.groupBy(_._1).foreach { case (_, spans) =>
        val sorted = spans.toSeq.sortBy(_._2)
        sorted.zip(sorted.tail).foreach { case (a, b) =>
          assert(b._2 - (a._3 - W + 1) > W, s"seed $seed: unmerged spans $a $b")
        }
      }
    }
  }

  test("short and empty docs produce no windows and no crash") {
    val d = docs(
      (1L, "A", "only seven tokens here not eight ok"),
      (2L, "A", ""),
      (3L, "A", "a b"))
    assert(RepeatedSpans.repeatedSpans(d).count() === 0)
  }

  test("span scrub removes exactly the repeated span; clean docs pass through") {
    val d = docs(
      (1L, "A", "u1 u2 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 u3 u4"),
      (2L, "A", "v1 p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 v2 v3"),
      (3L, "A", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
    val got = RepeatedSpans.scrubSpans(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) === ((4L, "u1 u2 u3 u4")))
    assert(got(2L) === ((3L, "v1 v2 v3")))
    assert(got(3L) === ((10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")))
  }

  test("span scrub: fully-duplicated documents vanish from the output") {
    // every window of the twin docs occurs twice -> every token is
    // inside a span -> no kept rows -> no output group, both engines
    val ten = (1 to 10).map(i => s"d$i").mkString(" ")
    val d = docs(
      (1L, "A", ten), (2L, "A", ten),
      (3L, "A", (1 to 9).map(i => s"z$i").mkString(" ")))
    val got = RepeatedSpans.scrubSpans(d)
      .collect().map(r => r.getLong(0)).toSet
    assert(got === Set(3L))
  }

  test("source overlap: exact ppm containment both directions") {
    // A's doc: 9 tokens -> distinct windows {t1..t8, t2..t9};
    // B's doc: t1..t8 then z1 -> {t1..t8, t2..t8 z1}. Shared = 1.
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val bTxt = (1 to 8).map(i => s"t$i").mkString(" ") + " z1"
    val d = docs((1L, "A", nine), (2L, "B", bTxt))
    val got = RepeatedSpans.sourceOverlap(d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      ("A", "B", 1L, 2L, 500000L),
      ("B", "A", 1L, 2L, 500000L)))
  }

  test("source overlap: disjoint sources emit no row") {
    val a = (1 to 9).map(i => s"a$i").mkString(" ")
    val b = (1 to 9).map(i => s"b$i").mkString(" ")
    val d = docs((1L, "A", a), (2L, "B", b))
    assert(RepeatedSpans.sourceOverlap(d).count() === 0)
  }
}
