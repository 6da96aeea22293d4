package graft

import graft.operators.LexicalStats

/** q126 PMI collocations + q128 Zipf fit: full driver-side replays on
  * inline corpora (planted collocation ranking; BigInt regression with
  * the shift-guarded divisions), plus the rank-strip seam at
  * m > Strip. */
class LexicalStatsSpec extends SparkSpec {

  // ---- q126 ---------------------------------------------------------

  private def brutePmi(texts: Seq[String])
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val docs = texts.map(_.split("\\s+").toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (w, o) => (w, o.size.toLong) }
    val pairs = docs.flatMap(t => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val pc = pairs.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val n = docs.map(_.size).sum.toLong
    val nb = pairs.size.toLong
    pc.collect { case ((a, b), cab) if cab >= 5 =>
      val pmi = math.round(math.log(
        (cab.toDouble * n.toDouble * n.toDouble) /
          (nb.toDouble * uni(a).toDouble * uni(b).toDouble)) * 1000000)
      (a, b, cab, uni(a), uni(b), pmi)
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(100)
  }

  test("q126 matches a driver-side PMI replay and ranks the planted collocation first") {
    import spark.implicits._
    // "strong coffee" always adjacent (6x); filler words are frequent
    // but combine freely, so their pairwise PMI is ~0
    val filler = Seq("the", "cat", "sat", "mat", "dog", "ran")
    val texts = (0 until 12).map { i =>
      val pad = (0 until 10).map(j => filler((i + j * 3) % filler.length)).mkString(" ")
      if (i % 2 == 0) s"$pad strong coffee $pad" else s"$pad $pad"
    }
    val out = LexicalStats.pmi(texts.toDF("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ref = brutePmi(texts)
    assert(out.length === ref.length)
    out.zip(ref).zipWithIndex.foreach { case ((o, e), i) =>
      assert(o === (e._1, e._2, e._3, e._4, e._5, e._6, i + 1L), s"row $i")
    }
    assert(out.head._1 === "strong" && out.head._2 === "coffee")
  }

  // ---- q128 ---------------------------------------------------------

  /** BigInt replay of the quantized regression — rank-assignment
    * within a frequency tie is irrelevant (y constant per class), so a
    * plain freq-desc sort reproduces the engine's strip construction. */
  private def bruteZipf(texts: Seq[String]): (Long, Long, Long, Long) = {
    val toks = texts.flatMap(_.split("\\s+"))
    val counts = toks.groupBy(identity).values.map(_.size.toLong).toSeq
      .sorted(Ordering[Long].reverse)
    val xy = counts.zipWithIndex.map { case (c, i) =>
      (math.round(math.log((i + 1).toDouble) * 1000000),
        math.round(math.log(c.toDouble) * 1000000))
    }
    val n = BigInt(xy.size)
    val sx = xy.map(t => BigInt(t._1)).sum
    val sy = xy.map(t => BigInt(t._2)).sum
    val sxx = xy.map(t => BigInt(t._1) * t._1).sum
    val sxy = xy.map(t => BigInt(t._1) * t._2).sum
    val den = n * sxx - sx * sx
    val slope = ((n * sxy - sx * sy) * 1000000 +
      BigInt(LexicalStats.SlopeShift) * den) / den - LexicalStats.SlopeShift
    val icpt = (sy * 1000000 - slope * sx +
      BigInt(LexicalStats.InterceptShift) * (n * 1000000)) /
      (n * 1000000) - LexicalStats.InterceptShift
    (xy.size.toLong, toks.size.toLong, slope.toLong, icpt.toLong)
  }

  private def zipfRow(texts: Seq[String]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = LexicalStats.zipf(texts.toDF("text")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("q128 matches the BigInt regression replay on a mixed corpus") {
    val texts = Seq(
      "a a a a a a a a b b b b c c d d e f g h",
      "a a b b c d i j k l m n o p q r",
      "a b c d e f g h i j s t u v w x y z")
    val got = zipfRow(texts)
    assert(got === bruteZipf(texts))
    assert(got._3 < 0, "frequency must fall with rank")
  }

  test("q128 rank strips are seamless when a frequency class exceeds Strip") {
    // 65600 hapax tokens: the c=1 class spans two strips (65536 + 64)
    assert(LexicalStats.Strip === 65536L)
    val hapax = (0 until 65600).map(i => f"t$i%05d").mkString(" ")
    val texts = Seq(hapax, "t00000-rep t00000-rep t00000-rep t00000-rep")
    val got = zipfRow(texts)
    assert(got === bruteZipf(texts))
    assert(got._1 === 65601L) // 65600 hapax + 1 repeated type
  }
}
