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

  // ---- q136 ---------------------------------------------------------

  /** Reference TextRank: the engine's exact integer semantics —
    * bigram graph with weight floor 3, K=4 damped rounds of
    * (r div wd)·w contributions in micro-units. */
  private def bruteTextRank(texts: Seq[String]): Seq[(Long, String, Long, Long)] = {
    val docs = texts.map(_.split("\\s+").toSeq)
    val pairs = docs.flatMap(t => t.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))))
      .filter(p => p._1 != p._2)
      .map(p => if (p._1 <= p._2) p else (p._2, p._1))
    val und = pairs.groupBy(identity)
      .collect { case (p, o) if o.size >= 3 => (p, o.size.toLong) }
    val adj: Map[String, Seq[(String, Long)]] = und.toSeq
      .flatMap { case ((a, b), w) => Seq((a, (b, w)), (b, (a, w))) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val wd = adj.map { case (n, es) => n -> es.map(_._2).sum }
    var r: Map[String, Long] = wd.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 4)
      r = adj.map { case (n, es) =>
        n -> (150000L + 85L * es.map { case (u, w) => (r(u) / wd(u)) * w }.sum / 100L)
      }
    r.toSeq.map { case (n, rv) => (n, wd(n), rv) }
      .sortBy { case (n, _, rv) => (-rv, n) }.take(50)
      .zipWithIndex.map { case ((n, w, rv), i) => ((i + 1).toLong, n, w, rv) }
  }

  test("q136 matches the driver-side integer TextRank replay; the planted hub ranks first") {
    import spark.implicits._
    // "hub" is every spoke's ONLY neighbor, heavily repeated; the
    // filler/noise pair is a separate 2-clique — hub must rank first
    val spokes = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val texts =
      spokes.flatMap(s => Seq.fill(4)(s"hub $s hub $s")) ++
        Seq.fill(5)("filler noise filler noise") ++
        Seq("rare paironce") // below the weight floor: not a node
    val got = graft.operators.LexicalStats.textrank(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === bruteTextRank(texts))
    assert(got.head._2 === "hub")
    assert(!got.exists(t => t._2 == "rare" || t._2 == "paironce"))
  }

  // ---- q137 ---------------------------------------------------------

  /** Reference DP: the engine's exact integer semantics — common
    * denominator c·N, closed-form absent-cell fold, one ppm floor. */
  private def bruteDp(rows: Seq[(String, String)]): Seq[(Long, String, Long, Long)] = {
    val toks = rows.flatMap { case (src, t) =>
      t.split("\\s+").toSeq.map(w => (src, w)) }
    val ni = toks.groupBy(_._1).map { case (s, o) => s -> BigInt(o.size) }
    val n = BigInt(toks.size)
    val scored = toks.groupBy(_._2).collect {
      case (w, occ) if occ.size >= 100 =>
        val c = BigInt(occ.size)
        val present = occ.groupBy(_._1).map { case (s, o) => s -> BigInt(o.size) }
        val pnum = present.map { case (s, csi) => (csi * n - ni(s) * c).abs }.sum
        // keysIterator, NOT keys.map: Set#map dedupes equal sizes
        val num = pnum + (n - present.keysIterator.map(ni).sum) * c
        (w, occ.size.toLong, ((num * 1000000) / (2 * c * n)).toLong)
    }.toSeq
    scored.sortBy { case (w, _, dp) => (-dp, w) }.take(40)
      .zipWithIndex.map { case ((w, c, dp), i) => ((i + 1).toLong, w, c, dp) }
  }

  private def engineDp(rows: Seq[(String, String)]): Seq[(Long, String, Long, Long)] = {
    import spark.implicits._
    graft.operators.LexicalStats.dispersion(
        rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
          .toDF("doc_id", "source", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("q137 matches the driver-side DP replay on the real corpus") {
    val rows = Tables.load(spark, sf0001, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val got = engineDp(rows)
    assert(got === bruteDp(rows))
    assert(got.nonEmpty)
  }

  test("q137: a term confined to one source tops the ranking; evenly spread terms score 0") {
    // two sources of equal token mass; "marker" lives ONLY in src_a,
    // "even" is split exactly with the mass
    val rows =
      Seq.fill(60)(("src_a", "even marker even marker")) ++
        Seq.fill(60)(("src_b", "even filler even filler"))
    val got = engineDp(rows)
    assert(got === bruteDp(rows))
    // marker/filler: v_own = 1, s_own = 1/2 → DP = 1/2 exactly; they
    // tie at the top (tie broken lexicographically)
    assert(got.take(2).map(_._2) === Seq("filler", "marker"))
    assert(got.take(2).forall(_._4 == 500000L))
    // "even" follows the mass exactly → DP = 0
    assert(got.find(_._2 == "even").get._4 === 0L)
  }

  // ---- q141 ---------------------------------------------------------

  private def bruteUnseen(texts: Seq[String]): Seq[Long] = {
    val counts = texts.flatMap(_.split("\\s+")).groupBy(identity)
      .map(_._2.size.toLong).toSeq
    val n = counts.sum
    val v = counts.size.toLong
    val n1 = counts.count(_ == 1L).toLong
    val n2 = counts.count(_ == 2L).toLong
    val chao1 = v + (BigInt(n1) * (n1 - 1) / (2 * (n2 + 1))).toLong
    val mm = (BigInt(n1) * 1000000 / n).toLong
    Seq(n, v, n1, n2, chao1, mm)
  }

  private def engineUnseen(texts: Seq[String]): Seq[Long] = {
    import spark.implicits._
    LexicalStats.unseen(texts.toDF("text"))
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).head
  }

  test("q141: Chao1 + missing mass match a hand-computed corpus and the replay") {
    // counts: a=1 b=1 c=1 d=2 → N=5 V=4 n1=3 n2=1
    // chao1 = 4 + 3·2/(2·2) = 5; missing mass = 3e6/5 = 600000 ppm
    assert(engineUnseen(Seq("a b c d d")) ===
      Seq(5L, 4L, 3L, 1L, 5L, 600000L))
    // n2 = 0 stays defined via the +1 bias correction:
    // all-hapax corpus → chao1 = 3 + 3·2/(2·1) = 6, mass all missing
    assert(engineUnseen(Seq("a b c")) === Seq(3L, 3L, 3L, 0L, 6L, 1000000L))
  }

  test("q141 matches the BigInt replay on the real corpus") {
    val texts = Tables.load(spark, sf0001, "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    assert(engineUnseen(texts) === bruteUnseen(texts))
    val Seq(_, v, n1, _, chao1, mm) = engineUnseen(texts)
    assert(chao1 >= v) // the estimator only ever adds unseen types
    assert(mm >= 0L && n1 >= 0L)
  }

  // ---- q142 ---------------------------------------------------------

  private def bruteBurst(docs: Seq[(Long, String)]): Seq[(Long, String, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, t) => t.split("\\s+").map(w => (w, id)) }
    val byW = occ.groupBy(_._1).map { case (w, o) =>
      (w, o.size.toLong, o.map(_._2).distinct.size.toLong)
    }.toSeq
    byW.filter(_._2 >= 100L)
      .map { case (w, cf, df) => (w, cf, df, (BigInt(cf) * 1000000 / df).toLong) }
      .sortBy(t => (-t._4, t._1)).take(40).zipWithIndex
      .map { case ((w, cf, df, b), i) => (i + 1L, w, cf, df, b) }
  }

  private def engineBurst(docs: Seq[(Long, String)]): Seq[(Long, String, Long, Long, Long)] = {
    import spark.implicits._
    LexicalStats.burstiness(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("q142: a clumped term tops a spread term of equal frequency") {
    // 'dup' ×200 inside one doc (burst 200×) vs 'x' once in each of
    // 150 docs (burst exactly 1×)
    val docs = (1L, Seq.fill(200)("dup").mkString(" ")) +:
      (2L to 151L).map(i => (i, "x filler"))
    val got = engineBurst(docs)
    assert(got === bruteBurst(docs))
    assert(got.head._2 === "dup" && got.head._5 === 200000000L)
    val xRow = got.find(_._2 == "x").get
    assert(xRow._3 === 150L && xRow._4 === 150L && xRow._5 === 1000000L)
  }

  test("q142 matches the BigInt replay on the real corpus") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = engineBurst(docs)
    assert(got === bruteBurst(docs))
    assert(got.nonEmpty && got.forall(_._5 >= 1000000L)) // burst ≥ 1 always
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

  // ---- q125 ---------------------------------------------------------

  /** BigInt replay of the growth fit: quadratic doc-id thresholds,
    * conditional N/V counts, DISTINCT quantized points, shift-guarded
    * closed-form regression (None when the denominator degenerates). */
  private def bruteHeaps(docs: Seq[(Long, String)])
      : (Long, Long, Long, Long, Option[Long], Option[Long]) = {
    val C = LexicalStats.HeapsC.toLong
    val tok = docs.map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val dmin = docs.map(_._1).min
    val dmax = docs.map(_._1).max
    val thr = (1L to C).map(j => dmin + ((dmax - dmin) * j * j) / (C * C))
    val first = tok.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1).map { case (_, o) => o.map(_._2).min }.toSeq
    val raw = thr.map { th =>
      (tok.filter(_._1 <= th).map(_._2.size.toLong).sum,
        first.count(_ <= th).toLong)
    }.filter(p => p._1 > 0 && p._2 > 0)
    val pts = raw.map { case (n, v) =>
      (math.round(math.log(n.toDouble) * 1000000),
        math.round(math.log(v.toDouble) * 1000000))
    }.distinct
    val np = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val den = np * sxx - sx * sx
    val beta =
      if (den == 0) None
      else Some((((np * sxy - sx * sy) * 1000000 +
        BigInt(LexicalStats.SlopeShift) * den) / den -
        LexicalStats.SlopeShift).toLong)
    val lnk = beta.map(b => ((sy * 1000000 - BigInt(b) * sx +
      BigInt(LexicalStats.InterceptShift) * (np * 1000000)) /
      (np * 1000000) - LexicalStats.InterceptShift).toLong)
    (pts.size.toLong, docs.size.toLong,
      tok.map(_._2.size.toLong).sum, first.size.toLong, beta, lnk)
  }

  private def heapsRow(docs: Seq[(Long, String)])
      : (Long, Long, Long, Long, Option[Long], Option[Long]) = {
    import spark.implicits._
    val r = LexicalStats.heaps(docs.toDF("doc_id", "text")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))
  }

  test("q125 matches the BigInt replay on a growing-vocabulary corpus, with positive beta") {
    // each doc re-uses a small core and introduces 3 fresh types —
    // sublinear but genuinely growing vocabulary (Heaps regime)
    val core = Seq("the", "of", "and", "data", "spark")
    val docs = (0L until 40L).map { i =>
      val fresh = (0 until 3).map(k => s"u${i}_$k")
      val pad = (0 until 8).map(j => core(((i + j) % core.size).toInt))
      (i, (pad ++ fresh ++ pad).mkString(" "))
    }
    val got = heapsRow(docs)
    assert(got === bruteHeaps(docs))
    assert(got._5.get > 0, "vocabulary must grow: beta > 0")
    assert(got._2 === 40L && got._4 === 5L + 40L * 3)
  }

  test("q125 sparse/shuffled doc ids: thresholds follow the id range, not ordinals") {
    val docs = Seq(7L, 900L, 13L, 512L, 8191L, 4096L, 77L, 2048L).zipWithIndex
      .map { case (id, i) => (id, (0 to i).map(k => s"w${id}_$k").mkString(" ")) }
    assert(heapsRow(docs) === bruteHeaps(docs))
  }

  test("q125 constant-vocabulary corpus fits beta = 0") {
    val docs = (0L until 20L).map(i => (i, "alpha beta gamma alpha"))
    val got = heapsRow(docs)
    assert(got === bruteHeaps(docs))
    assert(got._5 === Some(0L))
    assert(got._4 === 3L)
  }

  test("q125 single-doc corpus degenerates to one point and NULL fit on both engines") {
    val docs = Seq((5L, "a b c a"))
    val got = heapsRow(docs)
    assert(got === bruteHeaps(docs))
    assert(got._1 === 1L && got._5 === None && got._6 === None)
  }
}
