package graft

import graft.functions.SplitMix64Kernel
import graft.operators.{Curation, Similarity}

/** Hand-corpus proofs of the targeted-curation family (q100 BM25 /
  * q101 DSIR / q103 bigram LM) plus a driver-side brute-force
  * cross-check of q102 SemDeDup on the real sf0.001 embeddings —
  * every expected value recomputed independently with scala.math,
  * mirroring the engine's exact IEEE operation sequence. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the engine's per-term BM25 score. */
  private def bm25Score(tf: Double, df: Double, dl: Double,
      nd: Double, sdl: Double): Long = {
    val dlr = dl / (sdl / nd)
    val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dlr))
    val idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
    math.round((idf * tfn) * 1000000)
  }

  test("BM25: exact scores, tf monotonicity, absent docs excluded") {
    val d = Seq((1L, "q q x"), (2L, "q x x"), (3L, "y y y"))
      .toDF("doc_id", "text")
    val rows = Curation.bm25TopK(d, Seq(0 -> Seq("q")), 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._5)
    // N=3, sdl=9, dl=3 everywhere; df(q)=2; tf 2 vs 1
    val s1 = bm25Score(2, 2, 3, 3, 9)
    val s2 = bm25Score(1, 2, 3, 3, 9)
    assert(rows.toSeq === Seq((0L, 1L, 1L, s1, 1L), (0L, 2L, 1L, s2, 2L)))
    assert(s1 > s2) // more occurrences, same length -> higher score
  }

  test("BM25: rarer term outranks common term; multi-term scores sum") {
    val d = Seq((1L, "r x"), (2L, "s x"), (3L, "s x"), (4L, "r s"))
      .toDF("doc_id", "text")
    val got = Curation.bm25TopK(d, Seq(0 -> Seq("r", "s")), 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val sr = bm25Score(1, 2, 2, 4, 8) // df(r)=2 (docs 1,4)
    val ss = bm25Score(1, 3, 2, 4, 8) // df(s)=3 (docs 2,3,4)
    assert(sr > ss) // rarer term carries more idf
    assert(got(1L) === (1L, sr))
    assert(got(2L) === (1L, ss))
    assert(got(4L) === (2L, sr + ss)) // integer sum of both terms
  }

  test("DSIR: target-like docs outweigh dissimilar docs; Gumbel key replays") {
    val d = Seq(
      (1L, "src7", "aa bb aa bb"), (2L, "src7", "aa bb aa bb"),
      (3L, "other", "aa bb aa bb"), (4L, "other", "cc dd cc dd"))
      .toDF("doc_id", "source", "text")
    val sc = Curation.dsirScores(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sc.keySet === Set(1L, 2L, 3L, 4L)) // every doc scored
    // doc 3 shares all its hashed bigrams with the target; doc 4 none
    assert(sc(3L)._1 > sc(4L)._1)
    // key - wsum is exactly the quantized Gumbel draw keyed by doc_id
    sc.foreach { case (id, (w, k)) =>
      val u = SplitMix64Kernel.uniform(id, 101L * SplitMix64Kernel.Golden)
      val g = math.round(-math.log(-math.log(math.max(u, 1e-12))) * 1000000)
      assert(k - w === g, s"gumbel mismatch for doc $id")
    }
  }

  test("bigram LM: add-1 smoothed surprisal exact; <2-token docs drop") {
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val rows = Curation.bigramSurprisal(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // V=4 (a,b,c,z); c1(a)=3; c("a b")=2, c("a c")=1
    val sAb = math.round(math.log(7.0 / 3.0) * 1000000)
    val sAc = math.round(math.log(7.0 / 2.0) * 1000000)
    assert(rows === Set((1L, 1L, sAb), (2L, 1L, sAb), (3L, 1L, sAc)))
    assert(sAc > sAb) // rarer continuation is more surprising
  }

  test("SemDeDup: removals match a driver-side within-cell brute force") {
    val out = Similarity.queries("q102_semdedup")(spark, sf0001).collect()
    val cells = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = out.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet
    val embs = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.length === embs.size) // every vector labeled exactly once
    val ncells = Similarity.adaptiveCells(embs.size.toLong)
    assert(cells.values.forall(c => c >= 0 && c < ncells))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = embs.keys.toSeq.sorted
    val removed = scala.collection.mutable.Set[Long]()
    for (a <- ids; b <- ids if a < b && cells(a) == cells(b))
      if (r6(cos(embs(a), embs(b))) >= 0.4) removed += b
    assert(kept === embs.keySet -- removed)
    assert(removed.nonEmpty, "corpus should contain within-cell near-dups")
  }

  test("q113 decontamination: flags match a driver-side within-cell train×test brute force") {
    val out = Similarity.queries("q113_embedding_decontam")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val embs = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // the deterministic q70 split rule, recomputed independently
    def grp(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (h < "cccccccc") "train" else if (h < "e6666666") "val" else "test"
    }
    val train = embs.keySet.filter(grp(_) == "train")
    val test_ = embs.keySet.filter(grp(_) == "test")
    assert(out.keySet === train, "exactly the train split, each once")
    // cells from the engine's own assignment (already brute-force
    // cross-checked by the q102 spec above)
    val cells = Similarity.assignCells(
        Tables.load(spark, sf0001, "embeddings"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var anyHit = false
    for (t <- train) {
      val hits = test_.toSeq
        .filter(b => cells(b) == cells(t))
        .map(b => r6(cos(embs(t), embs(b))))
        .filter(_ >= 0.4)
      val (cell, n, mx, flag) = out(t)
      assert(cell === cells(t), s"cell mismatch for $t")
      assert(n === hits.size.toLong, s"hit count mismatch for $t")
      assert(flag === (if (hits.nonEmpty) 1L else 0L))
      assert(mx === (if (hits.isEmpty) -1.0 else hits.max),
        s"max_cos mismatch for $t")
      anyHit ||= hits.nonEmpty
    }
    assert(anyHit, "corpus should contain at least one train×test near pair")
  }

  test("q116 in-batch negatives match a driver-side shard/lead replay") {
    val out = Similarity.queries("q116_inbatch_negatives")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val cells = Similarity.assignCells(
        Tables.load(spark, sf0001, "embeddings"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // replay: the same splitmix64 draw, shard = floor(u*16), shard
    // order (u, vec_id), next-4 leads, same-cell exclusion
    val rows = cells.keys.toSeq.map { id =>
      val u = graft.functions.SplitMix64Kernel.uniform(
        id, 116L * graft.functions.SplitMix64Kernel.Golden)
      (id, u, math.floor(u * 16).toLong)
    }
    val expected = rows.groupBy(_._3).flatMap { case (shard, members) =>
      val ordered = members.sortBy(m => (m._2, m._1)).map(_._1)
      ordered.zipWithIndex.flatMap { case (anchor, i) =>
        (1 to 4).flatMap { j =>
          ordered.lift(i + j).collect {
            case neg if cells(neg) != cells(anchor) =>
              (anchor, shard, j.toLong, neg)
          }
        }
      }
    }.toSet
    assert(out === expected)
    assert(out.nonEmpty, "corpus should produce negatives")
    // no anchor ever pairs with a same-cell vector (the semantic
    // false-negative guard)
    assert(out.forall { case (a, _, _, n) => cells(a) != cells(n) })
  }

  test("q123 bucketing: well-separated surprisal levels split into exact terciles") {
    import spark.implicits._
    // three fluency levels, three docs each: repetitive (low
    // surprisal), mixed, all-unique continuations (high)
    val docs =
      (0 until 3).map(i => (i.toLong, "a b a b a b a b a b")) ++
      (0 until 3).map(i => (10L + i, s"c$i d e f g c$i d e")) ++
      (0 until 3).map(i => (20L + i, (0 until 8).map(j => s"u${i}_$j").mkString(" ")))
    val rows = graft.operators.Curation.perplexityBuckets(
      docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket("head") === Set(0L, 1L, 2L))
    assert(byBucket("middle") === Set(10L, 11L, 12L))
    assert(byBucket("tail") === Set(20L, 21L, 22L))
    // bucket order tracks surprisal order
    val su = rows.map(r => r._1 -> r._2).toMap
    assert(su(0L) < su(10L) && su(10L) < su(20L))
  }

  test("q123 bucketing: docs in the same bin share a bucket even across the n/3 boundary") {
    import spark.implicits._
    // four identical docs (one bin) + two harder docs: ceil(6/3) = 2
    // would split the identical four, but bin-granularity terciles
    // keep them together in 'head'
    val docs =
      (0 until 4).map(i => (i.toLong, "x y x y x y")) ++
      Seq((10L, "p0 q0 r0 s0 t0"), (11L, "p1 q1 r1 s1 t1"))
    val rows = graft.operators.Curation.perplexityBuckets(
      docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((0 until 4).forall(i => rows(i.toLong) === "head"), rows)
  }

  test("q123 bucketing: real corpus terciles are populated and ordered") {
    val rows = SparkEntry.queries("q123_perplexity_buckets")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    val grouped = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(grouped.keySet === Set("head", "middle", "tail"))
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    assert(mean(grouped("head")) < mean(grouped("middle")))
    assert(mean(grouped("middle")) < mean(grouped("tail")))
    // tercile balance at bin granularity: head holds at least a third
    val n = rows.length
    assert(grouped("head").size >= (n + 2) / 3 - 1)
  }

  test("q120 reweighting: identical sources get exactly uniform weights") {
    import spark.implicits._
    // four sources with the SAME text multiset: every excess is 0 and
    // every weight is exactly floor(1e6 / 4)
    val texts = Seq("alpha beta gamma", "beta gamma delta", "gamma delta alpha")
    val d = (for (s <- 0 until 4; (t, j) <- texts.zipWithIndex)
      yield ((s * 10 + j).toLong, s"src$s", t))
      .toDF("doc_id", "source", "text")
    val rows = graft.operators.Curation.domainReweight(d).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("src0", "src1", "src2", "src3"))
    assert(rows.forall(_._2 === 0L), rows.mkString(","))
    assert(rows.forall(_._3 === 250000L), rows.mkString(","))
  }

  test("q120 reweighting: the hard domain carries the excess; weights sum to ~1e6") {
    import spark.implicits._
    // srcEasy repeats one bigram pattern (high bigram counts -> low
    // surprisal); srcHard is all unique continuations (every bigram
    // count 1 -> high surprisal)
    val easy = (0 until 6).map(i =>
      (i.toLong, "srcEasy", "the cat sat on the mat the cat sat"))
    val hard = (0 until 6).map(i =>
      (100L + i, "srcHard", (0 until 9).map(j => s"w${i}_$j").mkString(" ")))
    val rows = graft.operators.Curation.domainReweight(
      (easy ++ hard).toDF("doc_id", "source", "text")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, _, exEasy, wEasy) = rows("srcEasy")
    val (_, _, exHard, wHard) = rows("srcHard")
    assert(exEasy === 0L) // below the mean: clipped to the floor
    assert(exHard > 0L)
    assert(wHard > wEasy)
    // floors: each weight loses < 1 ppm, so the sum is within n_src
    val wsum = rows.values.map(_._4).sum
    assert(wsum <= 1000000L && wsum >= 1000000L - rows.size)
    // the floor keeps the easy domain in the mix (never zeroed)
    assert(wEasy > 0L)
  }
}
