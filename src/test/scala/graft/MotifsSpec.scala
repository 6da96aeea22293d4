package graft

import graft.functions.SplitMix64Kernel
import graft.operators.Motifs

/** Proofs for the q133/q134 butterfly census: a brute-force
  * driver-side count on the real sf0.001 trade graph, planted-motif
  * exactness, and the bit-exact splitmix sampling contract of the
  * ESpar estimator. */
class MotifsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force butterfly census over an edge set: enumerate
    * supplier pairs per customer, then Σ C(shared, 2). */
  private def replay(edges: Set[(Long, Long)]): (Long, Long, Long, Long) = {
    val pairs = edges.groupBy(_._1).values.flatMap { es =>
      val ss = es.map(_._2).toSeq.sorted
      for (i <- ss.indices; j <- i + 1 until ss.size) yield (ss(i), ss(j))
    }.groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
    val wedges = pairs.sum
    val bf = pairs.map(c => c * (c - 1) / 2).sum
    (edges.size.toLong, wedges, if (pairs.isEmpty) 0L else pairs.max, bf)
  }

  private def engine(edges: Set[(Long, Long)], est: Boolean): Seq[Long] =
    Motifs.census(edges.toSeq.toDF("c", "s"), est)
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).head

  /** The q134 coin, replayed on the JVM kernel. */
  private def kept(c: Long, s: Long): Boolean = {
    val u = SplitMix64Kernel.uniform(
      c * 4294967296L + s, 133L * SplitMix64Kernel.Golden)
    math.floor(u * 8).toLong == 0L
  }

  test("q133: census equals the brute-force replay on the real trade graph") {
    val edges = Motifs.edges(
        Tables.load(spark, sf0001, "orders"),
        Tables.load(spark, sf0001, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (ne, nw, mx, bf) = replay(edges)
    assert(engine(edges, est = false) === Seq(ne, nw, mx, bf))
    assert(bf > 0L) // the graph is dense enough that the count is live
  }

  test("q133: a planted K2,2 is exactly one butterfly; pendants add nothing") {
    // K2,2 on customers {1,2} × suppliers {10,20}, plus a pendant
    // edge (3,10): one supplier pair (10,20) shared by 2 customers
    val edges = Set((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L))
    assert(engine(edges, est = false) === Seq(5L, 2L, 2L, 1L))
    // adding customer 4 to both suppliers: shared=3 → C(3,2)=3
    val edges3 = edges ++ Set((4L, 10L), (4L, 20L))
    assert(engine(edges3, est = false) === Seq(7L, 3L, 3L, 3L))
  }

  // ---- q139: degree-ordered triangle census ------------------------

  /** Brute-force triangle/wedge census over an undirected edge set
    * (a < b): each triangle once as a < b < c. */
  private def triReplay(edges: Set[(String, String)])
      : (Long, Long, BigInt, Long, Long) = {
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val tri = edges.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(_ > b).toLong
    }.sum
    val wedges = adj.values.map(s => BigInt(s.size) * (s.size - 1) / 2).sum
    val gcc = if (wedges == 0) 0L
      else ((BigInt(tri) * 3000000) / wedges).toLong
    (adj.size.toLong, edges.size.toLong, wedges, tri, gcc)
  }

  private def triEngine(edges: Set[(String, String)]): Seq[Long] =
    Motifs.triangles(edges.toSeq.toDF("a", "b"))
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).head

  test("q139: census equals the brute-force replay on the real token graph") {
    val und = graft.operators.LexicalStats.undirectedEdges(
      Tables.load(spark, sf0001, "documents"), 3L)
    val edges = und.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val (nn, ne, nw, t, gcc) = triReplay(edges)
    assert(triEngine(edges) === Seq(nn, ne, nw.toLong, t, gcc))
    assert(t > 0L) // the graph is dense enough that the count is live
  }

  test("q139: planted motifs — K4, star, K4+pendant") {
    // K4: 4 triangles, 12 wedges, gcc = 1 exactly
    val k4 = Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d"))
    assert(triEngine(k4) === Seq(4L, 6L, 12L, 4L, 1000000L))
    // a star is all wedges, no triangles
    val star = Set(("a", "b"), ("a", "c"), ("a", "d"))
    assert(triEngine(star) === Seq(4L, 3L, 3L, 0L, 0L))
    // K4 + pendant: the hub's extra wedges dilute gcc to 12/15
    val k4p = k4 + (("a", "e"))
    assert(triEngine(k4p) === Seq(5L, 7L, 15L, 4L, 800000L))
  }

  test("q134: the sample is the splitmix-kept edge subset and the estimator is count·8⁴") {
    val all = Motifs.edges(
        Tables.load(spark, sf0001, "orders"),
        Tables.load(spark, sf0001, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = Motifs.sample(all.toSeq.toDF("c", "s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled === all.filter { case (c, s) => kept(c, s) })
    // a 1-in-8 coin keeps roughly an eighth of the edges
    assert(sampled.size > all.size / 16 && sampled.size < all.size / 4,
      s"${sampled.size} of ${all.size}")
    val (ne, nw, mx, bf) = replay(sampled)
    assert(engine(sampled, est = true) === Seq(ne, nw, mx, bf, bf * 4096L))
  }
}
