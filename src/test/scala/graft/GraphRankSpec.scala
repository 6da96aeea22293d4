package graft

import graft.operators.GraphRank
import org.apache.spark.sql.functions.col

/** Hand-graph proofs of q105's integer random-walk centrality: the
  * exact 5-iteration ranks recomputed driver-side with the same
  * integer operation sequence, the node-encoding bijection, hub-vs-
  * leaf ordering, and the iteration plan shape (both per-round joins
  * shuffle — nothing node-sized ever broadcasts). */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the engine's damped integer update. All
    * quantities are positive, so Long `/` is the same floor division
    * as Spark's and DuckDB's `div`. */
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to iters) {
      val contrib = r.map { case (n, rv) => n -> rv / deg(n) }
      r = sym.groupBy(_._2).map { case (n, es) =>
        n -> (150000L + (85L * es.map(e => contrib(e._1)).sum) / 100L)
      }
    }
    r
  }

  private def handFrames(trades: Seq[(Long, Long)]) = {
    val orders = trades.zipWithIndex
      .map { case ((c, _), i) => (i.toLong, c) }.toDF("o_orderkey", "o_custkey")
    val lineitem = trades.zipWithIndex
      .map { case ((_, s), i) => (i.toLong, s) }.toDF("l_orderkey", "l_suppkey")
    (orders, lineitem)
  }

  test("q105: 5-iteration ranks are exactly the driver-side integer replay") {
    // c1–{s10,s11}, c2–s10, plus a duplicate trade that distinct() drops
    val trades = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 10L))
    val (orders, lineitem) = handFrames(trades)
    val got = GraphRank.centrality(orders, lineitem).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val enc = trades.distinct.map { case (c, s) => (2 * c, 2 * s + 1) }
    val want = replay(enc, GraphRank.PrIters)
    val deg = enc.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got.map(_._1).toSeq === want.keys.toSeq.sorted)
    got.foreach { case (node, isSupp, d, rank) =>
      assert(isSupp === (node % 2 == 1), s"node $node")
      assert(d === deg(node), s"degree of $node")
      assert(rank === want(node), s"rank of $node")
    }
  }

  test("q105: a hub outranks its leaves on a star graph") {
    // supplier 50 trades with customers 1..6; each customer only them
    val trades = (1L to 6L).map(c => (c, 50L))
    val (orders, lineitem) = handFrames(trades)
    val ranks = GraphRank.centrality(orders, lineitem).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val hub = ranks(2 * 50 + 1)
    (1L to 6L).foreach(c => assert(hub > ranks(2 * c), s"hub vs customer $c"))
  }

  /** Driver-side replica of q127's integer HITS half-steps: sum the
    * opposite role's score over the distinct edge list, then
    * re-normalize by the exact max in micro-units (all positive, so
    * Long `/` is the same floor division both engines use). */
  private def replayHits(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val e = edges.distinct
    var h: Map[Long, Long] = e.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (s, es) =>
        s -> es.map(x => h(x._1)).sum
      }
      val amax = ar.values.max
      a = ar.map { case (s, v) => s -> (v * 1000000L) / amax }
      val hr = e.groupBy(_._1).map { case (c, es) =>
        c -> es.map(x => a(x._2)).sum
      }
      val hmax = hr.values.max
      h = hr.map { case (c, v) => c -> (v * 1000000L) / hmax }
    }
    (h, a)
  }

  test("q127: HITS scores are exactly the driver-side integer replay") {
    // c1 buys from s10,s11,s12; c2 from s10; c3 from s10,s11 — plus a
    // duplicate trade that distinct() must drop
    val trades = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L),
      (3L, 10L), (3L, 11L), (3L, 11L))
    val (orders, lineitem) = handFrames(trades)
    val got = GraphRank.hits(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (h, a) = replayHits(trades, GraphRank.HitsIters)
    val gotA = got.filter(_._1 == "authority").map(r => r._2 -> r._3).toMap
    val gotH = got.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    assert(gotA === a)
    assert(gotH === h)
    // ranks are dense 1..N per role, ordered by (score desc, id)
    val aRanks = got.filter(_._1 == "authority")
      .sortBy(r => (-r._3, r._2)).map(_._4)
    assert(aRanks.toSeq === (1L to aRanks.length))
    // the widely-bought supplier is the top authority at max scale
    assert(got.filter(_._1 == "authority").minBy(_._4)._2 === 10L)
    assert(gotA(10L) === 1000000L)
    // the most diversified buyer is the top hub
    assert(got.filter(_._1 == "hub").minBy(_._4)._2 === 1L)
  }

  /** Driver-side replica of q130's coloring-schedule label
    * propagation: suppliers vote from customer labels, customers from
    * the NEW supplier labels; majority with ties to smallest label. */
  private def replayLp(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val e = edges.distinct
    var lc: Map[Long, Long] = e.map(_._1).distinct.map(c => c -> c).toMap
    var ls: Map[Long, Long] = Map.empty
    def vote(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      pairs.groupBy(_._1).map { case (n, xs) =>
        n -> xs.groupBy(_._2).toSeq
          .map { case (l, ys) => (l, ys.size) }
          .minBy { case (l, cnt) => (-cnt, l) }._1
      }
    for (_ <- 1 to iters) {
      ls = vote(e.map { case (c, s) => (s, lc(c)) })
      lc = vote(e.map { case (c, s) => (c, ls(s)) })
    }
    (lc, ls)
  }

  test("q130: census equals the replay; planted blocks resolve to their seed communities") {
    // two dense blocks ({1,2}×{10,11}, {3,4}×{20,21}) + one bridge
    // edge (2,20) + a duplicate trade distinct() must drop
    val trades = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 20L), (3L, 21L), (4L, 20L), (4L, 21L),
      (2L, 20L), (2L, 20L))
    val (orders, lineitem) = handFrames(trades)
    val got = GraphRank.labelProp(orders, lineitem).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (lc, ls) = replayLp(trades, GraphRank.LpIters)
    val wantCen = (lc.values ++ ls.values).toSeq.groupBy(identity).map {
      case (l, xs) => l -> (lc.values.count(_ == l).toLong,
        ls.values.count(_ == l).toLong)
    }
    val gotCen = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(gotCen === wantCen)
    got.foreach { case (_, nc, nsup, total, _) => assert(total === nc + nsup) }
    // ranks dense by (total desc, community)
    assert(got.sortBy(r => (-r._4, r._1)).map(_._5).toSeq ===
      (1L to got.length))
    // the two blocks keep distinct communities (the bridge does not
    // merge them under majority voting)
    assert(lc(1L) === lc(2L))
    assert(lc(3L) === lc(4L))
    assert(lc(1L) !== lc(3L))
  }

  /** Driver-side replica of q131: BigInt moment sums, the identical
    * decimal→double→sqrt→divide finish. */
  private def replayAssort(edges: Seq[(Long, Long)]): (Long, Long, Long, Option[Long]) = {
    val e = edges.distinct
    val dc = e.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    val ds = e.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val xy = e.map { case (c, s) => (BigInt(dc(c)), BigInt(ds(s))) }
    val n = BigInt(e.size)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(t => t._1 * t._1).sum
    val syy = xy.map(t => t._2 * t._2).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val den = math.sqrt((n * sxx - sx * sx).toDouble) *
      math.sqrt((n * syy - sy * sy).toDouble)
    val r = if (den == 0.0) None
      else Some(math.round((n * sxy - sx * sy).toDouble / den * 1000000.0))
    (e.size.toLong, sx.toLong, sy.toLong, r)
  }

  test("q131: moments and correlation equal the replay; hub-leaf structure is disassortative") {
    // supplier 50 is a hub (5 customers), supplier 51 a leaf; customer
    // 1 buys from both (high-degree c on low-degree s ⇒ r < 0), plus
    // a duplicate trade
    val trades = Seq((1L, 50L), (2L, 50L), (3L, 50L), (4L, 50L),
      (5L, 50L), (1L, 51L), (1L, 51L))
    val (orders, lineitem) = handFrames(trades)
    val row = GraphRank.assortativity(orders, lineitem).collect().head
    val (n, sx, sy, r) = replayAssort(trades)
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === sx)
    assert(row.getLong(2) === sy)
    assert(!row.isNullAt(3) && Some(row.getLong(3)) === r)
    assert(row.getLong(3) < 0L, "hub-leaf graph must be disassortative")
  }

  test("q131: a degree-regular graph has zero variance and yields NULL, not an error") {
    // complete 2×2 bipartite block: every degree is 2 on both sides
    val trades = Seq((1L, 50L), (1L, 51L), (2L, 50L), (2L, 51L))
    val (orders, lineitem) = handFrames(trades)
    val row = GraphRank.assortativity(orders, lineitem).collect().head
    assert(row.getLong(0) === 4L)
    assert(row.isNullAt(3))
  }

  test("q105: iteration step never broadcasts a node-sized table") {
    val edges = Seq((2L, 21L), (21L, 2L)).toDF("src", "dst")
    val deg = Seq((2L, 1L), (21L, 1L)).toDF("node", "d")
    val ranks = deg.select(col("node"), col("d"),
      org.apache.spark.sql.functions.lit(1000000L).as("r"))
    val p = GraphRank.step(edges, deg, ranks).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("BroadcastHashJoin"), p)
    // two joins per round (edge⋈contrib, inflow⋈deg — the round-7 A/B
    // kept this shape; see GraphRank scaladoc) — count on the tree
    // section only (FormattedMode repeats nodes in its details)
    val tree = p.linesIterator.takeWhile(_.nonEmpty).mkString("\n")
    assert("SortMergeJoin".r.findAllIn(tree).length === 2, p)
  }
}
