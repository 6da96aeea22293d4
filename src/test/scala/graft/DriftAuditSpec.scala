package graft

import graft.functions.SignProjectKernel
import graft.operators.DriftAudit
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Proofs for the q108 domain-drift matrix: an exact driver-side
  * replay on the real sf0.001 corpus (same kernel quantization, same
  * shifted floor-division means), and the zero-drift identity on a
  * synthetic corpus where two labels share identical vectors. */
class DriftAuditSpec extends SparkSpec {
  import spark.implicits._

  test("q108: drift matrix equals the driver-side integer replay") {
    val rows = graft.Tables.load(spark, sf0001, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    // per-label shifted centroid, the engine's exact arithmetic
    val byLabel = rows.groupBy(_._1)
    val cent = byLabel.map { case (lab, vs) =>
      val qs = vs.map { case (_, v) =>
        SignProjectKernel.normQuant(new GenericArrayData(v))
      }
      val dims = qs.head.length
      val c = Array.tabulate(dims) { p =>
        val s = qs.map(q => q(p) + 1000000L).sum
        s / qs.length // positive sums: floor == truncation
      }
      lab -> (c, qs.length.toLong)
    }
    val want = (for {
      la <- cent.keys.toSeq; lb <- cent.keys.toSeq if la < lb
    } yield {
      val (ca, na) = cent(la); val (cb, nb) = cent(lb)
      val ds = ca.indices.map(p => ca(p) - cb(p))
      ((la, lb), (na, nb, ds.map(x => x * x).sum, ds.map(math.abs).max))
    }).toMap
    val got = SparkEntry.queries("q108_label_drift")(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q108: labels with identical vector sets have zero drift") {
    val base = Seq.tabulate(6)(i =>
      Array.tabulate(8)(j => (math.sin(i * 8 + j + 1)).toFloat))
    val df = (base.map(v => (0, v.toSeq)) ++ base.map(v => (1, v.toSeq)) ++
        base.map(v => (2, v.reverse.toSeq)))
      .toDF("label", "embedding")
    val out = DriftAudit.driftMatrix(df).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(4), r.getLong(5))))
      .toMap
    assert(out((0, 1)) === ((0L, 0L))) // identical sets: zero everywhere
    assert(out((0, 2))._1 > 0L) // reversed dims: same norm, real drift
    assert(out((1, 2)) === out((0, 2))) // 0 and 1 are the same domain
  }

  test("q121: JS matrix equals a driver-side replay; identical sources diverge by zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "x x y z z z"),
      (2L, "srcB", "x y y w"),
      (3L, "srcC", "x x y z z z"), // identical multiset to srcA
      (4L, "srcD", "qq rr ss")) // vocabulary disjoint from all others
      .toDF("doc_id", "source", "text")
    val got = DriftAudit.divergenceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // driver replay with the engine's exact op sequence + quantization
    val corpora = Map(
      "srcA" -> "x x y z z z", "srcB" -> "x y y w", "srcC" -> "x x y z z z",
      "srcD" -> "qq rr ss")
    val counts = corpora.map { case (s, t) =>
      s -> t.split("\\s+").groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }
    def q(x: Double): Long = math.round(x * 1000000)
    def ent(s: String): Long = {
      val c = counts(s); val t = c.values.sum
      c.values.map(ci =>
        q(ci.toDouble / t.toDouble * math.log(t.toDouble / ci.toDouble))).sum
    }
    def js(a: String, b: String): (Long, Long) = {
      val (ca, cb) = (counts(a), counts(b))
      val (ta, tb) = (ca.values.sum, cb.values.sum)
      val shared = ca.keySet & cb.keySet
      val tsum = shared.toSeq.map { w =>
        val pa = ca(w).toDouble / ta.toDouble
        val pb = cb(w).toDouble / tb.toDouble
        q(pa * math.log(2 * pa / (pa + pb)) + pb * math.log(2 * pb / (pa + pb)))
      }.sum
      val cab = shared.toSeq.map(ca).sum
      val cba = shared.toSeq.map(cb).sum
      val corr = q((1.0 - cab.toDouble / ta.toDouble) * math.log(2.0)) +
        q((1.0 - cba.toDouble / tb.toDouble) * math.log(2.0))
      (shared.size.toLong, (tsum + corr) / 2)
    }
    for (a <- Seq("srcA", "srcB"); b <- Seq("srcB", "srcC") if a < b) {
      val (st, jsv) = js(a, b)
      assert(got((a, b)) === ((st, jsv, ent(a), ent(b))), s"($a,$b)")
    }
    assert(got(("srcA", "srcC"))._2 === 0L) // identical distributions
    assert(got(("srcA", "srcB"))._2 > 0L)
    // disjoint vocabularies share no type: the pair is absent by
    // definition (output covers pairs with >= 1 shared type)
    assert(!got.contains(("srcA", "srcD")))
  }
}
