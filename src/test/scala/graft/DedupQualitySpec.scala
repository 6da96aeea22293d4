package graft

import graft.operators.DedupQuality
import org.apache.spark.sql.functions._

/** q193 end-to-end dedup quality: perfect recovery at the planted
  * separation on a clean corpus, measured degradation as separation
  * shrinks, and the structural relations between the families'
  * censuses on the real gate corpus. */
class DedupQualitySpec extends SparkSpec {
  import spark.implicits._

  /** 10 disjoint-vocabulary base docs on the planted id grid (ids
    * 0, 5, …, 45; 30 tokens each) — no organic similarity anywhere,
    * so recovery quality is exactly the planted-cluster recovery. */
  private def toy = (0 until 10).map { b =>
    val id = b * 5L
    (id, (1 to 30).map(t => s"w${id}_$t").mkString(" "))
  }.toDF("doc_id", "text")

  private def rows(d: org.apache.spark.sql.DataFrame, sepDen: Int) =
    DedupQuality.qualityTable(d, sepDen).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap // family -> (planted, recovered, correct, prec, rec)

  test("q193: recovery at the planted separation on a clean corpus") {
    val m = rows(toy, DedupQuality.SepDen)
    // 10 bases × C(4,2) = 60 planted pairs. The EXACT family recovers
    // them all with nothing spurious — perfect recovery is achievable
    // at this separation, and the benchmark proves the planted truth
    // is sound.
    val (p, r, c, prec, rec) = m("exact")
    assert(p === 60L && r === 60L && c === 60L)
    assert(prec === 1000000L && rec === 1000000L)
    // The shipped b16r4 MinHash banding deterministically drops 3 of
    // the weakest pairs: the toy's 30-token docs put the widest
    // variant pairs at J ≈ 0.57, NEAR the 0.5 operating threshold
    // where b16r4's per-pair collision probability is ~0.83 — the
    // q192 margin-pref rationale measured end-to-end (deterministic:
    // the splitmix64 signatures are fixed). Precision stays perfect.
    val (pm, rm, cm, precm, recm) = m("minhash")
    assert(pm === 60L && rm === 57L && cm === 57L)
    assert(precm === 1000000L && recm === 950000L)
    // simhash128's Hamming ≤ 3 ball under-covers J ≈ 0.6 pairs (the
    // q182 recall column made cluster-level): far below both
    assert(m("simhash128")._5 < recm)
  }

  test("q193: recovery degrades monotonically as the separation shrinks") {
    // sepDen 12 → ≤ 25% junk, all intra-cluster J ≥ ~0.57: full
    // recovery. sepDen 4 → 25/50/75% junk: only (j0, j1) stays above
    // the 0.5 threshold (J ≈ 0.6; the next pair sits at ≈ 0.30), so
    // each planted cluster fractures to {0,1},{2},{3} — 1 of 6 pairs,
    // recall exactly 10⁶ div 6. Precision stays perfect (junk tails
    // never collide): dedup at too-wide separation LOSES duplicates,
    // it does not invent them.
    val hi = rows(toy, 12)("exact")
    val lo = rows(toy, 4)("exact")
    assert(hi._5 === 1000000L)
    assert(lo._5 === 166666L)
    assert(lo._4 === 1000000L) // precision survives the fracture
    assert(lo._2 < hi._2)      // recovered pairs strictly fall
  }

  test("q193: structural relations between families on the gate corpus") {
    val d = Tables.load(spark, sf0001, "documents")
    val m = rows(d, DedupQuality.SepDen)
    val ex = m("exact"); val mh = m("minhash"); val sh = m("simhash128")
    // planted pairs are identical across families (same corpus)
    assert(ex._1 === mh._1 && mh._1 === sh._1)
    // exact recall is structural: every planted pair is a J ≥ 0.5
    // edge by construction, so planted clusters are sub-components
    assert(ex._5 === 1000000L)
    assert(ex._3 === ex._1) // correct = planted for the exact family
    // LSH-verified pairs ⊆ exact pairs → coarser exact components
    // dominate: recovered and recall order exact ≥ minhash
    assert(mh._2 <= ex._2)
    assert(mh._5 <= ex._5)
    // the family contrast the benchmark exists to show
    assert(sh._5 < mh._5)
    // organic base-base near-dups merge planted clusters: precision
    // may dip below 10⁶ but correct pairs never exceed recovered
    assert(ex._3 <= ex._2 && mh._3 <= mh._2 && sh._3 <= sh._2)
  }
}
