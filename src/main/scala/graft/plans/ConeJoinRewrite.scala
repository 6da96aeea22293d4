package graft.plans

import graft.functions.{ConeContains, RectContains}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite an inner theta-join whose condition is the
  * declarative [[ConeContains]] predicate into the dec-band EQUI-join
  * plan (the same rewrite `ConeJoin.bandJoin` applies by hand):
  *
  * {{{
  *   Join(cat, smp, Inner, cone_contains(ra, dec, sRa, sDec, r))
  * ⇒ Project(join.output,
  *     Filter(cone_contains(...) AND dec BETWEEN sDec ± r,   // exact residual
  *       Join(Project(cat, band = floor(dec/B)),
  *            Generate(explode(sequence(floor((sDec−r)/B),
  *                                      floor((sDec+r)/B))), smp),
  *            Inner, cat.band = smp.band)))
  * }}}
  *
  * Without the rule Spark's only strategy for the theta condition is a
  * nested-loop join; with it, candidate generation becomes a hash/sort
  * equi-join on the band key, with the original predicate kept as the
  * exact residual — results identical by construction, the plan is the
  * 100 TB shape. Band width: `spark.graft.coneJoin.bandDeg` (default
  * 1.0). Installed by [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`).
  *
  * Loop safety: the rewritten join's condition is a plain band
  * equality, and the rule skips joins that already carry an equality
  * conjunct — so re-matching after predicate pushdown folds the
  * residual back into the join is a no-op.
  */
class ConeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def bandDeg: Double =
    spark.conf.get("spark.graft.coneJoin.bandDeg", "1.0").toDouble

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** An equality conjunct whose sides reference BOTH join children —
    * i.e. a usable hash-join key. Its presence means the join is
    * already equi-joinable (and in particular means this join is our
    * own band rewrite — the loop-safety guard); a single-side
    * equality like `x % 2 = 0` must NOT block the rewrite. */
  private def hasCrossSideEquality(cond: Expression, left: LogicalPlan,
                                   right: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
          b.references.subsetOf(right.outputSet) && b.references.nonEmpty) ||
          (a.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
            b.references.subsetOf(left.outputSet) && b.references.nonEmpty)
      case _ => false
    }

  /** The normalized shape of a rewritable spatial predicate: the
    * object/sample dec expressions, the sample's declination REACH
    * (cone radius, or rect height/2), and the two sides' reference
    * sets. */
  private case class Spatial(dec: Expression, sDec: Expression,
                             reach: Expression,
                             objRefs: AttributeSet, smpRefs: AttributeSet)

  /** The band restriction is only sound when the spatial predicate
    * must hold for every surviving row — i.e. it is a TOP-LEVEL
    * CONJUNCT. One nested under OR/NOT must not trigger the rewrite
    * (restricting candidates to band matches would drop rows the
    * other disjunct admits). */
  private def conjunctiveSpatial(cond: Expression): Option[Spatial] =
    conjuncts(cond).collectFirst {
      case c: ConeContains if c.children.forall(_.dataType == DoubleType) =>
        Spatial(c.dec, c.sDec, c.radiusDeg,
          c.ra.references ++ c.dec.references,
          c.sRa.references ++ c.sDec.references ++ c.radiusDeg.references)
      case r: RectContains if r.children.forall(_.dataType == DoubleType) =>
        Spatial(r.dec, r.sDec, Divide(r.heightDeg, Literal(2.0, DoubleType)),
          r.ra.references ++ r.dec.references,
          r.sRa.references ++ r.sDec.references ++
            r.widthDeg.references ++ r.heightDeg.references)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !hasCrossSideEquality(cond, left, right) =>
      conjunctiveSpatial(cond) match {
        case Some(sp) => rewrite(j, left, right, cond, sp, hint).getOrElse(j)
        case None => j
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, cc: Spatial,
                      hint: JoinHint): Option[LogicalPlan] = {
    // (ra, dec) must bind to one side and the sample fields to the other
    val objRefs = cc.objRefs
    val smpRefs = cc.smpRefs
    val (catalog, samples, catalogIsLeft) =
      if (objRefs.subsetOf(left.outputSet) && smpRefs.subsetOf(right.outputSet))
        (left, right, true)
      else if (objRefs.subsetOf(right.outputSet) && smpRefs.subsetOf(left.outputSet))
        (right, left, false)
      else return None

    val bWidth = Literal(bandDeg, DoubleType)
    // samples: explode to every covered band
    val bandS = AttributeReference("graft_band_s", LongType, nullable = false)()
    val lo = Floor(Divide(Subtract(cc.sDec, cc.reach), bWidth))
    val hi = Floor(Divide(Add(cc.sDec, cc.reach), bWidth))
    // timeZoneId must be concrete: a TimeZoneAwareExpression with None
    // is unresolved, and optimizer rules may not un-resolve the plan
    val seq = Sequence(lo, hi, None,
      Some(spark.sessionState.conf.sessionLocalTimeZone))
    val genSamples = Generate(Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bandS), child = samples)
    // catalog: its own band
    val bandCAlias = Alias(Floor(Divide(cc.dec, bWidth)), "graft_band_c")()
    val projCatalog = Project(catalog.output :+ bandCAlias, catalog)
    val (newLeft, newRight) =
      if (catalogIsLeft) (projCatalog, genSamples) else (genSamples, projCatalog)
    val bandEq = EqualTo(bandCAlias.toAttribute, bandS)
    // cheap dec-box conjuncts first, the exact predicate (and any other
    // original conjuncts) as residual
    val decBox = And(
      GreaterThanOrEqual(cc.dec, Subtract(cc.sDec, cc.reach)),
      LessThanOrEqual(cc.dec, Add(cc.sDec, cc.reach)))
    val rewritten = Project(j.output,
      Filter(And(decBox, cond),
        Join(newLeft, newRight, Inner, Some(bandEq), hint)))
    Some(rewritten)
  }
}
