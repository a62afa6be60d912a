package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite a naive interval-containment join into the
  * banded equi-join that `graft.operators.RangeJoin.pairs` builds by
  * hand (reference semantics: range.py contains()).
  *
  * A user who writes
  *
  *   points.join(intervals, pt >= begin && pt < end)
  *
  * gets, from stock Spark, a BroadcastNestedLoopJoin — every point
  * against every interval, O(|P|·|V|), the classic cluster-killer.
  * This rule detects the containment conjunct pair over epoch-µs longs
  * and rewrites: intervals explode onto the fixed-width time buckets
  * they overlap (`sequence(begin div b, (end-1) div b)` — floor
  * division, so pre-1970 instants band consistently), points project
  * their single bucket, and the join gains a bucket EQUALITY conjunct,
  * so the planner picks a hash-partitioned join. The original
  * containment predicate stays in the condition, so every true pair
  * survives and each survives exactly ONCE (a pair meets only in the
  * point's own bucket). Output columns are re-projected to the
  * original join's output — downstream plans see no difference.
  *
  * Fires only when `spark.graft.rangeJoin.bucketUs` is set positive
  * (the bucket width is the skew dial — shuffle volume is
  * rows × (1 + span/bucket)) and only on INNER joins with no existing
  * equi-conjunct (with one, Spark already plans a hash join; the
  * added band key would be redundant). Inverted/empty intervals
  * (end <= begin) match nothing under half-open containment and are
  * filtered before banding — `sequence(start, stop)` DESCENDS when
  * start > stop, so an inverted interval would otherwise explode into
  * a huge bucket array.
  *
  * Registered by [[GraftExtensions]]
  * (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`),
  * so `spark.sql(...)` users get the rewrite too.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BucketConfKey = "spark.graft.rangeJoin.bucketUs"

  /** FLOOR division toward -infinity (Bridge.fldiv's catalyst twin,
    * built directly — Column-bridged trees carry unresolved function
    * nodes, which an optimizer rule must not emit): the numerator is
    * an exact multiple of b, so the truncating `div` is exact.
    */
  private def fldivE(e: Expression, b: Long): Expression = {
    val lb = Literal(b)
    IntegralDivide(Subtract(e, Pmod(e, lb)), lb)
  }

  /** (pt, begin, end) when the conjuncts contain `pt >= begin` and
    * `pt < end` with pt a long attribute of one side and begin/end
    * long expressions of the other.
    */
  private def containment(conjuncts: Seq[Expression], ptSide: LogicalPlan,
                          ivSide: LogicalPlan): Option[(Attribute, Expression, Expression)] = {
    def isPt(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if a.dataType == LongType &&
        a.references.subsetOf(ptSide.outputSet) => Some(a)
      case _ => None
    }
    def isIv(e: Expression): Boolean =
      e.dataType == LongType && e.references.nonEmpty &&
        e.references.subsetOf(ivSide.outputSet) && e.deterministic
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(p, b) if isPt(p).isDefined && isIv(b) => (isPt(p).get, b)
      case LessThanOrEqual(b, p) if isPt(p).isDefined && isIv(b) => (isPt(p).get, b)
    }
    lower.flatMap { case (pt, begin) =>
      conjuncts.collectFirst {
        case LessThan(p: AttributeReference, e) if p.semanticEquals(pt) && isIv(e) => e
        case GreaterThan(e, p: AttributeReference) if p.semanticEquals(pt) && isIv(e) => e
      }.map(end => (pt, begin, end))
    }
  }

  private def hasEquiKey(conjuncts: Seq[Expression], l: LogicalPlan,
                         r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  /** Band the point side: project `pt div b` alongside the output. */
  private def bandPoints(side: LogicalPlan, pt: Attribute, b: Long): (LogicalPlan, Attribute) = {
    val band = Alias(fldivE(pt, b), "__graft_band")()
    (Project(side.output :+ band, side), band.toAttribute)
  }

  /** Band the interval side: drop inverted intervals, explode onto
    * every overlapped bucket.
    */
  private def bandIntervals(side: LogicalPlan, begin: Expression, end: Expression,
                            b: Long): (LogicalPlan, Attribute) = {
    val guarded = Filter(GreaterThan(end, begin), side)
    // TimeZoneAwareExpression: unresolved until a zone is pinned (the
    // zone is irrelevant for long sequences, but `resolved` checks it)
    val seq = new Sequence(fldivE(begin, b),
      fldivE(Subtract(end, Literal(1L)), b), Literal(1L))
      .withTimeZone(conf.sessionLocalTimeZone)
    val out = AttributeReference("__graft_band", LongType,
      nullable = seq.dataType.asInstanceOf[ArrayType].containsNull)()
    (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(out), child = guarded), out)
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val bucket = conf.getConfString(BucketConfKey, "0").toLong
    if (bucket <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val found = containment(conjuncts, left, right).map((_, true))
          .orElse(containment(conjuncts, right, left).map((_, false)))
        found match {
          case Some(((pt, begin, end), ptOnLeft)) =>
            val (ivSide, ptSide) = if (ptOnLeft) (right, left) else (left, right)
            val (pts, ptBand) = bandPoints(ptSide, pt, bucket)
            val (ivs, ivBand) = bandIntervals(ivSide, begin, end, bucket)
            val (newL, newR) = if (ptOnLeft) (pts, ivs) else (ivs, pts)
            val newCond = And(cond, EqualTo(ptBand, ivBand))
            Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
