package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a non-equi interval-containment join
  * into a bucketed equi-join — the declarative face of
  * [[graft.ext.Relational.rangeJoin]].
  *
  * Spark plans `SELECT ... FROM p JOIN iv ON p.v >= iv.lo AND p.v <= iv.hi`
  * as BroadcastNestedLoopJoin (or a cartesian product): every point row is
  * probed against every interval row — O(n·m), the classic 100 TB
  * scale-killer. With a bucket width W near the typical interval length,
  * the same join is an equi-join: the point side maps each row to ONE
  * bucket `floor(v/W)`, the interval side explodes to its covered buckets
  * `sequence(floor(lo/W), floor(hi/W))`, and the original predicate is
  * re-checked after the bucket match. Completeness: floor(x/W) is monotone,
  * so lo <= v <= hi implies bkt(lo) <= bkt(v) <= bkt(hi) — every
  * qualifying pair collides in the point's bucket.
  *
  * This is deliberately a LOGICAL rewrite into existing operators rather
  * than a custom SparkPlan: the produced Join/Generate/Project nodes keep
  * whole-stage codegen, AQE (skew splitting, runtime re-plan) and every
  * downstream optimizer rule working untouched.
  *
  * Fires only when ALL hold (conservative by design):
  *  - `spark.graft.rangeJoin.bucketWidth` is set to a positive number
  *    (session conf; 0/absent disables the rule entirely);
  *  - the join is INNER with a conjunctive condition containing a lower
  *    and an upper bound on the same numeric point attribute, with both
  *    bound attributes from the opposite side (strict or inclusive);
  *  - the condition has NO equi-conjunct across the sides — if one
  *    exists, Spark already hash-partitions on it and the nested-loop
  *    pathology this rule targets doesn't arise.
  * The rewritten join carries an equi-conjunct on the bucket ids, so the
  * rule can never re-fire on its own output under fixed-point iteration.
  * Timestamp intervals: cast to epoch seconds/micros first (numeric only —
  * the bucket arithmetic is plain division).
  *
  * Registered declaratively by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) and programmatically via
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def width: Double =
    try SQLConf.get.getConfString(WidthConf, "0").toDouble
    catch { case _: NumberFormatException => 0.0 }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x         => Seq(x)
  }

  /** (point, bound, isLower) for a comparison conjunct over two numeric
    * attributes; the original predicate is kept verbatim in the rewritten
    * join, so strict vs inclusive doesn't matter for correctness here.
    */
  private def asBound(e: Expression): Option[(AttributeReference, AttributeReference, Boolean)] = {
    def num(x: Expression): Option[AttributeReference] = x match {
      case a: AttributeReference if a.dataType.isInstanceOf[NumericType] => Some(a)
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(p, b) => for (pp <- num(p); bb <- num(b)) yield (pp, bb, true)
      case GreaterThan(p, b)        => for (pp <- num(p); bb <- num(b)) yield (pp, bb, true)
      case LessThanOrEqual(p, b)    => for (pp <- num(p); bb <- num(b)) yield (pp, bb, false)
      case LessThan(p, b)           => for (pp <- num(p); bb <- num(b)) yield (pp, bb, false)
      case _                        => None
    }
  }

  /** Flip `lo <= p` style conjuncts so the point is always first. */
  private def normalized(e: Expression): Seq[(AttributeReference, AttributeReference, Boolean)] =
    (asBound(e) ++ (e match {
      case GreaterThanOrEqual(b, p) => asBound(LessThanOrEqual(p, b))
      case GreaterThan(b, p)        => asBound(LessThan(p, b))
      case LessThanOrEqual(b, p)    => asBound(GreaterThanOrEqual(p, b))
      case LessThan(b, p)           => asBound(GreaterThan(p, b))
      case _                        => None
    })).toSeq

  private def spansBoth(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e.references.intersect(l.outputSet).nonEmpty && e.references.intersect(r.outputSet).nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) if rewritable(l, r, cond).isDefined =>
        val (point, lo, hi) = rewritable(l, r, cond).get
        val wLit = Literal(w)
        def bkt(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), wLit))

        val pointOnLeft = point.references.subsetOf(l.outputSet)
        val (pPlan, iPlan) = if (pointOnLeft) (l, r) else (r, l)

        val pBucket = Alias(bkt(point), "__gbkt_p__")()
        val newPoint = Project(pPlan.output :+ pBucket, pPlan)

        // inverted/null intervals explode to zero buckets instead of
        // erroring inside Sequence (matches the theta join: no match)
        // Sequence is TimeZoneAwareExpression: it stays unresolved (and
        // fails plan validation) unless the zone is pinned explicitly
        val seq = Sequence(bkt(lo), bkt(hi), Some(Literal(1L)),
          Some(SQLConf.get.sessionLocalTimeZone))
        val safeSeq = If(LessThanOrEqual(bkt(lo), bkt(hi)), seq,
          Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
        val iBucket = AttributeReference("__gbkt_i__", LongType, nullable = false)()
        val newInterval = Generate(Explode(safeSeq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(iBucket), child = iPlan)

        val newCond = And(EqualTo(pBucket.toAttribute, iBucket), cond)
        val (nl, nr) = if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
        Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }

  /** The (point, lo, hi) triple iff this inner-join condition is a pure
    * non-equi interval containment across the two sides.
    */
  private def rewritable(l: LogicalPlan, r: LogicalPlan, cond: Expression)
      : Option[(AttributeReference, AttributeReference, AttributeReference)] = {
    val cs = conjuncts(cond)
    val hasEqui = cs.exists {
      case EqualTo(a, b)       => spansBoth(EqualTo(a, b), l, r)
      case EqualNullSafe(a, b) => spansBoth(EqualNullSafe(a, b), l, r)
      case _                   => false
    }
    if (hasEqui) return None

    def side(a: AttributeReference): Int =
      if (l.outputSet.contains(a)) 0 else if (r.outputSet.contains(a)) 1 else -1

    val bounds = cs.flatMap(normalized).filter { case (p, b, _) =>
      side(p) >= 0 && side(b) >= 0 && side(p) != side(b)
    }
    val byPoint = bounds.groupBy(_._1)
    byPoint.collectFirst {
      case (p, bs) if bs.exists(_._3) && bs.exists(!_._3) =>
        (p, bs.find(_._3).get._2, bs.find(!_._3).get._2)
    }
  }
}
