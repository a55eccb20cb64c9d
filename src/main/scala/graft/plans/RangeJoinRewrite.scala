package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

/** Optimizer rule: rewrite an INNER join whose condition contains a
  * band predicate — `lower(point, lo) AND upper(point, hi)` with the
  * point expression from one side and both bounds from the other —
  * and NO equi conjunct, into a bucketized equi-join. Catalyst has no
  * join operator for pure inequality conditions and falls back to
  * BroadcastNestedLoopJoin/CartesianProduct, which is O(|L|·|R|); the
  * rewrite is the logical-plan form of
  * [[graft.ops.TemporalJoins.rangeBucketJoin]]:
  *
  *  - the bounds side explodes to the covered buckets
  *    (`Generate(Explode(Sequence(bkt(lo), bkt(hi))))`),
  *  - the point side projects its single bucket,
  *  - the join becomes an EQUI-join on the bucket column,
  *  - the FULL original predicate re-filters the candidates exactly
  *    (so extra non-equi conjuncts and strict/inclusive bound variants
  *    all keep their semantics — candidate buckets are a superset).
  *
  * Bucketing uses truncating integral division, which is monotone —
  * so `bkt(lo)..bkt(hi)` always covers `bkt(point)` for any point in
  * the band, for any sign, and every matching pair meets in EXACTLY
  * the point's bucket (no dedup needed). Joins that already carry an
  * equi conjunct are left alone: Catalyst hash-joins those.
  *
  * Opt-in: fires only when `spark.graft.rangeJoin.bucketWidth` is a
  * positive long (choose ≈ the typical band width; the bounds side
  * replicates by ceil(width/bucketWidth)+1 rows). LongType operands
  * (epoch micros, grid indexes) bucketize directly; TimestampType
  * operands bucketize through `UnixMicros` (bucketWidth in
  * MICROSECONDS) and DateType through `UnixDate` (bucketWidth in
  * DAYS) — both exact on the internal representation, so a natural
  * `ts BETWEEN lo AND hi` or `d BETWEEN d1 AND d2` needs no manual
  * epoch conversion. Registered via [[graft.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toLong
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) if cond.deterministic =>
        matchBand(cond, left, right).map { case (point, lo, hi, pointOnLeft) =>
          rewrite(j, point, lo, hi, pointOnLeft, width)
        }.getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Some(true) if point refs ⊆ left and bound refs ⊆ right,
    * Some(false) for the mirror, None otherwise. */
  private def sidesSplit(point: Expression, lo: Expression, hi: Expression,
                         left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    def within(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (within(point, left) && within(lo, right) && within(hi, right)) Some(true)
    else if (within(point, right) && within(lo, left) && within(hi, left)) Some(false)
    else None
  }

  /** (point, lo, hi, pointOnLeft) if the condition holds a LongType
    * band across sides and no cross-side equi conjunct. */
  private def matchBand(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val cs = conjuncts(cond)
    val crossEqui = cs.exists {
      case EqualTo(a, b) =>
        sidesSplit(a, b, b, left, right).isDefined ||
          sidesSplit(b, a, a, left, right).isDefined
      case EqualNullSafe(a, b) =>
        sidesSplit(a, b, b, left, right).isDefined ||
          sidesSplit(b, a, a, left, right).isDefined
      case _ => false
    }
    if (crossEqui) return None // hash-joinable already — leave it alone

    // normalize each comparison to (smaller, larger)
    def asLess(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(a, b)           => Some((a, b))
      case LessThanOrEqual(a, b)    => Some((a, b))
      case GreaterThan(a, b)        => Some((b, a))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    val less = cs.flatMap(asLess)
    // a band is a pair: point as the larger of one (lo ≤ p) and the
    // smaller of another (p ≤ hi), bounds on the opposite side
    // all three operands the same bucketizable type: raw longs divide
    // directly, timestamps divide on their internal epoch-micros
    // value, dates on their internal epoch-days value
    def bucketizable(t: org.apache.spark.sql.types.DataType) =
      t == LongType || t == TimestampType || t == DateType
    less.iterator.flatMap { case (lo, p) =>
      less.collectFirst {
        case (p2, hi) if p.semanticEquals(p2) &&
            bucketizable(p.dataType) && lo.dataType == p.dataType &&
            hi.dataType == p.dataType &&
            sidesSplit(p, lo, hi, left, right).isDefined =>
          (p, lo, hi, sidesSplit(p, lo, hi, left, right).get)
      }
    }.nextOption()
  }

  private def rewrite(j: Join, point: Expression, lo: Expression,
                      hi: Expression, pointOnLeft: Boolean, width: Long): LogicalPlan = {
    val w = Literal(width, LongType)
    // UnixMicros/UnixDate are the identity on the internal Long/Int
    // representation, so bucketing through them is exact and monotone
    // (width = µs for timestamps, days for dates)
    def asLong(x: Expression): Expression = x.dataType match {
      case TimestampType => UnixMicros(x)
      case DateType      => Cast(UnixDate(x), LongType)
      case _             => x
    }
    def bkt(x: Expression): Expression = new IntegralDivide(asLong(x), w)

    val (pointPlan, boundsPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    // bounds side: one row per covered bucket. The explicit timezone
    // keeps the Sequence resolved — analysis (ResolveTimeZone) will not
    // run again on an optimizer-built node.
    val bucketAttr = AttributeReference("__range_bucket", LongType, nullable = false)()
    val exploded = Generate(
      Explode(new Sequence(bkt(lo), bkt(hi), Some(Literal(1L, LongType)))
        .withTimeZone(conf.sessionLocalTimeZone)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bucketAttr), child = boundsPlan)

    // point side: its single bucket
    val pBucket = Alias(bkt(point), "__point_bucket")()
    val projected = Project(pointPlan.output :+ pBucket, pointPlan)

    val (newLeft, newRight) =
      if (pointOnLeft) (projected, exploded) else (exploded, projected)
    val equi = Join(newLeft, newRight, Inner,
      Some(EqualTo(pBucket.toAttribute, bucketAttr)), JoinHint.NONE)
    // exact semantics: re-apply the original condition, then strip the
    // bucket columns to restore the original join's output
    Project(j.output, Filter(j.condition.get, equi))
  }
}
