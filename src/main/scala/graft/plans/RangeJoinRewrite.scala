package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure point-in-interval inequality join into
  * the bucketed equi-join of [[graft.operators.RangeJoin]], automatically.
  *
  * A join whose ONLY condition is `p >= s AND p < e` (point from one side,
  * both bounds from the other) has no equi keys, so Spark plans a
  * nested-loop join — one side fully broadcast, per-row interval scans.
  * This rule inserts the interval-bucketing decomposition at the logical
  * level: intervals explode to the fixed-width buckets they overlap, points
  * compute their bucket, and the join becomes `bucket = bucket AND
  * <original condition>` — which the planner then executes as a hash join.
  *
  * Deliberately narrow: it matches exactly the half-open containment shape
  * (the common time-interval join), leaves any other inequality join
  * untouched, and preserves the original output attributes/order via a
  * final Project. Inject with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `spark.experimental.extraOptimizations`.
  *
  * The rewritten plan computes exactly the original condition as a residual
  * filter, so results are identical row-for-row (proven against the naive
  * join in RangeJoinRuleSpec).
  */
case class RangeJoinRewrite(bucketWidth: Long = 86400L) extends Rule[LogicalPlan] {

  require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")

  /** floor(x / width) as a LongType bucket id (matches RangeJoin) — in
    * EXACT integer arithmetic: the double-cast form loses integer
    * precision past 2^52, so a nanosecond-scale epoch (~1.7e18, double
    * ulp 256) could round across a bucket boundary and the equi-join
    * would silently drop rows the original inequality join returns.
    * `(x - pmod(x, w)) div w` is floor division for any sign of x (pmod
    * is non-negative, the numerator is exactly divisible). */
  private def bucketOf(x: Expression): Expression =
    IntegralDivide(
      Subtract(x, Pmod(x, Literal(bucketWidth))), Literal(bucketWidth))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(left, right, Inner,
        Some(cond @ And(GreaterThanOrEqual(p1, s), LessThan(p2, e))), hint)
        if p1.semanticEquals(p2) && p1.deterministic && s.deterministic && e.deterministic &&
          // LongType only: the bucket/Sequence construction below is typed
          // for integral epochs. Firing on timestamps/ints would build an
          // unresolvable Subtract and crash the optimizer; on strings the
          // numeric casts go NULL and the join would silently empty out.
          // Post-analysis there is no coercion to save us — guard hard.
          p1.dataType == LongType && s.dataType == LongType && e.dataType == LongType =>
      val pFromLeft = p1.references.subsetOf(left.outputSet) &&
        (s.references ++ e.references).subsetOf(right.outputSet)
      val pFromRight = p1.references.subsetOf(right.outputSet) &&
        (s.references ++ e.references).subsetOf(left.outputSet)
      if (!pFromLeft && !pFromRight) j
      else {
        val (points, intervals) = if (pFromLeft) (left, right) else (right, left)
        // Degenerate intervals (e <= s, or NULL bounds) never match in the
        // original join, but a start-bucket above the stop-bucket would make
        // Sequence(step=1) THROW at runtime — drop those rows first
        // (result-identical: inner join, unsatisfiable predicate).
        val nonDegenerate = Filter(LessThan(s, e), intervals)
        // intervals side: explode to every covered bucket [s/w .. (e-1)/w]
        // Sequence is TimeZoneAwareExpression: without an explicit zone it
        // stays unresolved even over longs, and the optimizer rejects the
        // plan ("previously resolved and now became unresolved")
        val seq = Sequence(
          bucketOf(s), bucketOf(Subtract(e, Literal(1L))), Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone))
        val bIv = AttributeReference("__rjb_iv", LongType, nullable = false)()
        val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bIv), child = nonDegenerate)
        // points side: one bucket per row
        val bPt = Alias(bucketOf(p1), "__rjb_pt")()
        val ptProj = Project(points.output :+ bPt, points)
        // The rewritten join always puts the points side on the left. When
        // the original had them on the right, side-specific hints
        // (broadcast(left) etc.) must swap with their child or they'd pin
        // the WRONG side — e.g. force-broadcasting the exploded intervals.
        val newHint = if (pFromLeft) hint else JoinHint(hint.rightHint, hint.leftHint)
        val newJoin = Join(ptProj, gen, Inner,
          Some(And(EqualTo(bPt.toAttribute, bIv), cond)), newHint)
        // restore the original schema (attribute order and no helper cols)
        Project(j.output, newJoin)
      }
  }
}
