package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.GraftBridge

/** As-of join as a NATIVE whole-plan operator — logical node + planner
  * strategy + physical streaming-merge exec, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (or
  * `spark.experimental.extraStrategies`).
  *
  * The compositional form ([[graft.operators.AsofJoin]]) already gets the
  * right answer with one shuffle; this is the tier-(c) implementation from
  * the custom-operator preference order (compose → Expression → LogicalPlan
  * + Strategy + SparkPlan), and its physical shape is strictly leaner where
  * it matters at 100 TB:
  *
  *   - the union trick materializes left∪right through ONE window sort and
  *     evaluates a `last(...) over (...)` frame per row, carrying a packed
  *     right-struct column through the whole frame;
  *   - this exec instead asks the planner for co-hash-partitioned inputs
  *     sorted (key, ts) / (key, ts, tie) — Spark's disk-backed external
  *     sort, per side — and then streams BOTH sides through a single
  *     forward merge pass per partition: O(1) state (one buffered right
  *     row), zero windowing, zero schema padding. Per-partition memory is
  *     constant regardless of key cardinality or corpus size.
  *
  * Semantics (identical to the compositional operator and DuckDB
  * `ASOF LEFT JOIN ... ON key = key AND lts >= rts`):
  *   - LEFT OUTER: every left row survives;
  *   - match = same key, greatest `rts <= lts` (inclusive);
  *   - among right ties at equal (key, rts), the greatest `tieBreak` wins;
  *   - NULL keys and NULL left timestamps never match (SQL comparison
  *     semantics), NULL right timestamps are never candidates.
  */
object AsofJoinNative {

  /** Register the planner strategy on a live session (idempotent). Also
    * injectable at session build via `graft.functions.GraftExtensions`. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

  /** Left-outer as-of join. Right columns come back prefixed `asof_` (the
    * rename also re-aliases the right side with fresh expression ids, so
    * self-joins — the common "events vs their own signup rows" shape — are
    * unambiguous by construction). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val r = right.toDF(right.columns.map("asof_" + _): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))
    val node = AsofJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _)), keys.map(k => attr(rPlan.output, "asof_" + k)),
      attr(lPlan.output, leftTs), attr(rPlan.output, "asof_" + rightTs),
      attr(rPlan.output, "asof_" + tieBreak))
    GraftBridge.ofRows(spark, node)
  }
}

/** Logical as-of join node: pure metadata, fully resolved at construction
  * (keys/timestamps are attributes of the already-analyzed children). */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {

  // Fail fast on mismatched key/time types (r16 review sweep): the exec
  // builds its merge orderings from LEFT-side types only and applies them
  // to right-projected UnsafeRows — an Int right timestamp against a Long
  // left would be read through getLong and compare garbage, silently
  // joining rows to the wrong (or no) right match. No analysis rule runs
  // over this node (it is constructed resolved), so the constructor is the
  // only place to check.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must match: left ${leftKeys.map(_.dataType)} vs " +
      s"right ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join timestamp types must match: left ${leftTime.dataType} vs " +
      s"right ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsofJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: forward merge of two co-partitioned, co-sorted
  * inputs. Requirements make the planner insert the hash exchanges and
  * disk-backed sorts; this node holds exactly ONE buffered right row per
  * partition at any moment.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides hash-partitioned on ALL key columns in order → co-partitioned
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending, NullsFirst, Seq.empty)),
    (rightKeys :+ rightTime :+ rightTie).map(SortOrder(_, Ascending, NullsFirst, Seq.empty)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nRightCols = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key..., time) tuple projections for the merge comparison
      val lProj = UnsafeProjection.create(leftKeys :+ leftTime, lOut)
      val rProj = UnsafeProjection.create(rightKeys :+ rightTime, rOut)
      val keyTimeOrd = RowOrdering.createNaturalAscendingOrdering(lKeyTypes :+ timeType)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyTypes)
      val keyProjL = UnsafeProjection.create(leftKeys, lOut)
      val keyProjR = UnsafeProjection.create(rightKeys, rOut)
      val resultProj = UnsafeProjection.create(output, lOut ++ rOut)
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      val joined = new JoinedRow
      val nKeys = leftKeys.size

      new Iterator[InternalRow] {
        private var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
        // last right row with non-null (key, time) at or before the current
        // left (key, lts) in merge order — O(1) state, and because the right
        // side is sorted (key, ts, tie) ascending, later overwrites at equal
        // (key, ts) make the greatest tieBreak win automatically
        private var candidate: InternalRow = null
        private var candidateKey: InternalRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lkt = lProj(lRow)
          // advance the right cursor through every row at or before
          // (key, lts); the tuple is projected ONCE per right row (r16 —
          // the compare and the null check previously each paid a
          // projection on the innermost loop)
          var advancing = true
          while (advancing && rNext != null) {
            val rkt = rProj(rNext)
            if (keyTimeOrd.compare(rkt, lkt) <= 0) {
              // NULL right key/time (the first nKeys+1 slots of the tuple
              // projection) can never be an as-of match — skip, don't buffer
              if (!rkt.anyNull) {
                candidate = rNext.copy()
                candidateKey = keyProjR(rNext).copy()
              }
              rNext = if (rIter.hasNext) rIter.next() else null
            } else advancing = false
          }
          // match iff the buffered candidate is from the SAME key group and
          // the left (key, lts) tuple is fully non-null — a candidate left
          // over from an earlier key group fails the key comparison, and a
          // NULL left key/timestamp never matches (SQL comparison semantics)
          val lk = keyProjL(lRow)
          val matched = candidateKey != null && !lk.anyNull &&
            !lkt.isNullAt(nKeys) && keyOrd.compare(candidateKey, lk) == 0
          joined(lRow, if (matched) candidate else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
