package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the join type a plain inequality condition
  * plans as a nested-loop (`BroadcastNestedLoopJoin`: one side fully
  * broadcast, per-row interval scan). Instead, both sides are keyed into
  * fixed-width time buckets: an interval covers every bucket it overlaps
  * (bounded explode), a point lands in exactly one, and the join becomes a
  * hash EQUI-join on the bucket id with the exact containment predicate as
  * a residual filter.
  *
  * At 100 TB: the point stream shuffles (or broadcasts the bucketed
  * intervals when they are small — AQE decides); candidate volume per point
  * is the number of intervals overlapping its bucket, so `bucketWidth`
  * trades explode factor (≈ interval span / width per interval) against
  * candidate fan-in — the standard interval-bucketing scheme (same family
  * as the blocked theta-join in Dedup.embeddingNearDupPairsBlocked).
  */
object RangeJoin {

  /** Inner point-in-interval join.
    *
    * @param points      rows with an epoch-seconds point column `pointSec`
    * @param intervals   rows with `[startSec, endSec)` epoch-second columns
    * @param bucketSec   bucket width in seconds
    * @return points ⋈ intervals where `startSec <= point < endSec`, with all
    *         columns of both inputs
    */
  def pointInInterval(points: DataFrame, pointSec: String,
                      intervals: DataFrame, startSec: String, endSec: String,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    // the upper bucket floor((endSec - 1)/bucketSec) subtracts a FULL
    // second, which is only the exclusive-boundary adjustment for INTEGER
    // seconds: a fractional endSec (e.g. 100.5 with bucketSec 100) would
    // under-cover its last bucket and silently drop true matches near
    // interval ends — reject fractional column types up front
    Seq(points.schema(pointSec), intervals.schema(startSec), intervals.schema(endSec))
      .foreach { f =>
        import org.apache.spark.sql.types._
        val integral = f.dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        }
        require(integral,
          s"${f.name} must be an integral epoch-seconds column for exact " +
            s"bucket coverage, got ${f.dataType.simpleString}")
      }
    // Degenerate intervals (endSec <= startSec) can never contain a point,
    // but sequence(start, stop) with start > stop silently counts DOWN
    // (default step -1) — up to span/width rows of fan-out per corrupt
    // interval that the residual filter then throws away. Drop them first;
    // result-identical for the inner join (same guard as RangeJoinRewrite).
    // An interval [s, e) covers buckets floor(s/w) .. floor((e-1)/w); the
    // explode factor is bounded by span/width + 1.
    val iv = intervals.filter(col(startSec) < col(endSec)).withColumn("__bucket",
      explode(sequence(floor(col(startSec) / bucketSec).cast("long"),
        floor((col(endSec) - 1) / bucketSec).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointSec) / bucketSec).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointSec) >= col(startSec) && col(pointSec) < col(endSec))
      .drop("__bucket")
  }
}
