package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group percentiles.
  *
  * Spark's exact `percentile(...)` is a TypedImperativeAggregate that
  * buffers EVERY group value on-heap in the final reduce task — with few
  * groups (e.g. 3 return-flags) that is ~N/3 doubles in one task: the
  * worst memory shape in the relational suite, an OOM at 100× test scale.
  *
  * Two replacements, picked by [[perGroup]] on measured input size:
  *
  *   - [[exactByWindow]] — exact interpolated percentiles re-keyed through
  *     a window sort instead of an aggregation buffer. The per-group sort
  *     runs in Spark's external sorter (disk-backed, spills — WindowExec
  *     streams over sorted input), so memory stays bounded regardless of
  *     group size; parallelism is still one task per group, which is the
  *     inherent floor for exact rank statistics with few groups.
  *   - approx_percentile — the 100 TB default: a mergeable sketch with
  *     map-side partial aggregation (full parallelism, bounded memory,
  *     rank error ≤ 1/accuracy).
  *
  * Interpolation matches `percentile` / DuckDB `quantile_cont` exactly:
  * h = (n−1)·p, result = v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1] − v[⌊h⌋]).
  */
object Percentiles {

  /** Exact interpolated percentiles per group, window-sorted (no
    * aggregation buffer). `ps` maps output column name → percentile. */
  def exactByWindow(df: DataFrame, groupCol: String, valueCol: String,
                    ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val wn = Window.partitionBy(col(groupCol))
    def lo(p: Double): Column = floor((col("n") - 1) * p) + 1 // 1-based lower rank
    def hi(p: Double): Column = least(lo(p) + 1, col("n"))
    val counted = df.select(col(groupCol), col(valueCol).cast("double").as("v"))
      // percentile()/approx_percentile ignore NULL values — drop them before
      // ranking so both perGroup paths agree (and n counts non-null only)
      .filter(col("v").isNotNull)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      // keep only rows that are a lower/upper rank for SOME requested p:
      // ≤ 2·|ps| rows per group survive into the final (tiny) aggregate
      .filter(ps.map { case (_, p) => col("rn") === lo(p) || col("rn") === hi(p) }
        .reduce(_ || _))
    val aggs = ps.flatMap { case (name, p) =>
      Seq(max(when(col("rn") === lo(p), col("v"))).as(s"__lo_$name"),
        max(when(col("rn") === hi(p), col("v"))).as(s"__hi_$name"))
    } :+ first(col("n")).as("__n")
    val outs = ps.map { case (name, p) =>
      val h = (col("__n") - 1) * p
      val frac = h - floor(h)
      (col(s"__lo_$name") + frac * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
    }
    counted.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: outs: _*)
  }

  /** Sketch-based percentiles (map-side combinable; rank error ≤
    * 1/accuracy) — the path for inputs too large for exact ranking.
    * Shaped to match [[exactByWindow]]'s contract, not raw
    * percentile_approx: the value is CAST TO DOUBLE first (on an integer
    * column the sketch would return an integer element while the exact
    * path interpolates doubles — same query flipping type and value at
    * exactRowLimit), and all-NULL groups are dropped as the exact path's
    * null filter drops them (the sketch alone would keep them with NULL
    * quantiles). Values remain approximate by design; the PARITY contract
    * is row set and schema. */
  def approxPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[(String, Double)], accuracy: Int = 10000): DataFrame =
    df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col(groupCol))
      .agg(
        percentile_approx(col("__v"), array(ps.map(p => lit(p._2)): _*), lit(accuracy))
          .as("__qs"))
      .select(col(groupCol) +:
        ps.zipWithIndex.map { case ((name, _), i) => col("__qs")(i).as(name) }: _*)

  /** Library entry point: exact (window-sorted) below `exactRowLimit` input
    * rows, sketch above. The gate is measured, not guessed: `sizeHint` if
    * the caller already knows it, else one count() action — metadata-cheap
    * for file-backed frames; callers passing an expensive derived frame
    * should persist it first or supply the hint (the frame is computed
    * again by the chosen percentile plan). */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
               ps: Seq[(String, Double)],
               exactRowLimit: Long = 10000000L, accuracy: Int = 10000,
               sizeHint: Option[Long] = None): DataFrame =
    if (sizeHint.getOrElse(df.count()) <= exactRowLimit) exactByWindow(df, groupCol, valueCol, ps)
    else approxPerGroup(df, groupCol, valueCol, ps, accuracy)
}
