package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable relative-error quantile sketches as PLAIN DATAFRAMES — the
  * quantile twin of [[HllSketch]]'s distinct cube, in the DDSketch family:
  * values map to log-spaced integer buckets, a sketch is just (cell keys,
  * bucket, count) rows, merge is `sum`, and any quantile of any cell range
  * comes from a cumulative walk over the merged histogram — so a 100 TB
  * fact table is scanned ONCE to build per-cell sketches and every later
  * p50/p95/p99 question over any slice touches only histogram rows.
  *
  * Bucketing (on positive integer micro-units, here cents) is PURE INTEGER
  * arithmetic — no ln, no doubles, nothing for two engines to disagree on:
  *   - c < 32: bucket = c, representative = c (EXACT small values);
  *   - else, with b = bitlength(c): 5 sub-bits after the MSB give
  *     bucket = (b−1)·32 + ((c >> (b−6)) & 31) and representative =
  *     (32 + sub) << (b−6), the bucket's lower bound.
  * Buckets are monotone in c (quantile order is preserved) and one bucket
  * spans a (1 + 1/32) ratio, so a reported quantile understates the true
  * one by at most ~3.1% relative — the DDSketch guarantee, with counts
  * exact and the whole estimator integer-deterministic (the
  * `agg_quantile_cube` oracle hash-matches representative cents, not a
  * tolerance).
  *
  * Scale shape: one narrow pass + a map-side-combined count per (cell,
  * bucket); ≤ ~512 buckets per cell regardless of data volume; merges and
  * quantile walks never touch source rows. Quantile selection is a
  * cumulative window over bucket order within each key group — group
  * cardinality × bucket count rows, nothing data-sized. */
object QuantileSketch {

  /** Per-cell histogram sketch: (keys, bucket, rep, cnt). `amount` must be
    * a positive integer column (micro-units); zero/negatives clamp to 1. */
  def histogram(df: DataFrame, keys: Seq[String], amount: Column): DataFrame = {
    val c = greatest(amount.cast("long"), lit(1L))
    df.select(keys.map(col) :+ c.as("c"): _*)
      .withColumn("b", length(bin(col("c"))).cast("long"))
      .withColumn("bucket",
        when(col("c") < 32, col("c"))
          .otherwise((col("b") - 1) * 32 +
            expr("shiftright(c, b - 6)").bitwiseAND(lit(31L))))
      .withColumn("rep",
        when(col("c") < 32, col("c"))
          .otherwise(expr("shiftleft(32 + (shiftright(c, b - 6) & 31), b - 6)")))
      .groupBy((keys.map(col) :+ col("bucket") :+ col("rep")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Roll sketches up to coarser keys: histogram merge is count addition. */
  def mergeHistograms(hists: DataFrame, keys: Seq[String]): DataFrame =
    hists.groupBy((keys.map(col) :+ col("bucket") :+ col("rep")): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates per key group from a (merged) histogram: for each
    * q, the representative of the first bucket whose cumulative count
    * reaches ⌈q·n⌉. Representatives are integer micro-units; callers
    * convert to display units at the output boundary. */
  def quantiles(hist: DataFrame, keys: Seq[String],
                qs: Seq[(String, Double)] = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val w = part.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(part))
    val aggs = qs.map { case (name, q) =>
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("rep"))).as(name)
    }
    withCum.groupBy(keys.map(col): _*)
      .agg(max(col("n")).as("n"), aggs: _*)
  }
}
