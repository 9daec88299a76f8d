package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog register sketches as PLAIN DATAFRAMES — the
  * pre-aggregated distinct-count cube pattern: build tiny per-cell register
  * tables once (e.g. per (day, event_type)), persist them, and answer
  * "distinct users over ANY range of cells" later by a register-max merge
  * that never rescans the events — the OLAP rollup a 100 TB fact table
  * cannot answer exactly per query.
  *
  * Unlike `approx_count_distinct` (whose HLL++ state is engine-internal and
  * opaque), these registers are ORDINARY ROWS (cell keys, bucket, rho):
  *   - mergeable by `max` — associative and commutative, so shard-built
  *     sketches equal the corpus-built sketch exactly (proven in
  *     SketchesSpec), and cross-day rollups are a groupBy away;
  *   - storable/joinable like any table (a sketch cube is just parquet);
  *   - DETERMINISTIC — bucket and rho derive from the engine-standard
  *     60-bit sha256-prefix hash ([[Dedup.hash60]]), so the DuckDB oracle
  *     reproduces registers, merge, AND estimate bit-for-bit (the
  *     `agg_hll_cube` row hash-matches, including the integer register sum
  *     — a stronger gate than "estimate within tolerance").
  *
  * Geometry: p=8 → m=256 registers; the remaining 52 hash bits feed rho
  * (leading-zero rank, 1..53). Standard-error ≈ 1.04/√256 ≈ 6.5%. The
  * estimator is textbook HLL: alpha·m²/Σ2^(−rho) with the linear-counting
  * small-range branch. All register arithmetic stays in exact BIGINTs
  * (Σ 2^(53−rho) ≤ 2^61); doubles appear only in the final estimate, which
  * is rounded at the output boundary like every oracled double here.
  * Determinism of that rounding is CHECKED, not hoped: the raw branch is a
  * fixed IEEE expression (spelled identically in the oracle), and the
  * linear-counting branch's ln has a finite domain — 255 possible
  * `256·ln(256/zeros)` values — which was compared exhaustively between
  * JVM `Math.log` and DuckDB `ln`: one value differs by 1 ulp (zeros=177)
  * and none sits closer than 1.7e-4 to a 2-decimal rounding boundary, so
  * `round(·, 2)` agrees on the whole domain.
  *
  * Scale shape: the build is one narrow pass + a (cells × 256)-row
  * aggregate — map-side partial max, fixed-width rows, no data-sized
  * shuffle. Merge and estimate touch register rows only. */
object HllSketch {

  val P = 8
  val M = 256
  /** Written as an arithmetic EXPRESSION (not a rounded literal) so the
    * DuckDB oracle can spell the identical IEEE operations. */
  val EstNumeratorSql: String =
    "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0"

  /** Per-cell register table: one row per (cell keys, bucket) with the max
    * leading-zero rank observed. `value` is hashed with the engine-standard
    * sha-60 ([[Dedup.hash60]] of its string form). */
  def registers(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val withH = df.select(keys.map(col) :+ Dedup.hash60(value.cast("string")).as("h"): _*)
    withH
      .withColumn("bucket", col("h").bitwiseAND(lit(255L)))
      .withColumn("rho",
        when(shiftright(col("h"), P) === 0L, lit(53))
          .otherwise(lit(53) - length(bin(shiftright(col("h"), P)))))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Roll register tables up to coarser keys (drop cell columns from
    * `keys`): bitwise-OR-free HLL merge is just per-bucket max, so any
    * subset of cells merges without touching source data. */
  def mergeRegisters(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs.groupBy((keys :+ "bucket").map(col): _*).agg(max("rho").as("rho"))

  /** Cardinality estimate per key group. Emits the exact integer register
    * sum (`s_sum`, the full-precision sketch state in one number) next to
    * the rounded double estimate so correctness gates can hash the exact
    * part. */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val raw = s"$EstNumeratorSql / CAST(s_sum AS DOUBLE)"
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")).as("s_present"))
      .withColumn("zeros", lit(M.toLong) - col("n_regs"))
      .withColumn("s_sum",
        col("s_present") + col("zeros") * lit(9007199254740992L))
      .withColumn("est_users", round(
        when(expr(s"$raw <= 640.0") && col("zeros") > 0,
          expr("256.0 * ln(256.0 / CAST(zeros AS DOUBLE))"))
          .otherwise(expr(raw)), 2))
      .select(keys.map(col) :+ col("zeros") :+ col("s_sum") :+ col("est_users"): _*)
  }
}
