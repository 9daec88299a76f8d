package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/serving-side compression step of a
  * training-data pipeline (reference stores raw vectors only; this is part
  * of the north-star surface: 100 TB of fp32 embeddings is 4× the bytes of
  * their int8 affine quantization at ~equal retrieval quality).
  *
  * Affine (asymmetric) per-vector int8: for vector x with m = min(x),
  * M = max(x), scale s = (M − m)/255,
  *
  *   q_i = floor((x_i − m) / (M − m) · 255)   ∈ [0, 255]
  *   x̂_i = m + q_i · s
  *
  * 100 TB design notes:
  *   - pure narrow pass — per-row min/max/transform folds, ZERO shuffle at
  *     any corpus size; quantized output shuffles/stores 1 byte per dim.
  *   - cross-engine exactness: elements are cast float→double (exact), every
  *     arithmetic step is a fixed-parenthesization IEEE double op, and the
  *     only outputs are integers (codes, floor-quantized error micro-units),
  *     so the DuckDB oracle reproduces them bit-for-bit — same contract as
  *     `Search.idfMicro` / the integer-cent RANGE-frame sums.
  *   - x = M (the max element) maps to (M−m)/(M−m)·255 = 255 exactly in
  *     IEEE, so no clamp is needed; degenerate constant vectors (M = m)
  *     quantize to all-zero codes with zero error by definition.
  */
object Quantization {

  private val Levels = 255.0
  private val Micro  = 1000000.0

  /** Per-vector int8 affine quantization + reconstruction-error accounting.
    *
    * Output: (id, n_dims, qvec_json, scale_nano, err_micro) where
    * `qvec_json` is the JSON-encoded int code array, `scale_nano` =
    * floor(s·1e9) and `err_micro` = Σ_i floor(|x_i − x̂_i|·1e6).
    */
  def int8Affine(emb: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    // vmin/vmax/span MUST be materialized as attributes before the lambdas
    // capture them: interpreted HOF lambdas re-evaluate captured outer
    // expressions per ELEMENT (no CSE), so an inline array_min(x) inside
    // transform() re-scans the whole vector once per component — O(dims²)
    // per row (measured 4.6 s → 0.5 s at sf0.1). The multi-referenced
    // non-cheap aliases keep CollapseProject from re-inlining them.
    val stats = emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("xd"))
      .select(col("id"), col("xd"),
        array_min(col("xd")).as("vmin"), array_max(col("xd")).as("vmax"))
      .withColumn("span", col("vmax") - col("vmin"))
    val x    = col("xd")
    val vmin = col("vmin")
    val span = col("span")
    // q_i as a double-valued integer (floor output), reused by the error term
    def qd(e: Column): Column = floor((e - vmin) / span * lit(Levels)).cast("double")
    def err(e: Column): Column =
      floor(abs(e - (vmin + qd(e) * (span / lit(Levels)))) * lit(Micro)).cast("long")

    val degenerate = col("vmax") === vmin
    stats.select(
      col("id"),
      size(x).cast("long").as("n_dims"),
      to_json(when(degenerate, transform(x, _ => lit(0)))
        .otherwise(transform(x, e => qd(e).cast("int")))).as("qvec_json"),
      when(degenerate, lit(0L))
        .otherwise(floor(span / lit(Levels) * lit(1e9)).cast("long")).as("scale_nano"),
      when(degenerate, lit(0L))
        .otherwise(aggregate(transform(x, err(_)), lit(0L), (acc, e) => acc + e))
        .as("err_micro"))
  }
}
