package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Distributed k-means (Lloyd iterations) over the embedding corpus — the
  * classic Spark clustering workload, shaped for 100 TB:
  *
  *   - centroids BROADCAST every round (they are the only global state,
  *     k × dims doubles);
  *   - assignment is a map-side-combined argmin: the crossJoin scores
  *     corpus×k rows, but `min_by` partial aggregation collapses them to
  *     ONE row per vector before the shuffle;
  *   - centroid recomputation is a per-dimension sum (posexplode →
  *     groupBy(cid, pos) with map-side combine → k·dims partials per
  *     partition), never a collect;
  *   - distances go through the codegen'd [[graft.functions.ArrayDotProduct]]
  *     as d² = |a|² + |b|² − 2a·b with norms computed once per side.
  *
  * Cross-engine determinism: embeddings are QUANTIZED to integer micro-units
  * up front (`round(x·1e6)` per component). Round-1 distances are then exact
  * integers in doubles (|q|² ≤ dims·(2e6)² ≪ 2^53), and round-2 centroids
  * are `exact-int-sum / count` divisions — identical IEEE ops on identical
  * inputs in any engine. The left-to-right dot-product fold matches DuckDB
  * `list_reduce` exactly (same contract as the cosine oracle).
  *
  * Seeding is deterministic: vectors with `id % centroidStep == 0` are the
  * initial centroids (same convention as [[Similarity.ivfTopK]]).
  */
object Clustering {

  /** Integer micro-unit quantization of a float/double vector. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"), x => round(x * 1e6).cast("long"))

  private def sqNorm(v: Column): Column = GraftFunctions.arrayDot(v, v)

  /** One Lloyd assignment: nearest centroid per vector (ties → lowest
    * centroid id). Input `corpus`: (vec_id, qd: array<double>, nq);
    * `cents`: (cid, m: array<double>, nm). */
  private def assign(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("nq") + col("nm") - lit(2.0) * GraftFunctions.arrayDot(col("qd"), col("m")))
      .groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))

  /** Recompute centroids as per-dimension means of the quantized vectors
    * (exact integer sums; one IEEE division per component). */
  private def recompute(assigned: DataFrame, quantized: DataFrame): DataFrame = {
    val sums = assigned.join(quantized, "vec_id")
      .select(col("cid"), posexplode(col("qi")).as(Seq("pos", "v")))
      .groupBy("cid", "pos").agg(sum("v").as("s"))
    val counts = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
    sums.groupBy("cid").agg(collect_list(struct(col("pos"), col("s"))).as("ps"))
      .join(counts, "cid")
      .select(col("cid"),
        transform(array_sort(col("ps")), x => x.getField("s").cast("double") / col("n")).as("m"))
      .withColumn("nm", sqNorm(col("m")))
  }

  /** Fixed-round Lloyd k-means; returns per-cluster stats after the final
    * assignment: member count, min member id, and the (exact-arithmetic)
    * mean of the first quantized component. `rounds` assignments run in
    * total, with `rounds − 1` centroid recomputations between them. */
  def kmeansStats(emb: DataFrame, centroidStep: Int, rounds: Int = 2,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val quantized = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qi"))
      .persist(lvl)
    val corpus = quantized
      .select(col("vec_id"), col("qi"),
        transform(col("qi"), _.cast("double")).as("qd"))
      .withColumn("nq", sqNorm(col("qd")))
      .select(col("vec_id"), col("qd"), col("nq"))
      .persist(lvl)
    val seed = corpus.filter(col("vec_id") % centroidStep === 0)
      .select(col("vec_id").as("cid"), col("qd").as("m"), col("nq").as("nm"))
    var assigned = assign(corpus, seed)
    var r = 1
    while (r < rounds) {
      assigned = assign(corpus, recompute(assigned, quantized))
      r += 1
    }
    val out = assigned.join(quantized, "vec_id")
      .groupBy(col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("vec_id")).as("min_member"),
        round(sum(element_at(col("qi"), 1)).cast("double") / count(lit(1)), 4).as("mean_q0"))
      .persist(lvl)
    // Materialize NOW, while quantized/corpus are cached (every round's
    // branches re-read them), then release the corpus-sized caches. Only
    // the k-row result stays persisted — without this, either the inputs
    // leak cache for the session lifetime (never unpersisted) or the
    // caller's action recomputes every round uncached (unpersisted too
    // early). The result is small and the eager materialization is the
    // iterative-algorithm norm (same pattern as connectedComponentKeepers).
    out.count(): Unit
    quantized.unpersist()
    corpus.unpersist()
    out
  }
}
