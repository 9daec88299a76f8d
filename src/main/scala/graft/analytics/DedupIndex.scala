package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED near-dup index: build once over corpus history, dedup every
  * arriving shard against it incrementally — the growing-corpus production
  * shape ([[Dedup.minhashLshPairs]] rescans the whole corpus per call,
  * which is right for a one-shot audit but not for a pipeline ingesting
  * shards forever; this is the missing half, the dedup twin of
  * [[PqIndex]]).
  *
  * On-disk layout under `dir`:
  *   - `bands/`    (doc_id, band, bucket) PARTITIONED BY band — the LSH
  *     probe structure; a few fixed-width rows per doc.
  *   - `shingles/` (doc_id, sh) — the shingle sets the verify stage
  *     intersects. This is the corpus-sized half; production systems either
  *     store it (as here) or re-read source text at verify time. Only
  *     verified CANDIDATES ever load it — the probe never scans it.
  *
  * At 100 TB: a delta shard joins the stored bands on (band, bucket) —
  * sub-quadratic by the same banding argument as the one-shot operator —
  * and the verify join touches shingle sets for candidate ids only. With a
  * metastore, store `bands` bucketed on (band, bucket) so delta probes
  * co-locate without shuffling the index; partition-by-band alone still
  * prunes the probe read per band. Band buckets are a pure function of the
  * text, so incremental [[append]]s compose: dedup(delta_2) sees
  * history + delta_1 exactly as a batch rebuild would.
  *
  * Determinism: shares [[Dedup.shingleFrame]]/[[Dedup.minhashBanded]]/
  * [[Dedup.jaccardVerify]] with the one-shot operator, so
  * `dedupDelta(history-built index, delta)` returns EXACTLY the
  * full-corpus pairs whose higher id lies in the delta (the `dedup_delta`
  * oracle row IS `dedup_minhash`'s SQL with that restriction).
  */
object DedupIndex {

  /** Build and write the index from corpus history. */
  def build(docs: DataFrame, dir: String,
            bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(docs.sparkSession, dir) {
      val withSh = Dedup.shingleFrame(docs, n, idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.minhashBanded(withSh, bands, rowsPerBand)
        .repartition(col("band"))
        .write.mode("overwrite").partitionBy("band").parquet(s"$dir/bands")
      withSh.write.mode("overwrite").parquet(s"$dir/shingles")
      withSh.unpersist(): Unit
    }

  /** Append a shard to the index (no dedup — compose with [[dedupDelta]]
    * first when the shard should be screened before admission). */
  def append(delta: DataFrame, dir: String,
             bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(delta.sparkSession, dir) {
      val withSh = Dedup.shingleFrame(delta, n, idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Dedup.minhashBanded(withSh, bands, rowsPerBand)
        .repartition(col("band"))
        .write.mode("append").partitionBy("band").parquet(s"$dir/bands")
      withSh.write.mode("append").parquet(s"$dir/shingles")
      withSh.unpersist(): Unit
    }

  /** Near-dup pairs TOUCHING the delta: delta-vs-history (via the stored
    * band index) plus delta-internal, both exact-Jaccard verified. History
    * is never rescanned — its bands are probed by join and its shingle
    * sets are loaded for verified candidates only. Assumes delta ids are
    * new (disjoint from the index). */
  def dedupDelta(spark: SparkSession, dir: String, delta: DataFrame,
                 minJaccard: Double,
                 bands: Int = 4, rowsPerBand: Int = 4, n: Int = 3,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dSh = Dedup.shingleFrame(delta, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dBand = Dedup.minhashBanded(dSh, bands, rowsPerBand)
    val iBand = spark.read.parquet(s"$dir/bands")
      .select(col("doc_id"), col("band"), col("bucket"))
    val cross = iBand.as("x").join(dBand.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id_b"))
    val internal = dBand.as("x").join(dBand.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val cand = cross.union(internal).distinct()
    val shin = spark.read.parquet(s"$dir/shingles").union(dSh)
    val out = Dedup.jaccardVerify(cand, shin, minJaccard)
      .localCheckpoint(true)
    dSh.unpersist()
    out
  }
}
