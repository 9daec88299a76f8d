package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED chunk-hash index: the content-defined-chunking twin of
  * [[DedupIndex]] — build once over corpus history, screen every arriving
  * shard for chunk-level duplicate MASS (the exact-substring-dedup
  * admission signal) without ever rescanning history.
  *
  * On-disk layout under `dir`:
  *   - `chunks/` (chunk_hash) PARTITIONED BY `bucket = chunk_hash % 64` —
  *     one 8-byte hash row per distinct chunk per write. Text never lands
  *     in the index: the store is digest-only, so a 100 TB corpus's index
  *     is ~tokens/modulus longs (three orders smaller than the text), and
  *     shuffles during build/screen move 8-byte keys.
  *
  * Screening uses a LEFT SEMI join from the delta's chunk stream to the
  * store — semi-join membership is exact even when appends have written a
  * hash more than once, so no store-side distinct pass is ever needed
  * (appends stay cheap and blind). Duplicate mass is reported in integer
  * per-mille (no doubles — cross-engine exact); the oracle row
  * `dedup_cdc_admit` IS the batch split semantics by construction.
  *
  * Append composes: chunk hashes are a pure function of text, so
  * build(h1) + append(h2) screens exactly like build(h1 ∪ h2)
  * (CdcIndexSpec proves it row-for-row). Every mutation runs under
  * [[IndexLock]], like every persisted index in this engine. */
object CdcIndex {

  private val Buckets = 64

  private def hashes(docs: DataFrame, w: Int, modulus: Int,
                     idCol: String, textCol: String): DataFrame =
    Dedup.cdcChunks(docs, w, modulus, idCol, textCol)
      .select(Dedup.hash60(col("chunk")).as("chunk_hash"))
      .distinct()
      .withColumn("bucket", col("chunk_hash") % Buckets)

  /** Build and write the index from corpus history. */
  def build(docs: DataFrame, dir: String, w: Int = 4, modulus: Int = 16,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(docs.sparkSession, dir) {
      hashes(docs, w, modulus, idCol, textCol)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/chunks")
    }

  private def appendUnlocked(delta: DataFrame, dir: String, w: Int, modulus: Int,
                             idCol: String, textCol: String): Unit =
    hashes(delta, w, modulus, idCol, textCol)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/chunks")

  /** Append a shard's chunk hashes (blind — screen first via
    * [[screenDelta]] when admission should gate the append, or use
    * [[ingest]] which does both under one lock). */
  def append(delta: DataFrame, dir: String, w: Int = 4, modulus: Int = 16,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(delta.sparkSession, dir) {
      appendUnlocked(delta, dir, w, modulus, idCol, textCol)
    }

  /** Screen-then-admit ingest — the decision layer that makes shards
    * COMPOSE: every delta doc gets a [[screenDelta]] verdict against the
    * stored history, and only ADMITTED docs' chunk hashes are appended, so
    * a later shard's copy of an admitted doc is rejected while a copy of a
    * REJECTED doc's novel content is not (rejected content never enters
    * the store — the [[DedupIndex.ingest]] contract at chunk granularity).
    * One lock spans screen + append; the verdict frame is eagerly pinned
    * BEFORE the append so the screen can never observe its own write.
    * Returns the verdicts. */
  def ingest(spark: SparkSession, dir: String, delta: DataFrame,
             maxDupPerMille: Int = 500, w: Int = 4, modulus: Int = 16,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    IndexLock.withLock(spark, dir) {
      val verdicts = screenDelta(spark, dir, delta, maxDupPerMille, w, modulus,
          idCol, textCol)
        .localCheckpoint(true)
      val keep = verdicts.filter(col("admit")).select(col("doc_id").as(idCol))
      appendUnlocked(delta.join(keep, Seq(idCol), "left_semi"), dir, w, modulus,
        idCol, textCol)
      verdicts
    }

  /** Screen an arriving shard against the stored history: per delta doc,
    * the chunk count, the count of chunk OCCURRENCES whose hash exists in
    * history, integer duplicate-mass per-mille, and the admission verdict
    * (`dup_permille <= maxDupPerMille`). Every delta doc gets a verdict
    * row — the routable-admission contract. */
  def screenDelta(spark: SparkSession, dir: String, delta: DataFrame,
                  maxDupPerMille: Int = 500, w: Int = 4, modulus: Int = 16,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hist = spark.read.parquet(s"$dir/chunks").select(col("chunk_hash"))
    // the chunk stream feeds both the total and the hit count — materialize
    // once (the multi-reference rule)
    val chunks = Dedup.cdcChunks(delta, w, modulus, idCol, textCol)
      .select(col("doc_id"), Dedup.hash60(col("chunk")).as("chunk_hash"))
      .localCheckpoint(true)
    val tot = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val hit = chunks.join(hist, Seq("chunk_hash"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    tot.join(hit, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup"))
      .withColumn("dup_permille", expr("1000 * n_dup div n_chunks"))
      .withColumn("admit", col("dup_permille") <= maxDupPerMille)
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        col("dup_permille"), col("admit"))
  }
}
