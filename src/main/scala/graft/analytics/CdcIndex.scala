package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED chunk-hash index: the content-defined-chunking twin of
  * [[DedupIndex]] — build once over corpus history, screen every arriving
  * shard for chunk-level duplicate MASS (the exact-substring-dedup
  * admission signal) without ever rescanning history.
  *
  * On-disk layout under `dir`:
  *   - `chunks/` (chunk_hash, doc_id) PARTITIONED BY `bucket =
  *     chunk_hash % 64` — one 8-byte hash row per (doc, distinct chunk)
  *     per write. Text never lands in the index: the store is digest-only,
  *     so a 100 TB corpus's index is ~tokens/modulus longs (orders smaller
  *     than the text), and shuffles during build/screen move 8-byte keys.
  *     The `doc_id` ATTRIBUTION column (r13) exists for exact
  *     right-to-be-forgotten — a chunk hash leaves the reachable set only
  *     when NO non-forgotten doc carries it. Screening never reads the
  *     column (parquet prunes it), but attribution DOES grow the row
  *     count from one per globally-distinct chunk to one per
  *     (doc, distinct chunk): on heavily cross-doc-duplicated corpora the
  *     screen semi-join scans proportionally more (hash-only) rows — the
  *     storage/scan price of the only exact forget semantics (ADVICE
  *     r13; pre-aggregate distinct hashes per bucket at screen time if a
  *     corpus's sharing factor ever makes it bite).
  *
  * Screening uses a LEFT SEMI join from the delta's chunk stream to the
  * store — semi-join membership is exact even when appends have written a
  * hash more than once, so no store-side distinct pass is ever needed
  * (appends stay cheap and blind). Duplicate mass is reported in integer
  * per-mille (no doubles — cross-engine exact); the oracle row
  * `dedup_cdc_admit` IS the batch split semantics by construction.
  *
  * Right-to-be-forgotten (r13): [[forget]] appends doc ids to a tombstone
  * set; [[screenDelta]] excludes tombstoned docs' rows from the reachable
  * hash set BEFORE the semi join, so a forgotten doc's content stops
  * rejecting arrivals exactly as if it had never been indexed — while a
  * chunk also carried by a surviving doc keeps matching (the
  * attribution-exact contract; `cdc_index_forget` oracle row).
  * [[compact]] reclaims space partition-scoped (only buckets containing
  * tombstoned rows are rewritten). Re-appending a forgotten doc_id
  * requires [[compact]] first (the tombstone suppresses its rows).
  *
  * Append composes: chunk hashes are a pure function of text, so
  * build(h1) + append(h2) screens exactly like build(h1 ∪ h2)
  * (CdcIndexSpec proves it row-for-row). Every mutation runs under
  * [[IndexLock]], like every persisted index in this engine. */
object CdcIndex {

  private val Buckets = 64

  /** Layout/chunking record (r15, completing the family contract of
    * VERDICT r14 #1): the CDC window `w` and rolling-hash `modulus` are
    * properties of the BUILD — chunk boundaries are a pure function of
    * (text, w, modulus), so an [[append]] or [[screenDelta]] under
    * different values produces different chunk hashes and silently misses
    * every duplicate. Recorded at build, validated on every later
    * operation; meta-less pre-r15 indexes trust the caller (their
    * historical contract). `buckets` is recorded for cross-version safety
    * (the partition rule must match what is on disk). */
  private def writeMeta(spark: SparkSession, dir: String, w: Int, modulus: Int): Unit =
    IndexMeta.write(spark, dir,
      s"""{"layout":1,"w":$w,"modulus":$modulus,"buckets":$Buckets}""")

  private def checkGeometry(spark: SparkSession, dir: String, w: Int, modulus: Int): Unit =
    IndexMeta.readText(spark, dir).foreach { txt =>
      def field(k: String): Long = IndexMeta.long(txt, k).getOrElse(
        throw new IllegalStateException(s"CDC index meta at $dir is unreadable: $txt"))
      if (field("w") != w || field("modulus") != modulus || field("buckets") != Buckets)
        throw new IllegalStateException(
          s"CDC index at $dir was built with w=${field("w")} modulus=${field("modulus")} " +
            s"buckets=${field("buckets")}; caller asked for w=$w modulus=$modulus " +
            s"buckets=$Buckets - mismatched chunking cannot compose; pass the build " +
            "parameters or rebuild the index")
    }

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  /** The stored chunk frame, or an empty (doc_id, chunk_hash, bucket)
    * frame when the store dir is absent (fresh index, or an all-forgotten
    * compact deleted it — the readers' empty contract). */
  private def readChunks(spark: SparkSession, dir: String): DataFrame = {
    val root = path(s"$dir/chunks")
    if (!fs(spark, root).exists(root)) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("chunk_hash", LongType), StructField("bucket", LongType))))
    } else spark.read.parquet(s"$dir/chunks")
  }

  private def hashes(docs: DataFrame, w: Int, modulus: Int,
                     idCol: String, textCol: String): DataFrame =
    Dedup.cdcChunks(docs, w, modulus, idCol, textCol)
      .select(col("doc_id"), Dedup.hash60(col("chunk")).as("chunk_hash"))
      .distinct()
      .withColumn("bucket", col("chunk_hash") % Buckets)

  /** Build and write the index from corpus history. */
  def build(docs: DataFrame, dir: String, w: Int = 4, modulus: Int = 16,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(docs.sparkSession, dir) {
      hashes(docs, w, modulus, idCol, textCol)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/chunks")
      writeMeta(docs.sparkSession, dir, w, modulus)
      // a REBUILD resets the index completely: stale tombstones from a
      // pre-rebuild [[forget]] must not keep suppressing the fresh corpus
      val tp = path(s"$dir/tombstones")
      fs(docs.sparkSession, tp).delete(tp, true): Unit
    }

  private def appendUnlocked(delta: DataFrame, dir: String, w: Int, modulus: Int,
                             idCol: String, textCol: String): Unit = {
    checkGeometry(delta.sparkSession, dir, w, modulus)
    val hadMeta = IndexMeta.readText(delta.sparkSession, dir).isDefined
    hashes(delta, w, modulus, idCol, textCol)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/chunks")
    // first mutating touch of a legacy meta-less index: pin the caller's
    // geometry (the chunks just written compose only under it) so every
    // later operation stops trusting caller parameters — the same
    // first-touch rule as SearchIndex.append / DedupIndex.appendUnlocked;
    // without it this index alone would keep the silent-miss hazard open
    if (!hadMeta) writeMeta(delta.sparkSession, dir, w, modulus)
  }

  /** Append a shard's chunk hashes (blind — screen first via
    * [[screenDelta]] when admission should gate the append, or use
    * [[ingest]] which does both under one lock). */
  def append(delta: DataFrame, dir: String, w: Int = 4, modulus: Int = 16,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(delta.sparkSession, dir) {
      appendUnlocked(delta, dir, w, modulus, idCol, textCol)
    }

  /** Delete history docs from the screening set without rewriting the
    * store: their ids join a tombstone set whose rows [[screenDelta]]
    * anti-joins out of the reachable hash set — O(|ids|) delete, space
    * reclaimed lazily by [[compact]] (the family contract). Requires a
    * store with the doc attribution column (pre-r13 stores must be
    * rebuilt — fail-fast check). */
  def forget(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "doc_id"): Unit =
    IndexLock.withLock(spark, dir) {
      if (!readChunks(spark, dir).columns.contains("doc_id"))
        throw new IllegalStateException(s"CDC index at $dir has no doc attribution " +
          "(built before right-to-be-forgotten support); rebuild it with CdcIndex.build")
      ids.select(col(idCol).cast("long").as("doc_id")).distinct()
        .write.mode("append").parquet(s"$dir/tombstones")
    }

  /** Rewrite ONLY the buckets containing tombstoned docs' rows and clear
    * the tombstone set (partition-scoped — see [[PqIndex.compact]]).
    * Screens before and after return identical verdicts (CdcIndexSpec). */
  def compact(spark: SparkSession, dir: String): Unit =
    IndexLock.withLock(spark, dir) {
      tombstones(spark, dir).foreach { tomb =>
        val t = broadcast(tomb)
        val root = path(s"$dir/chunks")
        val f = fs(spark, root)
        val affected = readChunks(spark, dir)
          .join(t, Seq("doc_id"), "left_semi")
          .select(col("bucket").cast("long")).distinct()
          .collect().map(_.getLong(0))
        if (affected.nonEmpty) {
          val surv = readChunks(spark, dir)
            .filter(col("bucket").isin(affected.toSeq: _*))
            .join(t, Seq("doc_id"), "left_anti")
            .localCheckpoint(true) // affected buckets only
          val survB = surv.select(col("bucket").cast("long")).distinct()
            .collect().map(_.getLong(0)).toSet
          if (survB.nonEmpty)
            surv.repartition(col("bucket"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("bucket").parquet(s"$dir/chunks")
          affected.filterNot(survB).foreach(b =>
            f.delete(path(s"$dir/chunks/bucket=$b"), true): Unit)
          // all-emptied edge: a partitioned dir with zero partitions fails
          // schema inference AND a zero-row placeholder part would corrupt
          // partition discovery for later appends — delete the dir; the
          // readers treat a missing store as empty ([[readChunks]])
          val anyLeft = f.listStatus(root).exists(_.getPath.getName.startsWith("bucket="))
          if (!anyLeft) f.delete(root, true): Unit
        }
        val p = path(s"$dir/tombstones")
        fs(spark, p).delete(p, true): Unit
      }
    }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = path(s"$dir/tombstones")
    if (fs(spark, p).exists(p)) Some(spark.read.parquet(p.toString)) else None
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
    * (non-forgotten) history, integer duplicate-mass per-mille, and the
    * admission verdict (`dup_permille <= maxDupPerMille`). Every delta doc
    * gets a verdict row — the routable-admission contract. */
  def screenDelta(spark: SparkSession, dir: String, delta: DataFrame,
                  maxDupPerMille: Int = 500, w: Int = 4, modulus: Int = 16,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    checkGeometry(spark, dir, w, modulus)
    val hist0 = readChunks(spark, dir)
    // tombstoned docs' rows leave the reachable set ([[forget]]); lock-free
    // by the same monotone argument as the twins
    val hist = tombstones(spark, dir)
      .fold(hist0)(t => hist0.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .select(col("chunk_hash"))
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
