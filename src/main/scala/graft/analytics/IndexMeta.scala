package graft.analytics

import org.apache.spark.sql.SparkSession

/** Tiny shared read/write layer for the persisted-index family's
  * `_graft_meta.json` layout records (r15, VERDICT r14 #1).
  *
  * The hazard this closes: every store in the family ([[SearchIndex]],
  * [[DedupIndex]], [[PqIndex]]) derives its partition directories from a
  * hash-bucket rule whose WIDTH is a build-time constant — `hash % buckets`.
  * Probes and RTBF paths recompute that rule driver-side to build literal
  * partition filters, so a caller (or a JVM-wide sys-prop) supplying a
  * different width against an existing index prunes to the WRONG
  * directories and silently returns incomplete rows. The fix is the same
  * record/validate pattern [[PqIndex]] has used for its PQ geometry since
  * r11: the build records its layout constants here, every later operation
  * reads them back, and an explicit caller value that disagrees FAILS FAST
  * instead of mis-pruning. Indexes written before this metadata existed
  * fall back to the caller/default value (documented per index).
  *
  * The format is a single flat JSON object, small enough that a regex
  * field-reader is simpler and dependency-free (same choice as
  * [[PqIndex]]'s private meta since r11). */
private[analytics] object IndexMeta {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def metaPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_graft_meta.json")

  private def tmpPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_graft_meta.json.tmp")

  /** Replace the meta file with the given pre-rendered JSON object —
    * atomically for lock-free readers. A plain create(overwrite=true)
    * truncates first, so a reader racing a meta REWRITE (every
    * [[PqIndex]] append refreshes drift fields; first-touch pins rewrite
    * legacy indexes) could see an empty or partial object and either crash
    * or, worse, fall back to the legacy default width and silently
    * mis-prune. Instead: write the full object to a `.tmp` twin, then
    * delete-and-rename into place. [[readText]] covers the between-renames
    * window by falling back to the complete `.tmp`. */
  def write(spark: SparkSession, dir: String, json: String): Unit = {
    val p = metaPath(dir)
    val t = tmpPath(dir)
    val f = fs(spark, p)
    val out = f.create(t, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    f.delete(p, false)
    if (!f.rename(t, p))
      throw new IllegalStateException(s"index meta swap: cannot move $t into place")
  }

  /** Read the meta object. Prefers the live file; a missing live file with
    * a `.tmp` twin present means a writer is mid-swap (or crashed there) —
    * the twin holds the complete object, so read it rather than reporting
    * "no meta" (which downstream means LEGACY layout, a silently different
    * bucket rule). One final re-read of the live path closes the race where
    * the swap's rename lands between the two probes. */
  def readText(spark: SparkSession, dir: String): Option[String] = {
    def read1(p: org.apache.hadoop.fs.Path): Option[String] = {
      val f = fs(spark, p)
      // exists() then open() is a TOCTOU against write()'s delete/rename
      // (ADVICE r15): the file can vanish between the probe and the open —
      // treat that exactly like exists()=false so the orElse chain falls
      // through to the path the swap moved the object to.
      if (!f.exists(p)) None
      else
        try {
          val in = f.open(p)
          Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
        } catch { case _: java.io.FileNotFoundException => None }
    }
    read1(metaPath(dir)).orElse(read1(tmpPath(dir))).orElse(read1(metaPath(dir)))
  }

  def long(txt: String, k: String): Option[Long] =
    s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)

  def flag(txt: String, k: String): Boolean =
    s""""$k":true""".r.findFirstIn(txt).isDefined

  /** Doc/vec-hash bucket width by corpus size (r15, VERDICT r14 #4): the
    * 16-bucket constants of r13/r14 bound RTBF pruning at min(|ids|,16)/16
    * of the store and fix compact granularity forever — at 100 TB that is
    * the wrong constant, and SCALING.md prescribing a manual raise is not a
    * policy. One bucket per ~2^20 rows keeps buckets parquet-friendly
    * (≥ tens of MB each at realistic row widths) while letting a 1-id
    * forget prune to 1/width of the store; clamped to [16, 4096] so small
    * corpora keep the measured r13/r14 layout (every oracle corpus lands on
    * 16 — all existing rows byte-stable) and the directory count stays
    * bounded. The chosen width is recorded in the index meta and read back
    * by every later operation — never recomputed from a constant. */
  def bucketPolicy(rows: Long): Int =
    math.min(4096L, math.max(16L, (rows + (1L << 20) - 1) >> 20)).toInt

  /** Token-hash postings width by postings-row count (r16, VERDICT r15
    * #4): the fixed 64-way layout of r13–r15 makes every probed bucket
    * corpus/64-sized and pins compact granularity forever — the same
    * wrong-constant shape [[bucketPolicy]] closed for the doc-hash width.
    * One bucket per ~2^20 postings rows (~tens of MB of parquet at
    * realistic row widths) keeps per-term probes near-constant-sized as
    * the corpus grows; clamped to [64, 4096] so every oracle corpus lands
    * on the historical 64 (existing indexes byte-stable) and directory
    * count stays bounded. Recorded in the index meta at build; probes and
    * mutators read it back ([[SearchIndex.resolveBuckets]] fail-fast). */
  def tokenBucketPolicy(postingsRows: Long): Int =
    math.min(4096L, math.max(64L, (postingsRows + (1L << 20) - 1) >> 20)).toInt
}
