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

  /** Overwrite the meta file with the given pre-rendered JSON object. */
  def write(spark: SparkSession, dir: String, json: String): Unit = {
    val p = metaPath(dir)
    val out = fs(spark, p).create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def readText(spark: SparkSession, dir: String): Option[String] = {
    val p = metaPath(dir)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
    }
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
}
