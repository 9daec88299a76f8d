package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{DedupIndex, PqIndex}

/** Measures the r13 partition-scoped compaction claim (VERDICT r12 #2):
  * compact time must be proportional to the TOMBSTONED-PARTITION share,
  * not the index size. For each share level the probe rebuilds a fresh
  * index, tombstones ids chosen to touch exactly that share of the
  * partitions (inverted lists for [[PqIndex]], doc-hash buckets for
  * [[DedupIndex]]), and times [[PqIndex.compact]]/[[DedupIndex.compact]].
  * A flat-ish curve would mean the rewrite is still index-sized (the r12
  * defect); a rising curve through the origin is the fix working.
  *
  * Usage: CompactScaleProbe [sfDir] — env contract as graft.Bench. */
object CompactScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val b1 = sys.env.get("SPARK_GRAFT_JARS").fold(b0)(j => b0.config("spark.jars", j))
    val spark = sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .fold(b1)(m => b1.config("spark.executor.memory", m))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    /** (path -> size) map of every data file under `root` — mtime-free so
      * two snapshots diff purely on rewrite. */
    def snapshot(root: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File(root)).map(f => f.getPath -> f.length()).toMap
    }
    /** Bytes in files present after but not before (rewritten/new), and
      * total data bytes after — the construction-level proportionality
      * quantity (compact TIME at small SF is dominated by the fixed
      * affected-partition discovery scan + job overhead). */
    def rewriteShare(before: Map[String, Long], after: Map[String, Long]): (Long, Long) = {
      val rewritten = after.collect { case (p, sz) if !before.contains(p) => sz }.sum
      (rewritten, after.values.sum)
    }

    /** Listener-observed file input bytes during `f` (the discovery-leg
      * byte cost — what the r14 sidecar replaces: a two-column scan of the
      * WHOLE codes store per compact). */
    def bytesRead[T](f: => T): (T, Long) = {
      val c = ProbeMetrics.bytesRead(spark.sparkContext)
      try { val r = f; (r, c.quiesce()) } finally c.remove()
    }

    // ---- PqIndex: tombstone whole lists at increasing share ------------
    val emb = graft.Tables(spark, dir).embeddings
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count(): Unit
    for (shpct <- Seq(1, 10, 50)) {
      val idx = java.nio.file.Files.createTempDirectory(s"cmp-pq-$shpct").toString
      PqIndex.build(emb, idx)
      val lists = spark.read.parquet(s"$idx/codes")
        .select(col("vec_id"), col("centroid_id").cast("long").as("cid"))
      val allLists = lists.select("cid").distinct().orderBy("cid")
        .collect().map(_.getLong(0))
      val nAff = math.max(1, allLists.length * shpct / 100)
      val target = allLists.take(nAff).toSet
      // forget HALF of each affected list: the partitions must be
      // REWRITTEN (survivors remain), not just deleted — the rewrite is
      // the cost being measured
      val victims = lists.filter(col("cid").isin(target.toSeq: _*) &&
        col("vec_id") % 2 === 0).select("vec_id")
      PqIndex.forget(spark, idx, victims)
      // discovery-leg A/B (r14, VERDICT r13 #3): the affected-list set via
      // the vlists sidecar (tombstone-bucket-pruned) vs the legacy
      // two-column codes scan — time and bytes, measured on the SAME index
      val tomb = broadcast(spark.read.parquet(s"$idx/tombstones"))
      val vbs = spark.read.parquet(s"$idx/tombstones")
        .select(pmod(xxhash64(col("vec_id")), lit(16)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val ((_, tDs), bDs) = bytesRead(timed {
        spark.read.parquet(s"$idx/vlists")
          .filter(col("vbucket").isin(vbs: _*))
          .join(tomb, Seq("vec_id"), "left_semi")
          .select(col("centroid_id").cast("long")).distinct().collect().length
      })
      val ((_, tDc), bDc) = bytesRead(timed {
        spark.read.parquet(s"$idx/codes")
          .join(tomb, Seq("vec_id"), "left_semi")
          .select(col("centroid_id").cast("long")).distinct().collect().length
      })
      val before = snapshot(s"$idx/codes")
      val (_, tC) = timed(PqIndex.compact(spark, idx))
      val (rw, tot) = rewriteShare(before, snapshot(s"$idx/codes"))
      lines += s"""{"index":"pq","sf":"$dir","lists_affected":$nAff,""" +
        s""""lists_total":${allLists.length},"compact_s":${f3(tC)},""" +
        s""""discover_sidecar_s":${f3(tDs)},"discover_sidecar_bytes":$bDs,""" +
        s""""discover_codescan_s":${f3(tDc)},"discover_codescan_bytes":$bDc,""" +
        s""""bytes_rewritten":$rw,"bytes_total":$tot}"""
      println(lines.last)
    }
    emb.unpersist(): Unit

    // ---- DedupIndex: tombstone whole doc-hash buckets ------------------
    val docs = graft.Tables(spark, dir).documents
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count(): Unit
    for (nb <- Seq(1, 4, 16)) {
      val idx = java.nio.file.Files.createTempDirectory(s"cmp-dd-$nb").toString
      DedupIndex.build(docs, idx)
      val victims = docs
        .filter(pmod(xxhash64(col("doc_id")), lit(16)) < nb &&
          col("doc_id") % 2 === 0) // half of each bucket -> real rewrites
        .select("doc_id")
      DedupIndex.forget(spark, idx, victims)
      val before = snapshot(s"$idx/bands") ++ snapshot(s"$idx/shingles")
      val (_, tC) = timed(DedupIndex.compact(spark, idx))
      val (rw, tot) = rewriteShare(before,
        snapshot(s"$idx/bands") ++ snapshot(s"$idx/shingles"))
      lines += s"""{"index":"dedup","sf":"$dir","buckets_affected":$nb,""" +
        s""""buckets_total":16,"compact_s":${f3(tC)},""" +
        s""""bytes_rewritten":$rw,"bytes_total":$tot}"""
      println(lines.last)
    }
    docs.unpersist(): Unit

    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        lines.mkString("", "\n", "\n")): Unit)
    spark.stop()
  }
}
