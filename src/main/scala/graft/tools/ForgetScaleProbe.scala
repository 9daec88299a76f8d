package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.{CdcIndex, SearchIndex}

/** Measures the r14 RTBF-cost claim (VERDICT r13 #1/#5): `forget` wall-time
  * and bytes READ must be flat across corpus scale for a FIXED tombstone
  * batch — O(|ids|), not O(index). For each SF the probe builds a fresh
  * BM25 [[SearchIndex]] and a [[CdcIndex]] over `documents`, forgets the
  * SAME fixed-size id batch, and records forget seconds, listener-observed
  * input bytes during the forget, index bytes on disk, and the compact
  * leg. Rising forget time/bytes with SF would mean the df-delta pass is
  * still index-sized (the r13 defect); flat curves are the forward-index
  * fix working.
  *
  * Usage: ForgetScaleProbe [sfDir] — env contract as graft.Bench
  * (SPARK_GRAFT_MASTER / _CPUS / _JARS / _EXEC_MEM / _BENCH_OUT). */
object ForgetScaleProbe {
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
    def dirBytes(p: String): Long = ProbeMetrics.dirBytes(p)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    val docs = graft.Tables(spark, dir).documents
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    // FIXED batch at every SF: the 200 lowest ids exist at all scales
    val ids = docs.select("doc_id").orderBy("doc_id").limit(200)
      .localCheckpoint(true)

    // ---- BM25 SearchIndex --------------------------------------------
    locally {
      val idx = java.nio.file.Files.createTempDirectory("fsp-bm25").toString
      val (_, tB) = timed(SearchIndex.build(docs, idx))
      val counter = ProbeMetrics.bytesRead(spark.sparkContext)
      val (_, tF) = timed(SearchIndex.forget(spark, idx, ids))
      val read = counter.quiesce()
      counter.remove()
      val bytesTotal = dirBytes(idx)
      // minShare = 0 forces the FULL reclaim: this probe's compact_s series
      // is compared across rounds (FORGETSCALE_r14 recorded the pre-
      // threshold full rewrite), and the r15 default (0.1) would skip every
      // bucket for a 200-doc forget and time a near-no-op instead —
      // tools.Bm25CompactScale measures the thresholded behavior
      val (_, tC) = timed(SearchIndex.compact(spark, idx, minShare = 0))
      lines += s"""{"index":"bm25","sf":"$dir","n_docs":$nDocs,"ids":200,""" +
        s""""build_s":${f3(tB)},"forget_s":${f3(tF)},"forget_bytes_read":$read,""" +
        s""""compact_s":${f3(tC)},"index_bytes":$bytesTotal}"""
      println(lines.last)
    }

    // ---- CDC chunk index ---------------------------------------------
    locally {
      val idx = java.nio.file.Files.createTempDirectory("fsp-cdc").toString
      val (_, tB) = timed(CdcIndex.build(docs, idx))
      val (_, tF) = timed(CdcIndex.forget(spark, idx, ids))
      val bytesTotal = dirBytes(idx)
      val (_, tC) = timed(CdcIndex.compact(spark, idx))
      lines += s"""{"index":"cdc","sf":"$dir","n_docs":$nDocs,"ids":200,""" +
        s""""build_s":${f3(tB)},"forget_s":${f3(tF)},""" +
        s""""compact_s":${f3(tC)},"index_bytes":$bytesTotal}"""
      println(lines.last)
    }

    docs.unpersist(): Unit
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        lines.mkString("", "\n", "\n")): Unit)
    spark.stop()
  }
}
