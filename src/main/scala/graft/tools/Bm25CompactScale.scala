package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.SearchIndex

/** Measurement for the r15 share-scoped BM25 compact (VERDICT r14 #2): at
  * a given SF, build the index fresh per line, forget a chosen fraction of
  * the corpus, compact, and record postings BYTES REWRITTEN next to the
  * tombstoned share — the r14 any-tombstone rule rewrote nearly the whole
  * postings store for even a 1-doc forget (a doc's tokens hash across most
  * of the 64 buckets); with the threshold, bytes-rewritten must be ZERO
  * below `minShare` and bucket-complete above it, i.e. track the share.
  * One line runs the small fraction at `minShare = 0` — the r14 behavior —
  * as the A/B control. Bytes read during the compact are recorded too:
  * discovery now comes from the tombstoned ids' forward doc-buckets
  * (O(|ids|)), not a postings pass.
  *
  * Usage: Bm25CompactScale [sfDir] — JSONL to SPARK_GRAFT_BENCH_OUT
  * (default BM25COMPACT_r15.jsonl), env contract as graft.Bench. */
object Bm25CompactScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BM25COMPACT_r15.jsonl")
    val sink = new java.io.PrintWriter(new java.io.FileWriter(outPath, true))

    val read = ProbeMetrics.bytesRead(spark.sparkContext)
    def quiesce(): Long = read.quiesce(maxSpins = 30)
    // r16: the task-level counter above ALSO counts block-manager reads of
    // localCheckpoint blocks (deserialized rows, ~20x their parquet size —
    // the r15 "1.5 GB read" was mostly that); the scan counter below sums
    // post-pruning selected bytes of the executed file scans — the honest
    // file-I/O figure. Both are recorded.
    val scan = new ProbeMetrics.ScanBytes(spark)
    def snapshot(p: String): Map[String, Long] = ProbeMetrics.fileSizes(p)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val minId = docs.agg(min("doc_id")).head().getLong(0)
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)

    // (label, tombstone predicate, minShare)
    val lines = Seq(
      ("one_doc", col("doc_id") === minId, 0.1),
      ("one_doc_full", col("doc_id") === minId, 0.0), // r14-behavior control
      ("pct2", pmod(col("doc_id"), lit(50)) === 7, 0.1),
      ("pct30", pmod(col("doc_id"), lit(10)) < 3, 0.1))
    lines.foreach { case (label, pred, minShare) =>
      val idx = java.nio.file.Files.createTempDirectory(s"bm25cs-$label").toString
      SearchIndex.build(docs, idx)
      val post0 = snapshot(s"$idx/postings")
      val postingsBytes = post0.values.sum
      val victims = docs.filter(pred).select("doc_id")
      val nTomb = victims.count()
      SearchIndex.forget(spark, idx, victims)
      val r0 = quiesce()
      val s0 = scan.drain()
      val t0 = System.nanoTime()
      SearchIndex.compact(spark, idx, minShare = minShare)
      val wall = (System.nanoTime() - t0) / 1e9
      val bytesRead = quiesce() - r0
      val scanBytes = scan.drain() - s0
      val post1 = snapshot(s"$idx/postings")
      // rewritten = any file added or changed inside postings/
      val rewrittenBytes = post1.collect {
        case (p, len) if post0.get(p).forall(_ != len) => len
      }.sum
      val bucketOf = (p: String) => "bucket=\\d+".r.findFirstIn(p)
      val changedBuckets = (post1.toSet -- post0.toSet).flatMap(kv => bucketOf(kv._1)) ++
        (post0.keySet -- post1.keySet).flatMap(bucketOf(_))
      val totalBuckets = Option(new java.io.File(s"$idx/postings").listFiles())
        .map(_.count(_.getName.startsWith("bucket="))).getOrElse(0)
      val retained = new java.io.File(s"$idx/tombstones").exists()
      sink.println(
        s"""{"probe":"bm25_compact_scale","sf":"$dir","label":"$label",""" +
        s""""n_docs":$nDocs,"tomb_docs":$nTomb,"tomb_share":${f3(nTomb.toDouble / nDocs)},""" +
        s""""min_share":$minShare,"postings_bytes":$postingsBytes,""" +
        s""""bytes_rewritten":$rewrittenBytes,"buckets_rewritten":${changedBuckets.size},""" +
        s""""buckets_total":$totalBuckets,"bytes_read":$bytesRead,""" +
        s""""scan_bytes":$scanBytes,""" +
        s""""tombstones_retained":$retained,"wall_s":${f3(wall)}}""")
      sink.flush()
    }
    // ---- docBuckets width A/B (VERDICT r14 #4) -----------------------
    // RTBF pruning saturates at min(|ids|, docBuckets)/docBuckets of the
    // doc-bucketed stores: a small forget batch against a 4x wider layout
    // must read ~4x fewer census/forward bytes. The policy picks the width
    // from corpus size at build; this A/B pins the mechanism at two widths
    // on the same corpus with a 4-id batch.
    import spark.implicits._
    val fourIds = docs.select("doc_id").orderBy("doc_id").limit(4)
      .as[Long].collect().toSeq.toDF("doc_id").localCheckpoint(true)
    // width 1 = no pruning at all (the whole doc-store is one bucket) —
    // the anchor that shows what the bucket level buys; 16 vs 64 then
    // shows the marginal gain is footer-bound at this SF (the policy keeps
    // 16 until the per-bucket data bytes dominate)
    Seq(1, 16, 64).foreach { db =>
      val idx = java.nio.file.Files.createTempDirectory(s"bm25db-$db").toString
      SearchIndex.build(docs, idx, docBuckets = db)
      val storeBytes = snapshot(s"$idx/forward").values.sum +
        snapshot(s"$idx/census").values.sum
      val r0 = quiesce()
      val s0 = scan.drain()
      val t0 = System.nanoTime()
      SearchIndex.forget(spark, idx, fourIds)
      val wall = (System.nanoTime() - t0) / 1e9
      val bytesRead = quiesce() - r0
      val scanBytes = scan.drain() - s0
      sink.println(
        s"""{"probe":"bm25_docbuckets_ab","sf":"$dir","doc_buckets":$db,""" +
        s""""n_docs":$nDocs,"ids":4,"forget_bytes_read":$bytesRead,""" +
        s""""forget_scan_bytes":$scanBytes,""" +
        s""""docstore_bytes":$storeBytes,"forget_s":${f3(wall)}}""")
      sink.flush()
    }
    // ---- token-bucket width A/B (r16, VERDICT r15 #4) ----------------
    // The probe reads |terms| postings buckets, each ~store/width — a 4x
    // wider token layout must cut query scan bytes ~4x; a share-crossing
    // compact's rewrite set is also width-granular. Build the same corpus
    // at two pinned widths (the policy picks by postings rows in
    // production; pinning isolates the width variable) and measure a
    // 3-term query probe and a pct30 compact at each.
    Seq(64, 256).foreach { tb =>
      val idx = java.nio.file.Files.createTempDirectory(s"bm25tb-$tb").toString
      SearchIndex.build(docs, idx, buckets = tb)
      val postingsBytes = snapshot(s"$idx/postings").values.sum
      // HOT terms (df ~ corpus): their own postings dominate any bucket
      // they land in, so width cannot shrink their probe — that cost is
      // the data, not the layout. RARE terms (the 3 lowest-df tokens) are
      // where width pays: their probe is ~store/width of collision mass.
      val terms = Seq("data", "fast", "query").sorted
      val rareTerms = spark.read.parquet(s"$idx/df")
        .orderBy(col("df"), col("token")).limit(3)
        .collect().map(_.getAs[String]("token")).toSeq.sorted
      def timedQuery(ts: Seq[String]): (Double, Long, Long) = {
        val r0 = quiesce(); val s0 = scan.drain()
        val t0 = System.nanoTime()
        SearchIndex.query(spark, idx, ts, k = 20).collect(): Unit
        ((System.nanoTime() - t0) / 1e9, quiesce() - r0, scan.drain() - s0)
      }
      val (queryWall, queryRead, queryScan) = timedQuery(terms)
      val (rareWall, rareRead, rareScan) = timedQuery(rareTerms)
      SearchIndex.forget(spark, idx, docs.filter(pmod(col("doc_id"), lit(10)) < 3)
        .select("doc_id"))
      val c0r = quiesce(); val c0s = scan.drain()
      val tc0 = System.nanoTime()
      SearchIndex.compact(spark, idx, minShare = 0.1)
      val compactWall = (System.nanoTime() - tc0) / 1e9
      val compactRead = quiesce() - c0r
      val compactScan = scan.drain() - c0s
      sink.println(
        s"""{"probe":"bm25_tokenbuckets_ab","sf":"$dir","token_buckets":$tb,""" +
        s""""n_docs":$nDocs,"postings_bytes":$postingsBytes,""" +
        s""""query_scan_bytes":$queryScan,"query_bytes_read":$queryRead,""" +
        s""""query_s":${f3(queryWall)},""" +
        s""""rare_query_scan_bytes":$rareScan,"rare_query_bytes_read":$rareRead,""" +
        s""""rare_query_s":${f3(rareWall)},""" +
        s""""compact_scan_bytes":$compactScan,"compact_bytes_read":$compactRead,""" +
        s""""compact_s":${f3(compactWall)}}""")
      sink.flush()
    }
    sink.close()
    spark.stop()
    println(s"wrote $outPath")
  }
}
