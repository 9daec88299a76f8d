package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The persisted BM25 index: (1) serving from the stored postings is
  * bit-identical to the one-shot scorer (same tf/dl/df census and the same
  * fixed-order float chain — EXACT equality, not approximate); (2) probing
  * is static partition pruning — a query reads only its terms' hash-bucket
  * directories. */
class SearchIndexSpec extends SparkSpec {

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case x => x }.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s) ++ allNodes(s.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.executedPlan)
      case x => Seq(x)
    }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("stored-index query returns bit-identical rows to the one-shot scorer") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx").toString
    SearchIndex.build(docs, dir)
    val terms = Seq("data", "fast", "query")
    val fromIndex = rows(SearchIndex.query(spark, dir, terms, k = 20))
    val oneShot = Search.bm25TopDocs(docs, terms, k = 20)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(fromIndex.nonEmpty)
    assert(fromIndex == want)
  }

  test("appends merge on read: two appends equal the one-shot scorer over the union") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val hi = docs.agg(max("doc_id")).head().getLong(0)
    val (t1, t2) = (hi / 3, 2 * hi / 3)
    val dir = Files.createTempDirectory("searchidx3").toString
    SearchIndex.build(docs.filter(col("doc_id") <= t1), dir)
    SearchIndex.append(docs.filter(col("doc_id") > t1 && col("doc_id") <= t2), dir)
    SearchIndex.append(docs.filter(col("doc_id") > t2), dir)
    val terms = Seq("data", "fast", "query")
    val fromIndex = rows(SearchIndex.query(spark, dir, terms, k = 20))
    val oneShot = Search.bm25TopDocs(docs, terms, k = 20)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(fromIndex.nonEmpty)
    assert(fromIndex == want)
  }

  // ---------------- right-to-be-forgotten lifecycle (r13) ----------------

  private def files(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(dir)).map(f => (f.getPath, f.length())).toSet
  }

  test("forget equals a one-shot scorer over the filtered corpus, exactly") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-forget").toString
    SearchIndex.build(docs, dir)
    val victims = docs.filter(col("doc_id") % 5 === 2).select("doc_id")
    SearchIndex.forget(spark, dir, victims)
    val terms = Seq("data", "fast", "query")
    val got = rows(SearchIndex.query(spark, dir, terms, k = 20))
    val oneShot = Search.bm25TopDocs(docs.filter(col("doc_id") % 5 =!= 2), terms, k = 20)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(got.nonEmpty && got == want,
      "forget must adjust df/n/dl_sum exactly, not just hide postings")
    // idempotence: re-forgetting the same ids (plus unknown ids) must not
    // double-subtract the statistics
    import spark.implicits._
    SearchIndex.forget(spark, dir, victims.union(Seq(999999999L).toDF("doc_id")))
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)) == want)
  }

  test("compact is partition-scoped and preserves answers; no-op compact touches nothing") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-compact").toString
    SearchIndex.build(docs, dir)
    val terms = Seq("data", "fast", "query")
    // forget a couple of docs that DO carry postings for the query terms
    val hit = SearchIndex.query(spark, dir, terms, k = 5)
      .select("doc_id").collect().map(_.getLong(0)).take(2)
    import spark.implicits._
    SearchIndex.forget(spark, dir, hit.toSeq.toDF("doc_id"))
    val afterForget = rows(SearchIndex.query(spark, dir, terms, k = 20))
    // buckets the tombstoned docs touch (from their postings rows)
    val tombBuckets = spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id").isin(hit.map(Long.box).toSeq: _*))
      .select(col("bucket").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val allBuckets = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName.stripPrefix("bucket=").toLong).toSet
    assert(tombBuckets.nonEmpty && (allBuckets -- tombBuckets).nonEmpty,
      "fixture needs touched and untouched buckets")
    val untouchedBefore = (allBuckets -- tombBuckets).map(b => files(s"$dir/postings/bucket=$b"))
    SearchIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    val untouchedAfter = (allBuckets -- tombBuckets).map(b => files(s"$dir/postings/bucket=$b"))
    assert(untouchedAfter == untouchedBefore,
      "compact must not touch buckets without tombstoned postings")
    // rewritten buckets no longer contain the forgotten docs
    val left = spark.read.parquet(s"$dir/postings").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(hit.forall(!left.contains(_)))
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)) == afterForget)
    // tombstone-free compact is a byte-level no-op (lock diagnostics aside)
    val snap = files(dir).filterNot(f => f._1.contains("_lock"))
    SearchIndex.compact(spark, dir)
    assert(files(dir).filterNot(f => f._1.contains("_lock")) == snap)
  }

  test("all-forgotten index queries empty and revives on append after compact") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents.limit(50)
      .localCheckpoint(true)
    val dir = Files.createTempDirectory("searchidx-empty").toString
    SearchIndex.build(docs, dir)
    val terms = Seq("data", "fast", "query")
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)).nonEmpty)
    SearchIndex.forget(spark, dir, docs.select("doc_id"))
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)).isEmpty)
    SearchIndex.compact(spark, dir)
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)).isEmpty)
    // ADVICE r13: a forget AFTER the all-forgotten compact must be a clean
    // no-op (census/ may legitimately hold zero dbucket partitions here),
    // not a schema-inference failure
    SearchIndex.forget(spark, dir, docs.select("doc_id"))
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)).isEmpty)
    // re-appending after compact: the index equals a fresh build
    SearchIndex.append(docs, dir)
    val got = rows(SearchIndex.query(spark, dir, terms, k = 20))
    val oneShot = Search.bm25TopDocs(docs, terms, k = 20)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(got == want)
  }

  test("forget never touches the postings store (forward index carries the df deltas)") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-fwd").toString
    SearchIndex.build(docs, dir)
    // the r14 forward store exists, doc-hash partitioned
    val fwdBuckets = new java.io.File(s"$dir/forward").listFiles()
      .count(_.getName.startsWith("dbucket="))
    assert(fwdBuckets == 16, s"forward store should carry 16 dbuckets, got $fwdBuckets")
    // HIDE the postings dir: an O(|ids|) forget must not even list it
    val post = java.nio.file.Paths.get(s"$dir/postings")
    val hidden = java.nio.file.Paths.get(s"$dir/postings_hidden")
    java.nio.file.Files.move(post, hidden)
    val victims = docs.filter(col("doc_id") % 5 === 2).select("doc_id")
    try SearchIndex.forget(spark, dir, victims)
    finally java.nio.file.Files.move(hidden, post)
    val terms = Seq("data", "fast", "query")
    val got = rows(SearchIndex.query(spark, dir, terms, k = 20))
    val oneShot = Search.bm25TopDocs(docs.filter(col("doc_id") % 5 =!= 2), terms, k = 20)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(got.nonEmpty && got == want,
      "a postings-blind forget must still produce exact df/n/dl_sum deltas")
  }

  test("forget reads only the ids' doc-buckets: bytes read scale with |ids|, not index size") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-fscale").toString
    SearchIndex.build(docs, dir)
    def dirBytes(p: String): Long =
      files(p).iterator.map(_._2).sum
    val storeBytes = dirBytes(s"$dir/forward") + dirBytes(s"$dir/census") +
      dirBytes(s"$dir/postings")
    // one forgotten id → ONE candidate dbucket of 16 in census and forward,
    // zero postings bytes; allow generous slack for parquet footers and the
    // tiny tombstone/id frames
    val victim = docs.agg(min("doc_id")).head().getLong(0)
    var read = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read += t.taskMetrics.inputMetrics.bytesRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      SearchIndex.forget(spark, dir, Seq(victim).toDF("doc_id"))
      // listener events are async: wait until the byte count stabilizes
      var last = -1L
      var spins = 0
      while (read != last && spins < 50) { last = read; Thread.sleep(100); spins += 1 }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(read > 0, "listener should observe the forget's reads")
    assert(read < storeBytes / 3,
      s"a 1-id forget should read ~1/16 of census+forward and no postings: " +
        s"read $read of $storeBytes index bytes")
  }

  test("moreLikeThis: seed excluded, terms from the seed's own vocabulary, forget-aware") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-mlt").toString
    SearchIndex.build(docs, dir)
    val seedId = 1L
    val res = SearchIndex.moreLikeThis(spark, dir, seedId, k = 20, topTerms = 10)
      .collect()
    assert(res.nonEmpty && res.length <= 20)
    assert(!res.exists(_.getAs[Long]("doc_id") == seedId), "seed must be excluded")
    // every matched-term count is bounded by the term budget
    assert(res.forall(r => r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 10))
    // integer micro scores, strictly ranked with the documented tie-break
    val pairs = res.map(r => (r.getAs[Long]("score_micro"), r.getAs[Long]("doc_id")))
    assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2); case _ => true })
    // deterministic: a second call returns identical rows
    val again = SearchIndex.moreLikeThis(spark, dir, seedId, k = 20, topTerms = 10)
      .collect().map(_.toSeq).toSeq
    assert(again == res.map(_.toSeq).toSeq)
    // forget-aware: tombstoning the top hit removes it; survivors keep ranks
    val topHit = res.head.getAs[Long]("doc_id")
    import spark.implicits._
    SearchIndex.forget(spark, dir, Seq(topHit).toDF("doc_id"))
    val after = SearchIndex.moreLikeThis(spark, dir, seedId, k = 20, topTerms = 10)
      .collect()
    assert(!after.exists(_.getAs[Long]("doc_id") == topHit))
  }

  test("moreLikeThisBatch on one seed equals the single-seed serving form exactly") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-mltb").toString
    SearchIndex.build(docs, dir)
    import spark.implicits._
    val single = SearchIndex.moreLikeThis(spark, dir, 1L, k = 20, topTerms = 10)
      .collect().map(_.toSeq).toSeq
    val batch1 = SearchIndex.moreLikeThisBatch(spark, dir, Seq(1L).toDF("doc_id"),
        k = 20, topTerms = 10)
      .select("doc_id", "dl", "n_terms", "score_micro")
      .collect().map(_.toSeq).toSeq
    assert(single.nonEmpty && batch1.toSet == single.toSet)
    // multi-seed: each seed's slice is that seed's single-seed answer
    val b3 = SearchIndex.moreLikeThisBatch(spark, dir, Seq(1L, 2L, 3L).toDF("doc_id"),
        k = 20, topTerms = 10).collect()
    assert(b3.map(_.getAs[Long]("seed_id")).toSet == Set(1L, 2L, 3L))
    val slice2 = b3.filter(_.getAs[Long]("seed_id") == 2L)
      .map(r => Seq[Any](r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("score_micro"))).toSet
    val single2 = SearchIndex.moreLikeThis(spark, dir, 2L, k = 20, topTerms = 10)
      .collect().map(_.toSeq).toSet
    assert(slice2 == single2)
  }

  test("compact folds the df/stats merge-on-read parts without changing answers") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val hi = docs.agg(max("doc_id")).head().getLong(0)
    val dir = Files.createTempDirectory("searchidx-fold").toString
    SearchIndex.build(docs.filter(col("doc_id") <= hi / 2), dir)
    SearchIndex.append(docs.filter(col("doc_id") > hi / 2), dir)
    SearchIndex.forget(spark, dir, docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    def parts(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts("df") > 1 && parts("stats") > 1,
      "fixture needs multiple merge-on-read parts before compacting")
    val terms = Seq("data", "fast", "query")
    val before = rows(SearchIndex.query(spark, dir, terms, k = 20))
    SearchIndex.compact(spark, dir)
    assert(rows(SearchIndex.query(spark, dir, terms, k = 20)) == before,
      "folding must preserve the exact integer sums")
    // folded: one write's worth of parts, and the negative parts are gone
    assert(spark.read.parquet(s"$dir/stats").count() == 1)
    val dfs = spark.read.parquet(s"$dir/df")
    assert(dfs.filter(col("df") <= 0).count() == 0,
      "folded df must hold positive per-token sums only")
  }

  test("token-sorted postings prune INSIDE buckets: fewer rows read than an unsorted twin") {
    // small parquet pages so min-max (column-index) pruning is observable
    // at spec scale (production files carry many pages/row groups per
    // bucket naturally)
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    val oldLimit = hc.get("parquet.page.row.count.limit")
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 1024)
    hc.setInt("parquet.page.row.count.limit", 50)
    try {
      val docs = graft.Tables(spark, sf("sf0.01")).documents
      val sorted = Files.createTempDirectory("searchidx-sorted").toString
      // few buckets -> enough postings per bucket for multiple row groups
      SearchIndex.build(docs, sorted, buckets = 4)
      // unsorted twin: same postings, same bucketing, row order scrambled
      // by a hash sort (a bare repartition would inherit the sorted source
      // order through the shuffle and prune just as well)
      val unsorted = Files.createTempDirectory("searchidx-unsorted").toString
      spark.read.parquet(s"$sorted/postings")
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), xxhash64(col("token"), col("doc_id")))
        .write.partitionBy("bucket").parquet(s"$unsorted/postings")
      spark.read.parquet(s"$sorted/df").write.parquet(s"$unsorted/df")
      spark.read.parquet(s"$sorted/stats").write.parquet(s"$unsorted/stats")

      val terms = Seq("data", "fast", "query")
      def rowsRead(dir: String): (Set[Seq[Any]], Long) = {
        val q = SearchIndex.query(spark, dir, terms, k = 20, buckets = 4)
        val res = rows(q)
        val scan = allNodes(q.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case p => p
          })
          .collect { case s: FileSourceScanExec => s }
          .find(_.relation.location.rootPaths.exists(_.toString.contains("/postings")))
          .get
        (res, scan.metrics("numOutputRows").value)
      }
      val (sRes, sRows) = rowsRead(sorted)
      val (uRes, uRows) = rowsRead(unsorted)
      assert(sRes == uRes, "layout must not change answers")
      assert(sRes.nonEmpty)
      // the pushed token filter prunes row groups only when tokens are
      // clustered: the sorted layout must read strictly less
      assert(sRows < uRows,
        s"sorted postings should prune inside buckets: read $sRows vs unsorted $uRows")
    } finally {
      def restore(k: String, v: String): Unit =
        if (v == null) hc.unset(k) else hc.set(k, v)
      restore("parquet.block.size", oldBlock)
      restore("parquet.page.size", oldPage)
      restore("parquet.page.row.count.limit", oldLimit)
    }
  }

  test("moreLikeThis's scoring probe is partition pruning like query's") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx-mlt-prune").toString
    SearchIndex.build(docs, dir)
    val totalBuckets = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    val res = SearchIndex.moreLikeThis(spark, dir, 1L, k = 20, topTerms = 10)
    assert(res.collect().nonEmpty)
    val postScan = allNodes(res.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      })
      .collect { case s: FileSourceScanExec => s }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("/postings")))
      .get
    assert(postScan.partitionFilters.nonEmpty, postScan.toString)
    val partitionsRead = postScan.metrics.get("numPartitions").map(_.value)
    assert(partitionsRead.exists(n => n > 0 && n <= 10 && n < totalBuckets),
      s"10 terms must read <=10 of $totalBuckets buckets, read $partitionsRead")
  }

  test("term probe is partition pruning: a query reads only its terms' buckets") {
    val docs = graft.Tables(spark, sf("sf0.01")).documents
    val dir = Files.createTempDirectory("searchidx2").toString
    SearchIndex.build(docs, dir)
    val totalBuckets = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(totalBuckets > 3, s"fixture needs more buckets than terms, got $totalBuckets")

    val res = SearchIndex.query(spark, dir, Seq("data", "fast", "query"), k = 20)
    assert(res.collect().nonEmpty)
    val postScan = allNodes(res.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      })
      .collect { case s: FileSourceScanExec => s }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("/postings")))
      .get
    assert(postScan.partitionFilters.nonEmpty, postScan.toString)
    val partitionsRead = postScan.metrics.get("numPartitions").map(_.value)
    assert(partitionsRead.exists(n => n > 0 && n <= 3),
      s"3 terms must read <=3 of $totalBuckets buckets, read $partitionsRead")
  }
}
