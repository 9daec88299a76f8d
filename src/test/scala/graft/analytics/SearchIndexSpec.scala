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
