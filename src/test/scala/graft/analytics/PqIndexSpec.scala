package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index: (1) serving from the stored structure is
  * bit-identical to the one-shot operator (same training + scoring
  * arithmetic, so this must be EXACT equality, not approximate); (2) the
  * inverted-list partitioning makes probing a static partition-pruned scan
  * — a query that probes nprobe lists reads only those directories. */
class PqIndexSpec extends SparkSpec {

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case x => x }.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s) ++ allNodes(s.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.executedPlan)
      case x => Seq(x)
    }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("vec_id"), r.getAs[Long]("adc"))).toSet

  test("stored-index query returns bit-identical rows to the one-shot operator") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf("sf0.01")).embeddings
    val dir = Files.createTempDirectory("pqidx").toString
    PqIndex.build(emb, dir)
    val queries = emb.filter(col("vec_id") < 3)
    val fromIndex = rows(PqIndex.query(spark, dir, queries, k = 5))
    val oneShot = ProductQuantization.ivfPqTopK(emb, queries, k = 5)
    val want = rows(oneShot)
    oneShot.unpersist(): Unit
    assert(fromIndex.nonEmpty)
    assert(fromIndex == want)
  }

  test("append encodes under the stored quantizer: equals a one-shot build of the union trained on history") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf("sf0.01")).embeddings
    val mid = emb.agg(max("vec_id")).head().getLong(0) / 2
    val h1 = emb.filter(col("vec_id") <= mid)
    val h2 = emb.filter(col("vec_id") > mid)
    val queries = emb.filter(col("vec_id") < 3)

    val incDir = Files.createTempDirectory("pqinc").toString
    PqIndex.build(h1, incDir)
    PqIndex.append(h2, incDir)
    val incremental = rows(PqIndex.query(spark, incDir, queries, k = 5))

    val refDir = Files.createTempDirectory("pqref").toString
    PqIndex.build(emb, refDir, trainOn = Some(h1))
    val reference = rows(PqIndex.query(spark, refDir, queries, k = 5))

    assert(incremental.nonEmpty)
    assert(incremental == reference)
    // the appended half is really in the index: some top-5 hit has a high id
    assert(incremental.exists { case (_, _, vecId, _) => vecId > mid },
      "fixture should surface appended vectors in the results")
  }

  test("probing is partition pruning: a query reads only its probed lists") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables(spark, sf("sf0.01")).embeddings
    val dir = Files.createTempDirectory("pqidx2").toString
    PqIndex.build(emb, dir)
    val totalLists = new java.io.File(s"$dir/codes").listFiles()
      .count(_.getName.startsWith("centroid_id="))
    assert(totalLists > 6, s"fixture needs more lists than nprobe, got $totalLists")

    val oneQuery = emb.filter(col("vec_id") === 0)
    val res = PqIndex.query(spark, dir, oneQuery, k = 5, nprobe = 6)
    assert(res.collect().nonEmpty)
    val codesScan = allNodes(res.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      })
      .collect { case s: FileSourceScanExec => s }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("/codes")))
      .get
    assert(codesScan.partitionFilters.nonEmpty, codesScan.toString)
    val partitionsRead = codesScan.metrics.get("numPartitions").map(_.value)
    assert(partitionsRead.exists(n => n > 0 && n <= 6),
      s"one query with nprobe=6 must read <=6 of $totalLists lists, read $partitionsRead")
  }
}
