package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import graft.analytics.SearchIndex

/** One-off diagnostic for VERDICT r15 "What's wrong" #2: per-JOB input
  * bytes during a BM25 compact, with the job's call site — names which leg
  * of [[SearchIndex.compact]] carries the read amplification before we fix
  * it. Not part of any round artifact; keep for future compaction work. */
object Bm25CompactDissect {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageBytes = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val stageInfoStr = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val rdds = s.stageInfo.rddInfos.map(r => r.name + (if (r.scope.isDefined) ":" + r.scope.get.name else ""))
          .mkString(", ")
        stageInfoStr.put(s.stageInfo.stageId, s"tasks=${s.stageInfo.numTasks} rdds=[$rdds]"): Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          stageBytes.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(m.inputMetrics.bytesRead): Unit
      }
    })
    val scans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution._
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit = {
        val sb = new StringBuilder
        ProbeMetrics.walkScans(qe.executedPlan) { s =>
          val path = s.relation.location.rootPaths.headOption.map(_.toString).getOrElse("?")
          val files = s.metrics.get("numFiles").map(_.value).getOrElse(-1L)
          val bytes = s.metrics.get("filesSize").map(_.value).getOrElse(-1L)
          sb.append(f"    scan $path files=$files size=${bytes / 1e6}%.2fMB\n"): Unit
        }
        if (sb.nonEmpty) scans.add(s"-- $fn:\n$sb"): Unit
      }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count(): Unit
    val label = sys.env.getOrElse("DISSECT_LABEL", "pct30")
    val (pred, minShare) = label match {
      case "one_doc_full" => (col("doc_id") === docs.agg(min("doc_id")).head().getLong(0), 0.0)
      case _              => (pmod(col("doc_id"), lit(10)) < 3, 0.1)
    }
    val idx = java.nio.file.Files.createTempDirectory(s"bm25dissect").toString
    SearchIndex.build(docs, idx)
    SearchIndex.forget(spark, idx, docs.filter(pred).select("doc_id"))
    Thread.sleep(1000)
    scans.clear()
    val read = ProbeMetrics.bytesRead(spark.sparkContext)
    val r0 = read.quiesce(maxSpins = 30)
    def fileBytes(): Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator().asScala
        .filter(_.getScheme == "file")
        .map(s => Option(s.getLong("bytesRead")).map(_.longValue()).getOrElse(0L)).sum
    }
    // counter sanity: a cold full scan of a known file must move the
    // counter by ~its size
    val s0 = fileBytes()
    spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sum(col("l_discount")), sum(col("l_tax")), count(lit(1))).head(): Unit
    println(f"SANITY lineitem cold scan: ${(fileBytes() - s0) / 1e6}%.2f MB " +
      f"(file is ${new java.io.File(s"$dir/lineitem.parquet").length() / 1e6}%.2f MB)")
    val f0 = fileBytes()
    SearchIndex.compact(spark, idx, minShare = minShare)
    val total = read.quiesce(maxSpins = 30) - r0
    val fTotal = fileBytes() - f0
    println(f"FILE-LEVEL bytes read during compact: ${fTotal / 1e6}%.2f MB")
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    scans.asScala.foreach(println)
    stageBytes.asScala.toSeq.sortBy(_._1).filter(_._2.get() > 500000).foreach { case (sid, b) =>
      println(f"STAGE $sid%4d ${b.get() / 1e6}%8.2f MB  ${stageInfoStr.getOrDefault(sid, "?").take(400)}")
    }
    println(f"TOTAL ${total / 1e6}%10.2f MB; postings store " +
      f"${ProbeMetrics.dirBytes(s"$idx/postings") / 1e6}%.2f MB; forward " +
      f"${ProbeMetrics.dirBytes(s"$idx/forward") / 1e6}%.2f MB; census " +
      f"${ProbeMetrics.dirBytes(s"$idx/census") / 1e6}%.2f MB; df " +
      f"${ProbeMetrics.dirBytes(s"$idx/df") / 1e6}%.2f MB")
    spark.stop()
  }
}
