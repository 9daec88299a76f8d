package graft.analytics

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The Multimodal scaladoc's 100 TB claim, MEASURED: metadata-only queries
  * over a media parquet table never read the blob pages. Parquet stores
  * each column as contiguous column chunks, and a reader seeks exactly the
  * chunks of the columns the scan requests — so the byte ranges a query
  * touches are (requested columns' chunk bytes + footer). The proof is
  * therefore two-sided and fully deterministic:
  *
  *   - PLAN: the metadata query's FileSourceScanExec ReadSchema excludes
  *     the binary column (Spark pushes the pruned schema to parquet);
  *   - BYTES: the footers say the blob chunks dominate the file, so the
  *     pruned read touches a small measured fraction of the bytes.
  *
  * (Task-level inputMetrics.bytesRead is NOT used: on the local filesystem
  * it under-reports buffered parquet reads identically for pruned and
  * unpruned scans — measured 2802 B for both against a 58 KB file — so it
  * cannot distinguish them; chunk byte ranges can.) */
class MultimodalPruningSpec extends SparkSpec {

  /** On-disk bytes per column (sum of column-chunk total sizes across
    * files/row-groups) — the byte ranges a scan of those columns reads. */
  private def columnBytes(dir: String): Map[String, Long] = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .flatMap { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try r.getFooter.getBlocks.asScala.toSeq
          .flatMap(_.getColumns.asScala.map(c => c.getPath.toDotString -> c.getTotalSize))
        finally r.close()
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case x => x }.flatMap {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s) ++ allNodes(s.plan)
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.executedPlan)
      case x => Seq(x)
    }

  private def scan(df: DataFrame): FileSourceScanExec = {
    df.collect(): Unit // execute so AQE stages materialize
    allNodes(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("metadata-only media queries never read blob pages (pruned schema x measured chunk bytes)") {
    val base = Files.createTempDirectory("media").toString
    Multimodal.asMediaTable(graft.Tables(spark, sf("sf0.01")).documents)
      .write.parquet(s"$base/media")

    def table: DataFrame = spark.read.parquet(s"$base/media")
    val metaScan = scan(table.groupBy("format")
      .agg(count(lit(1)).as("n"), max("doc_id").as("max_id")))
    val blobScan = scan(table.select(sum(length(col("media"))).as("payload_bytes")))

    // plan: the metadata scan pushes a media-free schema into parquet
    assert(metaScan.requiredSchema.fieldNames.sorted.toSeq == Seq("doc_id", "format"),
      s"metadata scan must prune the blob column: ${metaScan.requiredSchema.treeString}")
    assert(blobScan.requiredSchema.fieldNames.contains("media"))

    // bytes: blob chunks dominate the file, so the pruned scan's byte
    // ranges are a small measured fraction of the unpruned scan's
    val bytes = columnBytes(s"$base/media")
    val blobBytes = bytes("media")
    val metaBytes = metaScan.requiredSchema.fieldNames.map(bytes(_)).sum
    info(s"column chunk bytes: media=$blobBytes metadata=$metaBytes " +
      f"(pruned scan reads ${100.0 * metaBytes / (metaBytes + blobBytes)}%.1f%% of data bytes)")
    assert(blobBytes >= 3 * metaBytes,
      s"blob pages must dominate: media=$blobBytes vs metadata=$metaBytes")
  }
}
