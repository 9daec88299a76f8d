package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Sort-on-write layout: the clustered sink's files carry tight min/max
  * stats, so a time-band predicate prunes row groups the shuffled layout
  * has to read. Measured via the scan node's numOutputRows — same query,
  * same results, different IO. */
class LayoutSpec extends SparkSpec {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case x => x
    }
    finalPlan(df.queryExecution.executedPlan)
      .collectWithSubqueries { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("clustered layout prunes time-band scans; shuffled layout cannot") {
    val base = Files.createTempDirectory("layout").toString
    // epoch-seconds cluster key: INT64 parquet stats prune; raw Spark
    // timestamps default to INT96 on write, which carries NO usable
    // min/max — the layout op is pointless on such a column
    val ev = graft.Tables(spark, sf("sf0.001")).events
      .withColumn("ts_sec", col("ts").cast("long")).persist()

    new ClusteredParquetSink(base, partitions = 8, clusterCol = "ts_sec")
      .write(ev, "clustered")
    // control: same data, same file count, rows scattered across files
    ev.repartition(8).write.parquet(s"$base/shuffled")

    // a tight band: one hour around the median timestamp
    val mid = ev.agg(expr("percentile(ts_sec, 0.5)")).head().getDouble(0).toLong
    def band(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("ts_sec") >= mid - 1800L && col("ts_sec") < mid + 1800L)
        .select(col("event_id"))

    val clustered = band(s"$base/clustered")
    val shuffled = band(s"$base/shuffled")
    assert(clustered.collect().map(_.getLong(0)).sorted.toSeq ==
      shuffled.collect().map(_.getLong(0)).sorted.toSeq)

    val (prunedRows, fullRows) = (scanRows(clustered), scanRows(shuffled))
    assert(fullRows == ev.count(),
      s"shuffled layout must scan everything, scanned $fullRows")
    assert(prunedRows * 2 < fullRows,
      s"clustered layout should skip most row groups: $prunedRows vs $fullRows")
    ev.unpersist()
  }
}
