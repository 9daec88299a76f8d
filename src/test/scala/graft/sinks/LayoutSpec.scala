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

  test("z-ordered layout prunes band scans on BOTH dimensions; 1-D layout on one") {
    val base = Files.createTempDirectory("zlayout").toString
    val ev = graft.Tables(spark, sf("sf0.01")).events
      .withColumn("ts_sec", col("ts").cast("long")).persist()

    new ZOrderedParquetSink(base, partitions = 32, colA = "ts_sec", colB = "user_id")
      .write(ev, "zordered")
    // control: 1-D time clustering — prunes ts bands, blind to user bands
    new ClusteredParquetSink(base, partitions = 32, clusterCol = "ts_sec")
      .write(ev, "tsclustered")

    val tsStats = ev.agg(min("ts_sec"), max("ts_sec")).head()
    val (tsLo, tsHi) = (tsStats.getLong(0), tsStats.getLong(1))
    val uStats = ev.agg(min("user_id"), max("user_id")).head()
    val (uLo, uHi) = (uStats.getLong(0), uStats.getLong(1))
    // narrow bands: 1/16 of each dimension's range
    val tsBandHi = tsLo + (tsHi - tsLo) / 16
    val uBandHi = uLo + (uHi - uLo) / 16
    def tsBand(path: String): DataFrame = spark.read.parquet(path)
      .filter(col("ts_sec") >= tsLo && col("ts_sec") <= tsBandHi).select("event_id")
    def uBand(path: String): DataFrame = spark.read.parquet(path)
      .filter(col("user_id") >= uLo && col("user_id") <= uBandHi).select("event_id")

    def ids(df: DataFrame): Seq[Long] = df.collect().map(_.getLong(0)).sorted.toSeq
    // identical results on every layout
    assert(ids(tsBand(s"$base/zordered")) == ids(tsBand(s"$base/tsclustered")))
    assert(ids(uBand(s"$base/zordered")) == ids(uBand(s"$base/tsclustered")))
    assert(ids(uBand(s"$base/zordered")).nonEmpty)

    val full = ev.count()
    // z-order: BOTH band dimensions prune
    val zTs = scanRows(tsBand(s"$base/zordered"))
    val zU = scanRows(uBand(s"$base/zordered"))
    assert(zTs * 2 < full, s"z layout should prune ts bands: $zTs vs $full")
    assert(zU * 2 < full, s"z layout should prune user bands: $zU vs $full")
    // 1-D: ts prunes harder than z (tighter 1-D ranges), user reads ALL
    val cTs = scanRows(tsBand(s"$base/tsclustered"))
    val cU = scanRows(uBand(s"$base/tsclustered"))
    assert(cTs * 2 < full)
    assert(cU == full, s"1-D ts layout must be blind to user bands, scanned $cU of $full")
    ev.unpersist()
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

  test("z-ordered sink: an empty or all-null batch appends harmlessly instead of NPE-ing") {
    // the BatchSink contract every other sink keeps — a retry/replay path
    // can legitimately hand a sink zero rows, and the min/max stats row is
    // then all nulls (primitive getters would throw)
    val base = Files.createTempDirectory("zempty").toString
    val ev = graft.Tables(spark, sf("sf0.001")).events
    val sink = new ZOrderedParquetSink(base, partitions = 2, "event_id", "user_id")
    sink.write(ev.filter(col("event_id") < 0), "t") // empty
    assert(!new java.io.File(s"$base/t").exists() ||
      spark.read.parquet(s"$base/t").isEmpty)
    // all-null cluster column: rows must still land (plain append fallback)
    val nulls = ev.limit(5).withColumn("event_id", lit(null).cast("long"))
    sink.write(nulls, "t")
    assert(spark.read.parquet(s"$base/t").count() == 5)
    // and a normal batch afterwards still z-orders fine
    sink.write(ev.limit(10), "t")
    assert(spark.read.parquet(s"$base/t").count() == 15)
  }
}
