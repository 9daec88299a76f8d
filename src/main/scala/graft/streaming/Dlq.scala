package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.BatchSink

/** Dead-letter queue (SURVEY §2 O18/O19) as a directory of parquet batch
  * drops — the Spark-native replacement for the reference's RocksDB
  * `failed_batch:{tenant}:{db}:{table}:{opt_out}` keys
  * (`/root/reference/src/main.rs:918-939`).
  *
  * One subdirectory per failed batch keeps append and delete atomic at
  * batch granularity (replay removes exactly the batches that re-inserted
  * successfully — the parquet analog of the reference's per-key delete at
  * `src/main.rs:993-1001`). All four key parts travel as columns; we
  * implement the historical binary's FIXED 5-part parse semantics
  * (`historical_data/src/main.rs:808`), not the live binary's
  * `splitn(4)`/`parts[4]` panic (`src/main.rs:952,961` — SURVEY §7.4).
  *
  * Uses the Hadoop FileSystem API throughout, so the same code runs on
  * local disk in tests and HDFS/S3 in production.
  */
final class Dlq(spark: SparkSession, dir: String) extends Serializable {

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** O18: persist a failed batch with its routing metadata. The parquet
    * job writes into a staging name and the batch joins the queue by ONE
    * directory rename — a crash or job cancellation mid-append leaves only
    * a `.tmp_` directory [[pending]] never lists, not a half-written
    * `batch_` dir that would poison [[replayOnce]] with an unreadable
    * parquet read every cycle forever. A stale staging dir is harmless:
    * its micro-batch never committed, so the stream replays it. */
  def append(batch: DataFrame, tenant: String, db: String, table: String, optOut: Boolean): Unit = {
    val id = java.util.UUID.randomUUID().toString
    val staging = new Path(dir, s".tmp_$id")
    batch
      .withColumn("__tenant", lit(tenant))
      .withColumn("__db", lit(db))
      .withColumn("__table", lit(table))
      .withColumn("__opt_out", lit(optOut))
      .write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
    if (!fs.rename(staging, new Path(dir, s"batch_$id")))
      throw new IllegalStateException(s"DLQ append: cannot commit $staging")
  }

  /** Batches currently queued. Matched on the directory NAME — a DLQ root
    * path that itself contains "batch_" must not turn every child
    * (including staging dirs) into a replay candidate. */
  def pending(): Seq[String] = {
    val root = new Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("batch_"))
      .map(_.getPath.toString).toSeq.sorted
  }

  /** O19 (fixed semantics): re-insert every queued batch; drop each batch
    * directory only after ITS insert succeeded. Returns (replayed, failed)
    * counts; callers loop this on the reference's 60 s cadence
    * (`src/main.rs:1015`). */
  def replayOnce(sink: BatchSink): (Int, Int) = {
    var ok = 0
    var failed = 0
    pending().foreach { batchDir =>
      try {
        val df = spark.read.parquet(batchDir)
        val metaRows = df.select("__tenant", "__db", "__table", "__opt_out").take(1)
        if (metaRows.isEmpty) { // defensively drain empty drops
          fs.delete(new Path(batchDir), true)
          ok += 1
        } else {
        val meta = metaRows(0)
        val table = s"${meta.getString(1)}.${meta.getString(2)}"
        sink.write(df.drop("__tenant", "__db", "__table", "__opt_out"), table)
        fs.delete(new Path(batchDir), true)
        ok += 1
        }
      } catch {
        // NonFatal only: a fatal error (OOM, linkage) must propagate, and an
        // interrupt (shutdown asking the replay thread to stop) must both
        // stop the loop and leave the flag set for the caller. Spark wraps
        // an interrupt that lands mid-job in SparkException — check the
        // cause chain, not just the outer type.
        case e: Throwable if StreamingPipeline.isInterrupt(e) =>
          Thread.currentThread().interrupt()
          return (ok, failed + 1)
        case scala.util.control.NonFatal(_) =>
          failed += 1 // stays queued for the next cycle
      }
    }
    (ok, failed)
  }
}
