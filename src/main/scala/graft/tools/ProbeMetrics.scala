package graft.tools

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared measurement plumbing for the bench/probe mains: ONE
  * implementation of the task-metric accumulator with its async-bus
  * quiesce spin, and of the recursive directory byte walk, instead of a
  * hand-rolled near-copy per probe with slightly different spin caps
  * (r15 review). Measurement-protocol changes now land in one place and
  * keep every probe's numbers comparable. */
object ProbeMetrics {

  /** Accumulates one task metric across all jobs from construction on;
    * [[quiesce]] waits for the async listener bus to drain (value stable
    * across 100 ms polls, bounded spins) before reading — reading the
    * counter right after an action would race events still in flight. */
  final class TaskCounter(sc: SparkContext,
                          metric: org.apache.spark.executor.TaskMetrics => Long) {
    private val acc = new java.util.concurrent.atomic.AtomicLong
    private val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.addAndGet(metric(m)): Unit
      }
    }
    sc.addSparkListener(listener)
    def quiesce(maxSpins: Int = 50): Long = {
      var last = -1L
      var spins = 0
      while (acc.get() != last && spins < maxSpins) {
        last = acc.get(); Thread.sleep(100); spins += 1
      }
      acc.get()
    }
    def remove(): Unit = sc.removeSparkListener(listener)
  }

  /** Parquet/scan input bytes (task `inputMetrics.bytesRead`). */
  def bytesRead(sc: SparkContext): TaskCounter =
    new TaskCounter(sc, _.inputMetrics.bytesRead)

  /** Shuffle-write bytes — the scale-variance protocol's decider: flat
    * bytes across passes with spreading wall-time = host drift; growing
    * bytes = the plan itself did more work. */
  def shuffleWritten(sc: SparkContext): TaskCounter =
    new TaskCounter(sc, _.shuffleWriteMetrics.bytesWritten)

  /** Sum of SELECTED parquet bytes across every executed file scan
    * (post partition-pruning `filesSize` of each `FileSourceScanExec`,
    * AQE- and subquery-aware) — the honest file-I/O proxy for index
    * maintenance probes. The task-level [[bytesRead]] counter ALSO counts
    * block-manager reads of cached/localCheckpoint blocks, whose
    * deserialized rows inflate ~20x over their parquet source (the r15
    * BM25COMPACT "1.5 GB read" was mostly that, measured by
    * Bm25CompactDissect r16) — this counter sees only what the plans
    * selected from disk. Register before the work, read after; `drain`
    * waits for straggling onSuccess callbacks. */
  /** Walk an EXECUTED physical plan, calling `onScan` once per
    * [[org.apache.spark.sql.execution.FileSourceScanExec]] — AQE- and
    * subquery-aware, shared by [[ScanBytes]] and the dissect tooling so
    * the walk semantics cannot drift between them (r16 self-review).
    * `ReusedSubqueryExec` is deliberately NOT descended: it re-reads a
    * subquery result that already executed (and was already counted) at
    * its original site — descending would double-count its scans. */
  def walkScans(p: org.apache.spark.sql.execution.SparkPlan)(
      onScan: org.apache.spark.sql.execution.FileSourceScanExec => Unit): Unit = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive._
    p match {
      case s: FileSourceScanExec => onScan(s)
      case a: AdaptiveSparkPlanExec => walkScans(a.executedPlan)(onScan)
      case q: QueryStageExec => walkScans(q.plan)(onScan)
      case _: ReusedSubqueryExec => ()
      case _ => ()
    }
    p match {
      case _: ReusedSubqueryExec => ()
      case _ =>
        p.children.foreach(walkScans(_)(onScan))
        p.subqueries.foreach(walkScans(_)(onScan))
    }
  }

  final class ScanBytes(spark: org.apache.spark.sql.SparkSession) {
    import org.apache.spark.sql.execution._
    private val acc = new java.util.concurrent.atomic.AtomicLong
    private val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        walkScans(qe.executedPlan)(s =>
          acc.addAndGet(s.metrics.get("filesSize").map(_.value).getOrElse(0L)): Unit)
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def drain(maxSpins: Int = 30): Long = {
      var last = -1L
      var spins = 0
      while (acc.get() != last && spins < maxSpins) {
        last = acc.get(); Thread.sleep(100); spins += 1
      }
      acc.get()
    }
    def remove(): Unit = spark.listenerManager.unregister(listener)
  }

  /** Every file under `dir` with its length, recursive — the
    * bytes-rewritten comparisons diff two of these snapshots. */
  def fileSizes(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(dir)).map(f => f.getPath -> f.length()).toMap
  }

  def dirBytes(dir: String): Long = fileSizes(dir).values.sum
}
