package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming metrics surface (SURVEY §7.2 M5): per-micro-batch throughput
  * plus the pipeline's `observe("graft_metrics", ...)` counters (the skip
  * accounting the reference logs per missing field, src/main.rs:445-453,
  * travels as observed metrics on the transformed stream).
  *
  * The reference's equivalents are its `info!`/`warn!` tracing lines and the
  * throughput measurement feeding O16; here every batch's numbers flow
  * through one listener that both logs and retains a bounded in-memory tail
  * (for tests / health endpoints).
  */
final class MetricsListener(keep: Int = 256) extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long, numInputRows: Long,
                                processedRowsPerSecond: Double, observed: Map[String, String])

  private val tail = new ConcurrentLinkedQueue[BatchMetrics]()

  def recent: Seq[BatchMetrics] = {
    val b = Seq.newBuilder[BatchMetrics]
    tail.forEach(m => b += m)
    b.result()
  }

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    System.err.println(s"[graft-metrics] query ${event.name} started (${event.id})")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val observed = {
      val om = p.observedMetrics
      if (om == null || om.isEmpty) Map.empty[String, String]
      else {
        val b = Map.newBuilder[String, String]
        om.forEach { (name, row) =>
          row.schema.fieldNames.foreach(f => b += (s"$name.$f" -> String.valueOf(row.getAs[Any](f))))
        }
        b.result()
      }
    }
    val m = BatchMetrics(String.valueOf(p.name), p.batchId, p.numInputRows,
      p.processedRowsPerSecond, observed)
    tail.add(m): Unit
    while (tail.size() > keep) { tail.poll(): Unit }
    System.err.println(s"[graft-metrics] batch=${m.batchId} rows=${m.numInputRows} " +
      f"rate=${m.processedRowsPerSecond}%.1f/s observed=${m.observed}")
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    System.err.println(s"[graft-metrics] query ${event.id} terminated" +
      event.exception.map(e => s" with error: $e").getOrElse(""))
}
