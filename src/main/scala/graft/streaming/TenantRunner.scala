package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Multi-tenant fan-out + supervision (SURVEY §2 O21/O24).
  *
  * The reference spawns one tokio task per tenant, each looping forever with
  * a 60 s pause after failure, and a panic in one tenant never stops the
  * others (`/root/reference/src/main.rs:235-272`). Spark equivalent: every
  * tenant is an independent StreamingQuery inside ONE SparkSession (they
  * share executors; queries are concurrent by construction). Supervision
  * restarts a failed query after `restartDelayMs`; graceful shutdown stops
  * every query then the session (reference's `tokio::select!` + ctrl-c,
  * `src/main.rs:1058-1156`).
  */
final class TenantRunner(spark: SparkSession, restartDelayMs: Long = 60000) {

  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  private val stopping = new AtomicBoolean(false)

  /** Start + supervise one tenant's query in a daemon thread. `mkQuery` is
    * re-invoked after every failure (fresh query, same checkpoint → resumes
    * from the last committed micro-batch, O20). */
  def run(tenant: String)(mkQuery: () => StreamingQuery): Unit = {
    val t = new Thread(() => {
      while (!stopping.get()) {
        try {
          val q = mkQuery()
          queries.put(tenant, q)
          // close the start/stopAll race: if shutdown began while mkQuery was
          // in flight, this query was invisible to stopAll's iteration
          if (stopping.get()) q.stop()
          q.awaitTermination()
          if (!stopping.get()) Thread.sleep(restartDelayMs) // stream ended unexpectedly
        } catch {
          case _: InterruptedException => // shutdown
          case e: Throwable =>
            System.err.println(s"[graft] tenant $tenant query failed: ${e.getMessage}")
            if (!stopping.get()) Thread.sleep(restartDelayMs)
        }
      }
    }, s"graft-tenant-$tenant")
    t.setDaemon(true)
    t.start()
  }

  def activeQueries: Map[String, StreamingQuery] = {
    val b = Map.newBuilder[String, StreamingQuery]
    queries.forEach((k, v) => b += (k -> v))
    b.result()
  }

  /** O24: stop every tenant query gracefully (checkpoint-consistent). */
  def stopAll(): Unit = {
    stopping.set(true)
    queries.forEach((_, q) => try q.stop() catch { case _: Throwable => () })
  }

  /** Install a JVM shutdown hook mirroring the reference's signal handling. */
  def installShutdownHook(): Unit =
    sys.addShutdownHook { stopAll() }: Unit
}
