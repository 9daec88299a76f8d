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
    * from the last committed micro-batch, O20).
    *
    * `recoverCheckpoint`: the code-280 recovery path (reference
    * `src/main.rs:323-332,458-501` — on ChangeStreamHistoryLost, clear the
    * stored resume token and restart from now). When set and a failure
    * matches [[CheckpointRecovery.isPositionLost]], the named checkpoint is
    * deleted and the query restarts IMMEDIATELY (no restart delay — the
    * position is unrecoverable, waiting only widens the gap); the fresh
    * checkpoint makes the source start at its "latest" position. Without
    * recovery such a failure would restart-loop forever against the same
    * dead resume point. Back-to-back recoveries DO take the delay: a
    * second position-lost failure right after a cleared checkpoint means
    * the deletion was not the cure, and immediate retries would hot-loop
    * against the source. */
  def run(tenant: String, recoverCheckpoint: Option[String] = None)
         (mkQuery: () => StreamingQuery): Unit = {
    val t = new Thread(() => {
      // recovery is immediate ONCE: if the very next start fails the same
      // way, deleting the checkpoint did not cure it (e.g. the source is
      // unreachable and happens to phrase its error like a lost position) —
      // without this flag the loop would hammer mkQuery/delete/fail as fast
      // as query startup allows, with no backoff ever applied
      var lastRecovered = false
      while (!stopping.get()) {
        try {
          val q = mkQuery()
          queries.put(tenant, q)
          // close the start/stopAll race: if shutdown began while mkQuery was
          // in flight, this query was invisible to stopAll's iteration
          if (stopping.get()) q.stop()
          q.awaitTermination()
          lastRecovered = false
          if (!stopping.get()) Thread.sleep(restartDelayMs) // stream ended unexpectedly
        } catch {
          case _: InterruptedException => // shutdown
          case e: Throwable =>
            System.err.println(s"[graft] tenant $tenant query failed: ${e.getMessage}")
            val recovered = recoverCheckpoint.exists { ckpt =>
              CheckpointRecovery.isPositionLost(e) && {
                System.err.println(s"[graft] tenant $tenant: source position lost " +
                  s"(code-280 analog) — clearing checkpoint $ckpt, restarting from now")
                CheckpointRecovery.clearPosition(spark, ckpt)
                true
              }
            }
            if ((!recovered || lastRecovered) && !stopping.get()) Thread.sleep(restartDelayMs)
            lastRecovered = recovered
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

/** Classification + repair for "the source can no longer serve our
  * checkpointed position" failures — the Spark analog of MongoDB server
  * error 280 (ChangeStreamHistoryLost), which the reference handles by
  * clearing the saved resume token and re-opening the stream at the
  * current time (`/root/reference/src/main.rs:323-332,458-501`). */
object CheckpointRecovery {

  /** Failure signatures across the sources this engine reads: the Mongo
    * connector surfaces server 280/286 resume failures with these phrases;
    * Kafka-style sources report lost offsets with the phrases below; file
    * sources report deleted input. Matched case-insensitively over the
    * cause chain. A false positive here DELETES a checkpoint and skips
    * data, so every signature is a phrase only the loss error itself
    * carries: numeric codes are boundary-anchored ("error 280" must not
    * match "error 28012"), and the bare option name "failOnDataLoss" is
    * deliberately NOT matched — a config-validation error ("Invalid value
    * ... for option failOnDataLoss") contains it without any position
    * having been lost. */
  private val positionLostSignatures: Seq[scala.util.matching.Regex] = Seq(
    "changestreamhistorylost",
    """(error|code) 280\b""", """(error|code) 286\b""",
    "resume of change stream was not possible",
    "resume point may no longer be in the oplog",
    "data may have been lost because they are not available",
    "offsets out of range", "out of range offset")
    .map(p => new scala.util.matching.Regex(p))

  def isPositionLost(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 10) {
      val m = cur.getMessage
      if (m != null) {
        val lower = m.toLowerCase(java.util.Locale.ROOT)
        if (positionLostSignatures.exists(_.findFirstIn(lower).isDefined)) return true
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Delete the query checkpoint so the next start has no stored position
    * (source begins at its "latest"/now default — the reference's
    * `start_at_operation_time(now)`). Hadoop FS so it works on
    * local/HDFS/S3 checkpoints alike. */
  def clearPosition(spark: SparkSession, checkpointDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }
}
