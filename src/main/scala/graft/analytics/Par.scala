package graft.analytics

/** Driver-thread overlap of INDEPENDENT Spark actions (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because the driver calls them
  * sequentially. An index build writes several independent stores (each a
  * job + an output commit, mostly driver/commit latency at small scale and
  * straggler-tail fill at large scale); submitting them from a small pool
  * lets each job's tasks back-fill executors freed by the others' tails
  * instead of serializing the commits.
  *
  * Semantics: runs every task, propagates the FIRST failure (after all
  * tasks have finished — no store is left half-written by a sibling's
  * cancellation), preserves nothing about ordering. Callers must pass only
  * tasks that are mutually independent AND read already-materialized (or
  * concurrently-computable) inputs; tasks writing the same directory are
  * NOT independent. Job descriptions are thread-local in Spark, so each
  * task's jobs label correctly in the UI. */
private[graft] object Par {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val fs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      var firstFailure: Option[Throwable] = None
      fs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
