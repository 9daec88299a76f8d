package graft.streaming

/** Adaptive micro-batch admission sizing (SURVEY §2 O16).
  *
  * Faithful port of the reference's `BatchSizeManager::adjust_batch_size`
  * semantics (`/root/reference/src/main.rs:192-233`): measure the processing
  * rate of the last batch; above `targetRate` double the size, otherwise
  * halve it; always clamp to `[minSize, maxSize]`.
  *
  * On Spark this is a *driver-side admission knob*, not an operator: feed
  * [[suggest]] into the streaming source's rows-per-trigger option
  * (`maxFilesPerTrigger` / `maxDocsPerBatch` analog) between restarts, or
  * simply rely on AQE + trigger-time backpressure (SURVEY §4: the mechanism
  * is subsumed; this exists for contract parity and for sources whose
  * connectors lack native backpressure).
  *
  * Reference defaults: live `(initial, 1, 10000, 5000 rec/s)`; historical
  * `(initial, 5000, 8000, 10000 rec/s)` (`src/main.rs:350-351`,
  * `historical_data/src/main.rs:370-371`).
  */
final class BatchSizeManager(initialSize: Int, minSize: Int, maxSize: Int, targetRate: Double) {
  require(minSize >= 1 && maxSize >= minSize, "invalid batch size bounds")
  @volatile private var size: Int = math.min(math.max(initialSize, minSize), maxSize)

  def current: Int = size

  /** Record one processed batch; returns the new suggested size. */
  def adjust(processed: Long, elapsed: java.time.Duration): Int = {
    val secs = math.max(elapsed.toNanos / 1e9, 1e-9)
    val rate = processed / secs
    val next = if (rate > targetRate) size.toLong * 2 else size.toLong / 2
    size = math.min(math.max(next, minSize.toLong), maxSize.toLong).toInt
    size
  }

  /** The suggested per-trigger admission cap. */
  def suggest: Int = size
}

object BatchSizeManager {
  /** Reference live-binary defaults. */
  def live(initial: Int): BatchSizeManager = new BatchSizeManager(initial, 1, 10000, 5000.0)
  /** Reference historical-binary defaults. */
  def historical(initial: Int): BatchSizeManager = new BatchSizeManager(initial, 5000, 8000, 10000.0)
}
