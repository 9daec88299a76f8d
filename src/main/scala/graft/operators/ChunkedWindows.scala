package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof time-chunked forms of the per-user window family
  * (`w3_sessionize`, `q41_twa`, `q37_scd2`).
  *
  * The problem they solve: `Window.partitionBy(user_id)` processes one
  * user's ENTIRE history in one task. AQE's skew handling splits shuffle
  * blocks for joins/aggregations but can NOT split a window partition —
  * the frame semantics need the whole partition in one place — so a hot
  * user holding 10% of a 100 TB events table pins 10 TB on a single core.
  * SkewSpec synthesizes exactly that shape and proves these forms equal
  * the vanilla queries row-for-row.
  *
  * The trick, shared by all three: cut each user's timeline into fixed
  * `chunkSec` spans and split every EVENT-SIZED window into
  * `partitionBy(user_id, chunk)` — a hot user now spreads across
  * (span / chunkSec) tasks — then repair the chunk boundaries with a
  * CHUNK-LEVEL frame (one row per non-empty (user, chunk): thousands of
  * times smaller than the events) which IS still user-partitioned but
  * carries only per-chunk summaries. Lag/lead state crosses the boundary
  * through that frame (the previous chunk's last stamp, the next chunk's
  * first stamp), and running indexes (session number, SCD version) become
  * per-chunk prefix-sum offsets + within-chunk running values — the same
  * two-level decomposition the packing operators use for shard-local
  * prefix sums.
  *
  * Chunk sizing at scale: chunkSec trades boundary-frame size against
  * per-task span — pick span/chunkSec ≈ desired parallelism for the
  * hottest key (e.g. a year of a 10%-hot user at 1-day chunks = 365-way
  * spread, boundary frame 365 rows/user). Events with equal timestamps
  * land in the same chunk by construction, so ordering ties never
  * straddle a boundary.
  */
object ChunkedWindows {

  /** [[graft.queries.Relational.w3Sessionize]] with event-sized windows on
    * (user_id, chunk). Emits identical (user_id, session_idx, n_events,
    * sum_value) rows. */
  def sessionize(events: DataFrame, gapSec: Long = 1800L,
                 chunkSec: Long = 86400L): DataFrame = {
    val ev = events
      .withColumn("es", col("ts").cast("long"))
      .withColumn("chunk", col("es").cast("long") / chunkSec cast "long")
    val wc = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("es"), col("event_id"))
    // chunk-level boundary frame: previous non-empty chunk's last stamp
    val bounds = ev.groupBy(col("user_id"), col("chunk"))
      .agg(max(col("es")).as("last_es"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val boundary = bounds
      .withColumn("prev_last_es", lag(col("last_es"), 1).over(wu))
      .select(col("user_id"), col("chunk"), col("prev_last_es"))
    val withGap = ev.join(boundary, Seq("user_id", "chunk"))
      .withColumn("prev_es",
        coalesce(lag(col("es"), 1).over(wc), col("prev_last_es")))
      .withColumn("new_s",
        when(col("es") - col("prev_es") >= gapSec, 1).otherwise(0))
    // two-level session index: per-chunk offsets (user-partitioned but
    // CHUNK-sized) + within-chunk running sum (event-sized, chunk-split)
    val offsets = withGap.groupBy(col("user_id"), col("chunk"))
      .agg(sum(col("new_s")).as("chunk_news"))
      .withColumn("offset",
        coalesce(sum(col("chunk_news"))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("chunk"), col("offset"))
    withGap.join(offsets, Seq("user_id", "chunk"))
      .withColumn("session_idx",
        col("offset") + sum(col("new_s"))
          .over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** [[graft.queries.Relational.q41Twa]] with the lead() split on
    * (user_id, chunk); a chunk's last event takes the NEXT non-empty
    * chunk's first stamp from the boundary frame. Identical output. */
  def timeWeightedAvg(events: DataFrame, chunkSec: Long = 86400L): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("chunk", (col("us") / lit(chunkSec * 1000000L)).cast("long"))
    val wc = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("us"), col("event_id"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val boundary = ev.groupBy(col("user_id"), col("chunk"))
      .agg(min(col("us")).as("first_us"))
      .withColumn("next_first_us", lead(col("first_us"), 1).over(wu))
      .select(col("user_id"), col("chunk"), col("next_first_us"))
    ev.join(boundary, Seq("user_id", "chunk"))
      .withColumn("next_us",
        coalesce(lead(col("us"), 1).over(wc), col("next_first_us")))
      .withColumn("dt_ms", expr("(next_us - us) div 1000"))
      .filter(col("dt_ms").isNotNull && col("dt_ms") > 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("dt_ms")).as("sum_dt_ms"),
        sum(col("cents") * col("dt_ms")).as("sum_w_cents"))
      .withColumn("twa",
        round(col("sum_w_cents").cast("double") / col("sum_dt_ms") / 100.0, 4))
      .select(col("user_id"), col("n"), col("sum_dt_ms"), col("twa"))
      .orderBy(col("user_id"))
  }

  /** [[graft.queries.Relational.q37Scd2]] chunk-split: transition detection
    * (lag) and the post-filter version/lead windows all run on
    * (user_id, chunk); boundaries carry the previous chunk's last type and
    * the next transition-bearing chunk's first transition stamp. */
  def scd2(events: DataFrame, chunkSec: Long = 86400L): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_s"), col("event_id"))
      .withColumn("chunk", (col("ts_s") / chunkSec).cast("long"))
    val wc = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts_s"), col("event_id"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val lastType = ev.groupBy(col("user_id"), col("chunk"))
      .agg(max_by(col("event_type"), struct(col("ts_s"), col("event_id"))).as("last_type"))
      .withColumn("prev_last_type", lag(col("last_type"), 1).over(wu))
      .select(col("user_id"), col("chunk"), col("prev_last_type"))
    val trans = ev.join(lastType, Seq("user_id", "chunk"))
      .withColumn("prev_type",
        coalesce(lag(col("event_type"), 1).over(wc), col("prev_last_type")))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    // transitions are already sparse, but a hostile history alternating
    // types keeps them event-sized — so version/lead get the same
    // two-level treatment instead of a per-user window
    val vOff = trans.groupBy(col("user_id"), col("chunk"))
      .agg(count(lit(1)).as("n_tr"), min(col("ts_s")).as("first_tr_ts"))
      .withColumn("v_offset",
        coalesce(sum(col("n_tr"))
          .over(wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("next_first_tr_ts", lead(col("first_tr_ts"), 1).over(wu))
      .select(col("user_id"), col("chunk"), col("v_offset"), col("next_first_tr_ts"))
    trans.join(vOff, Seq("user_id", "chunk"))
      .withColumn("version", (col("v_offset") + row_number().over(wc)).cast("long"))
      .withColumn("valid_to_s",
        coalesce(lead(col("ts_s"), 1).over(wc), col("next_first_tr_ts")))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts_s").as("valid_from_s"), col("valid_to_s"))
      .orderBy(col("user_id"), col("version"))
  }
}
