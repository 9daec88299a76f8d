package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink abstraction for the routed statement batches (SURVEY §2 O14).
  *
  * The core pipeline is connector-agnostic: tests and the local corpus write
  * parquet; production plugs the ClickHouse JDBC driver into
  * [[JdbcStatementsSink]] without touching the dataflow. Rows carry the
  * reference's 4-column shape `(id, statement, created_at, timestamp)`
  * (`/root/reference/src/main.rs:891-895`): `created_at` is assigned by the
  * sink at insert time (the reference emits a SQL `now()`).
  */
trait BatchSink extends Serializable {
  /** Write one routed micro-batch/backfill chunk to `table`. Must be
    * idempotent-friendly: callers may retry the whole call (O17). */
  def write(df: DataFrame, table: String): Unit
}

/** Parquet-directory sink — one subdirectory per logical table. Used by
  * tests and the local benchmark corpus. */
final class ParquetSink(baseDir: String) extends BatchSink {
  override def write(df: DataFrame, table: String): Unit =
    df.withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(s"$baseDir/$table")
}

/** Generic JDBC VALUES sink matching the reference's insert shape. Uses
  * plain `java.sql` batched PreparedStatements per partition (executor-side,
  * no driver round-trip per row); `created_at` uses the database's `now()`
  * exactly like the reference (`src/main.rs:865`).
  *
  * With the ClickHouse JDBC driver on the classpath, `url` is e.g.
  * `jdbc:clickhouse://host:8123/db`. Parameters are BOUND, so the O10
  * escaping layer is unnecessary here by construction (SURVEY §2 O10). */
final class JdbcStatementsSink(url: String, user: String, password: String,
                               batchSize: Int = 8000,
                               nowSql: String = "now()") extends BatchSink {
  override def write(df: DataFrame, table: String): Unit = {
    // `nowSql` is "now()" for ClickHouse (the reference's literal,
    // src/main.rs:865); tests pass "CURRENT_TIMESTAMP" for Derby
    val sql = s"INSERT INTO $table (id, statement, created_at, timestamp) VALUES (?, ?, $nowSql, ?)"
    val (u, usr, pw, bs) = (url, user, password, batchSize)
    // Normalize the timestamp at the sink boundary: a TIMESTAMP_NTZ `ts`
    // surfaces as java.time.LocalDateTime and `r.getTimestamp` throws; the
    // cast to session-TZ TimestampType (entry points pin UTC) makes the row
    // extraction type stable regardless of the parquet encoding upstream.
    df.select(col("id").cast("string"), col("statement"), col("ts").cast("timestamp"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(u, usr, pw)
          try {
            val st = conn.prepareStatement(sql)
            var n = 0
            rows.foreach { r =>
              st.setString(1, r.getString(0))
              st.setString(2, r.getString(1))
              st.setTimestamp(3, r.getTimestamp(2))
              st.addBatch()
              n += 1
              if (n % bs == 0) { st.executeBatch(): Unit }
            }
            st.executeBatch(): Unit
          } finally conn.close()
        }
      }
  }
}

/** Training-shard writer: partitioned parquet layout
  * `baseDir/<table>/shard=<k>/...` with a deterministic 60-bit-hash shard
  * column (same routing as [[graft.analytics.Sampling.shardStats]]).
  *
  * Why this shape at 100 TB: `partitionBy` gives partition-pruned reads
  * (a trainer pulls its shard without scanning others), the hash keeps
  * shards balanced regardless of id distribution, and
  * `maxRecordsPerFile` bounds file sizes so downstream loaders see
  * uniform chunks. The write itself is narrow — rows route to shard
  * directories without a pre-shuffle; callers who want exactly one file
  * per shard can `repartition(nShards, col("shard"))` first, trading one
  * shuffle for file-count control. */
final class ShardedParquetSink(baseDir: String, nShards: Int,
                               idCol: String = "doc_id",
                               maxRecordsPerFile: Int = 1000000) extends BatchSink {
  override def write(df: DataFrame, table: String): Unit =
    df.withColumn("shard", graft.analytics.Sampling.shardOf(col(idCol), nShards))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard")
      .parquet(s"$baseDir/$table")
}

/** Time-clustered parquet layout: range-partition on the cluster column,
  * sort within partitions, write. Each output file then covers a TIGHT
  * range of the cluster key, so parquet min/max statistics let any
  * key-band predicate skip whole row groups at scan time — the
  * sort-on-write data-layout optimization (Z-order's 1-D case). At 100 TB
  * the one range shuffle at write time buys every downstream time-banded
  * scan a proportional read reduction; `LayoutSpec` measures the pruning
  * (clustered scan emits a fraction of the shuffled layout's rows for the
  * same predicate, identical results). */
final class ClusteredParquetSink(baseDir: String, partitions: Int,
                                 clusterCol: String = "ts") extends BatchSink {
  override def write(df: DataFrame, table: String): Unit =
    df.repartitionByRange(partitions, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Append).parquet(s"$baseDir/$table")
}

/** Z-ORDERED parquet layout: scale two cluster columns onto a 2^bits grid,
  * interleave their bits (Morton code), range-partition + sort by the
  * z-value, write. Each output file then covers a tight 2-D TILE of the
  * (colA, colB) space, so parquet min/max statistics prune row groups for
  * band predicates on EITHER dimension — the multi-dimensional
  * generalization of [[ClusteredParquetSink]] (whose sort key buys pruning
  * on one dimension only; this is the layout move behind Delta/Iceberg
  * Z-ORDER clustering). Cost at write: one tiny min/max stats pass + one
  * range shuffle — the same bill as the 1-D sink. LayoutSpec measures the
  * two-sided pruning against a 1-D control.
  *
  * The z-value is computed from SCALED copies of the columns (min/max
  * normalized to the grid), so arbitrary numeric ranges interleave
  * meaningfully; the helper columns are dropped before write. */
final class ZOrderedParquetSink(baseDir: String, partitions: Int,
                                colA: String, colB: String,
                                bits: Int = 16) extends BatchSink {
  override def write(df: DataFrame, table: String): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty batch (or all-null cluster columns): the agg row is all nulls
    // and the primitive getters would NPE — honor the BatchSink contract
    // every other sink keeps (an empty write is a harmless no-op) instead
    // of burning the caller's retries on a batch with nothing unwritable
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      if (!df.isEmpty)
        df.write.mode(SaveMode.Append).parquet(s"$baseDir/$table")
      return
    }
    val (minA, maxA, minB, maxB) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    val maxCell = (1L << bits) - 1
    def scaled(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxCell), greatest(lit(0L),
        round((col(c).cast("double") - lit(lo)) / (lit(hi - lo)) * maxCell).cast("long")))
    val z = (0 until bits).map { i =>
      shiftright(col("__za"), i).bitwiseAND(1) * lit(1L << (2 * i)) +
        shiftright(col("__zb"), i).bitwiseAND(1) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    df.withColumn("__za", scaled(colA, minA, maxA))
      .withColumn("__zb", scaled(colB, minB, maxB))
      .withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
      .write.mode(SaveMode.Append).parquet(s"$baseDir/$table")
  }
}

/** Test double: fails the first `failures` writes then delegates —
  * exercises the O17 retry / O18 DLQ paths deterministically. */
final class FlakySink(delegate: BatchSink, failures: Int) extends BatchSink {
  private val remaining = new java.util.concurrent.atomic.AtomicInteger(failures)
  override def write(df: DataFrame, table: String): Unit =
    if (remaining.getAndDecrement() > 0)
      throw new RuntimeException(s"injected sink failure ($table)")
    else delegate.write(df, table)
}
