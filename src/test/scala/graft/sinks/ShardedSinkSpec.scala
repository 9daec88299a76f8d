package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardedSinkSpec extends SparkSpec {

  test("ShardedParquetSink: partition-pruned shard reads, routing matches shardStats") {
    val base = Files.createTempDirectory("shards").toString
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    new ShardedParquetSink(base, nShards = 8).write(docs, "docs")

    val back = spark.read.parquet(s"$base/docs")
    assert(back.count() == docs.count())
    // shard column is a real hive partition: reading one shard prunes files
    // (metrics need a real execution of the same QueryExecution)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .map(_.metrics("numFiles").value).sum
    }
    val scanned = filesRead(spark.read.parquet(s"$base/docs").filter(col("shard") === 3))
    val total = filesRead(spark.read.parquet(s"$base/docs"))
    assert(scanned > 0 && scanned < total, s"pruning must reduce files read ($scanned vs $total)")

    // routing agrees with the shardStats operator
    val viaOp = graft.analytics.Sampling.shardStats(docs, nShards = 8)
      .select("shard", "n_docs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSink = back.groupBy("shard").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(viaSink == viaOp)
  }
}
