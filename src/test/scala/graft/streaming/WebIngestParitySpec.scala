package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Verdict-for-verdict parity between the STREAMING raw-web ingest
  * ([[EventTimeOps.streamingWebIngest]]: stateless repair → extract →
  * entropy gate) and the batch composed DAG
  * ([[graft.queries.AnalyticsQueries.pipelineWebIngest]]).
  *
  * Because every streaming stage is a per-row expression (no state, no
  * cross-row dependence), parity is UNCONDITIONAL in arrival order — the
  * split below is doc-parity, deliberately NOT a quality or rank order,
  * unlike AdmitParitySpec's precondition. The only coupling is the
  * calibrated threshold, fed from the batch DAG's own p25 (the
  * calibrate-on-yesterday pattern). */
class WebIngestParitySpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("streamingWebIngest == pipelineWebIngest verdict-for-verdict under arbitrary arrival") {
    val (srcDir, outA, outR, ckpt) = (tmp("wisrc"), tmp("wia"), tmp("wir"), tmp("wick"))
    val dir = sf("sf0.01")
    val docs = graft.Tables(spark, dir).documents

    val batch = graft.queries.AnalyticsQueries.pipelineWebIngest(spark, dir).persist()
    val p25 = batch.select(col("p25")).head().getLong(0)

    // arbitrary micro-batch split (doc parity — no ordering precondition)
    val pages = graft.queries.AnalyticsQueries.webIngestPages(docs)
    pages.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$srcDir/d0")
    pages.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$srcDir/d1")
    val schema = spark.read.parquet(s"$srcDir/d0").schema

    val q = EventTimeOps.streamingWebIngest(
        Sources.fileStream(spark, s"$srcDir/d*", schema), p25)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.filter(col("verdict")).write.mode("append").parquet(outA)
        b.filter(!col("verdict")).write.mode("append").parquet(outR)
      }
      .start()
    assert(q.awaitTermination(180000), "streaming web ingest did not finish in time")

    val streamed = spark.read.parquet(outA).unionByName(spark.read.parquet(outR))
    val total = docs.count()
    assert(streamed.count() == total)
    // verdict-for-verdict, all provenance columns
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // both routes are non-trivial (the gate really fires both ways)
    assert(spark.read.parquet(outA).count() > 0 && spark.read.parquet(outR).count() > 0)
    batch.unpersist(): Unit
  }
}
