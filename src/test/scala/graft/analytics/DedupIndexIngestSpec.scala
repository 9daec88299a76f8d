package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The production ingest loop over the persisted near-dup index
  * ([[DedupIndex.ingest]]): admission is SOUND (nothing admitted near-dups
  * the index) and every rejection is JUSTIFIED by a concrete pair; the
  * streaming foreachBatch form admits exactly what sequential batch calls
  * admit. */
class DedupIndexIngestSpec extends SparkSpec {

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def splits(docs: DataFrame): (Long, Long) = {
    val hi = docs.agg(max("doc_id")).head().getLong(0)
    (hi / 3, 2 * hi / 3)
  }

  test("ingest admits a sound set and justifies every rejection with a pair") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val (t1, t2) = splits(docs)
    val history = docs.filter(col("doc_id") <= t1)
    val b1 = docs.filter(col("doc_id") > t1 && col("doc_id") <= t2)
    val b2 = docs.filter(col("doc_id") > t2)
    val idx = Files.createTempDirectory("ingestidx").toString
    DedupIndex.build(history, idx)
    val a1 = ids(DedupIndex.ingest(spark, idx, b1, minJaccard = 0.5))
    val a2 = ids(DedupIndex.ingest(spark, idx, b2, minJaccard = 0.5))

    val full = Dedup.minhashLshPairs(docs, minJaccard = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty, "fixture needs near-dup pairs")
    val hist = ids(history)
    val admitted = a1 ++ a2

    // SOUND: no near-dup pair has both sides in the final index content
    // (history ∪ admitted) with at least one side admitted
    val inIndex = hist ++ admitted
    val unsound = full.filter { case (a, b) =>
      inIndex(a) && inIndex(b) && (admitted(a) || admitted(b))
    }
    assert(unsound.isEmpty, s"admitted near-dups: $unsound")

    // JUSTIFIED: a rejected b1 doc pairs with history or a lower-id b1 doc;
    // a rejected b2 doc pairs with history, an admitted b1 doc, or a
    // lower-id b2 doc (rejected b1 docs are NOT in the index and cannot
    // justify a b2 rejection)
    def partners(r: Long): Set[Long] =
      full.collect { case (a, b) if b == r => a case (a, b) if a == r => b }.toSet
    val ids1 = ids(b1); val ids2 = ids(b2)
    for (r <- ids1 -- a1) {
      val p = partners(r)
      assert(p.exists(x => hist(x) || (ids1(x) && x < r)),
        s"b1 doc $r rejected without a justifying pair")
    }
    for (r <- ids2 -- a2) {
      val p = partners(r)
      assert(p.exists(x => hist(x) || a1(x) || (ids2(x) && x < r)),
        s"b2 doc $r rejected without a justifying pair")
    }
    assert((ids1 -- a1).nonEmpty || (ids2 -- a2).nonEmpty,
      "fixture should reject at least one doc")
  }

  test("streaming foreachBatch ingest admits exactly what sequential batch ingest admits") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val (t1, t2) = splits(docs)
    val history = docs.filter(col("doc_id") <= t1)

    // sequential reference run
    val idxSeq = Files.createTempDirectory("ingestseq").toString
    DedupIndex.build(history, idxSeq)
    val want =
      ids(DedupIndex.ingest(spark, idxSeq,
        docs.filter(col("doc_id") > t1 && col("doc_id") <= t2), minJaccard = 0.5)) ++
      ids(DedupIndex.ingest(spark, idxSeq,
        docs.filter(col("doc_id") > t2), minJaccard = 0.5))

    // streamed run: one file per shard, one micro-batch per file
    val (srcDir, ckpt, outDir) = (Files.createTempDirectory("ingestsrc").toString,
      Files.createTempDirectory("ingestckpt").toString,
      Files.createTempDirectory("ingestout").toString)
    docs.filter(col("doc_id") > t1 && col("doc_id") <= t2)
      .repartition(1).write.parquet(s"$srcDir/d0")
    Thread.sleep(1500) // distinct mod times => deterministic batch order
    docs.filter(col("doc_id") > t2)
      .repartition(1).write.parquet(s"$srcDir/d1")
    val idxStream = Files.createTempDirectory("ingeststream").toString
    DedupIndex.build(history, idxStream)
    val schema = docs.schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/d*")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        DedupIndex.ingest(b.sparkSession, idxStream, b, minJaccard = 0.5)
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination(180000)

    assert(ids(spark.read.parquet(outDir)) == want)
  }

  test("streaming ingest -> forget -> ingest matches the batch interleave (tombstone twin)") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val (t1, t2) = splits(docs)
    val history = docs.filter(col("doc_id") <= t1)
    val b1 = docs.filter(col("doc_id") > t1 && col("doc_id") <= t2)
    val b2 = docs.filter(col("doc_id") > t2)
    // forget a deterministic slice of history BETWEEN the two shards: docs
    // it was blocking may now be admitted by the second shard
    val forgetIds = history.filter(col("doc_id") % 5 === 0).select("doc_id")

    // sequential batch reference: ingest b1, forget, ingest b2
    val idxSeq = Files.createTempDirectory("tombseq").toString
    DedupIndex.build(history, idxSeq)
    val a1 = ids(DedupIndex.ingest(spark, idxSeq, b1, minJaccard = 0.5))
    DedupIndex.forget(spark, idxSeq, forgetIds)
    val a2 = ids(DedupIndex.ingest(spark, idxSeq, b2, minJaccard = 0.5))

    // streamed run: the forget fires inside the foreachBatch loop, between
    // micro-batch 0 (= b1) and micro-batch 1 (= b2)
    val (srcDir, ckpt, outDir) = (Files.createTempDirectory("tombsrc").toString,
      Files.createTempDirectory("tombckpt").toString,
      Files.createTempDirectory("tombout").toString)
    b1.repartition(1).write.parquet(s"$srcDir/d0")
    Thread.sleep(1500) // distinct mod times => deterministic batch order
    b2.repartition(1).write.parquet(s"$srcDir/d1")
    val idxStream = Files.createTempDirectory("tombstream").toString
    DedupIndex.build(history, idxStream)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/d*")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (id == 1L) DedupIndex.forget(b.sparkSession, idxStream, forgetIds)
        DedupIndex.ingest(b.sparkSession, idxStream, b, minJaccard = 0.5)
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination(180000)

    assert(ids(spark.read.parquet(outDir)) == (a1 ++ a2))
    // the twins also agree on post-run probe state: a fresh shard sees the
    // same pairs against either index (forgotten docs excluded from both)
    def probe(idx: String): Set[(Long, Long)] =
      DedupIndex.dedupDelta(spark, idx,
          b2.withColumn("doc_id", col("doc_id") + 1000000L), minJaccard = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(idxStream) == probe(idxSeq))
    // forgotten docs are excluded from the probe on both sides
    val fIds = forgetIds.collect().map(_.getLong(0)).toSet
    assert(probe(idxSeq).forall(p => !fIds(p._1) && !fIds(p._2)))
  }
}
