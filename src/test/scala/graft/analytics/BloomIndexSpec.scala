package graft.analytics

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The persisted decontamination screen: build/append merge semantics, the
  * no-false-negative screen guarantee, and the stateless screen predicate
  * riding a structured stream with batch parity. */
class BloomIndexSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("build + append admits exactly what a one-shot build on the union admits") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val registryA = docs.filter(col("doc_id") < 3)
    val registryB = docs.filter(col("doc_id") >= 3 && col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)

    val incr = tmp("bloomidx-incr")
    BloomIndex.build(registryA, incr)
    BloomIndex.append(registryB, incr)
    val oneShot = tmp("bloomidx-one")
    BloomIndex.build(registryA.unionByName(registryB), oneShot)

    val a = BloomIndex.decontaminate(spark, incr, corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = BloomIndex.decontaminate(spark, oneShot, corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val exact = Dedup.decontaminate(corpus, registryA.unionByName(registryB))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a.nonEmpty && a == b && a == exact)
  }

  test("screen predicate never false-negatives a contaminated doc") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val registry = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5).persist()
    val idx = tmp("bloomidx-fn")
    BloomIndex.build(registry, idx)

    val kept = Dedup.decontaminate(corpus, registry)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = all -- kept
    assert(contaminated.nonEmpty)

    // every truly contaminated doc must probe true; anything probing false
    // is therefore a PROOF of clean (it must sit in the kept set)
    val probedTrue = corpus.filter(BloomIndex.screenPredicate(spark, idx))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.subsetOf(probedTrue))
    assert((all -- probedTrue).subsetOf(kept))
    corpus.unpersist(): Unit
  }

  test("the stateless screen rides a structured stream with batch parity") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents.persist()
    val registry = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val idx = tmp("bloomidx-stream")
    BloomIndex.build(registry, idx)

    val (srcDir, outDir, ckpt) = (tmp("src"), tmp("out"), tmp("ckpt"))
    val mid = corpus.agg(max("doc_id")).head().getLong(0) / 2
    corpus.filter(col("doc_id") <= mid).write.parquet(s"$srcDir/d0")
    corpus.filter(col("doc_id") > mid).write.parquet(s"$srcDir/d1")
    val schema = spark.read.parquet(s"$srcDir/d0").schema

    // ingest-time screen: keep docs the bloom PROVES clean, route the rest
    // to verification — stateless, so it needs no watermark and no state
    val pred = BloomIndex.screenPredicate(spark, idx)
    val q = Sources.fileStream(spark, s"$srcDir/d*", schema)
      .withColumn("needs_verify", pred)
      .select(col("doc_id"), col("needs_verify"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", outDir)
      .start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batch = corpus.withColumn("needs_verify", pred)
      .select(col("doc_id"), col("needs_verify")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.nonEmpty && got == batch)

    // and the proof carries: stream-admitted "clean" docs are a subset of
    // the exact decontamination's admissions
    val kept = Dedup.decontaminate(corpus, registry)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.filter(!_._2).keySet.subsetOf(kept))
    docs.unpersist(): Unit
  }

  test("readers survive the append swap window (tmp fallback) and screenPredicate honors textCol") {
    import spark.implicits._
    val registry = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "body")
    val dir = tmp("bloomidx-swap")
    BloomIndex.build(registry, dir, textCol = "body")
    val corpus = Seq(
      (10L, "alpha beta gamma delta padding"),  // shares shingles
      (11L, "nothing in common here at all")).toDF("doc_id", "body")
    // screenPredicate takes the payload column name (r16 review sweep: it
    // was hardcoded to "text" while build/append/decontaminate took it)
    val flagged = corpus.withColumn("hit", BloomIndex.screenPredicate(spark, dir, "body"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("hit")).toMap
    assert(flagged(10L) && !flagged(11L))
    // simulate a writer crashed between hadoopWrite's two renames: the live
    // file is gone, the .tmp twin holds the complete payload — lock-free
    // readers must fall back to it, not crash or read torn bits
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/bloom.bin"),
      java.nio.file.Paths.get(s"$dir/bloom.bin.tmp"))
    val flagged2 = corpus.withColumn("hit", BloomIndex.screenPredicate(spark, dir, "body"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("hit")).toMap
    assert(flagged2 == flagged)
    // a later build() heals the layout via its own atomic write
    BloomIndex.build(registry, dir, textCol = "body")
    assert(new java.io.File(s"$dir/bloom.bin").exists())
  }
}
