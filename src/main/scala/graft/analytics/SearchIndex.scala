package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED BM25 search index: build once, query many — the retrieval
  * member of the build-once family ([[PqIndex]] for ANN, [[DedupIndex]]
  * for near-dup). [[Search.bm25TopDocs]] recomputes corpus statistics per
  * call, which is right for a one-shot oracled query but not for a corpus
  * served repeatedly; this is the missing half.
  *
  * On-disk layout under `dir`:
  *   - `postings/` (token, doc_id, tf, dl) PARTITIONED BY token hash
  *     bucket — the inverted index, denormalized with the doc length so
  *     scoring needs NO doc-table join.
  *   - `df/`    (token, df) — vocabulary-sized document frequencies.
  *   - `stats/` one row (n, dl_sum) — corpus size and token mass.
  *
  * A query probes only its terms' buckets: the term list is hashed
  * DRIVER-side ([[Dedup.hash60Local]], bit-identical to the stored
  * bucketing) into a LITERAL partition filter, so the postings scan
  * statically prunes to |terms| of `buckets` directories — at 100 TB a
  * query reads ~terms/buckets of the index and never the corpus.
  *
  * Determinism: tf/dl/df/idf and the fixed-order BM25 sum are the exact
  * expressions of [[Search.bm25TopDocs]], so querying a freshly built
  * index returns bit-identical rows (the `bm25_index_search` oracle row
  * IS `bm25_search`'s SQL). */
object SearchIndex {

  private def writeIndex(docs: DataFrame, dir: String, buckets: Int,
                         mode: String, idCol: String, textCol: String): Unit = {
    val toks = TextAnalysis.tokens(col(textCol))
    val postings = docs
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", Dedup.hash60(col("token")) % buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sort postings by token INSIDE each bucket (r13, VERDICT r12 #4): the
    // probe prunes to |terms| bucket directories, but inside a bucket it
    // still row-filters `token IN (...)` — with token-sorted files the
    // parquet row-group/page min-max stats prune WITHIN the bucket too
    // (SearchIndexSpec measures rows read, sorted vs unsorted). The leading
    // `bucket` key keeps the write's required partition ordering satisfied,
    // so no second (order-destroying) sort is inserted before the writer.
    postings.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("token"), col("doc_id"))
      .write.mode(mode).partitionBy("bucket").parquet(s"$dir/postings")
    postings.groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode(mode).parquet(s"$dir/df")
    // stats cover ALL docs (a blank doc has no postings but still counts
    // toward n and dl_sum — same census bm25TopDocs takes)
    docs.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("dl_sum"))
      .write.mode(mode).parquet(s"$dir/stats")
    postings.unpersist(): Unit
  }

  /** Tokenize once; write postings, document frequencies, corpus stats. */
  def build(docs: DataFrame, dir: String, buckets: Int = 64,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(docs.sparkSession, dir) {
      writeIndex(docs, dir, buckets, "overwrite", idCol, textCol)
    }

  /** Append a shard: its postings, df increments, and stats increment are
    * written as new parts, and [[query]] MERGES them on read (sum over df
    * parts per token, sum over stats parts). BM25 has no trained state —
    * unlike [[PqIndex.append]] there is nothing to go stale, so after any
    * append sequence a query is EXACTLY a one-shot build of the union
    * (SearchIndexSpec proves it against [[Search.bm25TopDocs]]). */
  def append(delta: DataFrame, dir: String, buckets: Int = 64,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    IndexLock.withLock(delta.sparkSession, dir) {
      writeIndex(delta, dir, buckets, "append", idCol, textCol)
    }

  /** BM25 top-k from the stored index — output schema and values match
    * [[Search.bm25TopDocs]] exactly for the same terms and k. */
  def query(spark: SparkSession, dir: String, queryTerms: Seq[String], k: Int,
            buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.sorted,
      "queryTerms must be non-empty and sorted (fixed summation order is the determinism contract)")
    // merge-on-read across appended parts: one stats row / df row per
    // build-or-append, summed here (tiny: parts × |terms| rows)
    val st = spark.read.parquet(s"$dir/stats")
      .agg(sum(col("n")).as("n"), sum(col("dl_sum")).as("dl_sum")).head()
    val n = st.getAs[Long]("n")
    val avgdl = st.getAs[Long]("dl_sum").toDouble / n
    val dfMap = spark.read.parquet(s"$dir/df")
      .filter(col("token").isin(queryTerms: _*))
      .groupBy("token").agg(sum(col("df")).as("df"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    val probed = queryTerms.map(t => Dedup.hash60Local(t) % buckets).distinct
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(probed: _*) && col("token").isin(queryTerms: _*))
    val tfCols = queryTerms.map(t =>
      coalesce(max(when(col("token") === t, col("tf"))), lit(0L)).as(s"tf_$t"))
    val pivoted = post.groupBy("doc_id", "dl").agg(tfCols.head, tfCols.tail: _*)
    val score = queryTerms.map { t =>
      val df = dfMap.getOrElse(t, 0L)
      val tf = col(s"tf_$t").cast("double")
      (Search.idfMicro(lit(df), n).cast("double") / 1e6) *
        (tf * (k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    }.reduce(_ + _) // same fixed left-to-right chain as bm25TopDocs
    pivoted.withColumn("score", round(score, 4))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select((Seq(col("doc_id"), col("dl")) ++
        queryTerms.map(t => col(s"tf_$t")) ++ Seq(col("score"))): _*)
  }
}
