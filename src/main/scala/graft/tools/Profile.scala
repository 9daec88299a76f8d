package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.Dedup

/** Dev-only stage profiler for the slow analytics queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables(spark, dir).documents

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles+count")(withSh.count())
    time("shingles collect sizes")(withSh.select(size(col("sh"))).agg(sum("size(sh)")).count())
    val inv = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("explode")(inv.count())
    val a = inv.as("a"); val b = inv.as("b")
    val common = a.join(b, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    time("common pairs")(common.count())
    time("full ngram query")(Dedup.ngramJaccardPairs(docs, 0.6).count())

    val hbase = withSh.withColumn("hbase", transform(col("sh"), s => Dedup.hash60(s) % Dedup.MinhashM))
    time("hbase (sha per shingle)")(hbase.select(sum(size(col("hbase")))).count())
    val sig = hbase.withColumn("sig", Dedup.minhashSlots(col("hbase"), 16))
    time("signatures")(sig.select(col("sig")).count())
    time("full minhash query")(Dedup.minhashLshPairs(docs, 0.6).count())
    spark.stop()
  }
}
