package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure what the [[graft.analytics.Dedup.DfCapCeiling]] choice costs
  * (r17, VERDICT r16 #5): on a ScaleUp corpus, the true (j ≥ minJaccard)
  * pair set from a genuinely UNCAPPED inverted index vs the capped
  * default — and whether the lost pairs (every shared shingle hotter than
  * the cap) are still surfaced by the df-independent MinHash-LSH leg.
  *
  * Usage: CapRecallProbe <sfDir> [referenceDf]
  * The reference leg is uncapped by default (r17 review: a finite default
  * silently undercounts pairs_lost on any corpus whose boilerplate dfs
  * exceed it — the r17 published runs passed 300 with the observed max df
  * 257, valid, but only because that was checked by hand). Pass an
  * explicit referenceDf only to bound a pathologically hot corpus, and
  * read `max_observed_df` in the output to validate the choice. Prints
  * one JSON line: total/lost pair counts and the fraction of lost pairs
  * recovered by minhashLshPairs at the same threshold.
  */
object CapRecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CapRecallProbe <sfDir> [referenceDf]")
    val dir = args(0)
    val reference: Option[Int] = if (args.length > 1) Some(args(1).toInt) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.Dedup
    graft.functions.GraftFunctions.register(spark) // shingles() needs the registry
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val n = docs.count()
    val cap = Dedup.dfCapFor(n)
    // the observed max shingle df, recorded so a bounded referenceDf run
    // can be validated (referenceDf <= this value means the "true" pair
    // set itself was capped and pairs_lost is an undercount)
    val maxObservedDf = docs
      .select(explode(Dedup.shingles(col("text"))).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head().getLong(0)
    def keyed(maxDf: Option[Int]) =
      Dedup.ngramJaccardPairs(docs, minJaccard = 0.6, maxDf = maxDf)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val full = keyed(reference)
    val capped = keyed(Some(cap))
    val lost = full.join(capped, Seq("id_a", "id_b"), "left_anti").localCheckpoint(true)
    val nFull = full.count(); val nCapped = capped.count(); val nLost = lost.count()
    // the MinHash leg at the library default: banding is df-independent,
    // so boilerplate-only pairs the capped index misses should still band
    val mh = Dedup.minhashLshPairs(docs, minJaccard = 0.6)
      .select(col("id_a"), col("id_b"))
    val recovered = lost.join(mh, Seq("id_a", "id_b"), "left_semi").count()
    spark.stop()
    println(s"""{"dir":"$dir","docs":$n,"cap":$cap,""" +
      s""""reference_df":${reference.fold("\"uncapped\"")(_.toString)},""" +
      s""""max_observed_df":$maxObservedDf,""" +
      s""""pairs_uncapped":$nFull,"pairs_capped":$nCapped,"pairs_lost":$nLost,""" +
      s""""lost_recovered_by_minhash":$recovered}""")
  }
}
