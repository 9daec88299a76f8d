package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure what the [[graft.analytics.Dedup.DfCapCeiling]] choice costs
  * (r17, VERDICT r16 #5): on a ScaleUp corpus, the true (j ≥ minJaccard)
  * pair set from an effectively-uncapped inverted index vs the capped
  * default — and whether the lost pairs (every shared shingle hotter than
  * the cap) are still surfaced by the df-independent MinHash-LSH leg.
  *
  * Usage: CapRecallProbe <sfDir> [uncappedDf=300]
  * Prints one JSON line: total/lost pair counts per cap and the fraction
  * of lost pairs recovered by minhashLshPairs at the same threshold.
  */
object CapRecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CapRecallProbe <sfDir> [uncappedDf]")
    val dir = args(0)
    val uncapped = if (args.length > 1) args(1).toInt else 300
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val n = docs.count()
    val cap = Dedup.dfCapFor(n)
    def keyed(maxDf: Int) =
      Dedup.ngramJaccardPairs(docs, minJaccard = 0.6, maxDf = Some(maxDf))
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val full = keyed(uncapped)
    val capped = keyed(cap)
    val lost = full.join(capped, Seq("id_a", "id_b"), "left_anti").localCheckpoint(true)
    val nFull = full.count(); val nCapped = capped.count(); val nLost = lost.count()
    // the MinHash leg at the library default: banding is df-independent,
    // so boilerplate-only pairs the capped index misses should still band
    val mh = Dedup.minhashLshPairs(docs, minJaccard = 0.6)
      .select(col("id_a"), col("id_b"))
    val recovered = lost.join(mh, Seq("id_a", "id_b"), "left_semi").count()
    spark.stop()
    println(s"""{"dir":"$dir","docs":$n,"cap":$cap,"uncappedDf":$uncapped,""" +
      s""""pairs_uncapped":$nFull,"pairs_capped":$nCapped,"pairs_lost":$nLost,""" +
      s""""lost_recovered_by_minhash":$recovered}""")
  }
}
