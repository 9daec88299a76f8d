package graft.analytics
// lives beside the tools but in the analytics package: it drives the
// package-private shingle/band/verify stages directly

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Names the carrier of the dedup tier's cross-SF shuffle-byte growth
  * (VERDICT r14 #3 follow-through): tools/dedup_scale5.sh established the
  * per-pass bytes are FLAT (the wall spread is host drift) but grow
  * sf1→sf3 at ~1.5 exponent, identically for every pair-family query —
  * including `dedup_ngram`, which runs no label propagation — so the
  * growth lives in the SHARED pair-generation stage, not the cc
  * iteration. This probe decomposes that stage per SF: corpus rows,
  * shingle mass (the exploded frame the banded join shuffles), LSH
  * candidate pairs, and verified pairs. Linear shingle mass + superlinear
  * candidates would indict banding selectivity; linear candidates with
  * superlinear bytes would indict a broadcast→shuffle plan transition.
  *
  * Usage: DedupBytesProbe <sfDir>... — one JSON line per dir. */
object DedupBytesProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    args.foreach { dir =>
      val docs = graft.Tables(spark, dir).documents
      val sh = Dedup.shingleFrame(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = sh.count()
      val shingleMass = sh.select(sum(size(col("sh")))).head().getLong(0)
      val banded = Dedup.minhashBanded(sh, 4, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = cand.count()
      val nPairs = Dedup.jaccardVerify(cand, sh.select("doc_id", "sh"), 0.6).count()
      // band-bucket population distribution: the candidate mass is
      // Σ m(m-1)/2 over bucket populations m, so a few hot buckets can
      // carry the whole superlinearity
      val pops = banded.groupBy("band", "bucket").agg(count(lit(1)).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = pops.orderBy(col("m").desc).limit(5)
        .collect().map(_.getAs[Long]("m")).mkString("[", ",", "]")
      val hotMass = pops.agg(
        sum(col("m") * (col("m") - 1) / 2).as("pair_mass"),
        sum(when(col("m") > 64, col("m") * (col("m") - 1) / 2).otherwise(0L)).as("hot_mass"))
        .head()
      pops.unpersist(): Unit
      // the r15 remedies, measured: (a) capped LSH candidates (band-bucket
      // cap + full-sig refinement) and their verified pairs — recall loss
      // shows here if the cap drops true pairs; (b) the ngram inverted
      // self-join mass Σ min(df,cap)·(min(df,cap)−1)/2 under the old
      // relative cap vs the ceilinged one
      val cappedCand = Dedup.bandedCandidates(banded, Dedup.BandBucketCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCapped = cappedCand.count()
      val nCappedPairs = Dedup.jaccardVerify(cappedCand, sh.select("doc_id", "sh"), 0.6).count()
      cappedCand.unpersist(): Unit
      val dfs = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
      val oldCap = math.max(20L, nDocs / 100L)
      val newCap = Dedup.dfCapFor(nDocs).toLong
      def mass(cap: Long) = sum(least(col("df"), lit(cap)) * (least(col("df"), lit(cap)) - 1) / 2)
      val m = dfs.agg(mass(oldCap), mass(newCap)).head()
      println(s"""{"probe":"dedup_bytes","sf":"$dir","n_docs":$nDocs,""" +
        s""""shingle_mass":$shingleMass,"lsh_candidates":$nCand,"verified_pairs":$nPairs,""" +
        s""""top_bucket_pops":$top,"pair_mass":${hotMass.get(0)},"hot_mass_gt64":${hotMass.get(1)},""" +
        s""""lsh_candidates_capped":$nCapped,"verified_pairs_capped":$nCappedPairs,""" +
        s""""ngram_mass_relcap":${m.get(0)},"ngram_mass_ceiling":${m.get(1)},""" +
        s""""df_cap_old":$oldCap,"df_cap_new":$newCap}""")
      cand.unpersist(); banded.unpersist(); sh.unpersist(): Unit
    }
    spark.stop()
  }
}
