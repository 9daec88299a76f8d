package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{PqIndex, ProductQuantization, Similarity}

/** Measurement tool for the r12 3-point scale finding (SCALING.md r12):
  * the PQ-family sf1→sf3 exponents curve to ~1.9–2.3 because FULL-corpus
  * training makes both quantizer capacities grow with n (nlist = n/25,
  * codebook = n/40 per subspace), so the coarse-assignment crossJoin is
  * n × (n/25) — O(n²) — and the train legs dominate the lifecycle.
  *
  * The production remedy is the one every IVF-PQ deployment uses and the
  * API already carries ([[PqIndex.build]]'s `trainOn`): train the
  * quantizer on a BOUNDED sample (fixed absolute size, independent of
  * corpus), encode the full corpus under it — nlist and codebooks become
  * constants, the encode crossJoin is n × const = LINEAR, and serving
  * still probes a constant SHARE of the lists (candidates ∝ n, the
  * scale-stable contract of [[ProductQuantization.scaledNprobe]]).
  *
  * This probe measures that remedy at any SF: bounded-sample build time,
  * serve time, and recall@5 (raw ADC + exact-rescored) against
  * brute-force ground truth — so the linearity claim AND the recall cost
  * are numbers, not arguments.
  *
  * r13: pass `default` as sampleTarget to exercise the DEFAULT build
  * policy (`PqIndex.build` with nothing passed — auto-engages the
  * hash-ordered bounded sample above `TrainSampleTarget`, full-train
  * below) with the default-derived `scaledNprobe(autoTrainN(n))` probe
  * width, so the recall numbers describe exactly what a caller of the
  * default API gets.
  *
  * Usage: SampledTrainProbe [sfDir] [sampleTarget=50000|default] [nQueries=20]
  * Env: SPARK_GRAFT_MASTER / SPARK_GRAFT_JARS / SPARK_GRAFT_EXEC_MEM /
  * SPARK_GRAFT_CPUS — same contract as graft.Bench (local-cluster runs).
  */
object SampledTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val defaultMode = args.length > 1 && args(1) == "default"
    val target =
      if (defaultMode) ProductQuantization.TrainSampleTarget
      else if (args.length > 1) args(1).toLong else 50000L
    val nQ = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val b1 = sys.env.get("SPARK_GRAFT_JARS").fold(b0)(j => b0.config("spark.jars", j))
    val spark = sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .fold(b1)(m => b1.config("spark.executor.memory", m))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val emb = graft.Tables(spark, dir).embeddings
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val (sampleN, nprobe) =
      if (defaultMode) {
        val trainN = ProductQuantization.autoTrainN(n)
        (trainN, ProductQuantization.scaledNprobe(trainN))
      } else {
        val step = math.max(1L, n / target)
        val sN = emb.filter(col("vec_id") % step === 0).count()
        // bounded-sample capacities: constants once the sample size is fixed
        val nlist = math.max(1L, sN / 25L)
        (sN, math.max(1L, (nlist * 300L + 999L) / 1000L).toInt) // share=0.3
      }
    val depth = ProductQuantization.scaledDepth(n) // rescore width ∝ probed candidates

    val idx = java.nio.file.Files.createTempDirectory("sampled-train").toString
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuild) = timed {
      if (defaultMode) PqIndex.build(emb, idx) // the DEFAULT policy, verbatim
      else {
        val step = math.max(1L, n / target)
        PqIndex.build(emb, idx, trainOn = Some(emb.filter(col("vec_id") % step === 0)))
      }
    }

    val queries = emb.filter(col("vec_id") < nQ)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (raw, tRaw) = timed(pairs(
      PqIndex.query(spark, idx, queries, k = 5, nprobe = nprobe)))
    val (resc, tResc) = timed(pairs(
      PqIndex.queryRescored(spark, idx, queries, emb, k = 5, depth = depth, nprobe = nprobe)))
    val truth = pairs(Similarity.bruteForceTopK(emb, queries, 5))
    def recall(s: Set[(Long, Long)]): Double = (s & truth).size.toDouble / truth.size

    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val nlist = math.max(1L, sampleN / 25L)
    val mode = if (defaultMode) "default" else "trainOn"
    val line = s"""{"sf":"$dir","mode":"$mode","n":$n,"sample":$sampleN,"nlist":$nlist,""" +
      s""""nprobe":$nprobe,"depth":$depth,"build_s":${f3(tBuild)},""" +
      s""""serve_raw_s":${f3(tRaw)},"serve_rescored_s":${f3(tResc)},""" +
      s""""recall_raw":${f3(recall(raw))},"recall_rescored":${f3(recall(resc))}}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"): Unit)
    spark.stop()
    println(line)
  }
}
