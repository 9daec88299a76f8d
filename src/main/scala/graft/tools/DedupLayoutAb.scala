package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the r13 dedup-index layout trade (VERDICT r13 #7): the +16–37%
  * sf0.1 regressions on `dedup_index_forget` / `dedup_delta` /
  * `dedup_admit` were attributed to small-files overhead from the 64×16
  * directory fan-out the doc-hash partition level added. This probe runs
  * the three lifecycle queries at a larger SF under a chosen doc-hash
  * width (1 ≈ the old single-level file counts, 16 = the shipped layout),
  * set via the `graft.dedupindex.docbuckets` sys-prop — since r15 a
  * BUILD-time default only: the width is recorded in each index's
  * `_graft_meta.json` and read back by every later operation, so the
  * probe's per-JVM width applies to the indexes it builds, never to
  * pre-existing ones. Two runs decide whether the trade vanishes at
  * scale.
  *
  * Usage: DedupLayoutAb <docbuckets> [sfDir] — env contract as
  * graft.Bench. */
object DedupLayoutAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupLayoutAb <docbuckets> [sfDir]")
    sys.props("graft.dedupindex.docbuckets") = args(0)
    val dir = if (args.length > 1) args(1) else "/root/repo/data/sf1"
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

    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val names = Seq("dedup_delta", "dedup_admit", "dedup_index_forget")
    val timings = names.map { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val line = s"""{"probe":"dedup_layout_ab","docbuckets":${args(0)},""" +
      s""""sf":"$dir","queries":$qs}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"): Unit)
    spark.stop()
    println(line)
  }
}
