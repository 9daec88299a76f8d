package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** BENCH_r01 per-query seconds (sf0.1, local[32]) — the regression
    * baseline. Round N+1 compares against round N's recording; >1.3×
    * slowdowns are flagged in the output JSON so a regression can't hide
    * inside the total. */
  val baselineR01: Map[String, Double] = Map(
    "agg_approx" -> 2.109, "agg_stats" -> 2.653, "asof_signup" -> 2.723,
    "dedup_exact" -> 0.656, "dedup_minhash" -> 3.106, "dedup_ngram" -> 4.320,
    "dedup_ngram_keepers" -> 3.611, "dedup_simhash" -> 0.641,
    "dedup_simhash_pairs" -> 1.675, "embed_neardup" -> 5.028,
    "mm_decode" -> 0.610, "mm_frames" -> 0.389, "o10_escape" -> 1.972,
    "o11_o13_route" -> 2.560, "o12_optout_dim" -> 0.830,
    "o14_format_values" -> 7.526, "o3_count_range" -> 0.227,
    "o4_o5_extract" -> 1.686, "o6_o7_anonymize" -> 1.074,
    "o8_o9_statement_json" -> 2.080, "o8_withfield" -> 2.236,
    "q10_cube" -> 0.624, "q1_agg" -> 0.593, "q3_topk" -> 1.191,
    "q5_multijoin" -> 1.342, "q6_rollup" -> 0.544, "q7_percentile" -> 6.865,
    "q8_pivot" -> 0.609, "q9_exists" -> 0.704, "set_except" -> 0.639,
    "set_intersect" -> 0.487, "sim_ivf_topk" -> 1.097, "sim_lsh_bucket" -> 1.388,
    "sim_topk" -> 0.525, "text_fingerprint" -> 0.250, "text_langid" -> 0.295,
    "text_quality" -> 0.977, "text_tokens" -> 0.557, "text_tokens_re" -> 0.846,
    "w1_topn_per_group" -> 1.060, "w2_running_sum" -> 0.932,
    "w3_sessionize" -> 1.132)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Force FULL materialization of every output column. A bare `count()`
      * lets Catalyst prune all computed columns (a narrow transform query
      * would benchmark as a parquet row count); the noop sink executes the
      * complete plan and discards rows. */
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // one untimed warmup: JVM/codegen/parquet-footer caches
    try run("o3_count_range") catch { case _: Throwable => () }

    // optional args = subset of query names (dev iteration); default all
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a query that threw is recorded with time-to-failure — mark it so the
    // total can't silently understate cost
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // >1.3× vs the r01 baseline (and >0.5 s absolute, so micro-query jitter
    // over a 32-thread local cluster doesn't page anyone)
    val regressions = results.collect {
      case (k, v) if baselineR01.get(k).exists(b => v > b * 1.3 && v - b > 0.5) =>
        // Locale.ROOT: a comma decimal separator would corrupt the JSON
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", v / baselineR01(k))
    }.mkString("{", ",", "}")
    // queries whose r02 semantics do strictly more work than their r01
    // baseline — a flagged ratio on these is a known trade, not a regression
    val notes = Map(
      "agg_approx" -> "r01 was approx-only rows-check; r02 adds exact countDistinct verification",
      "dedup_ngram" -> "r01 ran uncapped; r02 engages the maxDf hot-shingle cap by default",
      "dedup_ngram_keepers" -> "same df-cap trade as dedup_ngram")
      .collect { case (k, n) if regressions.contains("\"" + k + "\"") => "\"" + k + "\":\"" + n + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"regressions_vs_r01":$regressions,""" +
      s""""regression_notes":$notes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
