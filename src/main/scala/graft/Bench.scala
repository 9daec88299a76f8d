package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-3 per-query seconds (sf0.1, local[32], uncontended box) — the
    * regression baseline for the next round. The map is this round's full
    * clean local recording; flagged slowdowns are re-measured once before
    * being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 4.649, "agg_stats" -> 1.452,
    "asof_signup" -> 2.148, "bm25_search" -> 1.492,
    "decontaminate" -> 1.202, "dedup_cc_keepers" -> 6.954,
    "dedup_exact" -> 0.427, "dedup_fuzzy_verify" -> 1.479,
    "dedup_minhash" -> 1.782, "dedup_ngram" -> 3.896,
    "dedup_ngram_keepers" -> 2.863, "dedup_simhash" -> 0.369,
    "dedup_simhash_pairs" -> 1.103, "doc_chunks" -> 0.474,
    "doc_len_histogram" -> 0.385, "embed_kmeans" -> 2.225,
    "embed_neardup" -> 3.595, "mm_decode" -> 0.549,
    "mm_frames" -> 0.424, "mm_resize" -> 0.344, "o10_escape" -> 1.951,
    "o11_o13_route" -> 2.824, "o12_optout_dim" -> 0.784,
    "o14_format_values" -> 2.591, "o3_count_range" -> 0.214,
    "o4_o5_extract" -> 1.618, "o6_o7_anonymize" -> 1.316,
    "o8_o9_statement_json" -> 1.629, "o8_withfield" -> 2.083,
    "pipeline_curate" -> 4.698, "q10_cube" -> 0.546,
    "q11_full_outer" -> 0.445, "q12_corr_subquery" -> 0.788,
    "q13_grouping_sets" -> 0.301, "q14_range_frame" -> 0.851,
    "q15_explode" -> 0.389, "q16_anti" -> 0.775,
    "q17_window_nav" -> 0.887, "q18_month_series" -> 0.537,
    "q19_sorted_collect" -> 0.437, "q1_agg" -> 0.526,
    "q20_cond_agg" -> 0.364, "q21_range_join" -> 1.131,
    "q22_map_agg" -> 0.543, "q23_corr" -> 0.42,
    "q24_null_safe" -> 0.466, "q3_topk" -> 0.85,
    "q5_multijoin" -> 1.135, "q6_rollup" -> 0.62,
    "q7_percentile" -> 2.243, "q8_pivot" -> 0.531,
    "q9_exists" -> 0.564, "sample_per_group" -> 0.353,
    "sample_stratified" -> 0.216, "sample_weighted" -> 0.406,
    "set_except" -> 0.612, "set_intersect" -> 0.432,
    "shard_stats" -> 0.34, "sim_ivf_topk" -> 0.897,
    "sim_lsh_banded" -> 1.92, "sim_lsh_bucket" -> 1.009,
    "sim_topk" -> 0.47, "split_assign" -> 0.401,
    "text_card_redact" -> 0.477, "text_fingerprint" -> 0.218,
    "text_langid" -> 0.349, "text_pii_redact" -> 0.53,
    "text_quality" -> 0.616, "text_repetition" -> 1.546,
    "text_tok_freq" -> 0.709, "text_tokens" -> 0.438,
    "text_tokens_re" -> 0.847, "text_top_tokens" -> 0.245,
    "tfidf_top_terms" -> 1.402, "w1_topn_per_group" -> 0.858,
    "w2_running_sum" -> 0.775, "w3_sessionize" -> 0.928,
    "w4_ntile" -> 0.919)

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
    /** One timed run: (seconds, succeeded). */
    def timeOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { run(name); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val firstPass = names.map { name =>
      val (t, ok) = timeOnce(name)
      if (!ok) failed ::= name
      name -> t
    }
    def regressed(k: String, v: Double): Boolean =
      baselinePrev.get(k).exists(b => v > b * 1.3 && v - b > 0.5)
    // Re-measure any flagged outlier once and keep the min: a transient
    // burst of contention on the bench box (observed in the driver's r02
    // recording — 25 s for a query that re-measures at 1.7 s on the same
    // commit) must not masquerade as a code regression. A real regression
    // reproduces on the immediate re-run; the reruns are listed so the
    // re-measurement is visible in the output. A rerun that THROWS is
    // discarded outright — it must neither mark the (successful) query
    // failed nor contribute its time-to-failure as a fake fast min.
    var reran = List.empty[String]
    val results = firstPass.map { case (k, v) =>
      if (regressed(k, v) && !failed.contains(k)) {
        reran ::= k
        val (t2, ok2) = timeOnce(k)
        k -> (if (ok2) math.min(v, t2) else v)
      } else k -> v
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a query that threw is recorded with time-to-failure — mark it so the
    // total can't silently understate cost
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val reranJson = reran.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // >1.3× vs the previous round's baseline (and >0.5 s absolute, so
    // micro-query jitter over a 32-thread local cluster doesn't page anyone)
    val regressions = results.collect {
      case (k, v) if regressed(k, v) =>
        // Locale.ROOT: a comma decimal separator would corrupt the JSON
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", v / baselinePrev(k))
    }.mkString("{", ",", "}")
    // regression_notes: kept in the schema for the driver's reader; no
    // known-trade annotations are active this round
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"reran":$reranJson,"regressions_vs_prev":$regressions,""" +
      s""""regression_notes":{},"sf":"$sfDir"}""")
    spark.stop()
  }
}
