package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-4 per-query seconds (sf0.1, local[8], uncontended box) — the
    * regression baseline for the next round. The map is this round's full
    * clean local recording; flagged slowdowns are re-measured once before
    * being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 4.477, "agg_approx_pct" -> 2.350,
    "agg_stats" -> 1.567,
    "text_gopher_gates" -> 0.645, "text_winnow" -> 1.242,
    "dedup_spans" -> 0.800, "dedup_winnow_pairs" -> 3.003,
    "semdedup_keepers" -> 6.108, "dedup_spans_keepers" -> 3.077,
    "text_clf_score" -> 1.878, "sample_epochs" -> 1.593,
    "q35_unpivot" -> 0.380, "q36_try" -> 1.830,
    "asof_native" -> 1.758, "asof_signup" -> 1.537,
    "bm25_search" -> 1.321, "decontaminate" -> 1.127,
    "dedup_cc_keepers" -> 6.331, "dedup_closure" -> 4.200, "dedup_containment" -> 3.056,
    "dedup_exact" -> 0.370, "dedup_fuzzy_verify" -> 1.372,
    "dedup_minhash" -> 1.441, "dedup_ngram" -> 3.336,
    "dedup_ngram_keepers" -> 3.105, "dedup_prefix" -> 0.644,
    "dedup_simhash" -> 0.320, "dedup_simhash_pairs" -> 1.023,
    "doc_chunks" -> 0.430, "doc_len_histogram" -> 0.314,
    "embed_kmeans" -> 1.981, "embed_neardup" -> 3.214,
    "embed_pq" -> 2.382, "embed_quantize" -> 0.650,
    "mm_decode" -> 0.420, "mm_frames" -> 0.304,
    "mm_resize" -> 0.261, "o10_escape" -> 1.459,
    "o11_o13_route" -> 2.746, "o12_optout_dim" -> 0.641,
    "o14_format_values" -> 2.047, "o3_count_range" -> 0.148,
    "o4_o5_extract" -> 1.225, "o6_o7_anonymize" -> 1.159,
    "o8_o9_statement_json" -> 1.657, "o8_withfield" -> 1.710,
    "pipeline_curate" -> 4.617, "q10_cube" -> 0.518,
    "q11_full_outer" -> 0.454, "q12_corr_subquery" -> 0.756,
    "q13_grouping_sets" -> 0.315, "q14_range_frame" -> 0.997,
    "q15_explode" -> 0.319, "q16_anti" -> 0.566,
    "q17_window_nav" -> 0.596, "q18_month_series" -> 0.460,
    "q19_sorted_collect" -> 0.355, "q1_agg" -> 0.482,
    "q20_cond_agg" -> 0.307, "q21_range_join" -> 0.573,
    "q22_map_agg" -> 0.465, "q23_corr" -> 0.470,
    "q24_null_safe" -> 0.440, "q25_array_ops" -> 0.595,
    "q26_rank_dist" -> 1.034, "q27_datetime" -> 0.354,
    "q28_regr" -> 0.422, "q29_mode" -> 0.416,
    "q30_cum_distinct" -> 0.671, "q31_variant" -> 0.650,
    "q32_lateral" -> 1.069, "q33_gapfill" -> 0.422,
    "q34_interval_merge" -> 0.848, "q3_topk" -> 0.778,
    "q5_multijoin" -> 1.157, "q6_rollup" -> 0.557,
    "q7_percentile" -> 2.016, "q8_pivot" -> 0.451,
    "q9_exists" -> 0.477, "sample_per_group" -> 0.298,
    "sample_stratified" -> 0.196, "sample_temperature" -> 0.392,
    "sample_weighted" -> 0.350, "set_except" -> 0.402,
    "set_intersect" -> 0.354, "shard_stats" -> 0.318,
    "sim_ivf_topk" -> 0.870, "sim_ivfpq_topk" -> 5.428,
    "sim_lsh_banded" -> 1.755, "sim_lsh_bucket" -> 0.719,
    "sim_pq_adc" -> 5.109, "sim_topk" -> 0.423,
    "split_assign" -> 0.349, "text_card_redact" -> 0.381,
    "text_fingerprint" -> 0.174, "text_hash_vec" -> 0.699,
    "text_langid" -> 0.283, "text_lm_score" -> 1.824,
    "text_pii_redact" -> 0.452, "text_quality" -> 0.568,
    "text_repetition" -> 1.756, "text_tok_freq" -> 0.568,
    "text_tokens" -> 0.397, "text_tokens_re" -> 0.845,
    "text_top_tokens" -> 0.200, "tfidf_top_terms" -> 1.311,
    "w1_topn_per_group" -> 0.711, "w2_running_sum" -> 0.602,
    "w3_sessionize" -> 0.836, "w4_ntile" -> 0.850)

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
