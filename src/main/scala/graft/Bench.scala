package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-8 FINAL per-query seconds (sf0.1, local[8], quiet box — no
    * concurrent sbt/test JVMs; ALL 149 queries, 0 failures, 0 regressions,
    * 2 transient reruns; full artifact committed as BENCH_LOCAL_r08.json)
    * — the regression baseline for round 9, recorded on the regenerated
    * testdata (us-NTZ events). Flagged slowdowns are re-measured TWICE
    * before being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 5.138, "agg_approx_pct" -> 2.380,
    "agg_hll_cube" -> 1.724, "agg_quantile_cube" -> 1.474,
    "agg_stats" -> 1.449, "asof_native" -> 0.921,
    "asof_signup" -> 1.153, "bm25_index_search" -> 5.963,
    "bm25_search" -> 0.904, "bpe_encode" -> 4.106,
    "bpe_merges" -> 0.948, "clf_train" -> 2.368,
    "cluster_topics" -> 3.639, "contamination_report" -> 0.972,
    "corpus_report" -> 0.568, "decontaminate" -> 0.800,
    "decontaminate_bloom" -> 0.980, "decontaminate_index" -> 1.488,
    "dedup_admit" -> 3.307, "dedup_cc_keepers" -> 4.077,
    "dedup_cc_star" -> 4.525, "dedup_closure" -> 4.973,
    "dedup_containment" -> 3.211, "dedup_delta" -> 1.724,
    "dedup_exact" -> 0.303, "dedup_fuzzy_verify" -> 1.113,
    "dedup_minhash" -> 0.934, "dedup_ngram" -> 3.416,
    "dedup_ngram_keepers" -> 2.631, "dedup_prefix" -> 0.583,
    "dedup_quality_keepers" -> 4.162, "dedup_simhash" -> 0.348,
    "dedup_simhash_pairs" -> 1.248, "dedup_spans" -> 0.996,
    "dedup_spans_keepers" -> 1.114, "dedup_winnow_pairs" -> 1.700,
    "doc_chunks" -> 0.384, "doc_len_histogram" -> 0.353,
    "dsir_weights" -> 2.181, "embed_kmeans" -> 1.583,
    "embed_neardup" -> 3.097, "embed_outliers" -> 2.240,
    "embed_pq" -> 1.875, "embed_project" -> 0.685,
    "embed_quantize" -> 0.389, "mm_decode" -> 0.458,
    "mm_frames" -> 0.250, "mm_resize" -> 0.226,
    "o10_escape" -> 1.570, "o11_o13_route" -> 2.081,
    "o12_optout_dim" -> 0.607, "o14_format_values" -> 1.841,
    "o3_count_range" -> 0.206, "o4_o5_extract" -> 1.200,
    "o6_o7_anonymize" -> 0.813, "o8_o9_statement_json" -> 1.640,
    "o8_withfield" -> 1.988, "pack_curriculum" -> 0.661,
    "pack_shards" -> 0.477, "pack_shuffled" -> 0.426,
    "pack_window_map" -> 0.407, "pack_windows" -> 0.325,
    "pipeline_curate" -> 4.723, "pipeline_full" -> 7.873,
    "pipeline_pack" -> 1.119, "q10_cube" -> 0.430,
    "q11_full_outer" -> 0.413, "q12_corr_subquery" -> 0.632,
    "q13_grouping_sets" -> 0.280, "q14_range_frame" -> 0.669,
    "q15_explode" -> 0.304, "q16_anti" -> 0.484,
    "q17_window_nav" -> 0.568, "q18_month_series" -> 0.400,
    "q19_sorted_collect" -> 0.415, "q1_agg" -> 0.470,
    "q20_cond_agg" -> 0.311, "q21_range_join" -> 0.552,
    "q22_map_agg" -> 0.360, "q23_corr" -> 0.362,
    "q24_null_safe" -> 0.463, "q25_array_ops" -> 0.597,
    "q26_rank_dist" -> 1.197, "q27_datetime" -> 0.383,
    "q28_regr" -> 0.412, "q29_mode" -> 0.417,
    "q30_cum_distinct" -> 0.749, "q31_variant" -> 0.624,
    "q32_lateral" -> 1.063, "q33_gapfill" -> 0.594,
    "q34_interval_merge" -> 0.857, "q35_unpivot" -> 0.444,
    "q36_try" -> 1.892, "q37_scd2" -> 0.806,
    "q38_retention" -> 0.788, "q39_funnel" -> 1.147,
    "q3_topk" -> 0.747, "q40_transitions" -> 0.869,
    "q41_twa" -> 0.703, "q5_multijoin" -> 0.934,
    "q6_rollup" -> 0.447, "q7_percentile" -> 1.897,
    "q8_pivot" -> 0.407, "q9_exists" -> 0.476,
    "sample_epochs" -> 0.504, "sample_mix" -> 0.524,
    "sample_per_group" -> 0.253, "sample_stratified" -> 0.163,
    "sample_temperature" -> 0.251, "sample_weighted" -> 0.334,
    "search_rrf" -> 1.087, "semdedup_keepers" -> 1.999,
    "set_except" -> 0.438, "set_intersect" -> 0.328,
    "shard_stats" -> 0.316, "sim_ivf_topk" -> 3.162,
    "sim_ivfpq_topk" -> 4.035, "sim_lsh_banded" -> 1.500,
    "sim_lsh_bucket" -> 0.707, "sim_pq_adc" -> 2.531,
    "sim_pqindex_topk" -> 6.409, "sim_topk" -> 0.370,
    "split_assign" -> 0.306, "text_card_redact" -> 0.340,
    "text_clf_score" -> 0.889, "text_cms_topk" -> 0.646,
    "text_collocations" -> 0.948, "text_fingerprint" -> 0.193,
    "text_gopher_gates" -> 0.695, "text_hash_vec" -> 0.747,
    "text_kn_heldout" -> 1.818, "text_kn_score" -> 2.175,
    "text_langid" -> 0.345, "text_lm_score" -> 1.667,
    "text_novelty" -> 1.128, "text_pii_redact" -> 0.359,
    "text_quality" -> 0.524, "text_quality_calibrated" -> 0.892,
    "text_repetition" -> 1.265, "text_tok_freq" -> 0.597,
    "text_tokens" -> 0.420, "text_tokens_re" -> 0.716,
    "text_top_tokens" -> 0.208, "text_winnow" -> 0.419,
    "tfidf_top_terms" -> 1.302, "w1_topn_per_group" -> 0.748,
    "w2_running_sum" -> 0.583, "w3_sessionize" -> 0.847,
    "w4_ntile" -> 0.815,
    // quiet subset recording (cold-start conservative), added after the
    // full round-8 recording above
    "q42_dau" -> 2.581)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pin: Tables.events reinterprets NTZ wall-clock as session-TZ
      // instant; without this, epoch math would drift on a non-UTC host.
      .config("spark.sql.session.timeZone", "UTC")
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
    // The baseline (and thus the rerun/regression protocol) is only
    // meaningful on the sf0.1 recording box; scale probes at other SFs set
    // this to skip re-measurement — there every heavy query trips the
    // sf0.1 thresholds by design and the reruns would triple the run.
    val noRerun = sys.env.contains("SPARK_GRAFT_NO_RERUN")
    def regressed(k: String, v: Double): Boolean =
      !noRerun && baselinePrev.get(k).exists(b => v > b * 1.3 && v - b > 0.5)
    // Re-measure any flagged outlier up to TWICE and keep the min: a
    // transient burst of contention on the bench box (observed in the
    // driver's r02 recording — 25 s for a query that re-measures at 1.7 s
    // on the same commit; r06's whole run was ~2.8× a clean rerun of the
    // identical binary) must not masquerade as a code regression. A real
    // regression reproduces on BOTH immediate re-runs; reruns are listed so
    // the re-measurement is visible in the output. A rerun that THROWS is
    // discarded outright — it must neither mark the (successful) query
    // failed nor contribute its time-to-failure as a fake fast min.
    var reran = List.empty[String]
    val results = firstPass.map { case (k, v) =>
      var best = v
      var tries = 0
      while (regressed(k, best) && !failed.contains(k) && tries < 2) {
        if (tries == 0) reran ::= k
        val (t2, ok2) = timeOnce(k)
        if (ok2) best = math.min(best, t2)
        tries += 1
      }
      k -> best
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
    // Known-trade annotations: when a flagged query's slowdown is a
    // DELIBERATE trade shipped this round, say so in the artifact instead
    // of leaving an untriaged flag (the round-5/6 process bug). Unknown
    // flags stay unannotated — that absence IS the page.
    val knownTrades = Map(
      "sim_ivf_topk" -> ("coarse quantizer is now TRAINED (3-round spherical Lloyd) " +
        "instead of an every-Nth pick: +2 corpus passes at index build for recall@10 " +
        "0.658 vs 0.544 at identical candidate cost (IvfRecallSpec/SCALING.md)"),
      "sim_ivfpq_topk" -> ("same trained coarse quantizer as sim_ivf_topk; " +
        "see IvfRecallSpec/SCALING.md"),
      "sim_pqindex_topk" -> ("times a FULL index lifecycle per run (train + " +
        "partitioned-parquet write + pruned probe) — serving cost is the probe " +
        "alone; the build amortizes over queries (PqIndexSpec/SCALING.md)"),
      "bm25_index_search" -> ("times a FULL index lifecycle per run (postings " +
        "build + 64-bucket write + pruned probe) — serving cost is the probe " +
        "alone; the build amortizes over queries (SearchIndexSpec/SCALING.md)"))
    val notes = results.collect {
      case (k, v) if regressed(k, v) && knownTrades.contains(k) =>
        "\"" + k + "\":\"" + knownTrades(k) + "\""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"reran":$reranJson,"regressions_vs_prev":$regressions,""" +
      s""""regression_notes":$notes,"sf":"$sfDir"}"""
    println(line)
    // durable copy of the FULL per-query map: a consumer that truncates
    // stdout still has the structured artifact on disk
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"): Unit
    }
    spark.stop()
  }
}
