package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-8 FINAL per-query seconds (sf0.1, local[8], quiet box — no
    * concurrent sbt/test JVMs; 142 queries, 0 failures, 0 regressions,
    * 2 transient reruns; full artifact committed as BENCH_LOCAL_r08.json)
    * — the regression baseline for round 9, re-recorded on the regenerated
    * testdata (us-NTZ events). Flagged slowdowns are re-measured TWICE
    * before being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 4.505, "agg_approx_pct" -> 2.599,
    "agg_hll_cube" -> 1.641, "agg_quantile_cube" -> 1.504,
    "agg_stats" -> 1.525, "asof_native" -> 0.887,
    "asof_signup" -> 1.417, "bm25_index_search" -> 6.792,
    "bm25_search" -> 1.085, "bpe_encode" -> 5.240,
    "bpe_merges" -> 1.014, "clf_train" -> 2.592,
    "cluster_topics" -> 4.099, "contamination_report" -> 1.128,
    "corpus_report" -> 0.721, "decontaminate" -> 0.924,
    "decontaminate_bloom" -> 0.877, "decontaminate_index" -> 1.144,
    "dedup_admit" -> 3.100, "dedup_cc_keepers" -> 4.491,
    "dedup_cc_star" -> 4.589, "dedup_closure" -> 3.843,
    "dedup_containment" -> 2.982, "dedup_delta" -> 1.845,
    "dedup_exact" -> 0.366, "dedup_fuzzy_verify" -> 1.193,
    "dedup_minhash" -> 1.099, "dedup_ngram" -> 4.033,
    "dedup_ngram_keepers" -> 3.088, "dedup_prefix" -> 0.568,
    "dedup_quality_keepers" -> 4.967, "dedup_simhash" -> 0.355,
    "dedup_simhash_pairs" -> 0.938, "dedup_spans" -> 1.221,
    "dedup_spans_keepers" -> 1.133, "dedup_winnow_pairs" -> 1.886,
    "doc_chunks" -> 0.431, "doc_len_histogram" -> 0.411,
    "dsir_weights" -> 2.236, "embed_kmeans" -> 1.936,
    "embed_neardup" -> 3.051, "embed_outliers" -> 2.153,
    "embed_pq" -> 2.081, "embed_project" -> 0.660,
    "embed_quantize" -> 0.431, "mm_decode" -> 0.416,
    "mm_frames" -> 0.267, "mm_resize" -> 0.249,
    "o10_escape" -> 1.451, "o11_o13_route" -> 2.194,
    "o12_optout_dim" -> 0.764, "o14_format_values" -> 2.307,
    "o3_count_range" -> 0.159, "o4_o5_extract" -> 1.815,
    "o6_o7_anonymize" -> 0.853, "o8_o9_statement_json" -> 1.422,
    "o8_withfield" -> 1.645, "pack_shards" -> 0.452,
    "pack_shuffled" -> 0.393, "pack_window_map" -> 0.352,
    "pack_windows" -> 0.294, "pipeline_curate" -> 4.340,
    "pipeline_full" -> 8.389, "pipeline_pack" -> 1.288,
    "q10_cube" -> 0.457, "q11_full_outer" -> 0.401,
    "q12_corr_subquery" -> 0.649, "q13_grouping_sets" -> 0.280,
    "q14_range_frame" -> 0.680, "q15_explode" -> 0.373,
    "q16_anti" -> 0.478, "q17_window_nav" -> 0.616,
    "q18_month_series" -> 0.490, "q19_sorted_collect" -> 0.325,
    "q1_agg" -> 0.499, "q20_cond_agg" -> 0.327,
    "q21_range_join" -> 0.592, "q22_map_agg" -> 0.413,
    "q23_corr" -> 0.458, "q24_null_safe" -> 0.444,
    "q25_array_ops" -> 0.612, "q26_rank_dist" -> 1.051,
    "q27_datetime" -> 0.371, "q28_regr" -> 0.431,
    "q29_mode" -> 0.407, "q30_cum_distinct" -> 0.681,
    "q31_variant" -> 0.649, "q32_lateral" -> 0.942,
    "q33_gapfill" -> 0.398, "q34_interval_merge" -> 0.876,
    "q35_unpivot" -> 0.326, "q36_try" -> 1.601,
    "q3_topk" -> 0.768, "q5_multijoin" -> 1.023,
    "q6_rollup" -> 0.501, "q7_percentile" -> 1.989,
    "q8_pivot" -> 0.464, "q9_exists" -> 0.445,
    "sample_epochs" -> 0.501, "sample_mix" -> 0.549,
    "sample_per_group" -> 0.321, "sample_stratified" -> 0.180,
    "sample_temperature" -> 0.274, "sample_weighted" -> 0.340,
    "search_rrf" -> 1.307, "semdedup_keepers" -> 2.044,
    "set_except" -> 0.403, "set_intersect" -> 0.334,
    "shard_stats" -> 0.303, "sim_ivf_topk" -> 2.707,
    "sim_ivfpq_topk" -> 4.484, "sim_lsh_banded" -> 1.663,
    "sim_lsh_bucket" -> 0.672, "sim_pq_adc" -> 3.042,
    "sim_pqindex_topk" -> 7.339, "sim_topk" -> 0.486,
    "split_assign" -> 0.357, "text_card_redact" -> 0.354,
    "text_clf_score" -> 0.941, "text_cms_topk" -> 0.816,
    "text_collocations" -> 1.293, "text_fingerprint" -> 0.194,
    "text_gopher_gates" -> 0.652, "text_hash_vec" -> 0.697,
    "text_kn_heldout" -> 1.788, "text_kn_score" -> 1.713,
    "text_langid" -> 0.256, "text_lm_score" -> 1.312,
    "text_pii_redact" -> 0.319, "text_quality" -> 0.416,
    "text_quality_calibrated" -> 0.730, "text_repetition" -> 1.220,
    "text_tok_freq" -> 0.575, "text_tokens" -> 0.388,
    "text_tokens_re" -> 0.649, "text_top_tokens" -> 0.175,
    "text_winnow" -> 0.363, "tfidf_top_terms" -> 1.143,
    "w1_topn_per_group" -> 0.633, "w2_running_sum" -> 0.537,
    "w3_sessionize" -> 0.725, "w4_ntile" -> 0.761,
    // appended from a quiet subset recording (cold-start conservative):
    // the four queries added after the full round-8 recording above
    "q37_scd2" -> 2.744, "q38_retention" -> 2.209,
    "q39_funnel" -> 2.119, "text_novelty" -> 1.685)

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
    def regressed(k: String, v: Double): Boolean =
      baselinePrev.get(k).exists(b => v > b * 1.3 && v - b > 0.5)
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
