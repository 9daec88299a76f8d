package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-10 regression baseline: per-query MEDIAN of the three closing
    * quiet recordings (sf0.1, local[8], 160 queries each, 0 failures,
    * 0 regressions) — ALL THREE committed as BENCH_LOCAL_r10_run{1,2,3}
    * .json, so the baseline is reproducible from history (the r9 ADVICE:
    * a min over uncommitted runs was untraceable; the median resists the
    * host's documented ~±3% drift without baking in a lucky floor).
    * Median totals: 190.0 / 201.2 / 195.2 s -> 193.4 s. Flagged
    * slowdowns are re-measured TWICE before being reported (below).
    * text_fix_encoding / text_html_extract / text_entropy / dedup_cdc /
    * dedup_cdc_rewrite / pipeline_web_ingest / pack_fim /
    * curate_threshold_sweep / dedup_cdc_admit / text_boilerplate_lines /
    * clf_auc / clf_pr_curve / embed_prototypes joined mid-round-10: their
    * entries are that session's first sf0.1 recording, refreshed at the
    * closing quiet re-record. dedup_cdc_admit times a FULL index
    * lifecycle (build + partitioned write + screen), like the
    * sim_pqindex/bm25_index rows. */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 2.293, "agg_approx_pct" -> 1.800,
    "agg_hll_cube" -> 0.732, "agg_quantile_cube" -> 0.648,
    "agg_stats" -> 1.524, "asof_native" -> 0.819,
    "asof_signup" -> 1.346, "bm25_index_search" -> 6.498,
    "bm25_search" -> 0.969, "bpe_encode" -> 3.525,
    "bpe_merges" -> 0.857, "clf_train" -> 1.690,
    "clf_auc" -> 2.152, "clf_pr_curve" -> 1.503,
    "text_boilerplate_lines" -> 3.277, "embed_prototypes" -> 3.759,
    "cluster_topics" -> 3.441, "contamination_report" -> 0.858,
    "corpus_datasheet" -> 1.238, "corpus_report" -> 0.545,
    "curate_domain_cap" -> 0.522, "decontaminate" -> 0.737,
    "decontaminate_bloom" -> 0.816, "decontaminate_index" -> 1.057,
    "dedup_admit" -> 2.598, "dedup_cc_keepers" -> 3.370,
    "dedup_cc_star" -> 4.101, "dedup_closure" -> 4.029,
    "dedup_cdc" -> 1.743, "dedup_cdc_rewrite" -> 3.560, "dedup_cdc_admit" -> 5.613,
    "dedup_containment" -> 3.132, "dedup_delta" -> 1.708,
    "dedup_exact" -> 0.363, "text_entropy" -> 1.765,
    "text_fix_encoding" -> 1.112, "text_html_extract" -> 1.686, "dedup_fuzzy_verify" -> 1.166,
    "dedup_intradoc" -> 0.648, "dedup_minhash" -> 1.021,
    "dedup_ngram" -> 3.803, "dedup_ngram_keepers" -> 2.749,
    "dedup_prefix" -> 0.576, "dedup_quality_keepers" -> 4.678,
    "dedup_simhash" -> 0.270, "dedup_simhash_pairs" -> 0.920,
    "dedup_spans" -> 0.787, "dedup_spans_keepers" -> 0.846,
    "dedup_winnow_pairs" -> 1.527, "doc_chunks" -> 0.334,
    "doc_len_histogram" -> 0.352, "dsir_weights" -> 2.210,
    "embed_kmeans" -> 1.497, "embed_mmr" -> 1.570,
    "embed_neardup" -> 2.740, "embed_outliers" -> 2.473,
    "embed_pq" -> 2.065, "embed_project" -> 0.659,
    "embed_quantize" -> 0.408, "mm_decode" -> 0.385,
    "mm_decode_image" -> 0.242, "mm_decode_wav" -> 0.217,
    "mm_frames" -> 0.265, "mm_resize" -> 0.227,
    "mm_resize_image" -> 0.182, "o10_escape" -> 1.278,
    "o11_o13_route" -> 1.967, "o12_optout_dim" -> 0.642,
    "o14_format_values" -> 1.959, "o3_count_range" -> 0.152,
    "o4_o5_extract" -> 1.431, "o6_o7_anonymize" -> 0.949,
    "o8_o9_statement_json" -> 1.652, "o8_withfield" -> 1.528,
    "pack_curriculum" -> 0.519, "pack_fim" -> 1.584,
    "curate_threshold_sweep" -> 2.457, "pack_shards" -> 0.391,
    "pack_shuffled" -> 0.358, "pack_window_map" -> 0.365,
    "pack_windows" -> 0.297, "pipeline_admit" -> 1.127, "pipeline_web_ingest" -> 4.356,
    // joined mid-round-10 (second batch): first sf0.1 recording, to be
    // refreshed at the closing quiet re-record
    "curate_url_dedup" -> 1.957, "corpus_diff" -> 0.454,
    "clf_calibration" -> 1.559, "eval_rouge2" -> 2.385,
    "pack_length_buckets" -> 0.521, "privacy_k_anon" -> 0.371,
    "curate_blocklist" -> 0.690, "pack_chat_template" -> 1.253,
    "pipeline_curate" -> 4.321, "pipeline_full" -> 9.359,
    "pipeline_pack" -> 1.494, "q10_cube" -> 0.506,
    "q11_full_outer" -> 0.346, "q12_corr_subquery" -> 0.748,
    "q13_grouping_sets" -> 0.316, "q14_range_frame" -> 0.720,
    "q15_explode" -> 0.307, "q16_anti" -> 0.475,
    "q17_window_nav" -> 0.555, "q18_month_series" -> 0.480,
    "q19_sorted_collect" -> 0.302, "q1_agg" -> 0.588,
    "q20_cond_agg" -> 0.305, "q21_range_join" -> 0.561,
    "q22_map_agg" -> 0.489, "q23_corr" -> 0.335,
    "q24_null_safe" -> 0.418, "q25_array_ops" -> 0.530,
    "q26_rank_dist" -> 1.078, "q27_datetime" -> 0.410,
    "q28_regr" -> 0.428, "q29_mode" -> 0.364,
    "q30_cum_distinct" -> 0.677, "q31_variant" -> 0.697,
    "q32_lateral" -> 0.971, "q33_gapfill" -> 0.397,
    "q34_interval_merge" -> 0.770, "q35_unpivot" -> 0.380,
    "q36_try" -> 1.565, "q37_scd2" -> 0.715,
    "q38_retention" -> 0.600, "q39_funnel" -> 0.868,
    "q3_topk" -> 0.866, "q40_transitions" -> 0.747,
    "q41_twa" -> 0.737, "q42_dau" -> 0.662,
    "q5_multijoin" -> 1.016, "q6_rollup" -> 0.465,
    "q7_percentile" -> 1.943, "q8_pivot" -> 0.484,
    "q9_exists" -> 0.522, "sample_epochs" -> 0.376,
    "sample_mix" -> 0.571, "sample_per_group" -> 0.263,
    "sample_stratified" -> 0.161, "sample_temperature" -> 0.254,
    "sample_weighted" -> 0.310, "search_rrf" -> 1.077,
    "semdedup_keepers" -> 1.949, "set_except" -> 0.447,
    "set_intersect" -> 0.349, "shard_stats" -> 0.334,
    "sim_ivf_topk" -> 2.710, "sim_ivfpq_topk" -> 4.261,
    "sim_lsh_banded" -> 1.540, "sim_lsh_bucket" -> 0.653,
    "sim_pq_adc" -> 2.657, "sim_pqindex_rescored" -> 6.805,
    "sim_pqindex_topk" -> 6.417, "sim_topk" -> 0.344,
    "split_assign" -> 0.284, "split_leakage" -> 2.080,
    "text_card_redact" -> 0.339, "text_clf_score" -> 0.943,
    "text_cms_topk" -> 0.629, "text_collocations" -> 0.954,
    "text_fingerprint" -> 0.181, "text_gopher_gates" -> 0.627,
    "text_hash_vec" -> 0.645, "text_kn_heldout" -> 1.574,
    "text_kn_score" -> 1.659, "text_langid" -> 0.215,
    "text_lm_score" -> 1.378, "text_novelty" -> 0.950,
    "text_pii_redact" -> 0.290, "text_quality" -> 0.402,
    "text_quality_calibrated" -> 0.755, "text_repetition" -> 1.049,
    "text_tok_freq" -> 0.543, "text_tokens" -> 0.334,
    "text_tokens_re" -> 0.692, "text_top_tokens" -> 0.172,
    "text_winnow" -> 0.393, "tfidf_top_terms" -> 1.023,
    "w1_topn_per_group" -> 0.604, "w2_running_sum" -> 0.511,
    "w3_sessionize" -> 0.722, "w4_ntile" -> 0.795)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — the scale
    // probe runs the heavy tier on local-cluster[W,C,M] (separate
    // executor JVMs: real serialization + loopback shuffle, the half of
    // the 100× story a saturated local[N] cannot show). Executor JVMs
    // need this repo's classes shipped: SPARK_GRAFT_JARS=<path to
    // `sbt package` jar>.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val builder1 = sys.env.get("SPARK_GRAFT_JARS")
      .fold(builder0)(j => builder0.config("spark.jars", j))
    val spark = sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .fold(builder1)(m => builder1.config("spark.executor.memory", m))
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
    val pqTrade = "deliberate r11 trade: PQ geometry moved 8x8 -> 32x2 " +
      "subspaces after the measured recall curve (tools.RecallCurve, " +
      "SCALING.md r11) showed raw ADC recall@5 is quantization-limited at " +
      "8x8 (~0.20, flat in nprobe) and crosses the 0.5 bar only at 32x2 " +
      "(0.58-0.68 at sf0.1); the ADC join/pivot now carries 4x the code " +
      "rows per candidate"
    // r11 triage of the r10 closing-bench flags on these three: HOST, not
    // plan — the driver's closing run and the committed quiet medians ran
    // the SAME commit (identical binary), and the matched cold-subset A/B
    // (r10 snapshot vs r11 HEAD, 3 fresh JVMs each) measured <5% deltas
    // with the dedup_exact control at the committed floor. SCALING.md r11.
    val r10TrioTriage = "r10 closing flag triaged as HOST drift (SCALING.md " +
      "r11 trio triage): closing run and committed quiet medians ran the " +
      "same commit; matched cold-subset A/B r10-vs-r11 deltas <5%"
    val knownTrades = Map(
      "embed_pq" -> pqTrade,
      "sim_pq_adc" -> pqTrade,
      "sim_pqindex_rescored" -> pqTrade,
      "sim_ivf_topk" -> ("coarse quantizer is now TRAINED (3-round spherical Lloyd) " +
        "instead of an every-Nth pick: +2 corpus passes at index build for recall@10 " +
        "0.658 vs 0.544 at identical candidate cost (IvfRecallSpec/SCALING.md)"),
      "sim_ivfpq_topk" -> ("trained coarse quantizer (see sim_ivf_topk) AND " + pqTrade),
      "sim_pqindex_topk" -> ("times a FULL index lifecycle per run (train + " +
        "partitioned-parquet write + pruned probe) — serving cost is the probe " +
        "alone; the build amortizes over queries (PqIndexSpec/SCALING.md); ALSO " + pqTrade),
      "bm25_index_search" -> ("times a FULL index lifecycle per run (postings " +
        "build + 64-bucket write + pruned probe) — serving cost is the probe " +
        "alone; the build amortizes over queries (SearchIndexSpec/SCALING.md)"),
      "dedup_minhash" -> ("host drift, not a plan change: git-stash A/B mid-r10 " +
        "measured 1.39 s on the SAME committed code that recorded the 1.02 s " +
        "baseline median (dedup_exact drifted 2.0x alongside on both sides of " +
        "the stash); SCALING.md r10 drift note"),
      "pipeline_full" -> r10TrioTriage,
      "clf_train" -> r10TrioTriage,
      "text_lm_score" -> r10TrioTriage)
    val notes = results.collect {
      case (k, v) if regressed(k, v) && knownTrades.contains(k) =>
        "\"" + k + "\":\"" + knownTrades(k) + "\""
    }.mkString("{", ",", "}")
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    // Build/serve split for the index-lifecycle queries (VERDICT r10 #6):
    // their `results` rows above time the full lifecycle and remain the
    // regression-gated truth; this extra pass separates build (train +
    // partitioned index write) from serve (the pruned probe), so a future
    // regression on one of these rows localizes immediately. Additive
    // info — deliberately NOT part of `value`.
    val indexSplit = graft.queries.AnalyticsQueries.indexLifecycles.toSeq
      .filter { case (name, _) => names.contains(name) } // skip on dev subsets
      .sortBy(_._1).flatMap { case (name, mk) =>
        try {
          val (build, serve) = mk(spark, sfDir)
          val t0 = System.nanoTime(); build()
          val tb = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          serve().write.format("noop").mode("overwrite").save()
          val ts = (System.nanoTime() - t1) / 1e9
          Some(name -> ((tb, ts)))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] index_split $name FAILED: ${e.getMessage}")
          None
        }
      }
    val splitJson = indexSplit.map { case (k, (b, s)) =>
      "\"" + k + "\":{\"build\":" + f3(b) + ",\"serve\":" + f3(s) + "}"
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"reran":$reranJson,"regressions_vs_prev":$regressions,""" +
      s""""regression_notes":$notes,"index_split":$splitJson,"sf":"$sfDir"}"""
    // The FULL per-query map (~4 KB for 180 queries) goes to a FILE, never
    // to stdout: the harness that records BENCH_r{N}.json keeps only the
    // LAST 2000 chars of stdout and json-parses what it finds there, so a
    // 4 KB line can never fit (r06–r10 shipped "parsed": null). Default
    // path keeps the artifact discoverable without env plumbing.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full_map.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), line + "\n"): Unit
    // Exactly ONE JSON object on stdout, as the FINAL line of the process
    // (after spark.stop(), so no shutdown chatter can follow it on stdout;
    // build.sbt sets `run / outputStrategy := StdoutOutput` so sbt does not
    // prepend "[info] ", and suppresses the trailing "[success] Total time"
    // line). The harness keeps only the LAST 2000 chars of stdout and
    // json-parses what it finds there, so the compact line must FIT that
    // window (VERDICT r11 #3 — the r11 line embedded ~420-char note BODIES
    // and overflowed it). Budget: note KEYS only (bodies live in the full
    // map), 10 slowest, and a hard <1500-char guard that degrades to a
    // minimal line rather than ever overflowing.
    val noteKeys = results.collect {
      case (k, v) if regressed(k, v) && knownTrades.contains(k) => k
    }.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val top = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val compactFull = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""regressions_vs_prev":$regressions,"regression_note_keys":$noteKeys,""" +
      s""""index_split":$splitJson,"slowest":$top,"full_map":"$fullPath","sf":"$sfDir"}"""
    val nRegressed = results.count { case (k, v) => regressed(k, v) }
    val compactMin = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""n_regressions":$nRegressed,"full_map":"$fullPath","sf":"$sfDir"}"""
    val compact = if (compactFull.length < 1500) compactFull else compactMin
    require(compact.length < 1500,
      s"bench compact line ${compact.length} chars — would overflow the 2000-char tail")
    spark.stop()
    println(compact)
    System.out.flush()
  }
}
