package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-14 regression baseline: per-query MEDIAN of the three closing
    * quiet recordings (sf0.1, local[8], 186 queries each, 0 failures, 0
    * regression flags vs the r13 baseline in each run) — ALL THREE
    * committed as BENCH_LOCAL_r14_run{1,2,3}.json, so the baseline is
    * reproducible from history. Run totals: 252.4 / 250.1 / 255.7 s ->
    * per-query-median sum 248.4 s (BENCH_LOCAL_r14.json; r13 was 260.5).
    * The r14 storage additions (SearchIndex forward/ store, PqIndex
    * vlists/ sidecar — the O(|ids|) RTBF legs) are baked into the
    * index-lifecycle rows. `bm25_mlt` joined after the full-suite
    * recording: its median comes from three dedicated fresh-JVM subset
    * runs at the same commit class (12.98/11.10/10.33 s — a full index
    * lifecycle like its bm25_index_* siblings); `bm25_mlt_batch` likewise
    * (11.41/11.90/10.39 s). Flagged slowdowns are re-measured TWICE
    * before being reported (below).
    * sim_pqindex_* / bm25_index_* / dedup_cdc_admit / cdc_index_forget /
    * sim_pq_adc time a FULL index lifecycle per run (train/build +
    * partitioned write + probe) — the build/serve split is emitted
    * separately as `index_split`. */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 2.215, "agg_approx_pct" -> 2.397,
    "agg_hll_cube" -> 0.632, "agg_quantile_cube" -> 1.183,
    "agg_stats" -> 1.467, "asof_native" -> 0.985,
    "asof_signup" -> 1.188, "bm25_index_forget" -> 9.275,
    "bm25_index_search" -> 6.099, "bm25_mlt" -> 11.099,
    "bm25_mlt_batch" -> 11.414,
    "bm25_search" -> 0.724,
    "bpe_encode" -> 4.218, "bpe_merges" -> 0.834,
    "cdc_index_forget" -> 3.856, "clf_auc" -> 1.360,
    "clf_calibration" -> 1.240, "clf_pr_curve" -> 0.946,
    "clf_train" -> 2.056, "cluster_topics" -> 2.887,
    "contamination_report" -> 0.852, "corpus_datasheet" -> 1.003,
    "corpus_diff" -> 0.365, "corpus_report" -> 0.424,
    "curate_blocklist" -> 0.567, "curate_domain_cap" -> 0.442,
    "curate_threshold_sweep" -> 0.793, "curate_url_dedup" -> 1.340,
    "decontaminate" -> 0.610, "decontaminate_bloom" -> 0.663,
    "decontaminate_index" -> 0.887, "dedup_admit" -> 3.381,
    "dedup_cc_keepers" -> 3.598, "dedup_cc_star" -> 3.685,
    "dedup_cdc" -> 1.217, "dedup_cdc_admit" -> 2.749,
    "dedup_cdc_rewrite" -> 1.519, "dedup_closure" -> 4.007,
    "dedup_containment" -> 2.991, "dedup_delta" -> 2.676,
    "dedup_exact" -> 0.296, "dedup_fuzzy_verify" -> 1.089,
    "dedup_index_forget" -> 2.754, "dedup_intradoc" -> 0.615,
    "dedup_minhash" -> 0.991, "dedup_ngram" -> 3.367,
    "dedup_ngram_keepers" -> 2.879, "dedup_prefix" -> 0.566,
    "dedup_quality_keepers" -> 4.463, "dedup_simhash" -> 0.261,
    "dedup_simhash_pairs" -> 0.893, "dedup_spans" -> 0.816,
    "dedup_spans_keepers" -> 0.814, "dedup_winnow_pairs" -> 1.588,
    "doc_chunks" -> 0.366, "doc_len_histogram" -> 0.315,
    "dsir_weights" -> 2.068, "embed_kmeans" -> 1.415,
    "embed_mmr" -> 1.652, "embed_neardup" -> 2.763,
    "embed_outliers" -> 2.293, "embed_pq" -> 0.471,
    "embed_project" -> 0.697, "embed_prototypes" -> 1.849,
    "embed_quantize" -> 0.379, "eval_rouge2" -> 1.939,
    "mm_decode" -> 0.370, "mm_decode_image" -> 0.212,
    "mm_decode_wav" -> 0.204, "mm_frames" -> 0.242,
    "mm_resize" -> 0.203, "mm_resize_image" -> 0.169,
    "o10_escape" -> 1.347, "o11_o13_route" -> 1.953,
    "o12_optout_dim" -> 0.712, "o14_format_values" -> 2.067,
    "o3_count_range" -> 0.174, "o4_o5_extract" -> 1.228,
    "o6_o7_anonymize" -> 0.833, "o8_o9_statement_json" -> 1.572,
    "o8_withfield" -> 1.810, "pack_chat_template" -> 0.929,
    "pack_curriculum" -> 0.482, "pack_fim" -> 0.385,
    "pack_length_buckets" -> 0.458, "pack_shards" -> 0.408,
    "pack_shuffled" -> 0.406, "pack_window_map" -> 0.349,
    "pack_windows" -> 0.314, "pipeline_admit" -> 1.098,
    "pipeline_curate" -> 4.222, "pipeline_full" -> 7.503,
    "pipeline_pack" -> 0.958, "pipeline_web_ingest" -> 1.836,
    "privacy_k_anon" -> 0.330, "q10_cube" -> 0.484,
    "q11_full_outer" -> 0.369, "q12_corr_subquery" -> 0.706,
    "q13_grouping_sets" -> 0.290, "q14_range_frame" -> 0.663,
    "q15_explode" -> 0.278, "q16_anti" -> 0.548,
    "q17_window_nav" -> 0.566, "q18_month_series" -> 0.371,
    "q19_sorted_collect" -> 0.315, "q1_agg" -> 0.681,
    "q20_cond_agg" -> 0.340, "q21_range_join" -> 0.604,
    "q22_map_agg" -> 0.503, "q23_corr" -> 0.343,
    "q24_null_safe" -> 0.416, "q25_array_ops" -> 0.551,
    "q26_rank_dist" -> 1.025, "q27_datetime" -> 0.351,
    "q28_regr" -> 0.315, "q29_mode" -> 0.307,
    "q30_cum_distinct" -> 0.584, "q31_variant" -> 0.545,
    "q32_lateral" -> 0.851, "q33_gapfill" -> 0.379,
    "q34_interval_merge" -> 0.746, "q35_unpivot" -> 0.429,
    "q36_try" -> 1.733, "q37_scd2" -> 0.785,
    "q38_retention" -> 0.616, "q39_funnel" -> 0.954,
    "q3_topk" -> 0.763, "q40_transitions" -> 0.630,
    "q41_twa" -> 0.588, "q42_dau" -> 0.703,
    "q5_multijoin" -> 0.982, "q6_rollup" -> 0.476,
    "q7_percentile" -> 1.840, "q8_pivot" -> 0.404,
    "q9_exists" -> 0.484, "sample_epochs" -> 0.430,
    "sample_mix" -> 0.466, "sample_per_group" -> 0.253,
    "sample_stratified" -> 0.183, "sample_temperature" -> 0.341,
    "sample_weighted" -> 0.374, "search_rrf" -> 1.235,
    "semdedup_keepers" -> 1.999, "set_except" -> 0.379,
    "set_intersect" -> 0.309, "shard_stats" -> 0.264,
    "sim_ivf_topk" -> 2.522, "sim_ivfpq_topk" -> 5.835,
    "sim_lsh_banded" -> 1.637, "sim_lsh_bucket" -> 0.792,
    "sim_pq_adc" -> 5.220, "sim_pqindex_forget" -> 9.203,
    "sim_pqindex_rescored" -> 9.732, "sim_pqindex_topk" -> 9.205,
    "sim_topk" -> 0.412, "skew_join_agg" -> 0.665,
    "split_assign" -> 0.286, "split_leakage" -> 2.197,
    "text_boilerplate_lines" -> 0.754, "text_card_redact" -> 0.340,
    "text_clf_score" -> 0.932, "text_cms_topk" -> 0.738,
    "text_collocations" -> 0.932, "text_entropy" -> 1.094,
    "text_fingerprint" -> 0.218, "text_fix_encoding" -> 0.574,
    "text_gopher_gates" -> 0.714, "text_hash_vec" -> 0.761,
    "text_html_extract" -> 0.932, "text_kn_heldout" -> 1.423,
    "text_kn_score" -> 1.652, "text_langid" -> 0.220,
    "text_lm_score" -> 1.325, "text_novelty" -> 0.938,
    "text_pii_redact" -> 0.296, "text_quality" -> 0.442,
    "text_quality_calibrated" -> 0.804, "text_repetition" -> 1.137,
    "text_tok_freq" -> 0.519, "text_tokens" -> 0.332,
    "text_tokens_re" -> 0.695, "text_top_tokens" -> 0.188,
    "text_winnow" -> 0.378, "tfidf_top_terms" -> 1.081,
    "w1_topn_per_group" -> 0.643, "w2_running_sum" -> 0.559,
    "w3_sessionize" -> 0.776, "w4_ntile" -> 0.833)

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

    // Per-query shuffle-write bytes (r15, VERDICT r14 #3): opt-in via
    // SPARK_GRAFT_SHUFFLE=1 — the scale-variance protocol's decider
    // (tools/dedup_scale5.sh). Bytes are a property of the PLAN: flat
    // bytes across passes + spreading wall-time = host drift; growing
    // bytes = the plan itself did more work (e.g. extra label-prop
    // rounds). Off by default: the post-query listener quiesce wait would
    // perturb the regression-gated timings.
    val recordShuffle = sys.env.contains("SPARK_GRAFT_SHUFFLE")
    val shuffleCounter =
      if (recordShuffle) Some(graft.tools.ProbeMetrics.shuffleWritten(spark.sparkContext))
      else None
    /** Snapshot the shuffle counter after waiting for the async listener
      * bus to quiesce (shared spin in [[graft.tools.ProbeMetrics]]). */
    def shuffleSnapshot(): Long = shuffleCounter.fold(0L)(_.quiesce(maxSpins = 30))
    val shuffleByQuery = scala.collection.mutable.LinkedHashMap.empty[String, Long]

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
      val before = if (recordShuffle) shuffleSnapshot() else 0L
      val (t, ok) = timeOnce(name)
      if (!ok) failed ::= name
      if (recordShuffle) shuffleByQuery(name) = shuffleSnapshot() - before
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
    val dedupLayoutTrade = "r13 layout trade: DedupIndex gained a 16-way " +
      "doc-hash partition level (bands 4->64 dirs, shingles 1->16) so " +
      "compaction is partition-scoped instead of a full index rewrite " +
      "(CompactionSpec/SCALING.md r13); measured overhead shrinks with " +
      "scale - +16-37% at sf0.1, 7-12% at sf1 (DEDUPAB_r14.jsonl A/B) - " +
      "and DocBuckets is a by-corpus-size knob; compact cost drops from " +
      "O(index) to O(tombstoned share)"
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
      "text_lm_score" -> r10TrioTriage,
      "dedup_delta" -> dedupLayoutTrade,
      "dedup_admit" -> dedupLayoutTrade,
      "dedup_index_forget" -> dedupLayoutTrade)
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
    val shuffleJson =
      if (shuffleByQuery.isEmpty) ""
      else shuffleByQuery.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","shuffle_write":{""", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"reran":$reranJson,"regressions_vs_prev":$regressions,""" +
      s""""regression_notes":$notes,"index_split":$splitJson$shuffleJson,"sf":"$sfDir"}"""
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
    val nRegressed = results.count { case (k, v) => regressed(k, v) }
    // Staged degradation (ADVICE r12): shed diagnostics one block at a time
    // — slowest map first, then index_split, then note keys — so a line
    // that creeps past the budget loses the biggest optional block, not
    // every diagnostic at once. The minimal line is the last resort only.
    def assemble(withSlowest: Boolean, withSplit: Boolean, withNotes: Boolean): String =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"n_failed":${failed.size},""" +
        s""""regressions_vs_prev":$regressions,""" +
        (if (withNotes) s""""regression_note_keys":$noteKeys,""" else "") +
        (if (withSplit) s""""index_split":$splitJson,""" else "") +
        (if (withSlowest) s""""slowest":$top,""" else "") +
        s""""full_map":"$fullPath","sf":"$sfDir"}"""
    val compactMin = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""n_regressions":$nRegressed,"full_map":"$fullPath","sf":"$sfDir"}"""
    val compact = Seq(
      assemble(withSlowest = true, withSplit = true, withNotes = true),
      assemble(withSlowest = false, withSplit = true, withNotes = true),
      assemble(withSlowest = false, withSplit = false, withNotes = true),
      assemble(withSlowest = false, withSplit = false, withNotes = false),
      compactMin).find(_.length < 1500).getOrElse(compactMin)
    require(compact.length < 1500,
      s"bench compact line ${compact.length} chars — would overflow the 2000-char tail")
    spark.stop()
    println(compact)
    System.out.flush()
  }
}
