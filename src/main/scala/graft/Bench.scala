package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-9 FINAL regression baseline: per-query MINIMUM over the three
    * closing quiet recordings (sf0.1, local[8]; 159-, 160-, and 160-query
    * runs, each 0 failures / 0 regressions) — the box turned ~35% noisier
    * between them for reasons outside this repo, so the minimum keeps the
    * round-10 gate TIGHT instead of baking host noise into the baseline.
    * The committed artifact BENCH_LOCAL_r09.json is the last complete
    * single run verbatim. Flagged slowdowns are re-measured TWICE before
    * being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 2.242, "agg_approx_pct" -> 1.693,
    "agg_hll_cube" -> 0.710, "agg_quantile_cube" -> 0.720,
    "agg_stats" -> 1.240, "asof_native" -> 0.973,
    "asof_signup" -> 1.567, "bm25_index_search" -> 5.113,
    "bm25_search" -> 0.906, "bpe_encode" -> 3.696,
    "bpe_merges" -> 1.028, "clf_train" -> 2.000,
    "cluster_topics" -> 4.225, "contamination_report" -> 1.105,
    "corpus_datasheet" -> 1.405, "corpus_report" -> 0.629,
    "curate_domain_cap" -> 0.560, "decontaminate" -> 0.829,
    "decontaminate_bloom" -> 0.953, "decontaminate_index" -> 1.260,
    "dedup_admit" -> 3.188, "dedup_cc_keepers" -> 4.003,
    "dedup_cc_star" -> 4.363, "dedup_closure" -> 3.895,
    "dedup_containment" -> 2.830, "dedup_delta" -> 1.815,
    "dedup_exact" -> 0.392, "dedup_fuzzy_verify" -> 1.149,
    "dedup_intradoc" -> 0.887, "dedup_minhash" -> 1.040,
    "dedup_ngram" -> 3.906, "dedup_ngram_keepers" -> 3.112,
    "dedup_prefix" -> 0.514, "dedup_quality_keepers" -> 4.028,
    "dedup_simhash" -> 0.290, "dedup_simhash_pairs" -> 1.110,
    "dedup_spans" -> 0.799, "dedup_spans_keepers" -> 0.984,
    "dedup_winnow_pairs" -> 1.646, "doc_chunks" -> 0.350,
    "doc_len_histogram" -> 0.312, "dsir_weights" -> 2.228,
    "embed_kmeans" -> 1.671, "embed_mmr" -> 1.799,
    "embed_neardup" -> 2.939, "embed_outliers" -> 2.744,
    "embed_pq" -> 2.046, "embed_project" -> 0.745,
    "embed_quantize" -> 0.446, "mm_decode" -> 0.427,
    "mm_decode_image" -> 0.266, "mm_decode_wav" -> 0.233,
    "mm_frames" -> 0.280, "mm_resize" -> 0.270,
    "mm_resize_image" -> 0.207, "o10_escape" -> 1.412,
    "o11_o13_route" -> 2.202, "o12_optout_dim" -> 0.726,
    "o14_format_values" -> 2.774, "o3_count_range" -> 0.159,
    "o4_o5_extract" -> 1.247, "o6_o7_anonymize" -> 0.784,
    "o8_o9_statement_json" -> 1.576, "o8_withfield" -> 1.687,
    "pack_curriculum" -> 0.650, "pack_shards" -> 0.461,
    "pack_shuffled" -> 0.429, "pack_window_map" -> 0.361,
    // pipeline_admit re-baselined mid-r10: the r9 89.188 s was recompute
    // amplification (unmaterialized multi-referenced subtrees + the
    // quadratic intra-doc span filter); fixed to 4.70 s measured cold
    // (quiet map swap at round close refreshes it again)
    "pack_windows" -> 0.326, "pipeline_admit" -> 4.696,
    "pipeline_curate" -> 4.598, "pipeline_full" -> 8.940,
    "pipeline_pack" -> 1.217, "q10_cube" -> 0.584,
    "q11_full_outer" -> 0.431, "q12_corr_subquery" -> 0.860,
    "q13_grouping_sets" -> 0.352, "q14_range_frame" -> 0.718,
    "q15_explode" -> 0.287, "q16_anti" -> 0.529,
    "q17_window_nav" -> 0.626, "q18_month_series" -> 0.446,
    "q19_sorted_collect" -> 0.338, "q1_agg" -> 0.555,
    "q20_cond_agg" -> 0.360, "q21_range_join" -> 0.626,
    "q22_map_agg" -> 0.415, "q23_corr" -> 0.417,
    "q24_null_safe" -> 0.499, "q25_array_ops" -> 0.548,
    "q26_rank_dist" -> 1.015, "q27_datetime" -> 0.419,
    "q28_regr" -> 0.376, "q29_mode" -> 0.386,
    "q30_cum_distinct" -> 0.725, "q31_variant" -> 0.749,
    "q32_lateral" -> 1.043, "q33_gapfill" -> 0.486,
    "q34_interval_merge" -> 0.980, "q35_unpivot" -> 0.380,
    "q36_try" -> 1.733, "q37_scd2" -> 0.875,
    "q38_retention" -> 0.683, "q39_funnel" -> 1.148,
    "q3_topk" -> 0.963, "q40_transitions" -> 0.809,
    "q41_twa" -> 0.643, "q42_dau" -> 0.780,
    "q5_multijoin" -> 1.194, "q6_rollup" -> 0.497,
    "q7_percentile" -> 1.859, "q8_pivot" -> 0.405,
    "q9_exists" -> 0.473, "sample_epochs" -> 0.441,
    "sample_mix" -> 0.524, "sample_per_group" -> 0.279,
    "sample_stratified" -> 0.194, "sample_temperature" -> 0.278,
    "sample_weighted" -> 0.319, "search_rrf" -> 1.357,
    "semdedup_keepers" -> 2.353, "set_except" -> 0.379,
    "set_intersect" -> 0.321, "shard_stats" -> 0.301,
    "sim_ivf_topk" -> 2.512, "sim_ivfpq_topk" -> 4.038,
    "sim_lsh_banded" -> 1.660, "sim_lsh_bucket" -> 0.667,
    "sim_pq_adc" -> 2.957, "sim_pqindex_rescored" -> 7.770,
    "sim_pqindex_topk" -> 7.274, "sim_topk" -> 0.430,
    "split_assign" -> 0.330, "split_leakage" -> 2.403,
    "text_card_redact" -> 0.403, "text_clf_score" -> 0.985,
    "text_cms_topk" -> 0.720, "text_collocations" -> 1.160,
    "text_fingerprint" -> 0.176, "text_gopher_gates" -> 0.641,
    "text_hash_vec" -> 0.704, "text_kn_heldout" -> 1.662,
    "text_kn_score" -> 1.766, "text_langid" -> 0.232,
    "text_lm_score" -> 1.414, "text_novelty" -> 1.042,
    "text_pii_redact" -> 0.352, "text_quality" -> 0.479,
    "text_quality_calibrated" -> 0.820, "text_repetition" -> 1.257,
    "text_tok_freq" -> 0.557, "text_tokens" -> 0.356,
    "text_tokens_re" -> 0.659, "text_top_tokens" -> 0.215,
    "text_winnow" -> 0.400, "tfidf_top_terms" -> 1.092,
    "w1_topn_per_group" -> 0.626, "w2_running_sum" -> 0.528,
    "w3_sessionize" -> 0.819, "w4_ntile" -> 0.838)

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
    // The harness that records BENCH_r{N}.json keeps only the LAST 2000
    // chars of stdout and json-parses what it finds there — a 160-query
    // map (~4 KB) can never fit, which is why r06–r09 shipped
    // "parsed": null. Emit a compact summary as the FINAL line (total,
    // counts, the 15 slowest queries at ms precision, and a pointer to
    // the full map) so the driver's window always contains one complete,
    // parseable JSON object. The full line above remains the authoritative
    // artifact.
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    val top = results.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""regressions_vs_prev":$regressions,"slowest":$top,""" +
      s""""full_map":"SPARK_GRAFT_BENCH_OUT or the stdout line above","sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
