package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Classification of a query's time vs the committed baseline, decided
    * by BOTH wall-clock and shuffle-write bytes (VERDICT r15 #2). Bytes
    * are a property of the PLAN, not the host: a wall-time flag whose
    * bytes are flat vs baseline means the plan did the same work and the
    * clock drifted (the r10/r13/r15 recurring closing-run pattern); a
    * flag whose bytes also moved means the plan itself did more work and
    * an operator must be named. */
  sealed trait Flag
  object Flag {
    /** Within wall gate (or no baseline entry — new query). */
    case object Clean extends Flag
    /** Wall moved but shuffle bytes flat vs the bytes baseline: the plan
      * did identical work — host drift suspected, rerun rather than page. */
    case object DriftSuspect extends Flag
    /** Wall moved AND bytes moved — or no bytes baseline exists to
      * exonerate the wall flag (conservative until one is recorded). */
    case object Regressed extends Flag
  }

  /** Wall gate unchanged since r08: >1.3x the committed median AND >0.5 s
    * absolute (micro-query jitter over a 32-thread box must not page). */
  def wallMoved(wall: Double, base: Double): Boolean =
    wall > base * 1.3 && wall - base > 0.5

  /** Bytes gate: >10% deviation from the committed median IN EITHER
    * DIRECTION, and >1 MiB absolute. Increases are the obvious plan
    * regression; DECREASES matter too (r16 self-review) — a change that
    * trades shuffle for recompute (e.g. a join flipped to a broadcast
    * nested loop) moves wall UP while bytes drop, and a drop must not
    * read as "plan did identical work". The 10% band covers AQE
    * re-planning jitter (the r15 DEDUPSCALE5 protocol measured <=3-5%
    * pass-to-pass spread on a fixed plan); the absolute floor keeps
    * broadcast-only micro-queries (bytes ~0) from flagging on noise. */
  def bytesMoved(bytes: Long, base: Long): Boolean =
    (bytes > base * 1.10 || bytes < base * 0.90) &&
      math.abs(bytes - base) > (1L << 20)

  /** Documented AQE plan bimodality (DEDUPSCALE5_r16, VERDICT r16 #3):
    * queries whose plan flips run-to-run between two recorded byte
    * regimes. The committed [[baselineShuffle]] median is ONE mode; the
    * values here are the OTHER observed mode(s). A wall flag whose bytes
    * land within the 10% band of a recorded alternate mode is the same
    * documented plan re-chosen by AQE, not new work — it must classify
    * DriftSuspect (rerun), not Regressed (page). dedup_ngram: the
    * recount/meta leg flips broadcast-vs-shuffle at sf0.1 — 8.48 MB
    * (BENCH_LOCAL_r16_run1) vs the committed 16.57 MB large-plan median
    * (runs 2–3). The r17 heaps protocol's sf0.1 leg caught the SAME flip
    * on the other pair-leg sharers — dedup_cc_keepers 9.22 MB (p3) and
    * dedup_cc_star 9.24 MB (p1) vs their ~17.6 MB large-plan mode
    * (DEDUPSCALE5_r17 §4; the family shares one pair leg within 0.4%
    * bytes, so the flip is one plan choice, not three) — recorded at the
    * small-plan bytes observed there (local-cluster and local[8] modes
    * sit within the 10% band of each other: 9.07 vs 8.48 MB on ngram).
    * dedup_closure has never been observed to flip; it gets an entry
    * only when a run shows one. Entries here require a DEDUPSCALE5/
    * TRIAGE note naming the flipping leg; an unexplained second mode is
    * a plan bug, not a gate annotation. */
  val bimodalShuffle: Map[String, Seq[Long]] = Map(
    "dedup_ngram" -> Seq(8475842L),
    "dedup_cc_keepers" -> Seq(9219897L),
    "dedup_cc_star" -> Seq(9240477L))

  /** Pure decision function (spec-pinned in BenchGateSpec): a deliberate
    * plan change (wall AND bytes up) classifies Regressed; a noisy rerun
    * (wall up, bytes flat) classifies DriftSuspect and is rerun, not
    * paged. Missing bytes on either side cannot exonerate — Regressed.
    * `altBytes` carries [[bimodalShuffle]]'s alternate plan modes: bytes
    * flat vs the baseline OR vs any recorded alternate mode count as
    * "same plan". */
  def classify(wall: Double, baseWall: Option[Double],
               bytes: Option[Long], baseBytes: Option[Long],
               altBytes: Seq[Long] = Nil): Flag =
    baseWall match {
      case None => Flag.Clean
      case Some(bw) if !wallMoved(wall, bw) => Flag.Clean
      case Some(_) =>
        (bytes, baseBytes) match {
          case (Some(b), Some(bb))
            if !bytesMoved(b, bb) || altBytes.exists(a => !bytesMoved(b, a)) =>
            Flag.DriftSuspect
          case _ => Flag.Regressed
        }
    }

  /** Round-17 regression baseline: per-query MEDIAN of FIVE closing
    * quiet recordings (sf0.1, local[8], 188 queries each, 0 failures, 0
    * Regressed flags) — ALL FIVE committed as
    * BENCH_LOCAL_r17_run{1..5}.json, so the baseline is reproducible from
    * history. Five runs instead of the usual three because the host's
    * wall clock was exceptionally noisy that night: identical-binary run
    * totals 284.2 / 315.9 / 317.1 / 371.7 / 293.1 s (1.31x spread) with
    * shuffle bytes bit-flat in every run — every wall flag during the
    * recording classified DriftSuspect, none Regressed. Median sum
    * 308.3 s vs r16's 266.2 is that drift, not code: the movers are
    * scattered sub-2 s queries at 1.4-1.6x with flat bytes, while the
    * round's actual perf change (the one-pass BM25 build) shows up in
    * index_split (build legs 5.9-6.9 -> 3.3-4.4 s) and in
    * bm25_index_forget 10.7 -> 9.7 s against the drift. The bytes
    * medians are [[baselineShuffle]]; the only intended bytes move this
    * round is the bm25 family's +~0.4 MB census-distinct exchange (the
    * price of dropping a whole corpus re-scan per build), inside the 10%
    * band. Flagged slowdowns are re-measured TWICE before being reported
    * (below). sim_pqindex_* / bm25_index_* / bm25_mlt* / dedup_cdc_admit
    * / cdc_index_forget / sim_pq_adc time a FULL index lifecycle per run
    * (train/build + partitioned write + probe) — the build/serve split
    * is emitted separately as `index_split`. */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 2.851, "agg_approx_pct" -> 2.936,
    "agg_hll_cube" -> 0.806, "agg_quantile_cube" -> 0.965,
    "agg_stats" -> 1.572, "asof_native" -> 1.128,
    "asof_signup" -> 1.582, "bm25_index_forget" -> 9.690,
    "bm25_index_search" -> 6.213, "bm25_mlt" -> 6.786,
    "bm25_mlt_batch" -> 6.569, "bm25_search" -> 1.075,
    "bpe_encode" -> 5.056, "bpe_merges" -> 0.940,
    "cdc_index_forget" -> 4.666, "clf_auc" -> 1.590,
    "clf_calibration" -> 1.379, "clf_pr_curve" -> 1.292,
    "clf_train" -> 2.247, "cluster_topics" -> 3.925,
    "contamination_report" -> 1.094, "corpus_datasheet" -> 1.317,
    "corpus_diff" -> 0.500, "corpus_report" -> 0.613,
    "curate_blocklist" -> 0.812, "curate_domain_cap" -> 0.702,
    "curate_threshold_sweep" -> 1.180, "curate_url_dedup" -> 1.643,
    "decontaminate" -> 0.877, "decontaminate_bloom" -> 0.953,
    "decontaminate_index" -> 1.187, "dedup_admit" -> 4.674,
    "dedup_cc_keepers" -> 4.041, "dedup_cc_star" -> 5.009,
    "dedup_cdc" -> 1.849, "dedup_cdc_admit" -> 3.325,
    "dedup_cdc_rewrite" -> 1.732, "dedup_closure" -> 4.445,
    "dedup_containment" -> 3.287, "dedup_delta" -> 3.269,
    "dedup_exact" -> 0.459, "dedup_fuzzy_verify" -> 1.329,
    "dedup_index_forget" -> 3.730, "dedup_intradoc" -> 0.775,
    "dedup_minhash" -> 1.851, "dedup_ngram" -> 3.813,
    "dedup_ngram_keepers" -> 3.110, "dedup_prefix" -> 0.646,
    "dedup_quality_keepers" -> 4.653, "dedup_simhash" -> 0.354,
    "dedup_simhash_pairs" -> 1.209, "dedup_spans" -> 1.068,
    "dedup_spans_keepers" -> 1.100, "dedup_winnow_pairs" -> 1.782,
    "doc_chunks" -> 0.450, "doc_len_histogram" -> 0.434,
    "dsir_weights" -> 2.736, "embed_kmeans" -> 1.672,
    "embed_mmr" -> 1.747, "embed_neardup" -> 3.367,
    "embed_outliers" -> 2.744, "embed_pq" -> 0.533,
    "embed_project" -> 0.881, "embed_prototypes" -> 2.278,
    "embed_quantize" -> 0.547, "eval_rouge2" -> 2.162,
    "mm_decode" -> 0.513, "mm_decode_image" -> 0.273,
    "mm_decode_wav" -> 0.245, "mm_frames" -> 0.333,
    "mm_resize" -> 0.270, "mm_resize_image" -> 0.228,
    "o10_escape" -> 1.442, "o11_o13_route" -> 2.293,
    "o12_optout_dim" -> 0.651, "o14_format_values" -> 2.461,
    "o3_count_range" -> 0.194, "o4_o5_extract" -> 1.349,
    "o6_o7_anonymize" -> 0.977, "o8_o9_statement_json" -> 1.703,
    "o8_withfield" -> 1.892, "pack_chat_template" -> 1.140,
    "pack_curriculum" -> 0.639, "pack_fim" -> 0.494,
    "pack_length_buckets" -> 0.556, "pack_shards" -> 0.491,
    "pack_shuffled" -> 0.449, "pack_window_map" -> 0.410,
    "pack_windows" -> 0.366, "pipeline_admit" -> 1.495,
    "pipeline_curate" -> 4.742, "pipeline_full" -> 8.809,
    "pipeline_pack" -> 1.304, "pipeline_web_ingest" -> 2.064,
    "privacy_k_anon" -> 0.511, "q10_cube" -> 0.792,
    "q11_full_outer" -> 0.489, "q12_corr_subquery" -> 0.984,
    "q13_grouping_sets" -> 0.376, "q14_range_frame" -> 1.015,
    "q15_explode" -> 0.393, "q16_anti" -> 0.593,
    "q17_window_nav" -> 0.727, "q18_month_series" -> 0.516,
    "q19_sorted_collect" -> 0.472, "q1_agg" -> 0.767,
    "q20_cond_agg" -> 0.500, "q21_range_join" -> 0.740,
    "q22_map_agg" -> 0.543, "q23_corr" -> 0.466,
    "q24_null_safe" -> 0.514, "q25_array_ops" -> 0.512,
    "q26_rank_dist" -> 1.040, "q27_datetime" -> 0.393,
    "q28_regr" -> 0.440, "q29_mode" -> 0.423,
    "q30_cum_distinct" -> 0.696, "q31_variant" -> 0.672,
    "q32_lateral" -> 1.054, "q33_gapfill" -> 0.530,
    "q34_interval_merge" -> 0.925, "q35_unpivot" -> 0.409,
    "q36_try" -> 1.871, "q37_scd2" -> 0.859,
    "q38_retention" -> 0.735, "q39_funnel" -> 0.964,
    "q3_topk" -> 0.927, "q40_transitions" -> 0.703,
    "q41_twa" -> 0.661, "q42_dau" -> 0.660,
    "q5_multijoin" -> 1.176, "q6_rollup" -> 0.554,
    "q7_percentile" -> 1.981, "q8_pivot" -> 0.506,
    "q9_exists" -> 0.524, "sample_epochs" -> 0.444,
    "sample_mix" -> 0.537, "sample_per_group" -> 0.306,
    "sample_stratified" -> 0.208, "sample_temperature" -> 0.353,
    "sample_weighted" -> 0.360, "search_rrf" -> 1.357,
    "semdedup_keepers" -> 2.356, "set_except" -> 0.569,
    "set_intersect" -> 0.396, "shard_stats" -> 0.428,
    "sim_ivf_topk" -> 3.186, "sim_ivfpq_topk" -> 6.699,
    "sim_lsh_banded" -> 1.916, "sim_lsh_bucket" -> 0.760,
    "sim_pq_adc" -> 5.685, "sim_pqindex_forget" -> 11.435,
    "sim_pqindex_rescored" -> 9.931, "sim_pqindex_topk" -> 10.863,
    "sim_topk" -> 0.609, "skew_join_agg" -> 0.963,
    "split_assign" -> 0.395, "split_leakage" -> 3.113,
    "text_boilerplate_lines" -> 0.999, "text_card_redact" -> 0.436,
    "text_clf_score" -> 1.097, "text_cms_topk" -> 1.048,
    "text_collocations" -> 1.396, "text_entropy" -> 1.307,
    "text_fingerprint" -> 0.223, "text_fix_encoding" -> 0.568,
    "text_gopher_gates" -> 0.775, "text_hash_vec" -> 0.717,
    "text_html_extract" -> 1.067, "text_kn_heldout" -> 1.771,
    "text_kn_score" -> 1.799, "text_langid" -> 0.271,
    "text_lm_score" -> 1.540, "text_novelty" -> 1.223,
    "text_pii_redact" -> 0.374, "text_quality" -> 0.498,
    "text_quality_calibrated" -> 0.869, "text_repetition" -> 1.392,
    "text_tok_freq" -> 0.764, "text_tokens" -> 0.386,
    "text_tokens_re" -> 0.824, "text_top_tokens" -> 0.226,
    "text_winnow" -> 0.486, "tfidf_top_terms" -> 1.410,
    "w1_topn_per_group" -> 0.839, "w2_running_sum" -> 0.648,
    "w3_sessionize" -> 0.960, "w4_ntile" -> 0.943)

  /** Per-query shuffle-write BYTES baseline (r16, VERDICT r15 #2):
    * median of the same three closing quiet recordings that produce
    * [[baselinePrev]] (BENCH_LOCAL_r17_run{1..5}.json `shuffle_write`
    * maps, folded by tools/baseline_swap.py). Used by [[classify]] to
    * split wall-time flags into Regressed (bytes moved too — the plan
    * did more work) vs DriftSuspect (bytes flat — host drift, rerun).
    * An empty map would make every wall flag conservatively classify
    * Regressed. Pass-to-pass these are near-bit-stable (the TRIAGE_r16
    * A/Bs measured zero spread at fixed config); the 10% gate band covers
    * the residual AQE jitter. */
  val baselineShuffle: Map[String, Long] = Map(
    "agg_approx" -> 3095847L, "agg_approx_pct" -> 5596751L,
    "agg_hll_cube" -> 428781L, "agg_quantile_cube" -> 553839L,
    "agg_stats" -> 9424233L, "asof_native" -> 2855566L,
    "asof_signup" -> 3100494L, "bm25_index_forget" -> 6058803L,
    "bm25_index_search" -> 6067714L, "bm25_mlt" -> 6232274L,
    "bm25_mlt_batch" -> 5936869L, "bm25_search" -> 80L,
    "bpe_encode" -> 106862L, "bpe_merges" -> 18995L,
    "cdc_index_forget" -> 362329L, "clf_auc" -> 794663L,
    "clf_calibration" -> 763775L, "clf_pr_curve" -> 794722L,
    "clf_train" -> 3761959L, "cluster_topics" -> 518058L,
    "contamination_report" -> 32480L, "corpus_datasheet" -> 325398L,
    "corpus_diff" -> 1060400L, "corpus_report" -> 137167L,
    "curate_blocklist" -> 428742L, "curate_domain_cap" -> 130717L,
    "curate_threshold_sweep" -> 2729L, "curate_url_dedup" -> 111575L,
    "decontaminate" -> 49475L, "decontaminate_bloom" -> 100128L,
    "decontaminate_index" -> 101995L, "dedup_admit" -> 2863655L,
    "dedup_cc_keepers" -> 16697844L, "dedup_cc_star" -> 16723087L,
    "dedup_cdc" -> 792079L, "dedup_cdc_admit" -> 359608L,
    "dedup_cdc_rewrite" -> 2371057L, "dedup_closure" -> 16584459L,
    "dedup_containment" -> 16569735L, "dedup_delta" -> 2355285L,
    "dedup_exact" -> 689490L, "dedup_fuzzy_verify" -> 23150L,
    "dedup_index_forget" -> 2356721L, "dedup_intradoc" -> 860227L,
    "dedup_minhash" -> 1575521L, "dedup_ngram" -> 16570504L,
    "dedup_ngram_keepers" -> 16665709L, "dedup_prefix" -> 18952L,
    "dedup_quality_keepers" -> 16846808L, "dedup_simhash" -> 67806L,
    "dedup_simhash_pairs" -> 21428L, "dedup_spans" -> 850827L,
    "dedup_spans_keepers" -> 2686978L, "dedup_winnow_pairs" -> 2856865L,
    "doc_chunks" -> 355102L, "doc_len_histogram" -> 1142L,
    "dsir_weights" -> 2234133L, "embed_kmeans" -> 208999L,
    "embed_mmr" -> 41009L, "embed_neardup" -> 15716L,
    "embed_outliers" -> 604528L, "embed_pq" -> 4545221L,
    "embed_project" -> 423861L, "embed_prototypes" -> 619301L,
    "embed_quantize" -> 380937L, "eval_rouge2" -> 6307442L,
    "mm_decode" -> 108608L, "mm_decode_image" -> 100446L,
    "mm_decode_wav" -> 100413L, "mm_frames" -> 139932L,
    "mm_resize" -> 80055L, "mm_resize_image" -> 113928L,
    "o10_escape" -> 1736899L, "o11_o13_route" -> 1217647L,
    "o12_optout_dim" -> 245361L, "o14_format_values" -> 9225906L,
    "o3_count_range" -> 56L, "o4_o5_extract" -> 2795948L,
    "o6_o7_anonymize" -> 251489L, "o8_o9_statement_json" -> 7715920L,
    "o8_withfield" -> 7711894L, "pack_chat_template" -> 3267678L,
    "pack_curriculum" -> 217940L, "pack_fim" -> 930446L,
    "pack_length_buckets" -> 62224L, "pack_shards" -> 51403L,
    "pack_shuffled" -> 234265L, "pack_window_map" -> 135623L,
    "pack_windows" -> 183093L, "pipeline_admit" -> 102272L,
    "pipeline_curate" -> 15401003L, "pipeline_full" -> 16395579L,
    "pipeline_pack" -> 338931L, "pipeline_web_ingest" -> 1908837L,
    "privacy_k_anon" -> 123337L, "q10_cube" -> 2536L,
    "q11_full_outer" -> 19397L, "q12_corr_subquery" -> 1496351L,
    "q13_grouping_sets" -> 1260L, "q14_range_frame" -> 3190390L,
    "q15_explode" -> 1500L, "q16_anti" -> 1019284L,
    "q17_window_nav" -> 3716172L, "q18_month_series" -> 3215L,
    "q19_sorted_collect" -> 160083L, "q1_agg" -> 1392L,
    "q20_cond_agg" -> 853L, "q21_range_join" -> 1862L,
    "q22_map_agg" -> 223499L, "q23_corr" -> 895L,
    "q24_null_safe" -> 1572L, "q25_array_ops" -> 143286L,
    "q26_rank_dist" -> 1970455L, "q27_datetime" -> 531508L,
    "q28_regr" -> 935L, "q29_mode" -> 1296L,
    "q30_cum_distinct" -> 142305L, "q31_variant" -> 731L,
    "q32_lateral" -> 6192094L, "q33_gapfill" -> 3078L,
    "q34_interval_merge" -> 2663591L, "q35_unpivot" -> 380L,
    "q36_try" -> 758L, "q37_scd2" -> 3305025L,
    "q38_retention" -> 60968L, "q39_funnel" -> 74763L,
    "q3_topk" -> 460556L, "q40_transitions" -> 2071860L,
    "q41_twa" -> 1898651L, "q42_dau" -> 883491L,
    "q5_multijoin" -> 1911L, "q6_rollup" -> 1367L,
    "q7_percentile" -> 5435113L, "q8_pivot" -> 206698L,
    "q9_exists" -> 796078L, "sample_epochs" -> 1026L,
    "sample_mix" -> 44040L, "sample_per_group" -> 1530L,
    "sample_stratified" -> 8862L, "sample_temperature" -> 958L,
    "sample_weighted" -> 34679L, "search_rrf" -> 3072L,
    "semdedup_keepers" -> 222158L, "set_except" -> 14869L,
    "set_intersect" -> 27906L, "shard_stats" -> 4126L,
    "sim_ivf_topk" -> 1439933L, "sim_ivfpq_topk" -> 3694269L,
    "sim_lsh_banded" -> 2460591L, "sim_lsh_bucket" -> 939556L,
    "sim_pq_adc" -> 4282078L, "sim_pqindex_forget" -> 5188172L,
    "sim_pqindex_rescored" -> 5186413L, "sim_pqindex_topk" -> 5185823L,
    "sim_topk" -> 2447L, "skew_join_agg" -> 24325L,
    "split_assign" -> 494L, "split_leakage" -> 2684685L,
    "text_boilerplate_lines" -> 1525540L, "text_card_redact" -> 276284L,
    "text_clf_score" -> 780294L, "text_cms_topk" -> 8224L,
    "text_collocations" -> 47189L, "text_entropy" -> 1501989L,
    "text_fingerprint" -> 52230L, "text_fix_encoding" -> 419378L,
    "text_gopher_gates" -> 1802752L, "text_hash_vec" -> 1357934L,
    "text_html_extract" -> 94891L, "text_kn_heldout" -> 108702L,
    "text_kn_score" -> 219623L, "text_langid" -> 49755L,
    "text_lm_score" -> 171887L, "text_novelty" -> 635401L,
    "text_pii_redact" -> 281123L, "text_quality" -> 57021L,
    "text_quality_calibrated" -> 39334L, "text_repetition" -> 5725637L,
    "text_tok_freq" -> 134618L, "text_tokens" -> 71102L,
    "text_tokens_re" -> 80663L, "text_top_tokens" -> 991L,
    "text_winnow" -> 1212609L, "tfidf_top_terms" -> 3291169L,
    "w1_topn_per_group" -> 1463L, "w2_running_sum" -> 2751854L,
    "w3_sessionize" -> 3085101L, "w4_ntile" -> 1984617L)

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

    // Per-query shuffle-write bytes — ALWAYS recorded since r16 (VERDICT
    // r15 #2): the regression gate needs them to split wall flags into
    // Regressed vs DriftSuspect, so every bench run (driver rounds and
    // BENCH_LOCAL baseline recordings alike) carries a bytes map. Bytes
    // are a property of the PLAN: flat bytes + moved wall = host drift;
    // moved bytes = the plan itself did more work. The listener quiesce
    // runs BETWEEN queries (outside the timed window), one snapshot per
    // boundary, so recording does not perturb the gated timings.
    // SPARK_GRAFT_SHUFFLE=0 opts out (diagnostic escape hatch only).
    val recordShuffle = !sys.env.get("SPARK_GRAFT_SHUFFLE").contains("0")
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
    var prevSnap = if (recordShuffle) shuffleSnapshot() else 0L
    val firstPass = names.map { name =>
      val (t, ok) = timeOnce(name)
      if (!ok) failed ::= name
      if (recordShuffle) {
        val snap = shuffleSnapshot()
        shuffleByQuery(name) = snap - prevSnap
        prevSnap = snap
      }
      name -> t
    }
    // The baseline (and thus the rerun/regression protocol) is only
    // meaningful on the sf0.1 recording box; scale probes at other SFs set
    // this to skip re-measurement — there every heavy query trips the
    // sf0.1 thresholds by design and the reruns would triple the run.
    val noRerun = sys.env.contains("SPARK_GRAFT_NO_RERUN")
    /** Bytes-aware flag (VERDICT r15 #2): wall gate decides WHETHER the
      * query is flagged; the recorded shuffle bytes vs [[baselineShuffle]]
      * decide WHAT KIND (Regressed vs DriftSuspect). Reruns apply to both
      * kinds — a real regression reproduces, drift usually doesn't. */
    def flagOf(k: String, v: Double): Flag =
      if (noRerun) Flag.Clean
      else classify(v, baselinePrev.get(k), shuffleByQuery.get(k),
        baselineShuffle.get(k), bimodalShuffle.getOrElse(k, Nil))
    def regressed(k: String, v: Double): Boolean = flagOf(k, v) != Flag.Clean
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
    // micro-query jitter over a 32-thread local cluster doesn't page
    // anyone), SPLIT by the bytes evidence (r16): `regressions_vs_prev`
    // carries only flags whose shuffle bytes also moved (or that have no
    // bytes baseline to exonerate them) — the plan did more work, name
    // the operator. `drift_suspect` carries wall-only flags whose bytes
    // are flat vs baseline — same plan, drifting clock; rerun, don't page.
    // Locale.ROOT: a comma decimal separator would corrupt the JSON.
    def ratioEntry(k: String, v: Double): String =
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", v / baselinePrev(k))
    val regressions = results.collect {
      case (k, v) if flagOf(k, v) == Flag.Regressed => ratioEntry(k, v)
    }.mkString("{", ",", "}")
    val driftSuspects = results.collect {
      case (k, v) if flagOf(k, v) == Flag.DriftSuspect => ratioEntry(k, v)
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
    // r16 triage of the r15 driver doublings (pipeline_full 2.21x,
    // sim_pqindex_forget 1.69x — VERDICT r15 #1): same-commit evidence,
    // fresh this round. (a) In-suite quiet local[8] full run: 8.12 s
    // (1.10x) / 10.07 s (1.06x) — no regression in the plan's regime.
    // (b) 5-pass fresh-JVM subset A/B at local[32]: per-query shuffle
    // bytes BIT-IDENTICAL across all passes (20.811 MB / 5.885 MB every
    // pass) while wall spread 21.5-36.9 s / 19.9-71.7 s — the plan did the
    // same work every time; only the clock moved. (c) Dedicated-subset
    // runs read these composed queries ~2.2x above their in-suite medians
    // even quiet (18-21 s vs 8.1 s) — the same subset-vs-in-suite JIT
    // effect the r15 bm25_mlt re-recording measured. The r15 driver
    // doubling did not reproduce on the same tree in-suite; from r16 the
    // always-on bytes map classifies such wall-only flags as
    // drift_suspect automatically. TRIAGE_r16.md.
    val r16DriftTriage = "r15 driver doubling triaged with r16 evidence " +
      "(TRIAGE_r16.md): in-suite quiet rerun 1.06-1.10x of baseline; 5-pass " +
      "same-commit A/B shuffle bytes bit-identical across passes while wall " +
      "spread up to 3.6x - wall-only movement, plan work constant; " +
      "bytes-aware gate now classifies this as drift_suspect"
    val dedupLayoutTrade = "r13 layout trade: DedupIndex gained a 16-way " +
      "doc-hash partition level (bands 4->64 dirs, shingles 1->16) so " +
      "compaction is partition-scoped instead of a full index rewrite " +
      "(CompactionSpec/SCALING.md r13); measured overhead shrinks with " +
      "scale - +16-37% at sf0.1, 7-12% at sf1 (DEDUPAB_r14.jsonl A/B) - " +
      "and DocBuckets is a by-corpus-size knob; compact cost drops from " +
      "O(index) to O(tombstoned share)"
    val r18AssignTrade = "deliberate r18 trade: the PQ/Lloyd assignment is " +
      "now a compiled per-row argmin over a driver-collected codebook " +
      "(graft.functions.NearestBookCode) instead of a broadcast-join + " +
      "min_by aggregate — training adds two bounded model-to-driver " +
      "collects (seed books, trained codebooks), a fixed ~0.3-0.7 s of " +
      "driver round-trips that dominates THIS sub-second query while the " +
      "same change cuts every sim_pqindex_*/sim_ivfpq/sim_pq_adc lifecycle " +
      "30-50% (OPTIMIZATION_r18.md)"
    val knownTrades = Map(
      "embed_pq" -> (pqTrade + "; ALSO " + r18AssignTrade),
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
      "dedup_minhash" -> ("r16 triage, RULED IN (TRIAGE_r16.md): a binary A/B " +
        "(pre-cap 1ff9d92^ vs cap) attributes the r15 median move " +
        "0.99->1.49 s to the bandedCandidates population-cap aggregate - " +
        "its per-band population count adds 0.022->1.576 MB shuffle at " +
        "sf0.1; deliberate trade (sf3 candidate mass -37%, verified pairs " +
        "-0.02%). Current in-suite median 1.51 s = 1.01x of the r15 " +
        "baseline that already carries it"),
      "pipeline_full" -> r16DriftTriage,
      "sim_pqindex_forget" -> r16DriftTriage,
      "clf_train" -> r16DriftTriage,
      "text_lm_score" -> r16DriftTriage,
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
      s""""drift_suspect":$driftSuspects,""" +
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
        s""""regressions_vs_prev":$regressions,"drift_suspect":$driftSuspects,""" +
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
