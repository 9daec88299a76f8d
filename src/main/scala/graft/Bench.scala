package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-7 per-query seconds (sf0.1, local[8], quiet box — recorded with
    * no concurrent sbt/test JVMs, per the round-6 bench-hygiene ask) — the
    * regression baseline for the next round. Flagged slowdowns are
    * re-measured TWICE before being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 5.263, "agg_approx_pct" -> 2.749,
    "agg_stats" -> 1.833, "asof_native" -> 0.913,
    "asof_signup" -> 1.007, "bm25_search" -> 1.719,
    "decontaminate" -> 0.783, "dedup_cc_keepers" -> 3.972,
    "dedup_closure" -> 3.549, "dedup_containment" -> 3.900,
    "dedup_exact" -> 0.450, "dedup_fuzzy_verify" -> 1.803,
    "dedup_minhash" -> 1.469, "dedup_ngram" -> 3.808,
    "dedup_ngram_keepers" -> 3.113, "dedup_prefix" -> 0.640,
    "dedup_simhash" -> 0.346, "dedup_simhash_pairs" -> 1.006,
    "dedup_spans" -> 1.089, "dedup_spans_keepers" -> 1.150,
    "dedup_winnow_pairs" -> 1.725, "doc_chunks" -> 0.420,
    "doc_len_histogram" -> 0.351, "embed_kmeans" -> 2.085,
    "embed_neardup" -> 3.598, "embed_pq" -> 2.467,
    "embed_quantize" -> 0.460, "mm_decode" -> 0.447,
    "mm_frames" -> 0.309, "mm_resize" -> 0.254,
    "o10_escape" -> 1.383, "o11_o13_route" -> 2.099,
    "o12_optout_dim" -> 0.674, "o14_format_values" -> 2.093,
    "o3_count_range" -> 0.178, "o4_o5_extract" -> 1.209,
    "o6_o7_anonymize" -> 0.844, "o8_o9_statement_json" -> 1.492,
    "o8_withfield" -> 1.677, "pipeline_curate" -> 5.016,
    "q10_cube" -> 0.558, "q11_full_outer" -> 0.463,
    "q12_corr_subquery" -> 0.734, "q13_grouping_sets" -> 0.270,
    "q14_range_frame" -> 0.844, "q15_explode" -> 0.336,
    "q16_anti" -> 0.541, "q17_window_nav" -> 0.779,
    "q18_month_series" -> 0.467, "q19_sorted_collect" -> 0.410,
    "q1_agg" -> 0.558, "q20_cond_agg" -> 0.370,
    "q21_range_join" -> 0.654, "q22_map_agg" -> 0.498,
    "q23_corr" -> 0.431, "q24_null_safe" -> 0.468,
    "q25_array_ops" -> 0.563, "q26_rank_dist" -> 1.116,
    "q27_datetime" -> 0.434, "q28_regr" -> 0.456,
    "q29_mode" -> 0.390, "q30_cum_distinct" -> 0.848,
    "q31_variant" -> 0.727, "q32_lateral" -> 1.017,
    "q33_gapfill" -> 0.475, "q34_interval_merge" -> 0.923,
    "q35_unpivot" -> 0.442, "q36_try" -> 1.686,
    "q3_topk" -> 1.175, "q5_multijoin" -> 1.208,
    "q6_rollup" -> 0.539, "q7_percentile" -> 2.372,
    "q8_pivot" -> 0.512, "q9_exists" -> 0.506,
    "sample_epochs" -> 0.428, "sample_mix" -> 0.668,
    "sample_per_group" -> 0.335, "sample_stratified" -> 0.194,
    "sample_temperature" -> 0.331, "sample_weighted" -> 0.412,
    "semdedup_keepers" -> 2.133, "set_except" -> 0.475,
    "set_intersect" -> 0.413, "shard_stats" -> 0.407,
    "sim_ivf_topk" -> 2.885, "sim_ivfpq_topk" -> 5.151,
    "sim_lsh_banded" -> 1.764, "sim_lsh_bucket" -> 0.774,
    "sim_pq_adc" -> 2.841, "sim_topk" -> 0.439,
    "split_assign" -> 0.313, "text_card_redact" -> 0.445,
    "text_clf_score" -> 1.038, "text_fingerprint" -> 0.214,
    "text_gopher_gates" -> 0.840, "text_hash_vec" -> 1.025,
    "text_langid" -> 0.251, "text_lm_score" -> 1.977,
    "text_pii_redact" -> 0.387, "text_quality" -> 0.534,
    "text_repetition" -> 1.474, "text_tok_freq" -> 0.644,
    "text_tokens" -> 0.392, "text_tokens_re" -> 0.741,
    "text_top_tokens" -> 0.188, "text_winnow" -> 0.486,
    "tfidf_top_terms" -> 1.216, "w1_topn_per_group" -> 0.663,
    "w2_running_sum" -> 0.612, "w3_sessionize" -> 0.980,
    "w4_ntile" -> 0.951)

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
        "see IvfRecallSpec/SCALING.md"))
    val notes = results.collect {
      case (k, v) if regressed(k, v) && knownTrades.contains(k) =>
        "\"" + k + "\":\"" + knownTrades(k) + "\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"reran":$reranJson,"regressions_vs_prev":$regressions,""" +
      s""""regression_notes":$notes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
