package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query bench regression gate — the ENFORCED form of
  * BENCH_BASELINE.md's per-query table, rebased in round 11 to the
  * ROUND-10 FIGURES OF RECORD (bench_r10_full.json: sf0.1, local[32],
  * min-of-3, noop-sink materialization, quiet host). The old operative
  * baseline (BENCH_r02) covered only 46 of the 149 registered
  * queries and carried a known-stale entry (q_media_features predates
  * the real codecs); this table binds EVERY query.
  *
  * Discipline (mirrors [[StreamGate]]): run min-of-`iters` per query at
  * sf0.1 and FAIL (exit 1) any query slower than [[Factor]] × its
  * baseline — 2× sits far outside the measured min-of-3 host-noise
  * band (~±30%) while still catching a real plan regression (an extra
  * exchange or a lost pushdown is rarely under 2×). Queries added
  * after round 10 are reported as "no baseline" and first-run figures
  * become their baseline at the next rebase. A gate run is a red exit,
  * not a doc diff.
  *
  *   sbt "runMain graft.tools.BenchGate [sfDir]"
  */
object BenchGate {
  val Factor = 2.0
  /** Absolute slack added to every threshold: sub-second queries are
    * dominated by fixed job-scheduling overhead whose jitter is
    * ADDITIVE, not multiplicative (first run: an untouched 0.15 s query
    * measured 0.33 s — inside per-job noise, outside 2×). 0.5 s is
    * negligible against any real multi-second regression and still
    * fails a 0.15 s query that loses its pushdown and turns 1 s+. */
  val AbsSlack = 0.5

  /** query -> round-10 figure-of-record seconds (sf0.1, min-of-3). */
  val Baseline: Map[String, Double] = Map(
    "q_active_time" -> 0.819,
    "q_active_users" -> 0.551,
    "q_adaptive_join" -> 2.421,
    "q_ann_recall" -> 0.828,
    "q_ann_recall_multiprobe" -> 0.910,
    "q_anomaly_mad" -> 0.783,
    "q_asof_join" -> 0.424,
    "q_asof_tolerance" -> 0.452,
    "q_audio_features" -> 1.097,
    "q_bm25_topk" -> 0.974,
    "q_bpe_encode" -> 1.205,
    "q_bpe_merges" -> 0.784,
    "q_cascade_dedup" -> 0.796,
    "q_cell_sample" -> 0.293,
    "q_chunk_dedup" -> 0.298,
    "q_chunk_windows" -> 0.250,
    "q_clean_corpus" -> 0.419,
    "q_cluster_purity" -> 0.400,
    "q_cluster_sizes" -> 1.894,
    "q_codebook_update" -> 0.271,
    "q_containment" -> 1.043,
    "q_cooccur" -> 0.378,
    "q_cosine_topk" -> 0.269,
    "q_count_distinct" -> 0.175,
    "q_cross_source_dup" -> 0.909,
    "q_cube" -> 1.035,
    "q_curate_corpus" -> 2.104,
    "q_decontaminate" -> 0.202,
    "q_decontaminate_bloom" -> 0.394,
    "q_decontaminate_ngram" -> 0.441,
    "q_decontaminate_semantic" -> 0.362,
    "q_dedup_clusters" -> 1.659,
    "q_dedup_exact" -> 0.200,
    "q_dedup_survivor" -> 2.017,
    "q_dedup_tau_sweep" -> 0.998,
    "q_delivery_gap" -> 0.313,
    "q_double_write" -> 0.285,
    "q_dsir_select" -> 1.099,
    "q_dup_spans" -> 0.727,
    "q_edit_distance" -> 1.397,
    "q_effective_mix" -> 2.032,
    "q_effective_tokens" -> 1.889,
    "q_embed_drift" -> 0.223,
    "q_embed_neardup" -> 0.925,
    "q_epoch_roundtrip" -> 0.311,
    "q_event_transitions" -> 0.391,
    "q_explained_var" -> 0.323,
    "q_filter_audit" -> 0.290,
    "q_fingerprint" -> 0.217,
    "q_frame_sample" -> 0.197,
    "q_funnel" -> 0.399,
    "q_gap_by_window" -> 0.438,
    "q_global_shuffle" -> 0.517,
    "q_gram_matrix" -> 0.358,
    "q_graph_stats" -> 1.197,
    "q_group_quantiles" -> 0.497,
    "q_growth_accounting" -> 0.530,
    "q_heavy_hitters" -> 0.369,
    "q_highwater" -> 0.165,
    "q_highwater_typed" -> 0.245,
    "q_incremental_neardup" -> 0.611,
    "q_incremental_semdedup" -> 0.428,
    "q_ingest_drift" -> 0.290,
    "q_inverted_index" -> 0.411,
    "q_ivf_assign" -> 0.232,
    "q_ivf_topk" -> 0.367,
    "q_join_census" -> 0.688,
    "q_json_roundtrip" -> 1.141,
    "q_kcenter_select" -> 0.455,
    "q_kcore" -> 1.471,
    "q_label_affinity" -> 0.514,
    "q_lang_id" -> 0.273,
    "q_late_census" -> 0.521,
    "q_leakage_split" -> 1.573,
    "q_length_deciles" -> 0.193,
    "q_lexical_diversity" -> 0.238,
    "q_lineitem_agg" -> 0.743,
    "q_linreg_fit" -> 0.190,
    "q_lm_fit" -> 0.497,
    "q_media_chunk_dedup" -> 0.566,
    "q_media_features" -> 1.704,
    "q_media_resize" -> 1.596,
    "q_media_stats" -> 0.144,
    "q_minhash_neardup" -> 0.795,
    "q_mix_sample" -> 0.403,
    "q_mix_schedule" -> 0.379,
    "q_modal_type" -> 0.230,
    "q_ngram_jaccard" -> 1.156,
    "q_novelty" -> 0.460,
    "q_ohlc_bars" -> 0.362,
    "q_pack_bins" -> 0.224,
    "q_pagerank" -> 1.608,
    "q_parse_props" -> 0.788,
    "q_pca_power" -> 0.374,
    "q_pca_project" -> 0.461,
    "q_pca_sampled" -> 0.357,
    "q_pii_redact" -> 0.765,
    "q_pipeline_dlq" -> 0.388,
    "q_pipeline_highwater" -> 0.203,
    "q_pipeline_ok" -> 0.410,
    "q_pivot" -> 0.177,
    "q_pq_encode" -> 0.222,
    "q_pq_topk" -> 0.278,
    "q_profile" -> 0.348,
    "q_quality_calibrate" -> 0.333,
    "q_quantize_err" -> 0.114,
    "q_range_join" -> 0.304,
    "q_rate_cusum" -> 0.195,
    "q_repetition" -> 0.239,
    "q_retention" -> 0.300,
    "q_revenue_by_nation" -> 0.386,
    "q_rollup" -> 0.806,
    "q_salted_agg" -> 0.241,
    "q_salted_join" -> 0.448,
    "q_sample_deterministic" -> 0.119,
    "q_semantic_dedup" -> 0.366,
    "q_semi_anti_join" -> 0.286,
    "q_session_stats" -> 0.333,
    "q_sessionize" -> 0.485,
    "q_set_ops" -> 0.239,
    "q_shard_assign" -> 0.163,
    "q_shipdate_filter" -> 0.168,
    "q_sim_label_topk" -> 0.339,
    "q_simhash" -> 0.209,
    "q_simhash_neardup" -> 0.692,
    "q_simjoin_prefix" -> 1.011,
    "q_sketch_audit" -> 0.753,
    "q_skew_profile" -> 0.308,
    "q_sliding_counts" -> 0.189,
    "q_snapshot_diff" -> 0.270,
    "q_source_cap" -> 0.152,
    "q_source_concentration" -> 0.166,
    "q_source_overlap" -> 1.894,
    "q_source_overlap_sketch" -> 0.975,
    "q_source_signature" -> 0.260,
    "q_span_scrub" -> 1.087,
    "q_stratified_sample" -> 0.147,
    "q_temperature_plan" -> 0.251,
    "q_text_stats" -> 0.813,
    "q_tfidf" -> 0.397,
    "q_token_count" -> 0.397,
    "q_token_freq" -> 0.304,
    "q_top_orders_per_cust" -> 0.380,
    "q_trailing_window" -> 0.333,
    "q_unpivot" -> 0.199,
    "q_value_quantiles" -> 0.268,
    "q_video_frames" -> 6.210,
    "q_weighted_sample" -> 0.119,
    "q_winnow_neardup" -> 0.876)

  /** Baseline total (sum of the per-query figures): 93.15 s. */
  val BaselineTotal: Double = 93.15

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries("q_delivery_gap")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val iters = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val timed = graft.Bench.time(spark, sfDir, iters,
      graft.SparkEntry.queries.toSeq.sortBy(_._1))
    spark.stop()
    val fresh = timed.collect {
      case (n, ts) if ts.nonEmpty && !Baseline.contains(n) => n
    }
    if (fresh.nonEmpty)
      println(s"no baseline yet (added post-r10): ${fresh.mkString(", ")}")
    // a baselined query that VANISHED from the registry (deleted or
    // renamed) must fail the gate, not silently narrow its coverage —
    // the PASS line claims every Baseline entry was compared
    val timedNames = timed.map(_._1).toSet
    val orphans = Baseline.keys.filterNot(timedNames.contains).toSeq.sorted
    val failures = orphans.map(n =>
      s"GATE FAIL: baselined query $n missing from SparkEntry.queries " +
        "(deleted or renamed — rebase the baseline)") ++ timed.flatMap {
      case (n, ts) if ts.isEmpty => Some(s"GATE FAIL: $n threw")
      case (n, ts) => Baseline.get(n).collect {
        case b if ts.head > Factor * b + AbsSlack =>
          f"GATE FAIL: $n ${ts.head}%.2f s > ${Factor * b + AbsSlack}%.2f s " +
            f"(2x r10 $b%.2f + ${AbsSlack}%.1f)"
      }
    }
    val total = timed.collect {
      case (n, ts) if ts.nonEmpty && Baseline.contains(n) => ts.head }.sum
    println(f"BENCHGATE total over baselined queries: $total%.2f s " +
      f"(r10: $BaselineTotal%.2f s)")
    if (failures.nonEmpty) {
      failures.foreach(System.err.println)
      sys.exit(1)
    }
    println(s"BENCHGATE PASS: ${Baseline.size} baselined queries within " +
      f"$Factor%.1fx of the r10 figures of record")
  }
}
