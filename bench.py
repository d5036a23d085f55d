#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side result transfer), which is how a cluster job would be
measured. Each query gets one unmeasured warm-up run first: the
first execution of a plan pays one-time JVM costs (whole-stage
codegen compilation, JIT, parquet footer caching) that a long-lived
cluster amortizes to zero, so steady-state latency is the number
that predicts 100 TB behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative mix: scan-agg, large join, window, rollup, set op,
# exact + fuzzy + minhash + simhash dedup, ANN, text analysis, stream
# window — the shapes that dominate a 100 TB pipeline.
HEADLINE = [
    "a4_groupby_count",
    "j4_large_join",
    "j1_inner_join",
    "w3_agg_over_frame",
    "a7_rollup",
    "a6_multi_distinct",
    "d1_drop_duplicates",
    "x1_dedup_exact",
    "x2_dedup_minhash",
    "x3_dedup_simhash",
    "x5_embedding_dedup",
    "x6_ann_topk",
    "t5_tokenize_explode",
    "x9_quality_score",
    "x11_fingerprint",
    "st1_tumbling_window",
    "st3_session_window",
    "f1_geohash",
    "o4_top_k",
    "sql1_topk_revenue",
    "j6_asof_join",
    "t6_json_funcs",
    "x12_ann_ivf",
    "x23_curation_pipeline",
    # round-2 additions: the two round-1 hash-fix keys, a ranking
    # window, the IN-subquery SQL shape, and the real media decoders —
    # so regressions in those surfaces show up in BENCH_r02+.
    "p8_pivot",
    "t7_array_funcs",
    "w1_row_number",
    "sql4_in_subquery",
    "m5_decode",
    "m6_audio_decode",
    # round-3: deferred-family representatives (VERDICT r2 #7) so
    # their first driver round also produces a timing row
    "a15_mode",
    "sql5_window_rank",
    "w7_percent_rank_cume_dist",
    "u4_snapshot_diff",
    "o1_order_by",
    # round-3 flagship operators
    "m9_png_decode",
    "g1_pagerank",
    "x33_boilerplate_ngrams",
    "w8_time_range_frame",
    # round-3 late additions: two-sided join, substring-run dedup,
    # PMI pair mining
    "j12_full_outer_join",
    "x41_substring_dedup",
    "x43_pmi_cooccurrence",
    # round-3 final additions: behavioral analytics, line-level dedup,
    # z-order bin model, calendar arithmetic
    "a22_funnel",
    "w10_gaps_islands",
    "x44_line_dedup",
    "l12_zorder_bins",
    "t13_date_arith",
    # this-session additions: skew diagnostics, BFS, incremental
    # dedup, lateral SQL, HLL sketch merge, nested roundtrip, tiling
    "a27_key_skew_profile",
    "g3_bfs_levels",
    "x46_incremental_dedup",
    "sql8_lateral_topn",
    "a28_hll_sketch_merge",
    "s14_nested_roundtrip",
    "m11_image_tiles",
    # round-3 warehouse/vector additions: attribution windows, daily
    # gap-fill, blocked band self-join, int8 vector quantization
    "a29_attribution",
    "w11_resample_ffill",
    "j13_band_join",
    "x47_embedding_quantize",
    "a31_cms_heavy_hitters",
    "w12_cumulative_distinct",
    "j14_null_safe_join",
    "j15_scd2_pit_join",
    "p10_try_arithmetic",
    "a32_data_quality_checks",
    "d3_column_drift",
    "sql9_grouping_id",
    "m12_audio_energy",
    "f6_multi_format_dates",
    "x48_dedup_survivorship",
    "x49_quality_prune_curve",
    "x50_span_corruption",
    "x51_nucleus_selection",
    "x52_embedding_mean_pool",
    "a33_rolling_active_users",
    "x53_hard_negative_mining",
    "s16_fixed_width",
    "a34_benford_first_digit",
    "j16_interval_overlap_join",
    "m13_video_scene_cuts",
    # round-4 additions: exact-k hash reservoir, radius-bounded kNN
    # join, convergence-loop components, centroid outlier screen
    "x54_reservoir_sample",
    "j17_knn_join",
    "g4_connected_components",
    "x55_embedding_outlier",
    "j18_skew_salted_join",
    "x56_ngram_novelty",
    "m14_phash_near_dup",
    "a35_mad_outliers",
    "x57_token_budget_fill",
    "x58_diversity_sample",
    # round-4 second wave: network/bitwise scalar surfaces, QUALIFY
    # top-n, robust window/stats, shard balance, FastSS lev-join,
    # blocked record linkage, graph degree profile
    "f7_ipv4_funcs",
    "t14_bitwise_funcs",
    "sql10_qualify_topn",
    "w13_moving_median",
    "a36_ks_two_sample",
    "x59_quantile_normalize",
    "x60_winsorize",
    "x61_shard_balance",
    "j19_edit_distance_join",
    "d4_record_linkage",
    "g5_degree_distribution",
    "a37_chi_square",
    "a38_lag_autocovariance",
    "x62_langid_confusion",
    "f8_hash_digest_funcs",
    "o5_nulls_ordering",
    "w14_drawdown",
    "j20_star_denorm",
    # round-4 third wave: EWMA smoothing, Gini concentration,
    # conversion latency, URL-parse surface, sanitizer, bloom
    # prefilter calibration, token-shift drift, gzip CSV roundtrip
    "w15_ewma",
    "a39_gini",
    "a40_conversion_lag",
    "f9_url_parse",
    "t15_unicode_sanitize",
    "x63_bloom_prefilter",
    "x64_token_shift",
    "s17_compressed_csv",
    "a41_ols_trend",
    "t16_json_nested",
    "d5_golden_record",
    "x65_vocab_coverage",
    # round-4 perf pass: every key refactored off the
    # explode(interpreted-lambda) pattern gets a bench row so the
    # zip-slice plan shape can't regress silently
    "x24_repetition_filter",
    "x22_decontaminate",
    "x29_fuzzy_decontaminate",
    "x45_source_overlap",
    "x36_oov_filter",
    "t10_stem_stopword",
    "x37_entropy_filter",
    # round-4 fourth wave: PIVOT SQL clause, phonetic keying, HLL
    # inclusion-exclusion overlap, tolerance as-of join
    "sql11_pivot_syntax",
    "f10_phonetic_key",
    "a42_sketch_overlap",
    "j21_asof_tolerance",
    "x66_tokenizer_fertility",
    "x67_cluster_size_profile",
    # round-4 seventh wave: email canonicalization, rolling OLS slope
    # window, multiline-JSON landing source
    "f11_email_normalize",
    "w16_moving_slope",
    "s18_multiline_json",
    "g6_common_neighbors",
    "m15_image_channel_stats",
    "x68_mixture_upsample",
    "x69_range_shards",
    "m16_audio_silence_runs",
    "x70_boilerplate_scrub",
    "u6_union_by_name",
    "a43_markov_transitions",
    "a44_path_pattern",
    "t17_higher_order_funcs",
    "s19_partition_discovery",
    "sql13_pipe_syntax",
    "t18_variant_extract",
    "sql14_parameterized",
    "e2_media_pipeline",
    "a45_window_funnel",
    "a46_dow_seasonality",
    "f12_money_parse",
    "e3_observe_metrics",
    "w17_rolling_mad",
    "x71_importance_weights",
    "g7_k_core",
    "m17_bmp_decode",
    "a47_ratio_to_report",
    "w18_resample_bfill",
    "d6_blocking_recall",
    "m18_wav_decimate",
    "st16_stream_distinct_users",
    # round-2 new flagship operators; sink-writing queries (j9 table
    # build via its cached fixture, st7 file staging + checkpoints)
    # stay LAST so their IO can't pollute earlier timings
    "x26_semdedup",
    "x27_perplexity_filter",
    "m7_image_phash",
    "j10_spatial_blocked_join",
    "j9_bucketed_join",
    "st7_foreach_batch_upsert",
    # sink-writing round-3 late additions: the commit-log MERGE table
    # and the 4-batch watermark stream — both stage files + write
    "l7_txn_log_merge",
    # deletion-vector merge-on-read delete over the same logtable
    # fixture (copies the table + writes sidecars — tail group), and
    # the purge that applies+retires the mask
    "l16_position_deletes",
    "l17_dv_purge",
    "l18_restore",
    "l19_shallow_clone",
    "st9_watermark_late_drop",
    # builds the same 4-merge logtable, then diffs each commit's
    # add/remove files — sink-writing, so it stays in the tail group
    "l11_change_feed",
    # CDC-folded aggregate view and the stateful sessionizer — both
    # session-2 wave: interval union, market basket, ordered
    # listagg, UNPIVOT surface, padding audit, calibration curve
    "w19_interval_union",
    "a49_market_basket",
    "a48_string_agg",
    "sql15_unpivot_syntax",
    "x72_length_bucket_pack",
    "x73_calibration_curve",
    "l20_write_audit_publish",
    "w20_cusum_drift",
    "f13_luhn_checksum",
    "x74_source_js_divergence",
    "l21_concurrent_merge_retry",
    "s20_bloom_filter_pointread",
    "a50_rfm_segmentation",
    "x75_code_data_filter",
    "sql16_join_hints",
    "l22_log_checkpoint",
    "w21_rolling_corr",
    "f14_timezone_localize",
    "x77_dp_noisy_release",
    "sql17_group_by_all",
    "x78_bm25_scoring",
    "a52_kaplan_meier",
    "a53_holt_forecast",
    "s21_corrupt_file_recovery",
    "a54_referential_audit",
    "st17_stream_cusum",
    "p11_transpose",
    "e4_entity_resolution",
    "u7_intersect_all",
    "x79_dataset_card",
    "a55_pareto_share",
    "l23_retention_vacuum",
    "w22_sigma_anomaly_days",
    "w23_mom_change",
    "a57_new_vs_returning",
    "x81_embedding_norm_audit",
    "s22_glob_recursive_scan",
    "w24_rank_migration",
    "a58_repeat_intervals",
    "x80_zipf_check",
    "j22_bracket_lookup",
    "a56_abc_analysis",
    "g8_degree_assortativity",
    "x82_prefix_reuse",
    "w25_local_peaks",
    "x83_term_burstiness",
    "x84_reshard_stability",
    "x85_sample_bias_audit",
    "st18_stream_topk",
    "m19_media_sniff",
    "l24_merge_schema_evolution",
    "e5_board_pack",
    "a59_topn_plus_other",
    "x86_k_anonymity_audit",
    "a60_backtest_naive",
    "s23_zstd_roundtrip",
    "j23_null_skew_split",
    "o6_keyset_pagination",
    "a61_same_store_growth",
    "x87_injection_scan",
    "a62_holiday_uplift",
    "x88_threshold_sweep",
    "a63_forecast_backtest",
    "w26_growth_streaks",
    "a64_cycle_time",
    "a65_growth_contribution",
    "l25_orphan_audit",
    "a66_weekday_hour_heatmap",
    "w27_decay_score",
    "x89_dedup_savings",
    "a67_cohort_ltv",
    "x90_derived_stopwords",
    "w28_monthly_bands",
    "w29_ohlc",
    "o7_skyline",
    "a68_bitmap_distinct",
    "x91_code_switching",
    "x92_inverted_index",
    "g9_label_propagation",
    "a69_dau_mau_stickiness",
    "a70_equidepth_histogram",
    "w30_resample_linterp",
    "x93_repeated_ngram_spans",
    "a71_freshness_audit",
    "x94_power_iteration_pc",
    "sql18_named_window",
    "f15_surrogate_key",
    "e6_ops_health",
    "x95_cdc_chunking",
    "l26_merge_full_sync",
    "sql19_filtered_agg",
    "j24_join_explosion_audit",
    "a72_revenue_recognition",
    "l27_bitemporal_asof",
    "d7_duplicate_payments",
    "x96_feature_hashing",
    "a73_revenue_bridge",
    "a74_spatial_hotspots",
    "l29_scd3_dimension",
    "a75_fiscal_445_calendar",
    "w31_series_align",
    "x97_soft_dedup_weights",
    "x98_winnow_overlap",
    "u8_diff_column_provenance",
    "j25_interval_intersect_measure",
    "g10_two_hop_reach",
    "j26_role_playing_dates",
    "s26_storage_footprint_audit",
    "a76_markov_3step",
    "t19_string_distance_funcs",
    "sql20_set_op_precedence",
    "x99_ndcg_at_10",
    "x100_planted_dup_mrr",
    "a77_forecast_interval_coverage",
    "x101_rendezvous_hashing",
    "w32_hot_streak_window",
    "a78_anova_eta_squared",
    "t20_array_set_algebra",
    "x102_prefix_filter_join",
    "d8_sample_dedup_bias",
    "f16_geohash_decode",
    "f17_geohash_neighbors",
    "l30_merge_idempotency",
    "st19_exactly_once_sink",
    "w33_rolling_mode",
    "a79_alert_rule_backtest",
    "a80_diff_in_diff",
    "sql21_range_tvf",
    "sql22_lateral_column_alias",
    "sql23_interval_range_frame",
    "sql24_projected_exists",
    "m20_integral_image",
    "a81_price_volume_mix",
    "j27_anti_range_join",
    "m21_conv2d_stencil",
    "s27_rowgroup_stats_pruning",
    "a82_runs_test",
    "f18_binary_encodings",
    "sql25_star_except",
    "a83_bootstrap_ci",
    "g11_closeness_landmarks",
    "a84_proportional_allocation",
    # stage files/checkpoints, so they close the tail group
    "s24_csv_header_drift",
    "l28_dynamic_partition_overwrite",
    "e7_medallion_pipeline",
    "l13_incremental_agg_view",
    "st13_sessionize_state",
]


def bench_order() -> list[str]:
    """EVERY registered key, curated HEADLINE ordering first.

    Any registry key not explicitly placed in HEADLINE is appended in
    sorted order, so the bench covers the whole registry by
    construction (VERDICT r4 #4: a key absent from the bench is a key
    whose regression is invisible) and a future registration cannot
    silently opt out. The appended block sits after HEADLINE's
    sink-writing tail, which keeps the curated prefix comparable
    round-over-round.
    """
    registry.load_all()
    head = [k for k in HEADLINE if k in registry.QUERIES]
    rest = sorted(k for k in registry.QUERIES if k not in set(head))
    return head + rest


# BENCH_r06's first HEADLINE rows (a4 3.62 s, j4 3.45 s, j1 2.31 s …)
# read 2-4x their isolated cold-job cost purely because the driver's
# early-suite measurements absorbed machine/startup contention
# (VERDICT r6 "What's wrong" #1; tools/isolated_bench.py refuted every
# apparent regression). So the EARLY BLOCK of the suite — where that
# contention lands — takes the MIN of two timed executions; one noisy
# run can no longer masquerade as a per-key regression. Later keys run
# once: by then the machine has settled, and 441 extra executions
# would double the suite for no signal.
EARLY_BLOCK = 30
EARLY_TRIALS = 2

# The streaming family gets min-of-2 regardless of suite position
# (VERDICT r7 "Next round" #3): st keys pay a per-trigger micro-batch
# floor (~1.1 s/trigger, SCALE.md state-store probe) whose scheduling
# jitter produced a ~2.6x run-to-run spread on UNCHANGED code —
# st4_stateful_dedup read 2.44/2.59/6.72/4.45 s across four r6-r7 runs
# while streaming/stateful.py had no diff. The st keys sit mid-suite,
# outside the early block, so each round risked a phantom regression
# hunt; min-of-2 bounds the jitter the same way it killed the a4
# phantom (3.62 -> 0.96 s in BENCH_r07).
MULTI_TRIAL_PREFIXES = ("st",)


def _trials(i: int, key: str) -> int:
    if i < EARLY_BLOCK or key.startswith(MULTI_TRIAL_PREFIXES):
        return EARLY_TRIALS
    return 1


def main() -> None:
    registry.load_all()
    spark = get_spark("bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # Warm the JVM/session with a trivial action so the first measured
    # query doesn't pay session startup.
    spark.range(1000).count()

    times: dict[str, float] = {}
    for i, key in enumerate(bench_order()):
        fn = registry.QUERIES[key]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm-up
        # Each call builds FRESH DataFrames, so a query's internal
        # persist()s can never be reused by the next call — without a
        # clear, 2x441 executions accumulate dead cache entries until
        # storage eviction churn taxes every late query (~10% on the
        # round-4 comparable subset, measured). Clearing between
        # queries keeps each measurement independent; the measured run
        # rebuilds its own persists exactly as a cold cluster job
        # would, while JIT/codegen/footer warm-up (the JVM state the
        # warm-up run exists for) survives.
        best = float("inf")
        for _ in range(_trials(i, key)):
            spark.catalog.clearCache()
            start = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        times[key] = round(best, 3)
        spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # The driver records only the TAIL of stdout; round 3's 89-entry
    # per-query dict overflowed it and the headline total was lost
    # (BENCH_r03.json "parsed": null — VERDICT r3 "Next round" #2).
    # So: full per-query detail goes to a sidecar file AND an earlier
    # stdout line, and the FINAL line is a compact summary whose
    # "queries" dict is bounded to the slowest 15 (~600 bytes total).
    protocol = {
        "early_block": EARLY_BLOCK,
        "early_trials": EARLY_TRIALS,
        "multi_trial_prefixes": list(MULTI_TRIAL_PREFIXES),
        "timing": "min of trials, warm-up run excluded, clearCache between runs",
    }
    detail = {
        "metric": "headline_queries_detail",
        "value": total,
        "unit": "sec",
        "queries": times,
        "protocol": protocol,
        "sf": sf_val,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))

    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:15])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(times),
                "queries_full": "BENCH_DETAIL.json",
                "protocol": protocol,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
