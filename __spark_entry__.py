"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1-shaped groupBy-agg) at sf0.001.
queries()       — every implemented operator from SURVEY.md §2 + the
                  north-star LLM-pipeline suite (registry-backed).
oracle_sql()    — matching DuckDB SQL per key (omitted only for ops
                  that are not SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voter_file_etl_spark import registry  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Driver-coverage rotation (the driver oracle-checks the FIRST 50 keys
# of queries() per round — contract documented in SURVEY.md §8).
#
# Round 3 window: the 25 keys that have never had a driver CORRECTNESS
# row (everything registered in round 2 plus the round-2-deferred
# u3/u4, o1/o3/o4, a15, sql5, w7) lead. Any key newly registered THIS
# round is unplaced and sorts immediately after them — inside the
# window — so new code is always externally oracle-checked the round
# it lands (per ADVICE r2). The window then backfills to 50 from
# _BACKFILL (round-1 greens, oldest first, earning a second green);
# round-2 greens close the list.
# ---------------------------------------------------------------------------
_CHECK_FIRST = [
    # never driver-checked (VERDICT r2 "What's missing" #1)
    "x24_repetition_filter", "x25_domain_mix", "x26_semdedup",
    "x27_perplexity_filter", "x28_bpe_merge_pairs",
    "x29_fuzzy_decontaminate", "x30_kmeans_codebook", "x31_url_normalize",
    "m6_audio_decode", "m7_image_phash",
    "j9_bucketed_join", "j10_spatial_blocked_join",
    "st7_foreach_batch_upsert", "st8_stream_dedup_builtin",
    "e1_etl_pipeline", "l5_schema_evolution",
    "sql5_window_rank", "a15_mode", "f4_normalize_phone",
    "o1_order_by", "o3_limit_offset", "o4_top_k",
    "u3_except", "u4_snapshot_diff", "w7_percent_rank_cume_dist",
]
_BACKFILL = [  # placed OUTSIDE the 50-key window (head 25 + 25 r3 keys fill it)
    # ROUND-4 NOTE: the never-checked set to front next round = this
    # list's first block below PLUS the unplaced keys that overflowed
    # past position 50 (m8/m9/m10/m12, x32-x34, x36/x37/x39/x40,
    # x47/x49, t10 — run `[k for k in queries()][50:]` minus greens
    # to enumerate exactly).
    # -- registered late in round 3, after the window filled: never
    # driver-checked — FRONT THESE IN _CHECK_FIRST FOR ROUND 4 --
    "l7_txn_log_merge", "l8_time_travel",
    "j12_full_outer_join", "a19_bool_bit_agg", "w9_nth_value",
    "t12_hash_encode", "sql6_cte_exists", "s12_orc_roundtrip",
    "st9_watermark_late_drop",
    "x41_substring_dedup", "x42_doc_chunking", "x43_pmi_cooccurrence",
    "l9_gdpr_delete", "l10_scd2_history", "a21_column_profile",
    "t13_date_arith", "st10_stream_into_logtable",
    "a22_funnel", "a23_retention_cohorts", "w10_gaps_islands",
    "l11_change_feed", "l12_zorder_bins", "x44_line_dedup",
    "sql7_recursive_hierarchy", "a24_sweepline_concurrency",
    "g2_triangle_count", "x45_source_overlap",
    "st11_stream_outer_join", "l13_incremental_agg_view",
    "st13_sessionize_state", "a27_key_skew_profile", "g3_bfs_levels",
    "s13_binary_source", "x46_incremental_dedup",
    "sql8_lateral_topn", "a28_hll_sketch_merge", "s14_nested_roundtrip",
    "m11_image_tiles", "l15_vacuum", "s15_merge_schema",
    "st14_incremental_ingest",
    # -- round-1 greens, oldest first --
    "a2_reconcile", "a4_groupby_count", "a5_household_agg",
    "a6_multi_distinct", "a7_rollup", "a13_argmax", "a14_stats_exact",
    "s1_file_scan", "s2_csv_read", "s6_count", "s7_write_roundtrip",
    "s8_manifest", "p1_project", "p2_nullif", "p3_cast",
    "p4_filter_contains", "p5_filter_prefix", "p6_anti_join",
    "p7_offset_window", "s9_json_roundtrip", "l3_partition_pruning",
    "s10_permissive_read", "j1_inner_join", "j2_left_join",
    "j3_semi_join", "j4_large_join", "j5_prefix_join", "j8_salted_join",
    "l2_overwrite_roundtrip", "l4_merge_upsert", "p9_unpivot",
    "a8_cube", "a9_grouping_sets", "a10_percentiles",
    "a11_approx_distinct", "w5_ntile_dist", "a12_approx_percentile",
    "f1_geohash", "f2_str_replace", "f3_split_extract",
    "t1_string_funcs", "t2_date_funcs", "t3_math_funcs",
    "t4_conditional", "t8_regexp_funcs", "t9_haversine",
    "u1_union", "u2_intersect",
    # round-1 failures re-greened in r2
    "t7_array_funcs", "p8_pivot",
    # round-2 greens close the list
    "m5_decode", "sql1_topk_revenue", "sql2_join_chain",
    "sql3_correlated_subquery", "sql4_in_subquery", "j6_asof_join",
    "j7_range_join", "st2_sliding_window", "st3_session_window",
    "t6_json_funcs", "w1_row_number", "w2_rank_dense_rank",
    "w3_agg_over_frame", "w4_lag_lead", "w6_first_last",
    "d1_drop_duplicates", "d2_fuzzy_dedup", "x1_dedup_exact",
    "x2_dedup_minhash", "x3_dedup_simhash", "x4_ngram_jaccard",
    "x17_dedup_clusters", "x22_decontaminate", "m1_multimodal_meta",
    "m2_multimodal_features", "m3_frame_sample", "m4_resize",
    "x13_hash_sample", "x14_stratified_sample", "x15_train_test_split",
    "x21_context_packing", "x23_curation_pipeline", "x5_embedding_dedup",
    "x6_ann_topk", "x12_ann_ivf", "x7_ann_lsh", "t5_tokenize_explode",
    "x8_lang_id", "x9_quality_score", "x10_token_count",
    "x11_fingerprint", "x16_tfidf", "x18_bigram_lm", "x20_pii_redact",
    "st6_interval_join", "st4_stateful_dedup", "st1_tumbling_window",
    "st5_stream_static_join",
]


def _ordered(keys: dict) -> list[str]:
    head = [k for k in _CHECK_FIRST if k in keys]
    placed = set(head) | set(_BACKFILL)
    new = [k for k in keys if k not in placed]  # registered this round
    backfill = [k for k in _BACKFILL if k in keys]
    return head + new + backfill


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["a4_groupby_count"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return {k: registry.QUERIES[k] for k in _ordered(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLE)
