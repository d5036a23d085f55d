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
# Round 2 window: the two round-1 failures (t7 scalarized, p8 oracle
# BIGINT-cast) re-check first, then the new m5_decode, then the 47
# highest-novelty keys that had no CORRECTNESS_r01 row. Five unchecked
# keys whose machinery is already proven by green siblings (u3/u4 ~
# u1/u2; o1/o3/o4 ~ p7/w5/sql1) defer to round 3, as does any key
# newly registered this round (they land after _CHECK_FIRST, before
# the round-1 greens). Round 3 should rotate: deferred + new keys
# first, round-2 greens last.
# ---------------------------------------------------------------------------
_CHECK_FIRST = [
    "t7_array_funcs", "p8_pivot", "m5_decode",
    "sql1_topk_revenue", "sql2_join_chain", "sql3_correlated_subquery",
    "sql4_in_subquery", "j6_asof_join", "j7_range_join",
    "st2_sliding_window", "st3_session_window", "t6_json_funcs",
    "w1_row_number", "w2_rank_dense_rank", "w3_agg_over_frame",
    "w4_lag_lead", "w6_first_last", "d1_drop_duplicates",
    "d2_fuzzy_dedup", "x1_dedup_exact", "x2_dedup_minhash",
    "x3_dedup_simhash", "x4_ngram_jaccard", "x17_dedup_clusters",
    "x22_decontaminate", "m1_multimodal_meta", "m2_multimodal_features",
    "m3_frame_sample", "m4_resize", "x13_hash_sample",
    "x14_stratified_sample", "x15_train_test_split", "x21_context_packing",
    "x23_curation_pipeline", "x5_embedding_dedup", "x6_ann_topk",
    "x12_ann_ivf", "x7_ann_lsh", "t5_tokenize_explode", "x8_lang_id",
    "x9_quality_score", "x10_token_count", "x11_fingerprint",
    "x16_tfidf", "x18_bigram_lm", "x20_pii_redact", "st6_interval_join",
    "st4_stateful_dedup", "st1_tumbling_window", "st5_stream_static_join",
]
_CHECK_LAST = [  # green in CORRECTNESS_r01 — rotate out of the window
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
]


def _ordered(keys: dict) -> list[str]:
    head = [k for k in _CHECK_FIRST if k in keys]
    tail = [k for k in _CHECK_LAST if k in keys]
    placed = set(head) | set(tail)
    rest = [k for k in keys if k not in placed]  # deferred + newly added
    return head + rest + tail


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
