#!/usr/bin/env python
"""Dump the physical plans of representative queries to PLANS.md.

[standing-gate] — standing tool (regenerates PLANS.md when plans change).

The audit trail behind SCALE.md: for each plan-shape family, the
actual `explain("formatted")` output at sf0.1, with the properties
the engine relies on (PushedFilters, pruned ReadSchema,
BroadcastHashJoin, partial+final HashAggregate, TakeOrderedAndProject,
PartitionFilters) visible in black and white. Regenerate with
`python tools/plan_audit.py` after plan-affecting changes;
tests/test_plan_quality.py enforces the same properties in CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDIT = [
    ("a4_groupby_count", "scan -> pushed filter -> partial+final agg (TPC-H Q1 shape)"),
    ("j1_inner_join", "dimension join -> BroadcastHashJoin, zero shuffle"),
    ("j4_large_join", "fact-fact join -> AQE-selected strategy"),
    ("sql1_topk_revenue", "3-way join + top-k -> TakeOrderedAndProject"),
    ("l3_partition_pruning", "partitioned read -> PartitionFilters"),
    ("p6_anti_join", "manifest skip-logic -> broadcast LeftAnti"),
    ("w1_row_number", "window -> single shuffle on partition key"),
    ("x2_dedup_minhash", "MinHash LSH -> band-key shuffle, candidate-only verify"),
    ("x5_embedding_dedup", "block-local Gram matmul via applyInPandas"),
    ("st3_session_window", "session windows -> merge inside the aggregate"),
    ("j9_bucketed_join", "bucketed co-located join -> no exchange above the scans"),
    ("j10_spatial_blocked_join", "grid-blocked spatial join -> cell equi-join, never cartesian"),
    ("x26_semdedup", "SemDeDup -> broadcast-codebook assign + bounded cell pairs + label propagation"),
    ("a6_multi_distinct", "multi-distinct without Expand -> joined single-distinct aggs"),
    ("l5_schema_evolution", "mergeSchema read -> pruned union schema"),
    # round-3 plan families
    ("w8_time_range_frame", "value-bounded RANGE frame -> one shuffle + running frame"),
    ("a16_weighted_median", "cumulative-weight window + conditional min"),
    ("j11_nearest_event_join", "two running windows over one sort, no pairwise distance join"),
    ("x33_boilerplate_ngrams", "global top-K stats -> broadcast join scoring"),
    ("x32_temperature_mix", "tiny rate table broadcast back -> map-side membership"),
    ("l6_compaction", "repartition on partition column -> one file per partition"),
    # round-3 final additions
    ("a22_funnel", "sequential user-keyed step joins, AQE co-partitioned"),
    ("w10_gaps_islands", "per-user window + island rollup, no SinglePartition"),
    ("x44_line_dedup", "line-key winner window -> doc reassembly groupBy"),
    ("l11_change_feed", "per-commit add/remove full-outer diff on the upsert key"),
    # this-session additions
    ("sql8_lateral_topn", "LATERAL LIMIT -> decorrelated Window + WindowGroupLimit"),
    ("a27_key_skew_profile", "heavy-key head -> TakeOrderedAndProject, window on 10 rows"),
    ("g3_bfs_levels", "frontier BFS -> equi-joins on node id, no cartesian"),
    ("x46_incremental_dedup", "corpus distinct-key join + batch-side arbitration window"),
    ("l13_incremental_agg_view", "CDC fold -> O(delta) union/groupBy, 32-row spine window"),
    # round-3 perf-pass additions
    ("j13_band_join", "numeric band self-join -> bucket equi-join, 3x bounded explode"),
    ("w11_resample_ffill", "daily spine via sequence/explode + ffill windows, no self-join"),
    ("a31_cms_heavy_hitters", "count-min sketch cells -> bounded depth explode + groupBy"),
    ("x47_embedding_quantize", "SQ8 vector quantization -> map-side array lambdas, zero exchange"),
    ("a29_attribution", "first/last-touch from ONE (user,time) window exchange"),
    ("a32_data_quality_checks", "expectation suite -> one aggregate per rule + broadcast orphan join"),
    # round-4 additions
    ("x54_reservoir_sample", "exact-k hash reservoir -> TakeOrderedAndProject, no global sort"),
    ("j17_knn_join", "radius-bounded kNN -> 9x grid equi-join + per-probe window"),
    ("x55_embedding_outlier", "per-label centroid outliers -> posexplode partial agg + broadcast centroids"),
    # round-4 second wave
    ("j19_edit_distance_join", "FastSS lev<=1 join -> deletion-key equi-join, no V^2 scan"),
    ("d4_record_linkage", "blocked (nationkey, prefix) candidate equi-join + map-side scoring"),
    ("a36_ks_two_sample", "two-level CDF prefix scan -> bucket offsets + partitioned windows"),
    ("x60_winsorize", "grouped percentile_disc -> broadcast clip bounds, two passes"),
    ("sql10_qualify_topn", "QUALIFY surface -> per-customer window + WindowGroupLimit"),
    # round-4 third/fourth/fifth waves
    ("w15_ewma", "dyadic-weight EWMA -> one o_custkey window exchange, codegen lag chain"),
    ("a39_gini", "rank-form Gini -> per-segment window + grouped aggregate, int64"),
    ("a40_conversion_lag", "first-click->first-purchase -> user-keyed aggregates, AQE co-partition"),
    ("f9_url_parse", "native parse_url inversion -> map-side, bounded host rollup"),
    ("x63_bloom_prefilter", "broadcast bit-set probes map-side; only truth-join shuffles"),
    ("x64_token_shift", "token-keyed partial agg -> TakeOrderedAndProject top-50"),
    ("a41_ols_trend", "daily-collapse OLS -> bounded sums, no window, no join"),
    ("d5_golden_record", "field-wise survivorship -> ONE entity-keyed conditional aggregate"),
    ("x65_vocab_coverage", "token counts partial/final -> bounded-vocab ranking window"),
    ("x56_ngram_novelty", "zip-slice shingles -> single LeftOuter mark-join on xxhash64 keys"),
    ("x41_substring_dedup", "positional zip-slice shingles -> hashed-key DF-capped self-join + diagonal islands"),
    ("a42_sketch_overlap", "map-side HLL partials -> 1-row broadcast estimates + truth intersect"),
    ("j21_asof_tolerance", "tolerance as-of -> union+last_value single sort, zero joins"),
    ("sql11_pivot_syntax", "PIVOT clause -> partial/final aggregate, broadcast dim join"),
    ("w16_moving_slope", "rolling OLS: rank + frame sums share ONE o_custkey exchange"),
    ("g6_common_neighbors", "wedge equi-joins on middle node + LEFT ANTI screen, no nested loop"),
    ("m15_image_channel_stats", "Arrow decode map-side; exchange carries 3-sum rows, not pixels"),
    ("x68_mixture_upsample", "O(domains) factor broadcast -> map-side bounded explode -> rollup"),
    ("x70_boilerplate_scrub", "line freq distinct-count -> LEFT ANTI scrub -> one rebuild groupBy"),
    ("m16_audio_silence_runs", "WAV decode + run-length inside one Arrow batch; zero shuffles"),
    ("a44_path_pattern", "journey strings built in one user_id shuffle; motif counts map-side"),
    ("a45_window_funnel", "level semi-joins with time-band predicates; bounded 4-value rollup"),
    ("t16_json_nested", "ONE from_json parse feeds all fields; bounded-priority rollup"),
    ("t18_variant_extract", "parse_json once -> typed variant_get paths; map-side"),
    ("sql13_pipe_syntax", "|> chain lowers to broadcast join + TakeOrderedAndProject"),
    ("e2_media_pipeline", "one Arrow decode emits phash+sums; dedup window on 4-int rows"),
    ("w19_interval_union", "islands sweep: ONE user_id exchange serves both windows + both rollups"),
    ("a49_market_basket", "pair gen ON ORDERKEY ONLY (bounded fanout); marginals + total broadcast; ob materialized once"),
    ("sql15_unpivot_syntax", "UNPIVOT -> map-side Expand over pre-aggregated 5-row rollup"),
    ("w20_cusum_drift", "sequential recurrence ABOVE the weekly aggregate (FlatMapGroupsInPandas sees O(weeks) rows)"),
    ("f13_luhn_checksum", "checksum as codegen transform/aggregate lambdas; no Generate, one rollup exchange"),
    ("x74_source_js_divergence", "O(S^2) pair fan-out via two equi-joins against broadcast pair table"),
    ("a50_rfm_segmentation", "RFM ntile windows over the CUSTOMER rollup; anchor date broadcast"),
    ("w21_rolling_corr", "six exact bigint sufficient statistics share ONE Window node"),
    ("x78_bm25_scoring", "probe filter pushed into tf branch scan; corpus stats broadcast"),
    ("a52_kaplan_meier", "risk-set + log-survival windows over the bounded duration rollup"),
    ("a54_referential_audit", "four LeftAnti joins on key-only projections"),
    ("e4_entity_resolution", "blocked candidates materialized once; six funnel aggregates fan out"),
    ("w29_ohlc", "OHLC via partial min_by/max_by on fused seq; ONE month exchange"),
    ("o7_skyline", "Pareto front: two-level prefix max, broadcast bucket offsets, no cartesian"),
    ("a68_bitmap_distinct", "exact distinct via partial bit_or words + popcount; no Expand"),
    ("x92_inverted_index", "salted (w, doc%64) rank cells -> exact 640-row re-rank; TakeOrdered top-500"),
    ("a70_equidepth_histogram", "global rank = bkt-partitioned cumsum + O(buckets) offsets + 1-row total"),
    ("x94_power_iteration_pc", "map-side Gram outer products; broadcast O(d) vector joins per round"),
    ("x95_cdc_chunking", "MapInPandas chunker directly over scan; only chunk-hash rollups shuffle"),
    ("j24_join_explosion_audit", "join cardinality from O(keys) counts; the join itself never runs"),
    ("a83_bootstrap_ci", "ONE md5/row (let-bound) -> kept-replicate explode -> partial agg; shuffle O(seg x 32)"),
    ("x17_dedup_clusters", "equivalence blocking -> ONE blk window (min + count>=2), never clique edges + iteration (r8)"),
    ("a69_dau_mau_stickiness", "trailing-30d distinct via bounded coverage explode; no distinct window"),
    ("j25_interval_intersect_measure", "two-set boundary sweep: one cust-partitioned window pass, no pair join"),
    ("j26_role_playing_dates", "one conformed date dim broadcast into BOTH roles; fact scanned once"),
    ("x98_winnow_overlap", "fingerprint-collision pairs with df-capped fanout; TakeOrdered top-20"),
    ("x102_prefix_filter_join", "PPJoin prefix candidates -> bounded exact verify; all-pairs never planned"),
    ("a76_markov_3step", "T^3 as two O(d^2) join+groupBy multiplies; events touched once"),
    ("w32_hot_streak_window", "Kadane as prefix-sum + running-min windows; no recurrence"),
    ("x101_rendezvous_hashing", "HRW: bounded 8x explode + doc-partitioned argmax windows"),
    ("a78_anova_eta_squared", "variance decomposition over 7-group rollup; broadcast totals"),
    ("w33_rolling_mode", "windowed mode via bounded 7x coverage explode of the daily rollup"),
    ("f17_geohash_neighbors", "integer bit-interleave re-encode; stays in whole-stage codegen"),
    ("a79_alert_rule_backtest", "two rules share one flags table; element-pick medians over calendar-bounded series"),
    # round-4 continuation-session plan families
    ("j27_anti_range_join", "anti join with a pure range predicate -> bucketized equi LeftAnti, 3x bounded explode"),
    ("m21_conv2d_stencil", "2-D convolution -> joinless scatter-aggregate (kernel explode + one groupBy)"),
    ("s27_rowgroup_stats_pruning", "zone-map layout write + O(files) footer audit; point read over bucketed files"),
    ("sql25_star_except", "* EXCEPT exclusion -> column pruning reaches the scan ReadSchema"),
]


def main() -> None:
    spark = get_spark("plan_audit")
    out = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        f"Scale factor dir: `{SF_DIR}`. See SCALE.md for the design",
        "rationale; tests/test_plan_quality.py enforces the key",
        "properties on every test run.",
        "",
    ]
    registry.load_all()
    for key, why in AUDIT:
        df = registry.QUERIES[key](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out.append(f"## {key}\n\n{why}\n\n```\n{plan.strip()}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
