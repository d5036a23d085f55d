"""The sf1.0 scale-critical battery (VERDICT r8 ask #6).

[standing-gate] — per-round battery (README §battery).

r8's full-registry sf1.0 replay caught five real at-scale defects;
the curated subset below is the STANDING close gate — cheap enough to
run every round, targeted at the defect classes the replay actually
found. Full-registry sf1.0 remains mandatory on any round that
touches arithmetic emission paths (see .claude/skills/verify/SKILL.md).

Selection rationale, by defect class observed at sf1.0:
- decimal->double conversion cliffs + money sums (a4's 1-ulp class)
- int64 overflow in aggregates and array folds (a77/a78/x55 class)
- rounding ties at emitted precision (x34 class — every intmath user)
- oracle-side join-order blow-ups (a45/j27/j13 class — the non-equi
  oracles with event-pair shapes plus the costliest measured ones)
- dedup/ANN/graph keys whose pair spaces or fixpoints grow at 10x
- stats keys whose test statistics concentrate (ties/overflow) at 10x

Carve-out (VERDICT r9 #4): d2_fuzzy_dedup's deliberately brute-force
oracle is the registry's costliest at sf1.0 — ~450M in-block
levenshteins (bounded, no non-equi operator; r9 measured ~570 s
single-thread-pinned, r10 re-measure after the row-group layout fix:
155 s wall / 10.1 min CPU) — and its cost is pure pair VOLUME, which
no sound prefilter can cut on this data (every c_name is fixed-length
with the constant prefix 'Customer#', so length-band, prefix-half and
suffix-half pigeonhole filters are all vacuously true; see SCALE.md
r10). The battery therefore checks d2 at sf0.5 (same algorithm both
sides, no scale-dependent branch, ~1/4 the pairs — 82 s wall
measured), with the full sf1.0 d2 check re-run only when dedup
blocking code changes. CARVED_OUT prints with --carved; the default
list omits those keys.

Usage:
  python tools/sf1_battery.py          # print the main battery keys
  python tools/sf1_battery.py | xargs python tools/driver_sim.py /tmp/sf1.0
  python tools/sf1_battery.py --carved | xargs python tools/driver_sim.py /tmp/sf0.5
  (build /tmp/sf0.5 once: python tools/sf_generate.py /tmp/sf0.5 0.5)
"""

from __future__ import annotations

import sys

# key -> the sf dir the carve-out runs at (and why it is sound there).
CARVED_OUT = {
    "d2_fuzzy_dedup": "/tmp/sf0.5",
}

BATTERY = [
    # money / decimal->double conversion class (a4 find)
    "a4_groupby_count", "sql1_topk_revenue", "a72_revenue_recognition",
    "a73_revenue_bridge", "a81_price_volume_mix", "a14_stats_exact",
    # overflow-in-aggregate / in-fold class (a77, a78, x55 finds)
    "a77_forecast_interval_coverage", "a78_anova_eta_squared",
    "x55_embedding_outlier", "a82_runs_test", "a83_bootstrap_ci",
    "a84_proportional_allocation",
    # rounding-tie class (x34 find + the r9 floor-idiom sweep set)
    "x34_quality_classifier", "a10_percentiles", "a12_approx_percentile",
    "a17_corr_covar", "t3_math_funcs", "t9_haversine",
    "j10_spatial_blocked_join", "j17_knn_join", "x27_perplexity_filter",
    "x30_kmeans_codebook", "x32_temperature_mix", "x35_containment_dedup",
    "x36_oov_filter", "x37_entropy_filter", "x38_minhash_accuracy",
    "x39_ann_recall", "x45_source_overlap", "x73_calibration_curve",
    "w30_resample_linterp", "x94_power_iteration_pc",
    # oracle join-order class (a45, j27, j13 finds) + funnel/sequence
    "a45_window_funnel", "a22_funnel", "a40_conversion_lag",
    "a44_path_pattern", "j27_anti_range_join", "j13_band_join",
    "j11_nearest_event_join", "j16_interval_overlap_join",
    "j7_range_join", "j19_edit_distance_join",
    # dedup family at 10x pair space
    "x1_dedup_exact", "x2_dedup_minhash", "x3_dedup_simhash",
    "x4_ngram_jaccard", "x17_dedup_clusters", "d2_fuzzy_dedup",
    "x44_line_dedup", "x46_incremental_dedup", "m14_phash_near_dup",
    "x29_fuzzy_decontaminate",
    # ANN / embedding at 10x vectors
    "x5_embedding_dedup", "x6_ann_topk", "x7_ann_lsh", "x12_ann_ivf",
    "x26_semdedup", "x47_embedding_quantize", "x53_hard_negative_mining",
    "x99_ndcg_at_10", "x100_planted_dup_mrr",
    # graph fixpoints at 10x nodes
    "g1_pagerank", "g3_bfs_levels", "g4_connected_components",
    "g7_k_core", "g9_label_propagation", "g11_closeness_landmarks",
    # text statistics that concentrate at 10x docs
    "x10_token_count", "x16_tfidf", "x43_pmi_cooccurrence",
    "x74_source_js_divergence", "x78_bm25_scoring", "x83_term_burstiness",
    "x90_derived_stopwords",
    # stateful streaming at 10x events
    "st1_tumbling_window", "st4_stateful_dedup",
    # multimodal heavy hitters measured >10 s oracle-side at sf1.0
    "m13_video_scene_cuts", "m20_integral_image", "m21_conv2d_stencil",
]

assert len(BATTERY) == len(set(BATTERY)), "duplicate battery key"
assert set(CARVED_OUT) <= set(BATTERY), "carve-out key not in battery"

if __name__ == "__main__":
    if "--carved" in sys.argv:
        print("\n".join(CARVED_OUT))
    else:
        print("\n".join(k for k in BATTERY if k not in CARVED_OUT))
