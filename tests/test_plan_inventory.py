"""Suite gate for the physical-plan census (tools/plan_inventory.py, r8).

The committed ``PLAN_INVENTORY.json`` pins every censusable key's
scale-relevant node counts (shuffles, join strategies, Python eval
nodes, generates, scans). The full-registry check is the tool /
round-close battery; in the suite a deterministic sample re-censuses
against the baseline so drift in the hottest shapes fails fast, plus
two registry-wide structural facts that need no Spark at all.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import plan_inventory

# The sample: the heaviest join/dedup/window shapes (where a silently
# added shuffle or a broadcast->SMJ flip costs most at 100 TB), one
# representative per plan family the census exists to pin, and the
# r7/r8 perf-rewrite keys whose plan shape is the fix.
SAMPLED_KEYS = [
    "j1_inner_join",          # broadcast dimension join: bhj, no shuffle
    "j4_large_join",          # fact-fact SMJ
    "j8_salted_join",         # salted skew join
    "p6_anti_join",           # broadcast left-anti
    "a4_groupby_count",       # partial+final agg, one shuffle
    "a5_household_agg",
    "w1_row_number",          # one window shuffle
    "o4_top_k",               # TakeOrderedAndProject
    "x1_dedup_exact",
    "x2_dedup_minhash",       # bucketed LSH, never all-pairs
    "m14_phash_near_dup",     # Hamming-ball delta-join (r7 rewrite)
    "m20_integral_image",     # fully row-local (r7 rewrite)
    "x17_dedup_clusters",     # one-window block groups (r8 rewrite)
    "a83_bootstrap_ci",       # one md5/row + partial agg (r7 rewrite)
    "x7_ann_lsh",
    "g4_connected_components",  # checkpointed fixpoint leaf
    "l3_partition_pruning",
    "sql1_topk_revenue",
]


def _baseline() -> dict:
    with open(plan_inventory.BASELINE_PATH) as fh:
        return json.load(fh)


def test_baseline_covers_exactly_the_censusable_registry():
    # No Spark needed: a key added without a baseline row (or a
    # baseline row for a dropped key) fails here even before any
    # plan is built.
    from voter_file_etl_spark import registry

    registry.load_all()
    assert sorted(_baseline()) == plan_inventory.censusable_keys(registry)


def test_baseline_has_no_forbidden_nodes_and_no_build_errors():
    base = _baseline()
    assert plan_inventory.forbidden_hits(base) == {}
    broken = {k: v for k, v in base.items() if any(n < 0 for n in v.values())}
    assert broken == {}, f"baseline captured build errors: {broken}"


def test_sampled_census_matches_the_committed_baseline(spark, sf_dir):
    current = plan_inventory.census_registry(spark, sf_dir, keys=SAMPLED_KEYS)
    assert plan_inventory.forbidden_hits(current) == {}
    drift = plan_inventory.diff_censuses(_baseline(), current)
    assert drift == {}, (
        f"physical-plan census drifted (review, then regenerate via "
        f"python tools/plan_inventory.py --write): {drift}"
    )
