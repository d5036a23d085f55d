"""BroadcastNestedLoopJoin build-side boundedness audit (r8).

[standing-gate] — per-round battery (plan-structure gates).

The plan census (tools/plan_inventory.py) counts 81
BroadcastNestedLoopJoinExec sites across the registry's static plans.
A BNLJ is the right plan for a theta join against a BOUNDED side
(threshold grids, calendar ranges, 1-row aggregates): the build side
broadcasts O(k) rows and the streamed side scans once. It is a 100 TB
disaster exactly when the build side is an unbounded scan — the
driver then buffers O(input) rows and every executor loops over them
per streamed row. The two regimes look identical at sf0.001.

This audit proves every BNLJ in the registry is the first kind: for
each BroadcastNestedLoopJoinExec in every key's AQE-off executed plan
it runs window_audit's path-boundedness verdict on the BUILD child —
'ok' iff every path hits an aggregate / limit / local relation /
literal Range before an unbounded leaf, 'contract' iff bounded only
via an RDDScan, 'raw' iff some path reaches a raw scan. Sites that
are bounded but not structurally provable — driver-built control
tables and scans under a literal id-range filter — carry a row-count
contract in DOCUMENTED_CONTRACTS; the audit exits 1 on any
raw/contract site outside that inventory, so a new theta join
against an unbounded side cannot land silently. The r8 baseline run
found zero genuinely unbounded sites (and two audit-precision fixes:
ReusedExchange references and literal Ranges are now resolved, not
treated as unknown leaves).

Usage: python tools/bnlj_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import plan_inventory
from tools.window_audit import _cls, _paths_verdict, _walk

# key -> why the build side is O(k) rows when the plan cannot show it.
# Mirrors window_audit.DOCUMENTED_CONTRACTS. Two honest classes only:
# driver-built control tables (ExistingRDD — 'contract' verdict) and
# scans bounded by a LITERAL id-range predicate visible in the plan
# ('raw' verdict structurally, k-row by the constant). Anything else
# raw is a defect; review before adding here.
DOCUMENTED_CONTRACTS: dict[str, str] = {
    # --- driver-built control tables (createDataFrame -> RDDScan) ---
    "a31_cms_heavy_hitters": "CMS hash-parameter rows: depth d=4 (a,b) pairs",
    "j22_bracket_lookup": "tax-bracket table: 5 (tier, lo, hi) rows",
    "j7_range_join": "band boundary table: 4 (band, lo, hi) rows",
    "m14_phash_near_dup": "Hamming-ball XOR masks: C(24,<=3)=2,325 deltas",
    "x49_quality_prune_curve": "min_words threshold grid: 6 rows",
    "x88_threshold_sweep": "similarity threshold grid: O(10) bp rows",
    # --- literal-id-range scans (bounded by a plan-visible constant) ---
    "t9_haversine": "reference points: s_suppkey < 50 literal filter",
    "x6_ann_topk": "query set: vec_id in [0, 8) literal + planted twins",
    "x39_ann_recall": "query set: vec_id in [0, 8) literal + planted twins",
    "x53_hard_negative_mining": "query set: vec_id in [0, 8) literal + planted twins",
    "x99_ndcg_at_10": "query set: vec_id in [0, 8) literal + planted twins",
    "x30_kmeans_codebook": "codebook seeds: vec_id in [0, 16) literal + planted twins",
    "x58_diversity_sample": "codebook seeds: vec_id in [0, 16) literal + planted twins",
}


def audit_df(df) -> list[dict]:
    findings = []
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        if _cls(node) != "BroadcastNestedLoopJoinExec":
            continue
        build_ix = 0 if "BuildLeft" in node.buildSide().toString() else 1
        child = node.children().apply(build_ix)
        # The build child is typically the BroadcastExchange itself —
        # the verdict walks through it to what actually broadcasts.
        findings.append(
            {
                "verdict": _paths_verdict(child),
                "build": _cls(child.children().apply(0))
                if _cls(child) == "BroadcastExchangeExec" and child.children().size()
                else _cls(child),
            }
        )
    return findings


def audit_registry(spark, sf_dir: str) -> dict[str, list[dict]]:
    from voter_file_etl_spark import registry

    registry.load_all()
    out: dict[str, list[dict]] = {}
    with plan_inventory._aqe_off(spark):
        for key in plan_inventory.censusable_keys(registry):
            spark.catalog.clearCache()
            findings = audit_df(registry.QUERIES[key](spark, sf_dir))
            if findings:
                out[key] = findings
    spark.catalog.clearCache()
    return out


def bad_keys(results: dict[str, list[dict]]) -> dict[str, list[dict]]:
    return {
        k: v
        for k, v in results.items()
        if k not in DOCUMENTED_CONTRACTS
        and any(f["verdict"] in ("raw", "contract") for f in v)
    }


def main() -> None:
    from voter_file_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("bnlj_audit")
    results = audit_registry(spark, sf_dir)
    n = sum(len(v) for v in results.values())
    print(f"{len(results)} keys with BNLJ sites, {n} sites")
    for k, v in sorted(results.items()):
        flags = " ".join(f"{f['verdict']}:{f['build']}" for f in v)
        print(f"  {k}: {flags}")
    bad = bad_keys(results)
    if bad:
        print(f"\nUNBOUNDED build sides: {sorted(bad)}")
        sys.exit(1)
    print("\nall BNLJ build sides bounded (structurally or by documented contract)")


if __name__ == "__main__":
    main()
