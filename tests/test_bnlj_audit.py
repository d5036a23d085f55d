"""Suite gate for the BNLJ build-side boundedness audit (r8).

Full-registry runs are the tool / round-close battery; here a
deterministic sample re-audits every key carrying a DOCUMENTED
contract (the shapes most likely to drift: control tables growing,
literal id-range bounds widening into data-dependent ones) plus
representative structurally-ok theta joins, and fails on any
raw/contract site outside ``bnlj_audit.DOCUMENTED_CONTRACTS``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import bnlj_audit, plan_inventory

SAMPLED_KEYS = sorted(bnlj_audit.DOCUMENTED_CONTRACTS) + [
    "a79_alert_rule_backtest",   # reused 1-row-agg broadcasts (6 sites)
    "x57_token_budget_fill",     # nested BNLJ over windowed prefix sums
    "x94_power_iteration_pc",    # per-round broadcast O(d) vectors
    "l13_incremental_agg_view",  # literal Range(4) version axis
]


def test_sampled_bnlj_build_sides_are_bounded(spark, sf_dir):
    from voter_file_etl_spark import registry

    registry.load_all()
    results: dict[str, list[dict]] = {}
    with plan_inventory._aqe_off(spark):
        for key in SAMPLED_KEYS:
            spark.catalog.clearCache()
            findings = bnlj_audit.audit_df(registry.QUERIES[key](spark, sf_dir))
            if findings:
                results[key] = findings
    spark.catalog.clearCache()
    bad = bnlj_audit.bad_keys(results)
    assert bad == {}, (
        f"BNLJ build sides not bounded and not documented in "
        f"bnlj_audit.DOCUMENTED_CONTRACTS: {bad}"
    )


def test_documented_contracts_are_not_stale(spark, sf_dir):
    # Every allowlisted key must still HAVE a non-ok BNLJ site;
    # otherwise the entry is dead weight that could mask a future
    # genuine unbounded join on the same key.
    from voter_file_etl_spark import registry

    registry.load_all()
    with plan_inventory._aqe_off(spark):
        for key in sorted(bnlj_audit.DOCUMENTED_CONTRACTS):
            spark.catalog.clearCache()
            findings = bnlj_audit.audit_df(registry.QUERIES[key](spark, sf_dir))
            assert any(f["verdict"] in ("raw", "contract") for f in findings), (
                f"{key}: no contract-needing BNLJ site remains — remove "
                f"its DOCUMENTED_CONTRACTS entry"
            )
    spark.catalog.clearCache()
