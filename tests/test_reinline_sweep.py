"""Suite gate for the projection re-inlining sweep (VERDICT r7 ask #5).

Round 7 found that CollapseProject + SimplifyExtractValueOps silently
re-evaluate an expensive expression once per output reference / per
exploded row, and fixed 10 keys with the let-binding idiom
(``transform(array(<expr>), x -> ...)``). The registry-wide sweep
(`tools/reinline_sweep.py`) then reported exactly two residual hits,
both documented partial-aggregate false positives (the expression
prints in the partial AND final HashAggregate nodes but evaluates
once per row). This test pins that state: it runs the sweep over a
deterministic sampled subset — every key the r7 pass touched, every
key carrying the expensive-pattern families the sweep targets, plus
the two allowlisted keys — and fails on ANY hit outside
``reinline_sweep.DOCUMENTED_PARTIAL_AGG``, and on the allowlist going
stale (an allowlisted key that no longer exhibits its documented FP
signature should be removed, not silently carried).
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import reinline_sweep

# Every key whose plan was rewritten in the r7 re-inlining pass (the
# let-binding idiom must not regress), the keys whose plans carry the
# swept expression families most densely, and the two allowlisted FPs.
SAMPLED_KEYS = [
    "m20_integral_image",
    "m21_conv2d_stencil",
    "x4_ngram_jaccard",
    "x40_curation_report",
    "x2_dedup_minhash",
    "x29_fuzzy_decontaminate",
    "x35_containment_dedup",
    "x88_threshold_sweep",
    "j5_prefix_join",
    "a83_bootstrap_ci",
    "d4_record_linkage",
    "x85_sample_bias_audit",
    "x22_decontaminate",
    "x11_fingerprint",
    "f8_hash_digest_funcs",
    "x25_domain_mix",
    "x32_temperature_mix",
]


def test_sampled_sweep_is_clean_outside_the_pinned_allowlist(spark, sf_dir):
    hits = reinline_sweep.sweep(spark, SAMPLED_KEYS, sf_dir)
    assert hits == {}, (
        f"re-inlined expensive expressions outside "
        f"DOCUMENTED_PARTIAL_AGG (let-bind them via "
        f"transform(array(<expr>), x -> ...)): {hits}"
    )


def test_allowlist_is_not_stale(spark, sf_dir):
    # Each allowlisted key must still exhibit its documented FP
    # signature (>=3 plan mentions of the pinned substring); otherwise
    # the allowlist entry is dead weight that could mask a future
    # genuine hit on the same key.
    from voter_file_etl_spark import registry

    registry.load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for key, sig in reinline_sweep.DOCUMENTED_PARTIAL_AGG.items():
        plan = (
            registry.QUERIES[key](spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(mode)
        )
        counts = collections.Counter(
            m.group(1) for m in reinline_sweep.PAT.finditer(plan)
        )
        matching = [e for e, n in counts.items() if sig in e and n >= 3]
        assert matching, (
            f"{key}: allowlisted signature {sig!r} no longer appears "
            f">=3 times — remove the DOCUMENTED_PARTIAL_AGG entry"
        )
        # And the FP class is real: the mentions sit in aggregate
        # nodes, not in multiple Project/Filter/Generate operators.
        assert "HashAggregate" in plan
