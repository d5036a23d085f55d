"""Registry-wide sweep for re-inlined expensive expressions (r7).

[standing-gate] — per-round battery (plan-structure gates).

Catalyst's CollapseProject + SimplifyExtractValueOps substitute a
projected alias's defining expression into every reference — so an
expensive expression (regexp, digest, set intersection, edit
distance, geohash) consumed by several output columns, by a threshold
filter over its alias, or by an explode's fan-out is silently
evaluated once PER REFERENCE (m20's raster regexp ran 100x/doc; d4's
levenshtein 4x/pair). The fix is the let-binding idiom:
``transform(array(<expr>), x -> ...)`` evaluates once;
``inline(transform(array(<expr>), x -> named_struct(...)))`` unpacks
multi-column outputs through one evaluation (Generate is a collapse
barrier, so filters on generated columns are safe).

This sweep walks every registry key's FORMATTED plan and reports
expressions matching the expensive-pattern list that appear >= 3
times. CAVEAT — known false positive class: an expression inside a
partial aggregate prints in BOTH the partial and final HashAggregate
nodes (and their function lists) but evaluates once per row; the two
such sites in the registry are pinned in DOCUMENTED_PARTIAL_AGG below
(VERDICT r7 ask #5) and the sweep FAILS (exit 1) on any hit outside
that allowlist, so a new re-inlining site cannot land silently.
Verify a new hit is in distinct Filter/Project/Generate operators
before "fixing" it. Confirmed single-evaluation shapes are pinned
one-by-one in
tests/test_plan_quality.py::test_expensive_expression_evaluates_once;
the allowlist + a sampled sweep run in the suite via
tests/test_reinline_sweep.py.

Usage: python tools/reinline_sweep.py [sf_dir]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAT = re.compile(
    r"(regexp_replace\([^)]{0,80}|regexp_extract\([^)]{0,80}|md5\([^)]{0,60}"
    r"|sha2\([^)]{0,60}|array_intersect\([^)]{0,40}|array_distinct\([^)]{0,60}"
    r"|levenshtein\([^)]{0,40}|sentences\([^)]{0,40}"
    r"|transform\(sequence\([^)]{0,40})"
)

# Documented false positives (mirrors window_audit.DOCUMENTED_CONTRACTS):
# key -> substring that must appear in every allowlisted hit. Both are
# sampling md5s used as a HashAggregate grouping/aggregate input — the
# expression prints in the partial AND final aggregate nodes (and
# their function lists, 4 mentions total) but row data flows through
# it exactly once, map-side. Verified by reading the executed plans at
# r7 close; any OTHER expression (or these keys growing a NEW hot
# expression) still fails the sweep.
DOCUMENTED_PARTIAL_AGG: dict[str, str] = {
    "x25_domain_mix": "md5(cast(concat(mix:",
    "x32_temperature_mix": "md5(cast(concat(tmx:",
}


def sweep(spark, keys, sf_dir: str) -> dict[str, dict[str, int]]:
    """Return {key: {expr: mentions}} for NON-allowlisted hot sites.

    A build error surfaces as {key: {"BUILD ERROR <type>": -1}} so
    callers (and the suite gate) cannot mistake a broken plan build
    for a clean sweep.
    """
    from voter_file_etl_spark import registry

    registry.load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out: dict[str, dict[str, int]] = {}
    for key in keys:
        if key.startswith(("st", "e")):
            # stream/pipeline executors: building them runs the
            # pipeline and the returned frame is the materialized
            # result — nothing to sweep.
            continue
        try:
            df = registry.QUERIES[key](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            out[key] = {f"BUILD ERROR {type(exc).__name__}": -1}
            continue
        counts = collections.Counter(m.group(1) for m in PAT.finditer(plan))
        allowed = DOCUMENTED_PARTIAL_AGG.get(key)
        hot = {
            e[:60]: n
            for e, n in counts.items()
            if n >= 3 and not (allowed and allowed in e)
        }
        if hot:
            out[key] = hot
    return out


def main() -> None:
    from voter_file_etl_spark import registry
    from voter_file_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all()
    spark = get_spark("reinline_sweep")
    hits = sweep(spark, sorted(registry.QUERIES), sf_dir)
    for key, hot in hits.items():
        print(f"{key}: {hot}")
    print(
        f"\n{len(hits)} keys flagged outside the DOCUMENTED_PARTIAL_AGG "
        f"allowlist ({sorted(DOCUMENTED_PARTIAL_AGG)})"
    )
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
