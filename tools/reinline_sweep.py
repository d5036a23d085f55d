"""Registry-wide sweep for re-inlined expensive expressions (r7).

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
nodes (and their function lists) but evaluates once per row; x25/
x32/x85's sampling md5s are examples. Verify a hit is in distinct
Filter/Project/Generate operators before "fixing" it. Confirmed
sites are pinned one-by-one in
tests/test_plan_quality.py::test_expensive_expression_evaluates_once.

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


def main() -> None:
    from voter_file_etl_spark import registry
    from voter_file_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all()
    spark = get_spark("reinline_sweep")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    flagged = 0
    for key in sorted(registry.QUERIES):
        if key.startswith(("st", "e")):
            # stream/pipeline executors: building them runs the
            # pipeline and the returned frame is the materialized
            # result — nothing to sweep.
            continue
        try:
            df = registry.QUERIES[key](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"{key}: BUILD ERROR {type(exc).__name__}")
            continue
        counts = collections.Counter(m.group(1) for m in PAT.finditer(plan))
        hot = {e[:60]: n for e, n in counts.items() if n >= 3}
        if hot:
            flagged += 1
            print(f"{key}: {hot}")
    print(f"\n{flagged} keys flagged (verify against the partial-agg FP class)")


if __name__ == "__main__":
    main()
