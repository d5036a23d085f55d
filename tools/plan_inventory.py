"""Registry-wide physical-plan inventory + drift gate (r8).

[standing-gate] — per-round battery (--check drift gate).

Every scale posture this repo argues for — broadcast the dimension,
one shuffle per window family, dedup via buckets never pairs, no
driver loops — is ultimately a statement about which PHYSICAL nodes a
key's plan contains. The window audit pins one shape (unpartitioned
windows), the reinline sweep pins one pathology (multi-evaluation);
this tool pins the whole operator census: for every registry key it
walks ``queryExecution().sparkPlan()`` and counts the
scale-relevant node classes, writing the result to
``PLAN_INVENTORY.json`` at the repo root.

The committed JSON is a DRIFT GATE, not documentation: ``--check``
recomputes the census and exits 1 on ANY per-key difference, so a
change that silently adds a shuffle, swaps a broadcast join for a
sort-merge join, introduces a cartesian product, or pushes work into
a Python eval node cannot land without the diff being reviewed and
the baseline regenerated on purpose. Two invariants hold regardless
of what the baseline says:

- ``CartesianProductExec`` count is 0 for every key (no allowlist —
  nothing in the registry needs an unconditioned cross join; a theta
  join against a bounded set plans as BroadcastNestedLoopJoin, which
  IS counted and baselined per key);
- ``BatchEvalPythonExec`` (row-at-a-time Python UDF) count is 0 for
  every key — the repo-wide "UDFs are the slow path" rule, enforced
  structurally instead of by grep.

Counts come from the EXECUTED plan with AQE disabled for the census
build — ``sparkPlan`` predates EnsureRequirements, so exchanges are
not inserted there yet, and with AQE on the executed plan is an
opaque AdaptiveSparkPlanExec wrapper; AQE-off ``executedPlan`` is the
full static physical plan (exchanges included), deterministic given
confs + file stats, at the sf0.001 fixture like the other audits.
(AQE's runtime re-plans only ever REDUCE this static census — convert
an SMJ to broadcast, coalesce partitions — so the baseline is the
worst-case shape.) st*/e* keys are skipped for the same reason reinline_sweep
skips them: building them EXECUTES the stream/pipeline and the
returned frame is a materialized result, not the pipeline's plan.
Keys that run eager fixpoints internally (g-family) census the final
returned frame — trivially small by design (checkpointed leaves), and
that triviality is exactly what the gate pins.

Usage:
    python tools/plan_inventory.py [sf_dir]            # print census
    python tools/plan_inventory.py --write [sf_dir]    # write baseline
    python tools/plan_inventory.py --check [sf_dir]    # gate (exit 1 on drift)
"""

from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(_REPO, "PLAN_INVENTORY.json")

# Physical node classes worth pinning, with the short census name.
# Anything not listed is structural noise (Project/Filter/Sort/
# AQE wrappers) whose drift is not a scale signal by itself.
COUNTED = {
    "ShuffleExchangeExec": "shuffle",
    "BroadcastExchangeExec": "broadcast",
    "SortMergeJoinExec": "smj",
    "ShuffledHashJoinExec": "shj",
    "BroadcastHashJoinExec": "bhj",
    "BroadcastNestedLoopJoinExec": "bnlj",
    "CartesianProductExec": "cartesian",
    "WindowExec": "window",
    "WindowGroupLimitExec": "window_limit",
    "WindowInPandasExec": "window_pandas",
    "GenerateExec": "generate",
    "BatchEvalPythonExec": "py_row_udf",
    "ArrowEvalPythonExec": "py_arrow_udf",
    "FlatMapGroupsInPandasExec": "apply_in_pandas",
    "MapInPandasExec": "map_in_pandas",
    "FileSourceScanExec": "scan",
    "RDDScanExec": "rdd_scan",
    "TakeOrderedAndProjectExec": "top_k",
}

# Node classes that must NEVER appear, baseline or not.
FORBIDDEN = {"CartesianProductExec", "BatchEvalPythonExec"}

# Builders that execute eagerly (streams, multi-stage pipelines):
# census would describe the materialized result, at the cost of
# RUNNING the key — skipped, mirroring tools/reinline_sweep.py.
_SKIP_PREFIXES = ("st", "e")


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def census_df(df) -> dict[str, int]:
    counts: collections.Counter[str] = collections.Counter()
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in COUNTED:
            counts[COUNTED[cls]] += 1
    return dict(sorted(counts.items()))


class _aqe_off:
    """Build plans under AQE-off so executedPlan is the full static
    physical plan, not an AdaptiveSparkPlanExec wrapper (restores the
    session conf on exit — the suite session keeps AQE on)."""

    def __init__(self, spark):
        self._spark = spark

    def __enter__(self):
        self._old = self._spark.conf.get("spark.sql.adaptive.enabled")
        self._spark.conf.set("spark.sql.adaptive.enabled", "false")

    def __exit__(self, *exc):
        self._spark.conf.set("spark.sql.adaptive.enabled", self._old)


def censusable_keys(registry) -> list[str]:
    return [
        k for k in sorted(registry.QUERIES) if not k.startswith(_SKIP_PREFIXES)
    ]


def census_registry(spark, sf_dir: str, keys=None) -> dict[str, dict[str, int]]:
    """{key: {node: count}}; a build error becomes
    {"BUILD_ERROR_<type>": -1} so the gate can't mistake a broken
    builder for a clean census."""
    from voter_file_etl_spark import registry

    registry.load_all()
    out: dict[str, dict[str, int]] = {}
    with _aqe_off(spark):
        for key in keys if keys is not None else censusable_keys(registry):
            # A key built earlier (here or anywhere in the session) may
            # have left persisted intermediates; a later key whose plan
            # overlaps would then census InMemoryTableScan instead of
            # its real subtree — build-order dependence a drift gate
            # cannot tolerate. Census every key against a cold cache.
            spark.catalog.clearCache()
            try:
                out[key] = census_df(registry.QUERIES[key](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                out[key] = {f"BUILD_ERROR_{type(exc).__name__}": -1}
    spark.catalog.clearCache()
    return out


def forbidden_hits(census: dict[str, dict[str, int]]) -> dict[str, dict[str, int]]:
    names = {COUNTED[c] for c in FORBIDDEN}
    return {
        k: {n: c for n, c in v.items() if n in names and c}
        for k, v in census.items()
        if any(v.get(n) for n in names)
    }


def diff_censuses(
    baseline: dict[str, dict[str, int]], current: dict[str, dict[str, int]]
) -> dict[str, str]:
    """Human-readable per-key drift between two censuses (only keys
    present in ``current`` are compared, so sampled checks work)."""
    drift: dict[str, str] = {}
    for key, cur in current.items():
        base = baseline.get(key)
        if base is None:
            drift[key] = f"not in baseline (have {cur})"
        elif base != cur:
            nodes = sorted(set(base) | set(cur))
            delta = {
                n: f"{base.get(n, 0)}->{cur.get(n, 0)}"
                for n in nodes
                if base.get(n, 0) != cur.get(n, 0)
            }
            drift[key] = str(delta)
    return drift


def main() -> None:
    from voter_file_etl_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("plan_inventory")
    census = census_registry(spark, sf_dir)

    bad = forbidden_hits(census)
    if bad:
        print(f"FORBIDDEN nodes (cartesian / row-wise Python UDF): {bad}")
        sys.exit(1)

    if "--write" in flags:
        with open(BASELINE_PATH, "w") as fh:
            json.dump(census, fh, indent=1, sort_keys=True)
            fh.write("\n")
        totals: collections.Counter[str] = collections.Counter()
        for v in census.values():
            totals.update(v)
        print(f"wrote {BASELINE_PATH}: {len(census)} keys")
        print(f"totals: {dict(sorted(totals.items()))}")
        return

    if "--check" in flags:
        with open(BASELINE_PATH) as fh:
            baseline = json.load(fh)
        drift = diff_censuses(baseline, census)
        missing = sorted(set(baseline) - set(census))
        for key, msg in sorted(drift.items()):
            print(f"DRIFT {key}: {msg}")
        if missing:
            print(f"keys in baseline but no longer censusable: {missing}")
        if drift or missing:
            print(
                "\nphysical-plan census drifted — review the diff above and "
                "regenerate deliberately: python tools/plan_inventory.py --write"
            )
            sys.exit(1)
        print(f"census clean: {len(census)} keys match the baseline")
        return

    for key, counts in census.items():
        print(f"{key}: {counts}")


if __name__ == "__main__":
    main()
