"""Exhaustive unpartitioned-window plan audit (VERDICT r6 ask #5).

[standing-gate] — per-round battery (plan-structure gates).

Walks the physical plan of EVERY registry key and finds each
WindowExec / WindowInPandasExec / WindowGroupLimitExec whose
``partitionSpec`` is empty — the shape that moves ALL rows to a single
partition at scale. For each such window the audit proves its input is
bounded: on every path from the window node down to a file-scan leaf
there must be an aggregate, a limit, or a driver-built local relation
— i.e. the global window runs over O(groups)/O(buckets)/O(k) rows,
never over raw scan rows.

Keys whose boundedness is contractual rather than structural (the
plan itself cannot show it) are listed in ``DOCUMENTED_CONTRACTS``
with the partition key a 100 TB deployment would add; the pytest gate
(tests/test_window_audit.py) fails the suite if an unpartitioned
window appears outside this inventory, so drift cannot silently put a
global window over raw rows.

KNOWN LAUNDERING HOLE, closed by rule (ADVICE r7 #4): ``RDDScanExec``
erases its input's provenance — ``localCheckpoint()`` over an
UNBOUNDED DataFrame presents the identical node as ``createDataFrame``
over ten driver rows, so treating it as structurally bounding would
let a global window over checkpointed raw data pass the audit.
RDDScan is therefore CONTRACT-bounding, not structurally bounding: a
window whose boundedness rests only on an RDDScan must carry a
``DOCUMENTED_CONTRACTS`` entry stating its row-count contract. (A
list-of-tuples ``createDataFrame`` also plans as RDDScanExec and is
deliberately held to the same rule — the audit cannot tell it apart
from a checkpoint; every registry control table sits below an
aggregate anyway, so the rule landed with zero new entries.)
``LocalTableScanExec`` stays structural — it only arises from a
LocalRelation (SQL VALUES, Arrow-converted driver rows), which cannot
be unbounded (already in driver memory by construction).

Usage: python tools/window_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Node classes that BOUND the row count flowing upward: everything
# above them is O(groups) / O(k) / O(driver-built rows), not O(scan).
_BOUNDING = {
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
    "LocalTableScanExec",  # driver-built control rows (see docstring)
    # A windowed-over-window chain: the INNER window is audited on its
    # own; treating it as pass-through keeps path semantics correct.
}

# Node classes whose boundedness is a CONTRACT, not a structure: the
# plan cannot show what fed them (see the laundering-hole note in the
# module docstring). A window bounded only by one of these needs a
# DOCUMENTED_CONTRACTS entry with its row-count contract.
_CONTRACT_BOUNDING = {
    "RDDScanExec",  # localCheckpoint / internal-RDD scans
}

# Leaves that represent unbounded-at-scale input.
_UNBOUNDED_LEAVES = {
    "FileSourceScanExec",
    "BatchScanExec",
    "RowDataSourceScanExec",
    "RangeExec",
}

# key -> (why the empty-partition window is bounded by CONTRACT, and
# the partition key a 100 TB deployment would add). Structural cases
# (aggregate/limit below) do NOT belong here — only plans the audit
# cannot prove on its own.
DOCUMENTED_CONTRACTS: dict[str, str] = {
    # Both are PARITY formulations of range sharding: ntile over a
    # global ordering is the only cross-engine-exact way to express
    # "16 balanced range shards", and the oracle must see identical
    # assignments. At 100 TB the same assignment is
    # repartitionByRange(16, <sort key>) — sampled boundaries, no
    # global window — and each query's output (the per-shard rollup)
    # is exactly the disjointness check for sampled boundaries. The
    # in-code comments at the two sites say the same.
    "x69_range_shards": "repartitionByRange(16, n_chars, doc_id)",
    "l12_zorder_bins": "repartitionByRange(16, z, l_orderkey, l_linenumber)",
    # r13: the global median/MAD rank windows read the localCheckpoint
    # of the per-DAY series — O(calendar days) rows (the checkpoint
    # hides the groupBy(ed) that structurally bounded them before).
    # The day count is fixed by the 7-year order calendar, not by
    # data volume, so the window input does not grow with corpus
    # size; at a scale where it did, the fix is the a36 bucketed
    # two-level rank, as the in-code comment says.
    "a79_alert_rule_backtest": "per-day rollup, O(calendar days)",
}


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _paths_verdict(node) -> str:
    """'ok' iff every path below ``node`` hits a structurally bounding
    node before an unbounded leaf; 'contract' iff bounded only via a
    contract-bounding node (RDDScan — needs a DOCUMENTED_CONTRACTS
    entry); 'raw' iff some path reaches an unbounded leaf."""
    c = _cls(node)
    if c in _CONTRACT_BOUNDING:
        return "contract"
    if c in _BOUNDING:
        return "ok"
    if c == "RangeExec":
        # A literal Range is bounded by its own plan-embedded size
        # (e.g. spark.range(4) for a version/grid axis). A large or
        # computed range is data: keep it unbounded past 10k rows.
        return "ok" if int(str(node.numElements())) <= 10_000 else "raw"
    if c in _UNBOUNDED_LEAVES:
        return "raw"
    if c == "ReusedExchangeExec":
        # A reuse marker is a REFERENCE, not a leaf — its boundedness
        # is its referenced exchange's boundedness (treating it as an
        # unknown leaf produced false 'raw' verdicts on reused 1-row
        # aggregate broadcasts, r8 bnlj_audit).
        return _paths_verdict(node.child())
    if c in ("BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec"):
        # The build side is bounded BY CONSTRUCTION (it fits in a
        # broadcast, <= autoBroadcastJoinThreshold); only the streamed
        # side determines the join's output scale.
        streamed = 1 if "BuildLeft" in node.buildSide().toString() else 0
        return _paths_verdict(node.children().apply(streamed))
    ch = node.children()
    if ch.size() == 0:
        # Unknown leaf type: treat as unbounded so new source kinds
        # fail loud, not silent.
        return "raw"
    verdicts = [_paths_verdict(ch.apply(i)) for i in range(ch.size())]
    if "raw" in verdicts:
        return "raw"
    if "contract" in verdicts:
        return "contract"
    return "ok"


_WINDOW_CLASSES = {"WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"}


def audit_df(df) -> list[dict]:
    """All empty-partition window nodes in df's physical plan, each
    with a structural boundedness verdict."""
    plan = df._jdf.queryExecution().sparkPlan()
    findings = []
    for node in _walk(plan):
        if _cls(node) not in _WINDOW_CLASSES:
            continue
        if not node.partitionSpec().isEmpty():
            continue
        child = node.children().apply(0)
        verdict = _paths_verdict(child)
        findings.append(
            {
                "node": _cls(node),
                # 'contract' counts as NOT structurally bounded, so the
                # gate requires a DOCUMENTED_CONTRACTS entry for it.
                "bounded": verdict == "ok",
                "verdict": verdict,
                "child": _cls(child),
            }
        )
    return findings


def audit_registry(spark, sf_dir: str) -> dict[str, list[dict]]:
    from voter_file_etl_spark import registry

    registry.load_all()
    out: dict[str, list[dict]] = {}
    for key in sorted(registry.QUERIES):
        df = registry.QUERIES[key](spark, sf_dir)
        findings = audit_df(df)
        if findings:
            out[key] = findings
    return out


def main() -> None:
    from voter_file_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window_audit")
    results = audit_registry(spark, sf_dir)
    n_sites = sum(len(v) for v in results.values())
    bad = {
        k: v
        for k, v in results.items()
        if any(not f["bounded"] for f in v) and k not in DOCUMENTED_CONTRACTS
    }
    print(f"{len(results)} keys with empty-partition windows, {n_sites} sites")
    for k, v in sorted(results.items()):
        flags = "".join(
            ("OK " if f["bounded"] else f["verdict"].upper() + " ") for f in v
        )
        doc = " [contract]" if k in DOCUMENTED_CONTRACTS else ""
        print(f"  {k}: {flags}({', '.join(f['node'] + '<-' + f['child'] for f in v)}){doc}")
    if bad:
        print(f"\nUNBOUNDED outside contract inventory: {sorted(bad)}")
        sys.exit(1)
    print("\nall empty-partition windows bounded (structurally or by contract)")


if __name__ == "__main__":
    main()
