"""Exhaustive unpartitioned-window drift gate (VERDICT r6 ask #5).

One sweep over EVERY registry key's physical plan: each
WindowExec/WindowInPandasExec/WindowGroupLimitExec with an empty
partitionSpec must have structurally bounded input (every path from
the window to a file-scan leaf crosses an aggregate / limit /
local-relation / broadcast build side) or be named in
tools/window_audit.DOCUMENTED_CONTRACTS with its at-scale partition
strategy. A future edit that puts a global window over raw scan rows
fails here by name — whether the key is new or old.

The per-key inventory lives in SCALE.md §14 ("Unpartitioned-window
inventory"); tools/window_audit.py prints the current state.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.window_audit import DOCUMENTED_CONTRACTS, audit_registry


def test_every_unpartitioned_window_is_bounded_or_documented(spark, sf_dir):
    results = audit_registry(spark, sf_dir)
    violations = {
        k: [f for f in v if not f["bounded"]]
        for k, v in results.items()
        if any(not f["bounded"] for f in v) and k not in DOCUMENTED_CONTRACTS
    }
    assert not violations, (
        "unpartitioned windows over unbounded input outside the "
        f"documented-contract inventory: {violations} — either fix the "
        "plan (partition the window / pre-aggregate its input) or add "
        "the key to tools/window_audit.DOCUMENTED_CONTRACTS with its "
        "at-scale partition strategy AND the SCALE.md inventory line"
    )
    # the contract inventory must not hold stale entries: every entry
    # still corresponds to a live unpartitioned-window key
    stale = [
        k
        for k in DOCUMENTED_CONTRACTS
        if k not in results or all(f["bounded"] for f in results[k])
    ]
    assert not stale, f"DOCUMENTED_CONTRACTS entries no longer needed: {stale}"
