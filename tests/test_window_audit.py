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

from tools.window_audit import DOCUMENTED_CONTRACTS, audit_df, audit_registry


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


def test_localcheckpoint_cannot_launder_unbounded_window_input(spark, sf_dir):
    # ADVICE r7 #4: RDDScanExec erases provenance — localCheckpoint()
    # over raw scan rows presents the same node as a 10-row
    # createDataFrame, so treating it as structurally bounding would
    # let a global window over checkpointed raw data pass the audit.
    # The rule: RDDScan is CONTRACT-bounding (bounded=False, verdict
    # 'contract'), forcing a DOCUMENTED_CONTRACTS entry.
    import os as _os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet(_os.path.join(sf_dir, "nation.parquet"))
    laundered = raw.localCheckpoint(eager=False)
    win = laundered.withColumn(
        "rn", F.row_number().over(Window.orderBy("n_nationkey"))
    )
    findings = audit_df(win)
    assert len(findings) == 1
    assert findings[0]["verdict"] == "contract"
    assert findings[0]["bounded"] is False
    # ...while a genuine LocalRelation (SQL VALUES / Arrow-converted
    # driver rows -> LocalTableScanExec) stays structurally bounded.
    # (A list-of-tuples createDataFrame plans as RDDScanExec and is
    # deliberately ALSO contract-bounding — the audit cannot tell it
    # apart from a checkpoint, and such control tables sit below
    # aggregates in every registry plan anyway.)
    local = spark.sql("SELECT * FROM VALUES (1), (2) AS t(k)").withColumn(
        "rn", F.row_number().over(Window.orderBy("k"))
    )
    ok = audit_df(local)
    assert len(ok) == 1 and ok[0]["bounded"], ok
