"""Source-level discipline gates.

VERDICT r13 #2: raw ``.localCheckpoint()`` call sites scattered across
operators bypassed the durable-checkpoint switch in session.py — an
executor loss at scale loses the blocks and fails the job even when
the operator *thought* it had opted into durability via
$SPARK_GRAFT_CHECKPOINT_DIR. The fix routes every materialization
through ``session.materialize`` (or ``iter_checkpoint`` for iterative
loops); these tests keep it that way.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "voter_file_etl_spark")


def _py_sources():
    for dirpath, _, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for name in files:
            if name.endswith(".py"):
                yield os.path.join(dirpath, name)


def test_no_raw_local_checkpoint_outside_session():
    # The only permitted localCheckpoint call sites are inside
    # session.py (the env-switch implementation itself). Everything
    # else must go through materialize()/iter_checkpoint so that
    # $SPARK_GRAFT_CHECKPOINT_DIR flips EVERY materialization to a
    # durable reliable checkpoint, not just the iterative loops.
    offenders = []
    for path in _py_sources():
        if os.path.basename(path) == "session.py":
            continue
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                code = line.split("#", 1)[0]
                if ".localCheckpoint(" in code:
                    offenders.append(f"{path}:{lineno}")
    assert not offenders, (
        "raw localCheckpoint call sites bypass the durable-checkpoint "
        f"switch — route through session.materialize: {offenders}"
    )


def test_materialize_honors_durable_checkpoint_env(spark, tmp_path, monkeypatch):
    # With $SPARK_GRAFT_CHECKPOINT_DIR set, materialize() must write
    # reliable-checkpoint data under the dir and the consumer plan
    # must scan the materialized rows (an RDD-scan leaf — the source
    # subtree is gone). Without it, nothing lands on the FS.
    from voter_file_etl_spark.session import CHECKPOINT_DIR_ENV, materialize

    src = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )

    monkeypatch.delenv(CHECKPOINT_DIR_ENV, raising=False)
    local = src.transform(materialize)
    assert local.count() == 100

    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, str(ckpt))
    durable = src.transform(materialize)
    assert durable.count() == 100
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "durable mode wrote nothing under the checkpoint dir"
    # Plan leaf: the materialized frame scans checkpoint blocks, not
    # the original range source.
    plan = durable._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan, plan[:2000]
    assert "Range (0, 100" not in plan, plan[:2000]
