"""Oracle-side plan gates (VERDICT r8 ask #4 — the a45 class).

The correctness gate compares Spark against DuckDB, so the ORACLE's
physical plan is load-bearing too: a45 (r8) filled the disk at sf1.0
when DuckDB picked an IEJoin-first order, and the r9 audit
(tools/oracle_plan_audit.py) found two more — j27's NOT-EXISTS on a
pure inequality compiled to a BLOCKWISE_NL_JOIN (errors x clicks ~
4e10 pairs) and j13's abs()-band self-join to a NESTED_LOOP_JOIN
(part x part ~ 4e10), both >120 s at sf1.0 while green at sf0.01.

These tests run plan-only (DuckDB EXPLAIN, no Spark session, no
execution), so the whole registry is cheap to gate in-suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from voter_file_etl_spark import registry  # noqa: E402
from voter_file_etl_spark.tables import TABLE_NAMES  # noqa: E402

# Honor the suite-wide testdata override (ADVICE r9): the census is
# scale-invariant, so any sf works; skip rather than error on
# machines without the driver-generated parquet.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} absent"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{os.path.join(SF_DIR, name)}.parquet'"
        )
    registry.load_all()
    return c


def test_full_registry_census_matches_baseline():
    # The committed ORACLE_PLAN_INVENTORY.json pins which oracles may
    # carry non-equi join operators and which operator classes; a new
    # entry (or class change) fails here until it is adjudicated by
    # measurement (tools/oracle_plan_audit.py --time at sf1.0) and the
    # baseline regenerated with --write.
    proc = subprocess.run(
        [sys.executable, "tools/oracle_plan_audit.py", SF_DIR, "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_timing_drift_comparator():
    # Pure gate behind --time-drift (VERDICT r10 ask #6): >3x growth
    # drifts, sub-floor churn doesn't, a fresh TIMEOUT on a
    # previously-bounded key always drifts, keys absent from either
    # side are ignored (partial runs are legal).
    from tools.oracle_plan_audit import timing_drift_lines

    old = {
        "a": {"result": "10 rows", "secs": 5.0, "budget_s": 120},
        "b": {"result": "10 rows", "secs": 0.1},
        "c": {"result": "10 rows", "secs": 2.0},
        "d": {"result": "10 rows", "secs": 4.0},
        "only_old": {"result": "1 rows", "secs": 1.0},
    }
    new = {
        "a": {"result": "10 rows", "secs": 20.0},      # 4x — drift
        "b": {"result": "10 rows", "secs": 0.5},       # 5x but sub-floor
        "c": {"result": "TIMEOUT >120s", "secs": 120}, # bounded->timeout
        "d": {"result": "10 rows", "secs": 8.0},       # 2x — fine
        "only_new": {"result": "1 rows", "secs": 99.0},
    }
    lines = timing_drift_lines(old, new)
    flagged = {ln.split(":")[0] for ln in lines}
    assert flagged == {"a", "c"}, lines
    # The floor applies to either side: 0.1 -> 0.5 s is noise, but
    # 0.4 -> 2.0 s (crosses the floor) is real 5x growth.
    assert timing_drift_lines(
        {"e": {"result": "1 rows", "secs": 0.4}},
        {"e": {"result": "1 rows", "secs": 2.0}},
    )
    # ADVICE r11 #2: a committed TIMEOUT/ERROR never anchors a ratio.
    # A fast ERROR (2 s to fail) recovering to a healthy-but-slower
    # 10 s run is an improvement, not >3x drift; still-broken keys
    # are likewise skipped (the --time path counts them as n_bad).
    assert timing_drift_lines(
        {"f": {"result": "ERROR Binder", "secs": 2.0}},
        {"f": {"result": "10 rows", "secs": 10.0}},
    ) == []
    assert timing_drift_lines(
        {"g": {"result": "TIMEOUT >120s", "secs": 120.0}},
        {"g": {"result": "TIMEOUT >120s", "secs": 120.0}},
    ) == []


def test_time_drift_fatal_run_stages_instead_of_overwriting(
    tmp_path, monkeypatch
):
    # ADVICE r11 #1: a fatal drift in the --time --time-drift path
    # must not destroy its own baseline. Fake a 10x-slower measurement
    # for one flagged key: the run must exit 1, leave the committed
    # sidecar byte-identical, and stage the drifted numbers next to it.
    import json

    import tools.oracle_plan_audit as opa

    registry.load_all()
    with open(os.path.join(REPO, "ORACLE_PLAN_INVENTORY.json")) as f:
        flagged = [k for k in json.load(f) if k in registry.ORACLE]
    key = sorted(flagged)[0]

    sidecar = tmp_path / "ORACLE_PLAN_TIMINGS.json"
    committed = {
        key: {"result": "1 rows", "secs": 1.0, "sf_dir": SF_DIR,
              "budget_s": 120.0}
    }
    sidecar.write_text(json.dumps(committed))
    before = sidecar.read_text()

    monkeypatch.setattr(opa, "_TIMINGS", str(sidecar))
    monkeypatch.setattr(opa, "_timed_count", lambda *a, **k: ("1 rows", 10.0))
    monkeypatch.setattr(
        sys, "argv",
        ["oracle_plan_audit.py", SF_DIR, "--time", "--time-drift", key],
    )
    assert opa.main() == 1
    assert sidecar.read_text() == before, "drift overwrote its own baseline"
    staged = json.loads((tmp_path / "ORACLE_PLAN_TIMINGS.json.drifted").read_text())
    assert staged[key]["secs"] == 10.0
    # A clean (non-drifting) --time run still records normally.
    monkeypatch.setattr(opa, "_timed_count", lambda *a, **k: ("1 rows", 1.2))
    assert opa.main() == 0
    assert json.loads(sidecar.read_text())[key]["secs"] == 1.2


@pytest.mark.parametrize("key", ["j27_anti_range_join", "j13_band_join"])
def test_r9_finds_stay_fixed(con, key):
    # Regression pins for the two r9 audit finds: j27's oracle is now
    # join-free (sort-based nearest-neighbor windows) and j13's
    # compiles to IE_JOIN (col-op-col inequality pair), so neither may
    # reacquire an unbounded nested-loop/blockwise operator.
    from tools.oracle_plan_audit import _plan_ops

    ops = set(_plan_ops(con, registry.ORACLE[key]))
    assert not ops & {"NESTED_LOOP_JOIN", "BLOCKWISE_NL_JOIN", "CROSS_PRODUCT"}, (
        f"{key} oracle degraded to an unbounded non-equi operator: {ops}"
    )
