"""Structure gate for AXES.json (VERDICT r10 ask #5).

The sidecar is only useful if every standing axis keeps a complete,
well-formed freshness entry — a malformed or dropped entry silently
removes an axis from the drift diff. README's cadence table is the
source of truth for which axes exist.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXPECTED_AXES = {
    "1_shuffle_partitions", "2_executor_cores", "3_session_timezone",
    "4_codegen_off", "5_aqe_off", "6_rowwise_parquet",
    "7_tiny_arrow_batches", "8_arrow_off_collect", "9_tiny_input_splits",
    "10_pushdown_off", "11_broadcast_off", "12_rocksdb_state_store",
    "13_kryo_serializer", "14_sort_agg", "15_collapse_project_off",
    "combined_capstone", "base_default_conf",
}


def _load() -> dict:
    with open(os.path.join(REPO, "AXES.json")) as f:
        return json.load(f)


def test_all_standing_axes_present():
    assert set(_load()["axes"]) == _EXPECTED_AXES


def test_every_entry_is_complete():
    for name, entry in _load()["axes"].items():
        assert entry.get("conf"), f"{name}: missing conf"
        run = entry.get("last_full_registry")
        assert run, f"{name}: missing last_full_registry"
        for field in ("round", "sf", "result", "head", "record"):
            assert run.get(field) not in (None, ""), (
                f"{name}: last_full_registry.{field} missing"
            )
        assert isinstance(run["round"], int)


def test_freshness_never_predates_the_axis_matrix():
    # Every axis was first proven by r9 at the latest (SCALE.md);
    # an entry older than its own first proof is a corrupted edit.
    for name, entry in _load()["axes"].items():
        assert entry["last_full_registry"]["round"] >= 5, name


def test_axes_record_tool_updates_an_entry(tmp_path, monkeypatch):
    import importlib
    import shutil
    import sys

    sys.path.insert(0, REPO)
    import tools.axes_record as ar

    tmp_repo = tmp_path / "repo"
    tmp_repo.mkdir()
    shutil.copy(os.path.join(REPO, "AXES.json"), tmp_repo / "AXES.json")
    monkeypatch.setattr(ar, "REPO", str(tmp_repo))
    monkeypatch.setattr(ar, "PATH", str(tmp_repo / "AXES.json"))
    monkeypatch.setattr(
        sys, "argv",
        ["axes_record.py", "5_aqe_off", "--round", "99",
         "--result", "441/441", "--head", "deadbee"],
    )
    assert ar.main() == 0
    data = json.loads((tmp_repo / "AXES.json").read_text())
    run = data["axes"]["5_aqe_off"]["last_full_registry"]
    assert run["round"] == 99 and run["head"] == "deadbee"
    # Unknown axis refuses.
    monkeypatch.setattr(
        sys, "argv",
        ["axes_record.py", "99_bogus", "--round", "99",
         "--result", "x", "--head", "deadbee"],
    )
    assert ar.main() == 1
    importlib.reload(ar)
