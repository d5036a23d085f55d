"""Unit tests for the mechanical rotation planner (tools/rotate_window.py).

The planner encodes SURVEY §8's steady-state flip; these tests pin
its three behaviors on synthetic history: the all-green happy path,
the off-by-N skip (the exact r9->r10 correction: the driver
re-checked tail-head keys ahead of schedule, so the next window must
not re-burn slots on them), and the two refusal modes (window/file
mismatch, non-green rows).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rotate_window import plan_rotation


def _g(**over):
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "err": None}
    row.update(over)
    return row


def test_happy_path_retires_and_promotes():
    window = ["w1", "w2"]
    tail = ["t1", "t2", "t3", "t4"]
    history = [(9, {"w1": _g(), "w2": _g()})]
    plan = plan_rotation(window, tail, history, window_n=2)
    assert plan["promoted"] == ["t1", "t2"]
    assert plan["appendix"] == ["w1", "w2"]
    assert plan["new_tail"] == ["t3", "t4", "w1", "w2"]


def test_off_by_n_skips_fresh_rechecks():
    # The exact r9 shape: the driver confirmed the window AND
    # re-checked tail-head key t1 ahead of schedule in the same file.
    # The next window must start at t2 (no slot burned on t1), and t1
    # retires to the tail END with the round's other greens.
    window = ["w1", "w2"]
    tail = ["t1", "t2", "t3", "t4"]
    history = [
        (8, {"t1": _g()}),          # old green (would otherwise be stale)
        (9, {"w1": _g(), "w2": _g(), "t1": _g()}),
    ]
    plan = plan_rotation(window, tail, history, window_n=2)
    assert plan["promoted"] == ["t2", "t3"]
    assert plan["skipped_fresh"] == ["t1"]
    assert plan["appendix"] == ["w1", "w2", "t1"]
    assert plan["new_tail"] == ["t4", "w1", "w2", "t1"]


def test_unknown_extra_key_refuses():
    history = [(9, {"w1": _g(), "zz_phantom": _g()})]
    plan = plan_rotation(["w1"], ["t1"], history, 1)
    assert "refuse" in plan and "zz_phantom" in plan["refuse"]


def test_refuses_on_missing_window_row():
    plan = plan_rotation(["w1", "w2"], ["t1"], [(9, {"w1": _g()})], 1)
    assert "refuse" in plan and "w2" in plan["refuse"]


def test_refuses_on_non_green_row():
    history = [(9, {"w1": _g(), "w2": _g(hash_match=False)})]
    plan = plan_rotation(["w1", "w2"], ["t1"], history, 1)
    assert "refuse" in plan and "w2" in plan["refuse"]


def test_failed_key_message_names_the_preempt_rule():
    history = [(9, {"w1": _g(err="boom"), "w2": _g()})]
    plan = plan_rotation(["w1", "w2"], ["t1"], history, 1)
    assert "refuse" in plan and "FRONT" in plan["refuse"]


def test_already_rotated_state_is_named():
    # Mid-round state: the flip for the last CORRECTNESS file already
    # happened (its keys all retired to the tail) and the staged
    # window awaits the NEXT file — the tool must say so, not demand
    # reconciliation.
    history = [(9, {"t3": _g(), "t4": _g()})]
    plan = plan_rotation(["w1", "w2"], ["t1", "t2", "t3", "t4"], history, 2)
    assert "refuse" in plan and "already" in plan["refuse"]
