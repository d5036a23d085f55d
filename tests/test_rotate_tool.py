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


# ---------------------------------------------------------------------------
# --write path (VERDICT r10 ask #3): pure text rewrite + temp-copy apply.
# ---------------------------------------------------------------------------

from tools.rotate_window import (  # noqa: E402
    apply_write, pins_payload, rewrite_entry_text,
)

_ENTRY_SRC = '''"""synthetic entry module for the write-path tests."""

_CHECK_FIRST = [
    # old window comment (replaced wholesale by the flip)
    "w1", "w2",
]
_BACKFILL = [
    # -- oldest greens, promoted first --
    "t1",
    "t2", "t3",
    # -- driver-green round 8 (retired window) --
    "t4", "t5",
]
'''


def _exec_lists(src: str) -> tuple[list, list]:
    ns: dict = {}
    exec(src, ns)
    return ns["_CHECK_FIRST"], ns["_BACKFILL"]


def _happy_plan():
    history = [(9, {"w1": _g(), "w2": _g()})]
    return plan_rotation(
        ["w1", "w2"], ["t1", "t2", "t3", "t4", "t5"], history, window_n=2
    )


def test_rewrite_entry_text_applies_the_flip():
    out = rewrite_entry_text(_ENTRY_SRC, _happy_plan(), 2)
    head, tail = _exec_lists(out)
    assert head == ["t1", "t2"]
    assert tail == ["t3", "t4", "t5", "w1", "w2"]
    # Historical section comments survive; the new appendix is marked.
    assert "driver-green round 8" in out
    assert "driver-green round 9 (retired window, CORRECTNESS_r09 2/2)" in out
    # The module around the lists is untouched.
    assert out.startswith('"""synthetic entry module')


def test_rewrite_drops_emptied_section_comments():
    # Promote the whole first section: its banner must not dangle.
    history = [(9, {"w1": _g(), "w2": _g()})]
    plan = plan_rotation(
        ["w1", "w2"], ["t1", "t2", "t3", "t4", "t5"], history, window_n=3
    )
    out = rewrite_entry_text(_ENTRY_SRC, plan, 3)
    head, tail = _exec_lists(out)
    assert head == ["t1", "t2", "t3"]
    assert tail == ["t4", "t5", "w1", "w2"]
    assert "oldest greens, promoted first" not in out


def test_rewrite_preserves_inline_comment_order():
    # ADVICE r11 #3: a non-banner comment that appears AFTER keys
    # inside a section must stay after them on --write — the old
    # banner/keys split silently hoisted it above the keys (invisible
    # to the divergence check, which only compares key order).
    src = _ENTRY_SRC.replace(
        '"t2", "t3",',
        '"t2",\n    # t3 carries a pinned carve-out\n    "t3",',
    )
    out = rewrite_entry_text(src, _happy_plan(), 2)
    head, tail = _exec_lists(out)
    assert head == ["t1", "t2"]
    assert tail == ["t3", "t4", "t5", "w1", "w2"]
    comment_at = out.index("pinned carve-out")
    assert out.index('"t3"', out.index("_BACKFILL")) > comment_at
    # And it still lands below its section banner, not above it.
    assert comment_at > out.index("oldest greens, promoted first")


def test_rewrite_refuses_on_drifted_backfill():
    # A source _BACKFILL that no longer matches the plan's tail input
    # (hand edit between plan and write) must refuse, not mangle.
    import pytest

    drifted = _ENTRY_SRC.replace('"t3",', '"t3", "zz_new",')
    with pytest.raises(ValueError, match="diverges"):
        rewrite_entry_text(drifted, _happy_plan(), 2)


def test_pins_payload_anchors():
    pins = pins_payload(_happy_plan(), total_keys=7, window_n=2)
    assert pins == {
        "confirmed_round": 9,
        "window_len": 2,
        "window_head": "t1",
        "window_tail": "t2",
        "backfill_last": "w2",
        "staged_next_head": "t3",
        "total_keys": 7,
    }


def test_apply_write_on_temp_copy(tmp_path):
    import json

    (tmp_path / "tests").mkdir()
    (tmp_path / "__spark_entry__.py").write_text(_ENTRY_SRC)
    rc = apply_write(_happy_plan(), 2, run_gates=False, repo=str(tmp_path))
    assert rc == 0
    head, tail = _exec_lists((tmp_path / "__spark_entry__.py").read_text())
    assert head == ["t1", "t2"] and tail[-2:] == ["w1", "w2"]
    pins = json.loads((tmp_path / "tests" / "rotation_pins.json").read_text())
    assert pins["window_head"] == "t1" and pins["total_keys"] == 7
