"""Rotation-integrity gate for the driver correctness window.

The driver oracle-checks only the FIRST 50 keys of
``__spark_entry__.queries()`` per round, so every registered key must be
explicitly placed in ``_CHECK_FIRST`` or ``_BACKFILL`` exactly once —
an unplaced key silently sorts into an arbitrary position and can
overflow past the window unnoticed (this happened to 13 keys in round
3, VERDICT r3 "Next round" #4). These tests fail the suite the moment
a new registry key lands without a rotation slot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from voter_file_etl_spark import registry


# Keys whose registration is environment-conditional: they must still
# hold a rotation slot (for environments where they register), but
# their absence from the local registry is not a phantom entry.
# (Empty since round 5: st15 gained a protobuf-free fallback and now
# registers everywhere.)
_ENV_GATED: set[str] = set()


def _registry_keys() -> set[str]:
    registry.load_all()
    return set(registry.QUERIES)


def test_every_registry_key_is_placed_exactly_once():
    head = entry_mod._CHECK_FIRST
    backfill = entry_mod._BACKFILL
    placed = head + backfill
    dupes = {k for k in placed if placed.count(k) > 1}
    assert not dupes, f"keys placed more than once: {sorted(dupes)}"
    keys = _registry_keys()
    unplaced = keys - set(placed)
    assert not unplaced, (
        f"registry keys with no rotation slot (add to _CHECK_FIRST so the "
        f"driver checks them, or _BACKFILL if already green): {sorted(unplaced)}"
    )
    phantom = set(placed) - keys - _ENV_GATED
    assert not phantom, f"rotation lists name unregistered keys: {sorted(phantom)}"


def test_window_head_is_exactly_the_check_first_block():
    ordered = list(entry_mod.queries())
    assert ordered[: len(entry_mod._CHECK_FIRST)] == [
        k for k in entry_mod._CHECK_FIRST if k in _registry_keys()
    ]


def test_check_first_holds_the_driver_window():
    # The driver checks 50 keys/round; a _CHECK_FIRST longer than 50
    # silently pushes its own tail outside the window.
    assert len(entry_mod._CHECK_FIRST) <= 50


def _stale_window_keys(
    check_first: list[str], registry_keys: set[str], checked: set[str]
) -> list[str]:
    """The tripwire predicate, pure so both regimes are unit-testable.

    Backlog-burn regime (some registry key lacks a CORRECTNESS row):
    returns the window keys already driver-checked — any non-empty
    result is a rotation mistake. Re-check regime (backlog empty):
    returns [] unconditionally — re-proving green keys IS the r10+
    contract (SURVEY §8), so the gate self-deactivates.
    """
    never = registry_keys - checked
    if not never:
        return []
    return [k for k in check_first if k in checked]


def _driver_checked_keys() -> set[str]:
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        checked |= set(json.load(open(f)))
    return checked


def test_check_window_is_spent_on_never_checked_keys():
    # During the backlog burn (SURVEY §8: r5-r9), a rotation mistake
    # that leaves already-green keys in _CHECK_FIRST wastes the
    # round's entire driver bandwidth re-proving proven keys (the
    # exact hazard VERDICT r6 "What's missing" #2 flagged). While ANY
    # registry key still lacks a driver CORRECTNESS row, the window
    # must contain ONLY such keys. Self-deactivates at r10+ when the
    # backlog is empty and the contract flips to oldest-green
    # re-checks.
    keys = _registry_keys()
    checked = _driver_checked_keys()
    stale = _stale_window_keys(entry_mod._CHECK_FIRST, keys, checked)
    assert not stale, (
        f"_CHECK_FIRST holds already-driver-checked keys while "
        f"{len(keys - checked)} keys still have no CORRECTNESS row — "
        f"rotate the window onto the _BACKFILL head: {stale}"
    )


def test_tripwire_self_deactivates_at_the_r10_flip():
    # VERDICT r7 ask #4: prove the flip is legal BEFORE round 10
    # reaches it. Once every registry key has a driver row, a window
    # full of already-green keys (the oldest-green re-check plan,
    # drawn from the _BACKFILL tail top-down) must NOT trip the gate.
    keys = _registry_keys()
    # Simulate the post-r9 state: every key driver-checked.
    all_checked = set(keys)
    r10_window = entry_mod._BACKFILL[-len(entry_mod._CHECK_FIRST):]
    assert all(k in all_checked for k in r10_window)
    assert _stale_window_keys(r10_window, keys, all_checked) == []
    # And the burn regime still fires on the same window while even
    # one key remains unchecked (the gate's teeth don't dull early).
    one_short = all_checked - {entry_mod._BACKFILL[0]}
    assert _stale_window_keys(r10_window, keys, one_short) == [
        k for k in r10_window if k in one_short
    ]


def _pins() -> dict:
    """Flip anchors written by tools/rotate_window.py --write.

    The pins derive from the driver's CORRECTNESS files (plan input),
    the entry lists from the tool's text rewrite (plan output) — these
    tests assert the two agree, so a garbled write or a hand edit to
    either side fails the suite.
    """
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tests", "rotation_pins.json")) as f:
        return json.load(f)


def test_current_window_matches_flip_pins():
    pins = _pins()
    window = entry_mod._CHECK_FIRST
    assert len(window) == pins["window_len"]
    assert window[0] == pins["window_head"]
    assert window[-1] == pins["window_tail"]
    # Re-check window: every key must already carry a driver row.
    checked = _driver_checked_keys()
    unchecked = [k for k in window if k not in checked]
    assert not unchecked, (
        f"re-check window holds keys with no driver row: {unchecked}"
    )
    # The confirmed round's retired set sits at the very end of the
    # tail (re-checked last next cycle).
    assert entry_mod._BACKFILL[-1] == pins["backfill_last"]
    assert len(window) + len(entry_mod._BACKFILL) == pins["total_keys"]


def test_window_burns_no_slot_on_fresh_rechecks():
    # Independent of the tool: read the confirmed round's CORRECTNESS
    # file directly — nothing the driver just proved green may occupy
    # a slot in the next window (the r9/r10 off-by-7 class).
    import glob
    import json

    pins = _pins()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        repo, f"CORRECTNESS_r{pins['confirmed_round']:02d}.json"
    )
    fresh = set(json.load(open(path)))
    burned = fresh & set(entry_mod._CHECK_FIRST)
    assert not burned, (
        f"window burns slots on keys r{pins['confirmed_round']} just "
        f"proved green: {sorted(burned)}"
    )
    # Rounds after the confirmed one would mean the flip is overdue.
    newer = [
        f for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if int(f.rsplit("_r", 1)[1][:-5]) > pins["confirmed_round"]
    ]
    assert not newer, f"flip overdue — newer driver rounds exist: {newer}"


def test_next_window_is_staged_at_tail_head():
    # The standing contract (SURVEY §8): the NEXT round's window is
    # always the current tail head, and every staged key already
    # carries a driver row.
    pins = _pins()
    staged = entry_mod._BACKFILL[: pins["window_len"]]
    assert staged[0] == pins["staged_next_head"]
    checked = _driver_checked_keys()
    assert all(k in checked for k in staged)
