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


def test_r10_window_is_the_oldest_green_recheck_block():
    # VERDICT r9 ask #1: the executed r10 window starts at the former
    # _BACKFILL[7] (s1_file_scan), NOT a2_reconcile — the driver's r9
    # run already re-checked a2_reconcile … a14_stats_exact
    # (CORRECTNESS_r09 rows 44-50), so those 7 retire to the tail and
    # the window holds exactly the next 50 oldest greens. Every window
    # key must already carry a driver row (this is a re-check window)
    # and the stalest keys the r9 run just re-proved must sit at the
    # very end of the tail (re-checked last next cycle).
    window = entry_mod._CHECK_FIRST
    assert len(window) == 50
    assert window[0] == "s1_file_scan"
    assert window[-1] == "j7_range_join"
    # None of the 7 r9-fresh re-checks may burn an r10 slot.
    r9_fresh = {
        "a2_reconcile", "a4_groupby_count", "a5_household_agg",
        "a6_multi_distinct", "a7_rollup", "a13_argmax", "a14_stats_exact",
    }
    assert not r9_fresh & set(window)
    checked = _driver_checked_keys()
    unchecked = [k for k in window if k not in checked]
    assert not unchecked, (
        f"r10 re-check window holds keys with no driver row: {unchecked}"
    )
    # The r9-retired set (43 first-checks + 7 re-checks) sits at the
    # very end of the tail, the 7 freshest greens last.
    assert entry_mod._BACKFILL[-1] == "a14_stats_exact"
    assert entry_mod._BACKFILL[-7] == "a2_reconcile"
    assert entry_mod._BACKFILL[-50] == "w31_series_align"


def test_r11_window_is_staged_next_in_tail():
    # The standing contract (SURVEY §8): the NEXT round's window is
    # always the current tail head. Pin the r11 staging so the next
    # flip stays mechanical: st2_sliding_window leads, and the first
    # 50 tail entries all carry driver rows.
    staged = entry_mod._BACKFILL[:50]
    assert staged[0] == "st2_sliding_window"
    checked = _driver_checked_keys()
    assert all(k in checked for k in staged)
