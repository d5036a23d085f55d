"""Mechanical executor for the steady-state re-check rotation (r10+).

SURVEY.md §8's standing algorithm, as code instead of round-open
archaeology: confirm the previous round's CORRECTNESS file covers the
current `_CHECK_FIRST` window 50/50 green, retire that window to the
`_BACKFILL` tail, promote the next 50 tail-head keys, and emit the
two new list literals ready to paste into __spark_entry__.py (plus
the driver_sim command that pre-verifies the new window). The tool
deliberately does NOT self-edit __spark_entry__.py — the flip commit
must also update the staging pins in tests/test_rotation.py, so the
round's builder applies both together and the suite's rotation gates
adjudicate the result.

Failure modes it refuses on (exercised in tests/test_rotate_tool.py):
  - the latest CORRECTNESS file's key set != the current window
    (the driver ran a different window than staged — reconcile first);
  - any non-green row (a failed key must RE-ENTER _CHECK_FIRST, not
    retire — the tool prints which).
It also skips tail-head keys the driver already re-checked in the
confirmed round or later (the r9/r10 off-by-7 class: the driver
re-checked _BACKFILL[:7] ahead of schedule, so r10 started at [7]).

Usage:
  python tools/rotate_window.py [--window N]     # default 50
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def plan_rotation(
    window: list[str],
    tail: list[str],
    history: list[tuple[int, dict]],
    window_n: int = 50,
) -> dict:
    """Pure rotation planner.

    Returns {"refuse": reason} on an illegal flip, else
    {"promoted": [...], "appendix": [...], "skipped_fresh": [...],
    "new_tail": [...], "round": N} where `appendix` is the retired
    window in CORRECTNESS order and `new_tail` the full post-flip
    _BACKFILL.
    """
    if not history:
        return {"refuse": "no CORRECTNESS history — nothing to rotate on"}
    last_round, last_rows = history[-1]

    # The file must cover the whole staged window. EXTRA rows are
    # legal when they are tail keys — the driver re-checking greens
    # ahead of schedule (r9 ran the 43-key residual window plus the
    # first 7 tail keys) — and simply retire with this round; any
    # other extra key is unknown and blocks the flip.
    if set(last_rows) <= set(tail) and not set(last_rows) & set(window):
        return {
            "refuse": (
                f"rotation for CORRECTNESS_r{last_round:02d} already "
                "executed (its keys all sit in the tail) — the staged "
                f"window awaits CORRECTNESS_r{last_round + 1:02d}; "
                "nothing to do"
            )
        }
    missing = sorted(set(window) - set(last_rows))
    if missing:
        return {
            "refuse": (
                f"CORRECTNESS_r{last_round:02d} lacks rows for staged "
                f"window keys {missing} — the driver ran a different "
                "window than staged; reconcile before rotating"
            )
        }
    unknown = sorted(set(last_rows) - set(window) - set(tail))
    if unknown:
        return {
            "refuse": (
                f"CORRECTNESS_r{last_round:02d} carries rows for keys in "
                f"neither the window nor the tail: {unknown}"
            )
        }

    failed = [k for k, row in last_rows.items() if not _green(row)]
    if failed:
        return {
            "refuse": (
                f"CORRECTNESS_r{last_round:02d} has non-green rows "
                f"{failed} — failed keys must FRONT the next window "
                "(they preempt the stale-green cycle); this tool only "
                "executes the all-green path"
            )
        }

    latest: dict[str, int] = {}
    for rnd, rows in history:
        for k, row in rows.items():
            if _green(row):
                latest[k] = max(rnd, latest.get(k, -1))

    skipped = [k for k in tail[:window_n] if latest.get(k, -1) >= last_round]
    promoted = [k for k in tail if latest.get(k, -1) < last_round][:window_n]
    # Retire everything the file proved green — the window plus any
    # ahead-of-schedule tail re-checks — to the tail end, in file
    # order (the tail's order IS the future re-check plan).
    appendix = list(last_rows)
    new_tail = [
        k for k in tail if k not in set(promoted) and k not in set(appendix)
    ] + appendix
    return {
        "promoted": promoted,
        "appendix": appendix,
        "skipped_fresh": skipped,
        "new_tail": new_tail,
        "round": last_round,
    }


def _correctness_history() -> list[tuple[int, dict]]:
    """[(round_no, rows)] ascending."""
    out = []
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if m:
            out.append((int(m.group(1)), json.load(open(f))))
    return sorted(out)


def _fmt_list(name: str, keys: list[str], comment: str) -> str:
    lines = [f"{name} = [", f"    # {comment}"]
    row = "   "
    for k in keys:
        item = f' "{k}",'
        if len(row) + len(item) > 78:
            lines.append(row)
            row = "   "
        row += item
    if row.strip():
        lines.append(row)
    lines.append("]")
    return "\n".join(lines)


def main() -> int:
    import __spark_entry__ as entry_mod

    window_n = 50
    if "--window" in sys.argv:
        window_n = int(sys.argv[sys.argv.index("--window") + 1])

    plan = plan_rotation(
        list(entry_mod._CHECK_FIRST),
        list(entry_mod._BACKFILL),
        _correctness_history(),
        window_n,
    )
    if "refuse" in plan:
        print("REFUSE:", plan["refuse"])
        return 1

    n = plan["round"]
    print(
        f"confirmed: CORRECTNESS_r{n:02d} {len(plan['appendix'])}/"
        f"{len(plan['appendix'])} green — retiring the window to the tail"
    )
    if plan["skipped_fresh"]:
        print(
            f"note: skipping {len(plan['skipped_fresh'])} tail-head keys "
            f"already re-checked in r{n} or later (off-by-N correction): "
            f"{plan['skipped_fresh']}"
        )
    print(f"\nnext window ({len(plan['promoted'])} keys):\n")
    print(_fmt_list(
        "_CHECK_FIRST", plan["promoted"],
        f"r{n + 1} window: oldest greens after the r{n} retire "
        "(generated by tools/rotate_window.py)",
    ))
    print("\nretired appendix (append to _BACKFILL, replacing the "
          "promoted head):\n")
    print(_fmt_list(
        f"_BACKFILL_r{n}_appendix", plan["appendix"],
        f"driver-green round {n} (retired window, CORRECTNESS_r{n:02d} "
        f"{len(plan['appendix'])}/{len(plan['appendix'])})",
    ))
    print(
        f"\nsanity: new head+tail = "
        f"{len(plan['promoted']) + len(plan['new_tail'])} keys "
        "(expect the registry count); pre-verify with:\n"
        "  python tools/driver_sim.py /root/testdata/sf0.01 "
        + " ".join(plan["promoted"])
    )
    print(
        "\nremember: update tests/test_rotation.py staging pins in the "
        "SAME commit (window head/tail anchors)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
