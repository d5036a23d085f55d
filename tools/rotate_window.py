"""Mechanical executor for the steady-state re-check rotation (r10+).

[standing-gate] — part of the per-round battery (README §battery).

SURVEY.md §8's standing algorithm, as code instead of round-open
archaeology: confirm the previous round's CORRECTNESS file covers the
current `_CHECK_FIRST` window 50/50 green, retire that window to the
`_BACKFILL` tail, promote the next 50 tail-head keys, and either emit
the two new list literals (plan mode, default) or — with ``--write``
(VERDICT r10 ask #3) — apply the flip itself: rewrite the
`_CHECK_FIRST`/`_BACKFILL` blocks in __spark_entry__.py in place
(preserving the tail's historical section comments), refresh the
staging anchors in tests/rotation_pins.json, and run the rotation
gates (tests/test_rotation.py + tests/test_rotate_tool.py) so the
flip and its adjudication land as one reviewed commit.

Failure modes it refuses on (exercised in tests/test_rotate_tool.py):
  - the latest CORRECTNESS file's key set != the current window
    (the driver ran a different window than staged — reconcile first);
  - any non-green row (a failed key must RE-ENTER _CHECK_FIRST, not
    retire — the tool prints which).
It also skips tail keys the driver already re-checked in the
confirmed round or later (the r9/r10 off-by-7 class: the driver
re-checked _BACKFILL[:7] ahead of schedule, so r10 started at [7]).

Usage:
  python tools/rotate_window.py [--window N]          # plan (default 50)
  python tools/rotate_window.py --write [--no-gates]  # apply + gate
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

    # Scan the FULL tail, not just tail[:window_n] (ADVICE r10 #1):
    # promotion below consumes as deep a prefix as it takes to find
    # window_n stale keys, so an ahead-of-schedule re-check anywhere in
    # that scanned prefix is skipped — the report must name it too.
    skipped = [k for k in tail if latest.get(k, -1) >= last_round]
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


# ---------------------------------------------------------------------------
# --write machinery. Pure text-in/text-out so tests/test_rotate_tool.py
# can exercise the write path on a synthetic module (no repo mutation).
# ---------------------------------------------------------------------------

_KEY_RE = re.compile(r'"([A-Za-z0-9_]+)"')


def _find_block(src: str, name: str) -> tuple[int, int]:
    """(start, end) character span of `name = [...]` including the
    closing bracket line. The block must open at column 0 and close
    with a `]` at column 0 (the file's committed shape)."""
    m = re.search(rf"^{name} = \[\n", src, re.M)
    if not m:
        raise ValueError(f"{name} block not found")
    close = re.compile(r"^\]\n", re.M).search(src, m.end())
    if not close:
        raise ValueError(f"{name} block never closes")
    return m.start(), close.end()


def _parse_tokens(block_src: str) -> list[tuple[str, str]]:
    """[('comment', line) | ('key', name)] in source order."""
    tokens: list[tuple[str, str]] = []
    for line in block_src.splitlines()[1:-1]:  # drop `name = [` and `]`
        stripped = line.strip()
        if not stripped:
            continue
        if stripped.startswith("#"):
            tokens.append(("comment", stripped))
        else:
            for k in _KEY_RE.findall(line):
                tokens.append(("key", k))
    return tokens


def _render_tokens(name: str, tokens: list[tuple[str, str]]) -> str:
    """Re-emit the block: comments on their own lines, keys packed
    ≤79 chars, 4-space indent — the committed _BACKFILL style."""
    lines = [f"{name} = ["]
    row = "   "

    def flush():
        nonlocal row
        if row.strip():
            lines.append(row)
        row = "   "

    for kind, val in tokens:
        if kind == "comment":
            flush()
            lines.append(f"    {val}")
        else:
            item = f' "{val}",'
            if len(row) + len(item) > 78:
                flush()
            row += item
    flush()
    lines.append("]")
    return "\n".join(lines) + "\n"


def _drop_emptied_sections(
    tokens: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Remove banners whose section lost all its keys (a retired
    window can empty a historical group; its banner must not dangle).

    A banner starts at a comment line beginning with ``# --``; comment
    lines that don't are continuations of the open banner (the
    multi-line r9 banner shape). A section = one banner + its keys up
    to the next banner.

    Token order WITHIN a section is preserved verbatim (ADVICE r11
    #3): a section is the ordered token run from one ``# --`` banner
    start to the next, and a kept section re-emits exactly that run —
    an inline comment that follows keys stays after those keys
    instead of being silently hoisted above them on the next --write.
    Only sections whose key set emptied are dropped (banner,
    continuations, and any interior comments dangle together).
    """
    sections: list[list[tuple[str, str]]] = [[]]
    for kind, val in tokens:
        if kind == "comment" and val.startswith("# --") and sections[-1]:
            sections.append([])
        sections[-1].append((kind, val))
    out: list[tuple[str, str]] = []
    for section in sections:
        if any(kind == "key" for kind, _ in section):
            out.extend(section)
    return out


def rewrite_entry_text(src: str, plan: dict, window_n: int = 50) -> str:
    """Apply the flip to __spark_entry__.py source text.

    _CHECK_FIRST is regenerated from plan['promoted']; _BACKFILL keeps
    its historical section comments, drops the promoted/retired keys,
    and gains the round's appendix at the tail end.
    """
    n = plan["round"]
    retired = set(plan["appendix"]) | set(plan["promoted"])

    cf_start, cf_end = _find_block(src, "_CHECK_FIRST")
    new_cf = _fmt_list(
        "_CHECK_FIRST", plan["promoted"],
        f"r{n + 1} window: oldest greens after the r{n} retire "
        "(generated by tools/rotate_window.py --write)",
    ) + "\n"
    src = src[:cf_start] + new_cf + src[cf_end:]

    bf_start, bf_end = _find_block(src, "_BACKFILL")
    tokens = _parse_tokens(src[bf_start:bf_end])
    kept = [t for t in tokens if t[0] == "comment" or t[1] not in retired]
    kept = _drop_emptied_sections(kept)
    kept.append((
        "comment",
        f"# -- driver-green round {n} (retired window, "
        f"CORRECTNESS_r{n:02d} {len(plan['appendix'])}/"
        f"{len(plan['appendix'])}) --",
    ))
    kept.extend(("key", k) for k in plan["appendix"])
    new_keys = [v for t, v in kept if t == "key"]
    if new_keys != plan["new_tail"]:
        raise ValueError(
            "rewritten _BACKFILL key order diverges from the plan's "
            "new_tail — refusing to write (source block drifted?)"
        )
    src = src[:bf_start] + _render_tokens("_BACKFILL", kept) + src[bf_end:]
    return src


def pins_payload(plan: dict, total_keys: int, window_n: int = 50) -> dict:
    """tests/rotation_pins.json — the flip anchors test_rotation.py
    asserts against (derived from the plan, which is derived from the
    driver's CORRECTNESS files)."""
    return {
        "confirmed_round": plan["round"],
        "window_len": len(plan["promoted"]),
        "window_head": plan["promoted"][0],
        "window_tail": plan["promoted"][-1],
        "backfill_last": plan["new_tail"][-1],
        "staged_next_head": plan["new_tail"][0],
        "total_keys": total_keys,
    }


def apply_write(
    plan: dict, window_n: int, run_gates: bool = True, repo: str = REPO
) -> int:
    entry_path = os.path.join(repo, "__spark_entry__.py")
    src = open(entry_path).read()
    new_src = rewrite_entry_text(src, plan, window_n)
    total = len(_KEY_RE.findall(
        new_src[slice(*_find_block(new_src, "_CHECK_FIRST"))]
    )) + len(_KEY_RE.findall(
        new_src[slice(*_find_block(new_src, "_BACKFILL"))]
    ))
    open(entry_path, "w").write(new_src)
    pins_path = os.path.join(repo, "tests", "rotation_pins.json")
    with open(pins_path, "w") as f:
        json.dump(pins_payload(plan, total, window_n), f, indent=2)
        f.write("\n")
    print(f"wrote {entry_path} (head+tail = {total} keys) and {pins_path}")
    if run_gates:
        import subprocess
        rc = subprocess.call([
            sys.executable, "-m", "pytest", "-q",
            os.path.join(repo, "tests", "test_rotation.py"),
            os.path.join(repo, "tests", "test_rotate_tool.py"),
        ])
        print("rotation gates:", "GREEN" if rc == 0 else f"FAILED rc={rc}")
        return rc
    return 0


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

    if "--write" in sys.argv:
        return apply_write(
            plan, window_n, run_gates="--no-gates" not in sys.argv
        )

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
        "\nplan mode only — run with --write to apply this flip to "
        "__spark_entry__.py + tests/rotation_pins.json and run the "
        "rotation gates (one commit, no hand transcription)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
