"""Update AXES.json after an invariance-axis run.

[standing-gate] — part of the per-round battery (README §battery).

Keeps the per-axis freshness sidecar (VERDICT r10 ask #5) mechanical:
the battery runs an axis, then records it with one command instead of
a hand edit. SCALE.md keeps the narrative record in the same commit.

Usage:
  python tools/axes_record.py <axis> --round N --result "441/441" \
      [--sf 0.01] [--record "SCALE.md r11 ..."] [--head <commit>]

<axis> must be an existing key in AXES.json's "axes" map (this tool
records runs of the standing axes; adding a NEW axis is a reviewed
hand edit). --head defaults to the current `git rev-parse --short
HEAD`.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "AXES.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("axis")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--result", required=True)
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--record", default=None)
    ap.add_argument("--head", default=None)
    args = ap.parse_args()

    head = args.head or subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, text=True
    ).strip()

    with open(PATH) as f:
        data = json.load(f)
    if args.axis not in data["axes"]:
        print(
            f"unknown axis {args.axis!r} — existing: "
            f"{sorted(data['axes'])}", file=sys.stderr,
        )
        return 1
    entry = data["axes"][args.axis]
    prev = entry.get("last_full_registry", {})
    entry["last_full_registry"] = {
        "round": args.round,
        "sf": args.sf,
        "result": args.result,
        "head": head,
        "record": args.record
        or f"SCALE.md round-{args.round} record",
    }
    with open(PATH, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(
        f"{args.axis}: r{prev.get('round', '?')} -> r{args.round} "
        f"({args.result} at sf{args.sf}, {head})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
