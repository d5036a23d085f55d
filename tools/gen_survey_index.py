"""Regenerate SURVEY.md §8 (implementation index) from the registry.

[standing-gate] — standing tool (run on any registry change).

Run after adding/removing query keys:  python tools/gen_survey_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from voter_file_etl_spark import registry  # noqa: E402

SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "SURVEY.md")
HEADER = "## 8. Implementation index (auto-generated from the registry)"

PREAMBLE = """
Every key registered in `/root/repo/__spark_entry__.py` `queries()`,
its implementing module (under `voter_file_etl_spark/`), and its
correctness check ("value-hash" = full DuckDB-oracle row/schema/value
comparison). This is the line-by-line realization of the §2 contract
plus the north-star extensions.

Numbering notes: `x19` is intentionally unassigned (the LLM-pipeline
suite jumps x18 -> x20); there is no `o2`/`w-gap` operator either —
gaps are numbering history, not dropped work.

**Driver-coverage rotation contract**: the grading driver
oracle-checks the FIRST 50 keys of `queries()` per round.
`__spark_entry__._CHECK_FIRST/_CHECK_LAST` pin the window
deliberately: round 2 fronts the 50 keys with no (or failed)
CORRECTNESS_r01 row; keys proven green rotate to the back. Future
rounds must rotate the window again (deferred + newly added keys
first) so every key accumulates a driver-green row. The repo-local
equivalent of the driver's check — stricter, string-form-calibrated —
is `python tools/driver_sim.py` (all keys, any sf).

**Backlog-burn window plan (r5–r9)**: after CORRECTNESS_r04 the
cumulative driver-checked set was 198/441; registry growth is FROZEN
until the backlog clears (VERDICT r4 #2 — new keys only for genuine
contract gaps). `_BACKFILL`'s head enumerates every never-checked key
in priority order, so each round's rotation is mechanical — move the
first 50 `_BACKFILL` entries into `_CHECK_FIRST`, retire the green
window to the tail:

- **r5** (done, CORRECTNESS_r05 50/50 green): the 16 round-3
  leftovers (g2 … j12) + the 34 earliest round-4 registrations
  (x54 … x63_bloom_prefilter) → cumulative 248.
- **r6** (this round's `_CHECK_FIRST`): x64_token_shift …
  a49_market_basket (the first 49 never-checked head entries) +
  st15_transform_with_state pulled forward per VERDICT r5 #1 (its
  protobuf-free fallback landed in r5; the judge asked for its first
  driver check this round even though it sat last in the
  never-checked region). a48_string_agg — the literal 50th head
  entry — cedes its slot and leads r7 instead → cumulative 298.
- **r7**: a48_string_agg … e5_board_pack (next 50) → cumulative 348.
- **r8**: a59_topn_plus_other … a75_fiscal_445_calendar (next 50)
  → cumulative 398.
- **r9**: the residual 43 (w31_series_align …
  a84_proportional_allocation + any r5–r8 stragglers) → cumulative
  441/441.

**r10+ regression re-check plan (VERDICT r5 #7)**: once the backlog is
empty the rotation contract flips from first-checks to re-checks of
stale green rows. `_BACKFILL`'s tail is already ordered
oldest-green-first (r1–r3 block, then the retired r4 window, then the
retired r5 window, and each subsequent retired window appends after),
so the flip is the same mechanical move — r10's window = the first 50
entries after the never-checked region (by then: the 50 oldest r1
greens, a2_reconcile … s10_permissive_read region), r11 the next 50,
and so on, with each re-checked window retiring back to the tail. A
key re-entering `_CHECK_FIRST` after a failed driver row always
preempts the stale-green cycle, exactly as during the burn.
"""


def main() -> None:
    registry.load_all()
    qs = entry.queries()
    rows = []
    for key in sorted(qs):
        fn = registry.QUERIES[key]
        mod = fn.__module__.replace("voter_file_etl_spark.", "").replace(".", "/")
        check = "value-hash" if key in registry.ORACLE else "rows-only"
        rows.append(f"| `{key}` | `{mod}.py` | {check} |")

    section = "\n".join(
        [HEADER, "", PREAMBLE.strip(), "",
         "| query key | module | check |", "|---|---|---|", *rows, ""]
    )
    text = open(SURVEY).read()
    head, _, _ = text.partition(HEADER)
    open(SURVEY, "w").write(head + section)
    print(f"wrote {len(rows)} index rows")


if __name__ == "__main__":
    main()
