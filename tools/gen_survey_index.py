"""Regenerate SURVEY.md §8 (implementation index) from the registry.

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
cumulative driver-checked set is 198/441; registry growth is FROZEN
until the backlog clears (VERDICT r4 #2 — new keys only for genuine
contract gaps). `_BACKFILL`'s head enumerates every never-checked key
in priority order, so each round's rotation is mechanical — move the
first 50 `_BACKFILL` entries into `_CHECK_FIRST`, retire the green
window to the tail:

- **r5** (this round): the 16 round-3 leftovers (g2 … j12) + the 34
  earliest round-4 registrations (x54 … x63_bloom_prefilter)
  → cumulative 248.
- **r6**: x64_token_shift … x89_dedup_savings region (next 50,
  including st15_transform_with_state, now registered everywhere via
  its protobuf-free fallback) → cumulative 298.
- **r7**: a67_cohort_ltv … f15_surrogate_key region → cumulative 348.
- **r8**: e6_ops_health … sql24_projected_exists region → cumulative
  398.
- **r9**: the residual ~43 (m20 … a84 + any r5–r8 stragglers) →
  cumulative 441/441; from r10 the window re-checks the oldest green
  rows for regression coverage.
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
