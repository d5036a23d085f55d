"""Oracle-side physical-plan audit (VERDICT r8 ask #4).

[standing-gate] — per-round battery (--check, --time on drift).

a45 (r8) proved that ORACLES HAVE PLANS TOO: DuckDB chose an
IEJoin-first order for a45's funnel oracle — clicks x purchases on
pure inequality, ~2e10 intermediate rows — and filled the disk at
sf1.0 before the MATERIALIZED-CTE pin fixed the join order.  The
correctness gate only means anything if the oracle itself can run at
the audit scale, so this tool closes the CLASS, not the instance:

  1. EXPLAIN every registered oracle against the given sf_dir's
     parquet views (plan-only, fast) and flag any plan containing a
     non-equi join operator: IE_JOIN, PIECEWISE_MERGE_JOIN,
     NESTED_LOOP_JOIN, BLOCKWISE_NL_JOIN, CROSS_PRODUCT.
  2. With --time, EXECUTE each flagged oracle under a wall-clock
     budget (default 120 s, enforced via con.interrupt() from a
     watchdog thread) and report rows + seconds.  A flagged key that
     finishes inside the budget at sf1.0 is adjudicated bounded-by-
     measurement; a timeout or error is the a45 failure mode caught
     BEFORE it fills a disk.

Why measured time, not estimates: DuckDB 1.0's EC for a pure
inequality self-join of two 60k-row scans reads "EC: 60000" — the
optimizer's estimate is the EQUI-join guess and misses non-equi
blow-ups entirely (that naivety is exactly why it picked a45's
IEJoin-first order).  Estimates therefore cannot gate; execution can.

Non-equi operators are NOT errors by themselves — band joins, as-of
joins, interval joins and deliberate small-side cross products
(spines, probe grids, scalar singletons) legitimately compile to
these operators.  The audit makes the judgment explicit per key and
exits 1 only on a timeout/error in --time mode (or EXPLAIN failure).

The flagged set is a CENSUS, like tools/plan_inventory.py: --write
records {key: [ops]} to ORACLE_PLAN_INVENTORY.json at the repo root;
--check recomputes and exits 1 on drift, so a NEW oracle acquiring a
non-equi join (or an existing one changing operator class) must be
adjudicated explicitly — measured at sf1.0 with --time — before the
baseline is regenerated.  The set is scale-invariant (verified
identical at sf0.001 and sf1.0; DuckDB picks these operators by rule,
not cardinality), so the committed baseline and the pytest gate use
sf0.001 while --time adjudication runs at sf1.0.

--time runs additionally record each flagged key's measured seconds
into ORACLE_PLAN_TIMINGS.json (VERDICT r9 #5) so budget drift is a
diffable artifact round-over-round; the plan-only baseline and
--check stay execution-free.

--time-drift (VERDICT r10 ask #6) watches the sidecar for DRIFT, not
just bounds: with --check it re-measures every flagged key the
committed sidecar covers at the same sf_dir (read-only — the sidecar
is only rewritten by --time) and exits 1 if any grew >3x (the r9
single-row-group class surfaced this way: seconds explode long
before the 120 s budget trips); with --time it additionally makes
any printed drift fatal instead of informational, and on drift the
sidecar is NOT rewritten — measurements go to a .drifted staging
file until the drift is adjudicated (ADVICE r11 #1).

Re-baseline rule (VERDICT r11 ask #7): the committed sidecar numbers
are only LOWERED (a quieter machine re-anchoring the baseline) after
two consecutive rounds' drift watches measured below the committed
number — then run a plain --time at the same sf_dir and commit the
rewrite; a single quiet run stays informational, like a single noisy
one (BENCH.md rule 3's symmetric case).

Usage:
  python tools/oracle_plan_audit.py [sf_dir] [--time] [--budget SEC]
                                    [--write | --check] [--time-drift]
                                    [key ...]

Defaults: sf_dir=/tmp/sf1.0 (tools/sf_generate.py output), all
registered oracles, budget 120 s per flagged key.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voter_file_etl_spark import registry  # noqa: E402
from voter_file_etl_spark.tables import TABLE_NAMES  # noqa: E402

# DuckDB physical operators that can multiply rows without an equality
# key.  HASH_JOIN is excluded: equi-keyed, output bounded by match
# multiplicity the queries control.
_NON_EQUI_OPS = (
    "IE_JOIN",
    "PIECEWISE_MERGE_JOIN",
    "NESTED_LOOP_JOIN",
    "BLOCKWISE_NL_JOIN",
    "CROSS_PRODUCT",
)


def _plan_ops(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    rows = con.execute("EXPLAIN " + sql).fetchall()
    plan = "\n".join(str(part) for row in rows for part in row)
    hits: list[str] = []
    for line in plan.splitlines():
        for op in _NON_EQUI_OPS:
            if op in line:
                hits.append(op)
    return hits


def _timed_count(
    con: duckdb.DuckDBPyConnection, sql: str, budget: float
) -> tuple[str, float]:
    """Run count(*) over the oracle under a wall budget; the watchdog
    interrupts the scan so a blow-up dies in memory, not on disk.

    Each timed query runs on its OWN cursor (ADVICE r9): a cursor
    shares the parent connection's in-memory catalog (the parquet
    views stay visible) but carries its own interrupt state, so a
    watchdog that loses the race with fetchone() — budget expiring
    between query end and done.set() — interrupts only this query's
    dead cursor, never the NEXT key's query on the shared connection.
    The watchdog also re-checks ``done`` immediately before
    interrupting, closing the benign-but-noisy window where a
    completed query is flagged anyway."""
    cur = con.cursor()
    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(budget) and not done.is_set():
            cur.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.time()
    try:
        n = cur.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        return f"{n} rows", time.time() - t0
    except Exception as exc:
        msg = str(exc).splitlines()[0]
        if "INTERRUPT" in msg.upper() or "interrupted" in msg.lower():
            return f"TIMEOUT >{budget:.0f}s", time.time() - t0
        return f"ERROR {msg}", time.time() - t0
    finally:
        done.set()
        w.join()
        cur.close()


_BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ORACLE_PLAN_INVENTORY.json",
)
# Sidecar (VERDICT r9 #5): measured seconds per flagged key from
# --time runs, keyed by key -> {result, secs, sf_dir, budget}. Kept
# OUT of the baseline so --check stays plan-only/fast; committed so
# budget drift (keys creeping toward the 120 s ceiling, like j13's
# 64 s / m13's 25 s at sf1.0) is visible round-over-round instead of
# collapsing to pass/fail.
_TIMINGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ORACLE_PLAN_TIMINGS.json",
)


def _record_timings(entries: dict[str, dict], sf_dir: str, budget: float) -> None:
    import json

    try:
        with open(_TIMINGS) as f:
            book = json.load(f)
    except (FileNotFoundError, ValueError):
        book = {}
    for key, rec in entries.items():
        book[key] = {**rec, "sf_dir": sf_dir, "budget_s": budget}
    with open(_TIMINGS, "w") as f:
        json.dump(book, f, indent=1, sort_keys=True)


def timing_drift_lines(
    old: dict[str, dict],
    new: dict[str, dict],
    factor: float = 3.0,
    floor: float = 1.0,
) -> list[str]:
    """Pure comparator for the --time-drift gate (VERDICT r10 ask #6).

    Flags keys whose fresh measurement grew > ``factor``x over the
    committed sidecar entry — the r9 single-row-group class, where a
    layout regression serialized the oracle and its seconds exploded
    long before the 120 s budget tripped. Sub-second churn is noise,
    so a pair only drifts when either side is >= ``floor`` seconds.
    A fresh TIMEOUT/ERROR on a previously-bounded key always drifts.
    A committed TIMEOUT/ERROR entry never anchors a ratio (ADVICE
    r11 #2): its ``secs`` is time-to-failure, not a healthy
    baseline, so a broken->ok recovery that lands slower than the
    old failure time is an improvement, not drift — skipped here
    (an explicit --time run re-records the healthy number).
    """
    lines: list[str] = []
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        o_ok = not str(o.get("result", "")).startswith(("TIMEOUT", "ERROR"))
        n_ok = not str(n.get("result", "")).startswith(("TIMEOUT", "ERROR"))
        if o_ok and not n_ok:
            lines.append(f"{k}: was {o['secs']} s, now {n['result']}")
            continue
        if not o_ok:
            continue
        o_s, n_s = float(o.get("secs", 0)), float(n.get("secs", 0))
        if max(o_s, n_s) >= floor and o_s > 0 and n_s / o_s > factor:
            lines.append(
                f"{k}: {o_s} -> {n_s} s ({n_s / o_s:.1f}x, budget "
                f"{n.get('budget_s', o.get('budget_s', '?'))} s)"
            )
    return lines


def census(con: duckdb.DuckDBPyConnection, keys: list[str]) -> dict[str, list[str]]:
    """{key: sorted unique non-equi ops} for every key whose oracle
    carries at least one."""
    out: dict[str, list[str]] = {}
    for key in keys:
        sql = registry.ORACLE.get(key)
        if sql is None:
            continue
        ops = _plan_ops(con, sql)
        if ops:
            out[key] = sorted(set(ops))
    return out


def main() -> int:
    args = list(sys.argv[1:])
    do_time = "--time" in args
    if do_time:
        args.remove("--time")
    do_write = "--write" in args
    if do_write:
        args.remove("--write")
    do_check = "--check" in args
    if do_check:
        args.remove("--check")
    do_time_drift = "--time-drift" in args
    if do_time_drift:
        args.remove("--time-drift")
    budget = 120.0
    if "--budget" in args:
        i = args.index("--budget")
        budget = float(args[i + 1])
        del args[i : i + 2]
    sf_dir = "/tmp/sf1.0"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    registry.load_all()
    # Full-run detection keys off whether the USER restricted the key
    # set (ADVICE r10 #2), not off a comparison against ORACLE — the
    # default list is QUERIES ∩ ORACLE, so a stale oracle registered
    # for a key absent from QUERIES would otherwise silently disable
    # the stale-baseline detection on every default run.
    explicit_keys = bool(args)
    keys = args or [k for k in registry.QUERIES if k in registry.ORACLE]

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    if do_write or do_check:
        import json

        current = census(con, keys)
        if do_write:
            with open(_BASELINE, "w") as f:
                json.dump(current, f, indent=1, sort_keys=True)
            print(f"wrote {len(current)} flagged oracles to {_BASELINE}")
            return 0
        with open(_BASELINE) as f:
            baseline = json.load(f)
        full_run = not explicit_keys
        drift = []
        for k in sorted(set(current) | set(baseline)):
            if k not in keys and k not in current:
                # Partial run: a baseline key outside the requested set
                # is not drift. On a FULL-registry run, though, a
                # baseline key with no registered oracle is a stale
                # entry (deleted/renamed key) the census must flag
                # (ADVICE r9) — otherwise the committed file silently
                # diverges from reality.
                if full_run and k not in registry.ORACLE:
                    drift.append(
                        f"{k}: baseline={baseline.get(k)} but no such "
                        "oracle is registered (deleted/renamed key — "
                        "regenerate with --write)"
                    )
                continue
            if current.get(k) != baseline.get(k):
                drift.append(
                    f"{k}: baseline={baseline.get(k)} current={current.get(k)}"
                )
        if drift:
            print("oracle non-equi-join census drift (adjudicate with --time")
            print("at sf1.0, then regenerate with --write):")
            for line in drift:
                print("  " + line)
            return 1
        print(f"oracle census clean: {len(current)} flagged keys match baseline")
        if do_time_drift:
            # Read-only timing drift pass (VERDICT r10 ask #6):
            # re-measure every flagged key the committed sidecar has an
            # entry for AT THE SAME sf_dir and flag >3x growth. Does
            # NOT update the sidecar — a drift must be adjudicated and
            # re-recorded with an explicit --time run.
            try:
                with open(_TIMINGS) as f:
                    book = json.load(f)
            except (FileNotFoundError, ValueError):
                print("no committed timings sidecar — run --time first")
                return 1
            old = {
                k: rec for k, rec in book.items()
                if k in current and k in keys
                and rec.get("sf_dir") == sf_dir
            }
            fresh: dict[str, dict] = {}
            for k in sorted(old):
                result, secs = _timed_count(con, registry.ORACLE[k], budget)
                fresh[k] = {"result": result, "secs": round(secs, 2)}
            drift_t = timing_drift_lines(old, fresh)
            if drift_t:
                print("oracle timing drift (>3x vs committed sidecar —")
                print("adjudicate, then re-record with --time):")
                for line in drift_t:
                    print("  " + line)
                return 1
            worst = max(
                fresh.values(), key=lambda r: r["secs"], default=None
            )
            print(
                f"timing drift clean: {len(fresh)}/{len(old)} sidecar keys "
                f"re-measured within 3x at {sf_dir}"
                + (f" (worst {worst['secs']} s)" if worst else "")
            )
        return 0

    n_flagged = 0
    n_bad = 0
    timed: dict[str, dict] = {}
    for key in keys:
        sql = registry.ORACLE.get(key)
        if sql is None:
            continue
        try:
            ops = _plan_ops(con, sql)
        except Exception as exc:
            print(f"EXPLAIN-FAIL {key}: {str(exc).splitlines()[0]}")
            n_bad += 1
            continue
        if not ops:
            continue
        n_flagged += 1
        opstr = ", ".join(
            f"{op} x{ops.count(op)}" for op in dict.fromkeys(ops)
        )
        if do_time:
            result, secs = _timed_count(con, sql, budget)
            ok = not (result.startswith("TIMEOUT") or result.startswith("ERROR"))
            n_bad += int(not ok)
            timed[key] = {"result": result, "secs": round(secs, 2)}
            tag = "ok  " if ok else "FAIL"
            print(f"{tag} {key}: [{opstr}] -> {result} in {secs:.2f} s")
        else:
            print(f"flag {key}: [{opstr}]")
    if timed:
        import json

        try:
            with open(_TIMINGS) as f:
                prior = {
                    k: r for k, r in json.load(f).items()
                    if r.get("sf_dir") == sf_dir
                }
        except (FileNotFoundError, ValueError):
            prior = {}
        drift_lines = timing_drift_lines(prior, timed)
        for line in drift_lines:
            print("drift " + line)
            if do_time_drift:
                n_bad += 1
        if do_time_drift and drift_lines:
            # ADVICE r11 #1: a fatal drift must NOT destroy its own
            # baseline — overwriting the sidecar here would make an
            # immediate re-run compare against the drifted numbers
            # and pass. Stage the measurements instead; the committed
            # sidecar survives until the drift is adjudicated and
            # deliberately re-recorded with a plain --time run.
            staged = _TIMINGS + ".drifted"
            with open(staged, "w") as f:
                json.dump(
                    {
                        k: {**r, "sf_dir": sf_dir, "budget_s": budget}
                        for k, r in timed.items()
                    },
                    f, indent=1, sort_keys=True,
                )
            print(
                f"drift detected: committed sidecar untouched; "
                f"staged {len(timed)} measurements at {staged}"
            )
        else:
            _record_timings(timed, sf_dir, budget)
            print(f"recorded {len(timed)} timings to {_TIMINGS}")

    print(
        f"\n{n_flagged}/{len(keys)} oracles carry non-equi join operators; "
        + (
            f"{n_bad} timed out or errored at {sf_dir} (budget {budget:.0f} s)"
            if do_time
            else "run with --time to adjudicate by measurement"
        )
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
