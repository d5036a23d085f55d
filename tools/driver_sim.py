"""Strict driver-style correctness simulator.

[standing-gate] — per-round battery (README §battery).

The grading driver materializes BOTH sides as pandas DataFrames
(Spark ``.toPandas()``-equivalent, DuckDB ``.df()``), sorts columns by
name, sorts rows by all columns, and hashes cell values.  That hash is
dtype-sensitive: DuckDB HUGEINT becomes float64 (``10003.0``) and
mismatches a Spark bigint (``10003``); list-valued cells are
unhashable and crash the check (both observed in CORRECTNESS_r01).

The repo's pytest harness (tests/oracle_harness.py) compares *Python*
values, which is lenient about exactly those two failure modes.

Calibrated against CORRECTNESS_r01: the driver's hash is equivalent to
comparing the *string form* of each cell —

  - int32 vs int64 pass (p7_offset_window, w5_ntile_dist were green);
  - python-date object columns vs datetime64 pass (a5, t2, p3 green —
    pandas renders midnight datetime64 as '1995-01-01' too);
  - int64 vs float64 FAIL ('10003' != '10003.0' — p8_pivot red);
  - list cells CRASH (t7_array_funcs).

So this tool replays every registered key under that contract:

  1. column-name sets must match;
  2. no cell may be a list / dict / ndarray;
  3. canonical string frames (columns sorted by name, rows sorted,
     cells stringified with datetime normalized to midnight-date
     form) must be identical.

Usage:  python tools/driver_sim.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voter_file_etl_spark import registry  # noqa: E402
from voter_file_etl_spark.tables import TABLE_NAMES  # noqa: E402


def _canon_frame(df: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Canonical string frame: columns sorted by name, every cell a
    string (driver-hash-equivalent form), rows sorted."""
    problems: list[str] = []
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            bad = s.map(lambda v: isinstance(v, (list, dict, set, np.ndarray)))
            if bad.any():
                problems.append(f"column {col!r} holds unhashable values")
                df[col] = s.map(repr)
                continue
        if str(s.dtype).startswith("datetime64"):
            s = s.astype("datetime64[us]")
        df[col] = s.astype(str).replace({"NaT": "None", "nan": "None", "<NA>": "None"})
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, problems


def check_key(key: str, spark, con, sf_dir: str) -> list[str]:
    problems: list[str] = []
    sdf = registry.QUERIES[key](spark, sf_dir)
    spdf = sdf.toPandas()
    oracle = registry.ORACLE.get(key)
    if oracle is None:
        _, p = _canon_frame(spdf)
        return [f"(rows-only) {m}" for m in p]
    ddf = con.execute(oracle).df()

    s_c, s_p = _canon_frame(spdf)
    d_c, d_p = _canon_frame(ddf)
    problems += [f"spark: {m}" for m in s_p]
    problems += [f"oracle: {m}" for m in d_p]

    if sorted(spdf.columns) != sorted(ddf.columns):
        problems.append(
            f"columns differ spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
        )
        return problems
    if len(s_c) != len(d_c):
        problems.append(f"row count spark={len(s_c)} duck={len(d_c)}")
        return problems

    for col in s_c.columns:
        a, b = s_c[col], d_c[col]
        eq = a == b
        if not bool(eq.all()):
            idx = (~eq).idxmax()
            problems.append(
                f"string-form mismatch {col!r} at sorted row {idx}: "
                f"spark={a[idx]!r} duck={b[idx]!r} "
                f"(dtypes spark={spdf[col].dtype} duck={ddf[col].dtype})"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all()
    keys = sys.argv[2:] or list(registry.QUERIES)

    from pyspark.sql import SparkSession

    # Partition-count / parallelism overrides: results must be
    # invariant to both (any divergence is hidden order dependence),
    # so the replica lets a stress run pick adversarial values, e.g.
    # SPARK_GRAFT_SIM_PARTITIONS=7 SPARK_GRAFT_SIM_CORES=5.
    n_part = os.environ.get("SPARK_GRAFT_SIM_PARTITIONS", "16")
    n_cores = os.environ.get("SPARK_GRAFT_SIM_CORES", "16")
    builder = (
        SparkSession.builder.master(f"local[{n_cores}]")
        # The console progress bar interleaves carriage returns with
        # the per-key ok/FAIL lines, hiding them from line-oriented
        # grep/tee consumers — keep replica logs line-clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", n_part)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # Arrow-accelerated toPandas for the REPLICA's collect only:
        # without it a multi-million-row result (x3/x4 pair tables at
        # sf1.0) converts row-by-row in single-threaded Python — ~30
        # CPU-minutes and 10 GB for one key. Values are identical
        # either way (invariance axis 8 proved the whole registry
        # strict-clean with Arrow conversion DISABLED); opt out with
        # SPARK_GRAFT_SIM_ARROW=0 to replay that axis.
        .config(
            "spark.sql.execution.arrow.pyspark.enabled",
            os.environ.get("SPARK_GRAFT_SIM_ARROW", "1") != "0",
        )
    )
    # Extra adversarial confs, ';'-separated k=v pairs — e.g.
    # SPARK_GRAFT_SIM_CONF="spark.sql.codegen.wholeStage=false" to
    # prove results are codegen/interpreted invariant.
    for pair in os.environ.get("SPARK_GRAFT_SIM_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{os.path.join(sf_dir, name)}.parquet'"
        )

    n_bad = 0
    for key in keys:
        try:
            problems = check_key(key, spark, con, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if problems:
            n_bad += 1
            print(f"FAIL {key}")
            for m in problems:
                print(f"     - {m}")
        else:
            print(f"ok   {key}")
    print(f"\n{len(keys) - n_bad}/{len(keys)} strict-clean")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
