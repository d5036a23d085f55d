"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, exact equality — floats
must match to the bit, which is what the engine's decimal/quantized
arithmetic guarantees).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from typing import Any

import duckdb

from voter_file_etl_spark.tables import TABLE_NAMES

REL_TOL = 0.0  # exact by default — mirrors the driver's value hash


def _duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:  # pragma: no cover
        pass
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(key: str, spark, sf_dir: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{key}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        only_s = [r for r in s_set[:2000] if r not in set(d_set[:2000])][:3]
        raise AssertionError(
            f"{key}: value mismatch; first aligned diffs={diffs!r}; "
            f"sample spark-only={only_s!r}"
        )
