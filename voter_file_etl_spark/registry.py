"""Query-key registry.

Every operator from SURVEY.md §2 registers here as a (spark, sf_dir)
-> DataFrame callable plus (where SQL-expressible) an ANSI-SQL oracle
string that DuckDB runs on the same parquet tables. The driver
executes both and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- float aggregations route through exact DECIMAL arithmetic and only
  the final value is cast to DOUBLE (sum order then cannot change the
  result bit pattern across engines);
- raw double math is rounded to a fixed number of decimals on both
  sides when it crosses an engine boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``key`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from voter_file_etl_spark.plans import (  # noqa: F401
        aggregates,
        analytics,
        core,
        joins,
        lifecycle,
        reshape,
        scalars,
        setops,
        sql_surface,
        temporal,
        windows,
    )
    from voter_file_etl_spark.operators import (  # noqa: F401
        dedup,
        etl,
        graph,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from voter_file_etl_spark.streaming import (  # noqa: F401
        joins as stream_joins,
        sinks as stream_sinks,
        stateful as stream_stateful,
        windows as stream_windows,
    )
