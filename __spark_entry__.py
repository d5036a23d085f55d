"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1-shaped groupBy-agg) at sf0.001.
queries()       — every implemented operator from SURVEY.md §2 + the
                  north-star LLM-pipeline suite (registry-backed).
oracle_sql()    — matching DuckDB SQL per key (omitted only for ops
                  that are not SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from voter_file_etl_spark import registry  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["a4_groupby_count"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLE)
