"""Loaders for the driver's synthetic star-schema tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets real file
scans (column pruning + predicate pushdown reach the parquet reader).
Nothing is cached here: queries declare their own plans and the
optimizer prunes what it needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on regardless of which session
    invokes it (the driver builds its own SparkSession):

    - session timezone UTC so timestamp rendering matches the DuckDB
      oracle's naive timestamps;
    - nanosAsLong so parquet TIMESTAMP(NANOS) columns (events.ts) are
      readable; the loader converts them back to timestamps in-plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) -> read as long ns and
        # convert with exact integer division (micros), matching
        # DuckDB's ns->us truncation on the oracle side.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
