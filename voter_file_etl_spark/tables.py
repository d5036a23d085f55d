"""Loaders for the driver's synthetic star-schema tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets real file
scans (column pruning + predicate pushdown reach the parquet reader).
Nothing is cached here: queries declare their own plans and the
optimizer prunes what it needs.
"""

from __future__ import annotations

import contextlib
import functools
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


@functools.lru_cache(maxsize=None)
def parquet_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata, driver-side.

    No Spark job is scheduled — pyarrow reads only footers — so
    plan-size gates (e.g. m14's broadcast decision) can consult corpus
    size at DataFrame-construction time without making plan building
    eager (ADVICE r8 #1: a ``docs.count()`` there scheduled a count
    job for every plan-only consumer — census, audits, explain).
    Memoized per (sf_dir, table): the testdata is immutable per round.
    Handles both a single parquet file and a directory of part files.
    """
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on regardless of which session
    invokes it (the driver builds its own SparkSession):

    - session timezone UTC so timestamp rendering matches the DuckDB
      oracle's naive timestamps;
    - nanosAsLong so parquet TIMESTAMP(NANOS) columns (events.ts in
      some testdata generations) are readable; `normalize_events_ts`
      converts whatever physical type the file has back to a session
      timestamp in-plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Bring events.ts to TimestampType whatever the file stored.

    The driver has regenerated testdata with different physical types
    across rounds: TIMESTAMP(NANOS) (reads as long under nanosAsLong —
    exact ns->us integer division matches DuckDB's truncation) and
    TIMESTAMP(MICROS) (reads as timestamp_ntz — cast is lossless under
    the UTC session timezone). Keying on the read dtype keeps every
    consumer correct against either generation.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype is not None and dtype != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


@contextlib.contextmanager
def stream_parallelism(spark: SparkSession, n: int = 8):
    """Pin shuffle (= state-store) partitions for a streaming query.

    AQE is disabled in stateful streaming, so a micro-batch pays a
    fixed ``spark.sql.shuffle.partitions`` tasks — and one Python
    state worker each for applyInPandasWithState — per trigger no
    matter how small the batch is. The registered streams replay a
    bounded backlog whose per-batch volume fits comfortably in a few
    partitions; the session default (sized for the batch engine)
    multiplies pure task/state-store overhead per trigger. The conf
    is read at query START and pinned into the checkpoint, so setting
    it around ``.start()``/``awaitTermination`` and restoring after
    is safe for every other query in the session.

    This knob must match the workload, not the machine: a production
    cluster ingesting real volume RAISES it (state is hash-split by
    key over exactly this many stores) — the point is that it should
    be an explicit per-stream choice, not inherited from the batch
    default.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def events_file_schema(spark: SparkSession, sf_dir: str):
    """On-disk schema of events.parquet as this session's confs read it
    (for readStream, which requires a declared schema). A parquet
    footer read — no data scan."""
    ensure_session_confs(spark)
    return spark.read.parquet(table_path(sf_dir, "events")).schema


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df
