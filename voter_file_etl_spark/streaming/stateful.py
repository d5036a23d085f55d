"""Custom stateful streaming operator: first-seen dedup with
applyInPandasWithState (SURVEY.md §2.11 north-star extension).

The reference's idempotency story is PK dedup on insert
(createMany skipDuplicates, load.ts:356-360). In a streaming
ingest that becomes keyed state: for every (user_id, event_type)
key, keep the earliest event timestamp and a seen-count; duplicate
deliveries update state instead of emitting duplicate rows.

The state function aggregates to (min_ts, count) — both
arrival-order-independent — so the streamed result is deterministic
and the DuckDB oracle is a plain GROUP BY. That makes this the rare
stateful-streaming op with a full value-hash correctness check
rather than a rows-only one.

Scale: state is one 16-byte record per distinct key, partitioned by
key hash across executors (RocksDB state store in production).
Trigger.AvailableNow replays the backlog in bounded batches with
exactly-once file tracking; at steady state a watermark +
GroupStateTimeout would evict idle keys — here keys are bounded
(users × event types) so state is O(keys), not O(events).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import ensure_session_confs

_OUT_SCHEMA = "user_id long, event_type string, first_us long, n_seen long"
_STATE_SCHEMA = "first_us long, n_seen long"


def _dedup_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold (min first_us, count) into keyed state; emit the key's
    current state once per trigger. Min/count are order-independent,
    so replays and batch boundaries cannot change the result."""
    first_us, n_seen = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_min = int(pdf["us"].min())
        first_us = batch_min if first_us is None else min(first_us, batch_min)
        n_seen += len(pdf)
    state.update((first_us, n_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "first_us": [first_us],
            "n_seen": [n_seen],
        }
    )


def run_dedup_stream(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """File-source stream -> keyed first-seen state -> memory sink."""
    ensure_session_confs(spark)
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) as long
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type", F.expr("ts div 1000").alias("us"))
    )
    deduped = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _dedup_state,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    query = (
        deduped.writeStream.outputMode("update")
        .format("memory")
        .queryName("st4_stream_out")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # One emitted row per key per trigger; keep each key's final state.
    out = spark.sql("SELECT * FROM st4_stream_out")
    return out.groupBy("user_id", "event_type").agg(
        F.min("first_us").alias("first_us"), F.max("n_seen").alias("n_seen")
    )


@register(
    "st4_stateful_dedup",
    oracle="""
    SELECT user_id, event_type,
           epoch_us(min(ts)) AS first_us,
           count(*) AS n_seen
    FROM events
    GROUP BY user_id, event_type
    """,
)
def st4_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix="st4_ckpt_", dir=os.environ.get("TMPDIR", "/tmp"))
    return run_dedup_stream(spark, sf_dir, ckpt)


# ---------------------------------------------------------------------------
# ST8 — built-in streaming dedup: dropDuplicates over the full key on
# an unbounded stream (state = one entry per distinct key, the
# native sibling of st4's custom applyInPandasWithState dedup; with
# event-time bounds, dropDuplicatesWithinWatermark caps the state).
# Which PHYSICAL row survives per key is arrival-order-dependent, so
# the registered output is the per-type distinct-key count — exactly
# the quantity the dedup guarantees deterministically.
# ---------------------------------------------------------------------------
@register(
    "st8_stream_dedup_builtin",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def st8_stream_dedup_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    ckpt = tempfile.mkdtemp(prefix="st8_ckpt_", dir=os.environ.get("TMPDIR", "/tmp"))
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) as long
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type")
    )
    counted = (
        stream.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    query = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("st8_stream_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # Update mode emits a row per trigger as counts grow; the final
    # value per type is the maximum emitted.
    return (
        spark.sql("SELECT * FROM st8_stream_out")
        .groupBy("event_type")
        .agg(F.max("n_users").alias("n_users"))
    )
