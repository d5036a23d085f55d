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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# transformWithStateInPandas's driver<->worker protocol is protobuf-
# based (pyspark/sql/streaming/proto); environments without
# google.protobuf cannot run it. st15 still registers EVERYWHERE: it
# takes the transformWithState path when the dependency exists and an
# applyInPandasWithState fallback with identical semantics otherwise,
# so the engine has no hard dependency on protobuf and the key is
# checkable in any driver environment.
try:  # pragma: no cover - environment probe
    import google.protobuf  # noqa: F401

    _HAS_TWS_PROTO = True
except ImportError:  # pragma: no cover
    _HAS_TWS_PROTO = False

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import (
    ensure_session_confs,
    events_file_schema,
    normalize_events_ts,
    stream_parallelism,
)

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
    stream = normalize_events_ts(
        spark.readStream.schema(events_file_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).select("user_id", "event_type", F.unix_micros("ts").alias("us"))
    deduped = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _dedup_state,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    with stream_parallelism(spark):
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
    stream = (
        spark.readStream.schema(events_file_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_type")
    )
    counted = (
        stream.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    with stream_parallelism(spark):
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


# ---------------------------------------------------------------------------
# ST13 — streaming sessionization with applyInPandasWithState +
# EventTimeTimeout: the custom stateful operator the built-in
# session_window (st3) approximates in batch, run as a REAL stream.
# Per user the state holds the one open session (start_us, last_us,
# n_events); a row further than the 6 h gap from last_us closes the
# session (emitted in that batch) and opens a new one; a session
# with NO closing row is flushed by the event-time timeout when the
# watermark passes last_us + gap. Close-or-timeout means every
# session is emitted exactly once, so the streamed output equals the
# batch gaps-and-islands oracle.
#
# Determinism engineering: the source is staged as mtime-ordered
# chronological halves (cross-batch order guaranteed; in-batch rows
# are sorted in the state fn; equal-us ties cannot move a session
# boundary because gaps are strict >) plus TWO far-future sentinel
# batches — the first advances the watermark past every real
# last_us + gap, the second triggers the timeout sweep (timeouts fire
# against the PREVIOUS batch's watermark, SPARK-24634, proven st9).
#
# Scale: state is one 24-byte open session per ACTIVE user — the
# timeout evicts idle keys, so state is O(active users), not O(users)
# or O(events); this is the unbounded-stream-safe sessionizer.
# ---------------------------------------------------------------------------
_ST13_GAP_US = 6 * 3600 * 1_000_000
_ST13_DAY_US = 86_400_000_000
_ST13_OUT = "user_id long, session_start_us long, session_end_us long, n_events long"
_ST13_STATE = "start_us long, last_us long, n long"


def _session_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    uid = key[0]
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "session_start_us": [start_us],
                "session_end_us": [last_us],
                "n_events": [n],
            }
        )
        return

    parts = [pdf for pdf in pdfs if len(pdf)]
    us = np.sort(np.concatenate([p["us"].to_numpy() for p in parts]))
    closed: list[tuple[int, int, int]] = []
    if state.exists:
        start_us, last_us, n = state.get
        if int(us[0]) - last_us > _ST13_GAP_US:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = None, None, 0
    else:
        start_us, last_us, n = None, None, 0

    # segment boundaries: index i starts a new session when the gap
    # from the previous row is strictly greater than the threshold
    brk = np.flatnonzero(np.diff(us) > _ST13_GAP_US) + 1
    bounds = [0, *brk.tolist(), len(us)]
    for i in range(len(bounds) - 1):
        seg = us[bounds[i] : bounds[i + 1]]
        if i == 0 and start_us is not None:
            last_us, n = int(seg[-1]), n + len(seg)
        else:
            if start_us is not None:
                closed.append((start_us, last_us, n))
            start_us, last_us, n = int(seg[0]), int(seg[-1]), len(seg)
    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp((last_us + _ST13_GAP_US) // 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [uid] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


@register(
    "st13_sessionize_state",
    oracle=f"""
    WITH d AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
    ), g AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER (
                    PARTITION BY user_id ORDER BY us) > {_ST13_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM d
    ), s AS (
      SELECT user_id, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def st13_sessionize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import time

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="st13_sess_", dir=os.environ.get("TMPDIR", "/tmp"))
    from voter_file_etl_spark.tables import t as _t

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    lims = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).collect()[0]
    mn, mx = lims["mn"], lims["mx"]
    # Stage two chronological halves in ONE write job: a single
    # writer task emits one file per q= directory (vs per-batch
    # scan+write jobs of the same events table). Two data batches
    # are the minimum that still exercises cross-batch state carry
    # (open sessions spanning the half boundary); each extra trigger
    # costs a fixed shuffle+state-commit round.
    _n_data_batches = 2
    stage = os.path.join(work, "stage_q")
    (
        ev.withColumn(
            "q",
            F.width_bucket(
                F.col("us"), F.lit(mn), F.lit(mx + 1), F.lit(_n_data_batches)
            ).cast("int")
            - 1,
        )
        .repartition(1)
        .write.partitionBy("q")
        .parquet(stage)
    )
    src = os.path.join(work, "src")
    os.makedirs(src)
    now = time.time()
    names = []
    for i in range(_n_data_batches):
        qdir = os.path.join(stage, f"q={i}")
        if not os.path.isdir(qdir):  # quarter with no rows
            continue
        part = next(p for p in sorted(os.listdir(qdir)) if p.endswith(".parquet"))
        shutil.move(os.path.join(qdir, part), os.path.join(src, f"0{i}_q.parquet"))
        names.append(f"0{i}_q.parquet")
    # Far-future sentinels: 1-row files written driver-side (pyarrow,
    # no Spark job) — they only advance the watermark.
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, flush_us in enumerate(
        [mx + 10 * _ST13_DAY_US, mx + 20 * _ST13_DAY_US], start=4
    ):
        name = f"0{i}_flush.parquet"
        pq.write_table(
            pa.table({"user_id": pa.array([-1], pa.int64()),
                      "us": pa.array([flush_us], pa.int64())}),
            os.path.join(src, name),
        )
        names.append(name)
    for i, name in enumerate(names):
        mtime = now - 100 + 10 * i
        os.utime(os.path.join(src, name), (mtime, mtime))

    stream = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.timestamp_micros("us"))
        .withWatermark("ts", "1 hour")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_state,
        _ST13_OUT,
        _ST13_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )
    with stream_parallelism(spark):
        query = (
            sessions.writeStream.outputMode("update")
            .format("memory")
            .queryName("st13_stream_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table("st13_stream_out").filter(F.col("user_id") >= 0)


# ---------------------------------------------------------------------------
# ST15 — transformWithStateInPandas (Spark 4's arbitrary-state API,
# SPARK-49564): the successor to applyInPandasWithState used by
# st4/st13, with typed named state slots (ValueState/ListState/
# MapState), per-state TTL, and timers as first-class handle
# operations. Here: one ValueState per (user_id, event_type) holding
# (n_events, sum_cents, max_us) — every component is an
# order-independent monoid fold, so replays and batch slicing cannot
# change the final answer, and the update-mode emissions are made
# deterministic by taking each key's LAST (= componentwise max,
# counters are monotone: n grows, sum of positive cents grows, max
# grows) emission. Values cross engines as exact integer cents
# (floor(v*100 + 0.5), identical IEEE ops both sides).
#
# Scale: state is one 24-byte tuple per live key in the state store
# (RocksDB in production — this API is the one that supports state
# rebalancing + TTL); two chronological half files exercise
# cross-batch state carry.
# ---------------------------------------------------------------------------
_ST15_OUT = "user_id long, event_type string, n_events long, sum_cents long, max_us long"


class _RunningStats(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "stats", "n long, sc long, mx long"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, sc, mx = 0, 0, None
        if self._state.exists():
            n, sc, mx = self._state.get()
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            sc += int(pdf["cents"].sum())
            bmx = int(pdf["us"].max())
            mx = bmx if mx is None else max(mx, bmx)
        self._state.update((n, sc, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "n_events": [n],
                "sum_cents": [sc],
                "max_us": [mx],
            }
        )

    def close(self) -> None:
        pass


def _running_stats_fallback(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of _RunningStats, used where the
    transformWithState protobuf protocol is unavailable — same keyed
    (n, sum_cents, max_us) fold, same one-emission-per-trigger Update
    contract, so the downstream last-emission reduction is shared."""
    n, sc, mx = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        sc += int(pdf["cents"].sum())
        bmx = int(pdf["us"].max())
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, sc, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n_events": [n],
            "sum_cents": [sc],
            "max_us": [mx],
        }
    )


@register(
    "st15_transform_with_state",
    oracle="""
    SELECT user_id, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           max(epoch_us(ts)) AS max_us
    FROM events
    GROUP BY user_id, event_type
    """,
)
def st15_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from voter_file_etl_spark.tables import t as _t

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="st15_tws_", dir=os.environ.get("TMPDIR", "/tmp"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.expr("cast(floor(value * 100 + 0.5d) as bigint)").alias("cents"),
    )
    lims = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).collect()[0]
    mn, mx = lims["mn"], lims["mx"]
    # Two chronological halves staged in one write job (same harness
    # as st13): cross-batch state carry is exercised, per-trigger
    # fixed costs are not multiplied.
    stage = os.path.join(work, "stage_q")
    (
        ev.withColumn(
            "q",
            F.width_bucket(F.col("us"), F.lit(mn), F.lit(mx + 1), F.lit(2)).cast(
                "int"
            )
            - 1,
        )
        .repartition(1)
        .write.partitionBy("q")
        .parquet(stage)
    )
    src = os.path.join(work, "src")
    os.makedirs(src)
    import time

    now = time.time()
    for i in range(2):
        qdir = os.path.join(stage, f"q={i}")
        if not os.path.isdir(qdir):
            continue
        part = next(p for p in sorted(os.listdir(qdir)) if p.endswith(".parquet"))
        dst = os.path.join(src, f"0{i}_half.parquet")
        shutil.move(os.path.join(qdir, part), dst)
        os.utime(dst, (now - 100 + 10 * i, now - 100 + 10 * i))

    stream = (
        spark.readStream.schema("user_id long, event_type string, us long, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    if _HAS_TWS_PROTO:
        out = stream.groupBy("user_id", "event_type").transformWithStateInPandas(
            _RunningStats(),
            outputStructType=_ST15_OUT,
            outputMode="Update",
            timeMode="None",
        )
    else:  # protobuf-free twin: same state fold, same Update contract
        out = stream.groupBy("user_id", "event_type").applyInPandasWithState(
            _running_stats_fallback,
            _ST15_OUT,
            "n long, sc long, mx long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    with stream_parallelism(spark):
        query = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("st15_stream_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    # Update mode emits once per key per batch it appears in; the final
    # state is the LAST emission. n_events grows by >=1 per emission, so
    # max over the whole struct (field order: n_events first) selects
    # that emission atomically — no reliance on the other columns being
    # monotone (sum_cents could shrink if values were negative).
    return (
        spark.table("st15_stream_out")
        .groupBy("user_id", "event_type")
        .agg(F.max(F.struct("n_events", "sum_cents", "max_us")).alias("s"))
        .select("user_id", "event_type", "s.n_events", "s.sum_cents", "s.max_us")
    )


# ---------------------------------------------------------------------------
# ST17 — streaming CUSUM drift detection (w20's monitor as a REAL
# stream): the daily per-type revenue rollup arrives in three
# chronological micro-batches and a per-key numeric accumulator
# (S, max, alarm count, first-alarm index) carries ACROSS batch
# boundaries — the third state shape in the suite after first-seen
# dedup (st4, monoid fold) and sessionization (st13, timeout
# eviction): a sequential recurrence where arrival order matters
# and state is the only thing connecting batches. Reference
# parameters (series length, total) are baked into the feed by the
# upstream batch job — the offline-reference/online-detector split
# every production monitor uses. The max(0, ·) reflection is w20's
# exact-integer form, so the streamed final states equal the batch
# recursive-CTE oracle row for row.
#
# Determinism engineering: batches split on day-value terciles
# (chronology holds per key across batches), mtime-ordered files,
# maxFilesPerTrigger=1, in-batch rows sorted by day; update-mode
# emissions resolve to each key's LAST batch via max_by(idx).
#
# Scale: state is five int64s per key; the detector sees the
# BOUNDED daily rollup, never raw events.
# ---------------------------------------------------------------------------
_ST17_OUT = (
    "event_type string, idx long, n_days long, s long, mx long,"
    " alarms long, first_alarm long"
)
_ST17_STATE = "idx long, s long, mx long, alarms long, first_alarm long"


def _cusum_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    etype = key[0]
    parts = [p for p in pdfs if len(p)]
    pdf = pd.concat(parts).sort_values("day_idx")
    idx, s, mx, alarms, first = state.get if state.exists else (0, 0, 0, 0, 0)
    n = int(pdf["n_days"].iloc[0])
    total = int(pdf["total_cents"].iloc[0])
    thr = 2 * total
    for cents in pdf["cents"].astype("int64"):
        idx += 1
        s = max(0, s + n * int(cents) - total)
        if s > mx:
            mx = s
        if s > thr:
            alarms += 1
            if first == 0:
                first = idx
    state.update((idx, s, mx, alarms, first))
    yield pd.DataFrame(
        [
            {
                "event_type": etype,
                "idx": idx,
                "n_days": n,
                "s": s,
                "mx": mx,
                "alarms": alarms,
                "first_alarm": first,
            }
        ]
    )


@register(
    "st17_stream_cusum",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(cents) OVER (PARTITION BY event_type) AS total
      FROM d
    ), rec AS (
      SELECT event_type, i, n, total,
             greatest(0, n * cents - total) AS s
      FROM idx WHERE i = 1
      UNION ALL
      SELECT b.event_type, b.i, b.n, b.total,
             greatest(0, r.s + b.n * b.cents - b.total)
      FROM rec r JOIN idx b
        ON b.event_type = r.event_type AND b.i = r.i + 1
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN s > 2 * total THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           CAST(max(s) AS BIGINT) AS max_s,
           CAST(coalesce(min(CASE WHEN s > 2 * total THEN i END), 0)
                AS BIGINT) AS first_alarm
    FROM rec GROUP BY event_type
    """,
)
def st17_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import time as _time

    from pyspark.sql.window import Window as W

    from voter_file_etl_spark.tables import t

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="st17_cusum_")
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("cents")
    )
    w_key = W.partitionBy("event_type")
    feed = daily.select(
        "event_type",
        "day",
        "cents",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("day_idx"),
        F.count(F.lit(1)).over(w_key).cast("long").alias("n_days"),
        F.sum("cents").over(w_key).cast("long").alias("total_cents"),
    )
    # Tercile split on day VALUE: chronology holds per key across
    # batches (batch 0's days all precede batch 1's for every key).
    # min/max day come from the RAW events scan (r13): the old shape
    # ran the whole daily aggregate plus a distinct() — two extra
    # Exchanges — to get two scalars that a shuffle-free partial
    # min/max over ts already yields.
    d_stats = ev.select(F.col("ts").cast("date").alias("day")).agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    ).collect()[0]
    span = (d_stats["mx"] - d_stats["mn"]).days + 1
    staged = feed.withColumn(
        "q",
        F.least(
            F.lit(2),
            (F.datediff("day", F.lit(d_stats["mn"])) * 3 / span).cast("int"),
        ),
    )
    stage = os.path.join(work, "stage")
    staged.repartition(1).write.partitionBy("q").parquet(stage)
    src = os.path.join(work, "src")
    os.makedirs(src)
    now = _time.time()
    moved = []
    for i in range(3):
        qdir = os.path.join(stage, f"q={i}")
        if not os.path.isdir(qdir):
            continue
        part = next(
            p for p in sorted(os.listdir(qdir)) if p.endswith(".parquet")
        )
        name = f"0{i}_days.parquet"
        shutil.move(os.path.join(qdir, part), os.path.join(src, name))
        moved.append(name)
    for i, name in enumerate(moved):
        mtime = now - 100 + 10 * i
        os.utime(os.path.join(src, name), (mtime, mtime))

    stream = (
        spark.readStream.schema(
            "event_type string, day date, cents long, day_idx long,"
            " n_days long, total_cents long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    states = stream.groupBy("event_type").applyInPandasWithState(
        _cusum_state,
        _ST17_OUT,
        _ST17_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    with stream_parallelism(spark):
        query = (
            states.writeStream.outputMode("update")
            .format("memory")
            .queryName("st17_stream_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    out = spark.table("st17_stream_out")
    return out.groupBy("event_type").agg(
        F.max_by(F.col("n_days"), F.col("idx")).alias("n_days"),
        F.max_by(F.col("alarms"), F.col("idx")).alias("n_alarms"),
        F.max_by(F.col("mx"), F.col("idx")).alias("max_s"),
        F.max_by(F.col("first_alarm"), F.col("idx")).alias("first_alarm"),
    )
