"""Stream-stream interval join (SURVEY.md §2.11 north-star).

Purchases joined to the same user's views from the preceding hour —
the attribution query. In Structured Streaming both sides are
watermarked and the time-bound condition lets the state store evict
rows older than (watermark - interval): state is bounded by the
join window, independent of stream length. The batch form below is
the oracle-checked plan; run_interval_join_stream executes the same
join with two real file-source streams.

Scale: the join shuffles both streams on user_id; per-key state
holds only one hour of views (eviction driven by the watermark).
This is the canonical bounded-state stream-stream join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import (
    ensure_session_confs,
    events_file_schema,
    normalize_events_ts,
    t,
)


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return p, v


def _interval_join(p: DataFrame, v: DataFrame) -> DataFrame:
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    return p.join(v, cond).select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("v_ts").alias("view_us"),
    )


@register(
    "st6_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def st6_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, v = _sides(t(spark, sf_dir, "events"))
    return _interval_join(p, v)


def run_interval_join_stream(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """ST6 with two real watermarked file-source streams."""
    ensure_session_confs(spark)
    raw_schema = events_file_schema(spark, sf_dir)

    def source() -> DataFrame:
        return normalize_events_ts(
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    p, v = _sides(source())
    # Watermarks bound the state: views older than (watermark - 1h)
    # can never match a future purchase and are evicted.
    p = p.withWatermark("p_ts", "2 hours")
    v = v.withWatermark("v_ts", "2 hours")
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            _interval_join(p, v)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("st6_stream_out")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql("SELECT * FROM st6_stream_out")


# ---------------------------------------------------------------------------
# ST11 — stream-stream LEFT OUTER interval join, executed as a REAL
# stream: purchases left-joined to the same user's views from the
# preceding hour, where a purchase with no qualifying view must
# still emit — with NULL view columns — once the watermark proves no
# match can ever arrive. That null-emission is the part append-mode
# inner joins (st6) never exercise: Spark holds the unmatched left
# row in state until min(left WM, right WM) passes the last instant
# a matching view could carry, then emits exactly one null row.
#
# Determinism engineering: the source is staged as mtime-ordered
# files (two chronological halves, then TWO sentinel batches far
# past the data, +10d and +20d). Sentinels survive both side
# filters (one 'purchase' + one 'view' row each, user_id = -1) so
# BOTH watermarks advance past every real row — and there are two
# post-data batches because late-row filtering uses the PREVIOUS
# batch's watermark (SPARK-24634, proven in st9): the final state
# flush needs one extra watermark advance. With every unmatched row
# flushed, the stream's append-mode output equals the batch LEFT
# JOIN, which is exactly what the oracle computes.
#
# Scale: state per user is one hour of views plus pending unmatched
# purchases younger than the watermark — bounded by the interval,
# independent of stream length.
# ---------------------------------------------------------------------------
_ST11_DAY_US = 86_400_000_000


@register(
    "st11_stream_outer_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def st11_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="st11_outer_", dir=os.environ.get("TMPDIR", "/tmp"))
    ev = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us"), "user_id", "event_type"
    )
    lims = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).collect()[0]
    t_mid, mx = (lims["mn"] + lims["mx"]) // 2, lims["mx"]

    src = os.path.join(work, "src")
    os.makedirs(src)
    now = time.time()
    # Stage BOTH data halves in one write job (the st13/st9 harness:
    # label + partitionBy, single writer task emits one file per b=
    # dir) instead of two scan+repartition(1)+write jobs over the
    # same events table.
    stage = os.path.join(work, "stage_b")
    (
        ev.withColumn(
            "b",
            F.when(F.col("us") < t_mid, F.lit(0)).otherwise(F.lit(1)),
        )
        .repartition(1)
        .write.partitionBy("b")
        .parquet(stage)
    )
    names = []
    for i, name in enumerate(["00_first", "01_second"]):
        bdir = os.path.join(stage, f"b={i}")
        part = next(p for p in sorted(os.listdir(bdir)) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(os.path.join(bdir, part), dst)
        names.append(f"{name}.parquet")
    # Far-future sentinel batches (2 rows each): written driver-side
    # with pyarrow — a Spark job per 2-row local relation is pure
    # scheduler overhead (the st13/manifest discipline).
    import pyarrow as pa
    import pyarrow.parquet as pq

    for j, flush_us in enumerate([mx + 10 * _ST11_DAY_US, mx + 20 * _ST11_DAY_US]):
        name = f"0{2 + j}_flush.parquet" if j == 0 else f"0{2 + j}_flush2.parquet"
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([-1 - 2 * j, -2 - 2 * j], pa.int64()),
                    "us": pa.array([flush_us, flush_us], pa.int64()),
                    "user_id": pa.array([-1, -1], pa.int64()),
                    "event_type": pa.array(["purchase", "view"], pa.string()),
                }
            ),
            os.path.join(src, name),
        )
        names.append(name)
    for i, name in enumerate(names):
        mtime = now - 100 + 10 * i
        os.utime(os.path.join(src, name), (mtime, mtime))

    stream = (
        spark.readStream.schema("event_id long, us long, user_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("event_id", "user_id", "event_type", F.timestamp_micros("us").alias("ts"))
    )
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    v = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    joined = p.join(v, cond, "leftOuter").select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("v_ts").alias("view_us"),
    )
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("st11_stream_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.table("st11_stream_out").filter(F.col("user_id") >= 0)
