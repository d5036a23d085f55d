"""Streaming operators (SURVEY.md §2.11).

The reference's "incremental" semantics are file-granular (newer
files replace older ones; loaded files are skipped). Structured
Streaming's file source + Trigger.AvailableNow gives that exactly-
once file tracking natively; the tumbling-window aggregate below is
the declared streaming query, expressed so the *same* logical plan
runs in batch (for the DuckDB oracle) and as a stream
(run_tumbling_stream, exercised in tests).

Scale: windowed aggregation keys the shuffle by (window, event_type);
with a watermark the state store evicts closed windows, so state is
bounded by (active windows × key cardinality), independent of input
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t, table_path


def _windowed(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window aggregate — shared by batch and stream."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# ST1 — tumbling-window aggregation (batch form; hour windows are
# epoch-aligned so date_trunc is the oracle equivalent).
# ---------------------------------------------------------------------------
@register(
    "st1_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed(t(spark, sf_dir, "events"))


def run_tumbling_stream(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """The same aggregate as a real stream: file source, AvailableNow
    trigger, complete-mode memory sink. Returns the materialized result."""
    # Declare the on-disk schema (probed from the parquet footer) and
    # convert ts in-plan, exactly like the batch loader.
    from voter_file_etl_spark.tables import (
        ensure_session_confs,
        events_file_schema,
        normalize_events_ts,
    )

    ensure_session_confs(spark)
    # File-source streaming needs a directory; select the events file
    # with a glob filter so the source can track it for exactly-once.
    stream = normalize_events_ts(
        spark.readStream.schema(events_file_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).withWatermark("ts", "1 hour")
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            _windowed(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("st1_stream_out")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql("SELECT * FROM st1_stream_out")


# ---------------------------------------------------------------------------
# ST5 — stream-static join: enrich the event stream with a static
# dimension (the voter/customer profile), then aggregate. In
# Structured Streaming the static side is re-broadcast per micro-
# batch — no stream-side state — so this is the scalable "enrich on
# ingest" shape. Batch form below is the oracle-checked plan;
# run_enrich_stream executes the same logical plan as a real stream.
# ---------------------------------------------------------------------------
def _enriched(events: DataFrame, customer: DataFrame) -> DataFrame:
    dim = customer.select("c_custkey", "c_mktsegment")
    return (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "st5_stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def st5_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enriched(t(spark, sf_dir, "events"), t(spark, sf_dir, "customer"))


def run_enrich_stream(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """ST5 as a real stream-static join with a file-source stream."""
    from voter_file_etl_spark.tables import (
        ensure_session_confs,
        events_file_schema,
        normalize_events_ts,
    )

    ensure_session_confs(spark)
    stream = normalize_events_ts(
        spark.readStream.schema(events_file_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            _enriched(stream, t(spark, sf_dir, "customer"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("st5_stream_out")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql("SELECT * FROM st5_stream_out")


# ---------------------------------------------------------------------------
# ST9 — watermark late-data semantics, driver-checkable. The brief's
# "watermarks + windowed aggs for late data" has so far been proven
# only structurally (st1 declares a watermark but AvailableNow drains
# everything in order, so nothing is ever late). Here lateness is
# REAL and the outcome is exact. Spark keeps TWO watermarks per batch
# (SPARK-24634): late-event filtering uses the PREVIOUS batch's
# watermark, state eviction the current one — so a late row is
# dropped only when it arrives >= 2 batches after the watermark
# passed its window. The staging forces exactly that:
#
#   batch 0 — events before the timeline midpoint T_mid;
#   batch 1 — on-time continuation [T_mid, T_b1) — advances the
#             watermark past every early window;
#   batch 2 — re-deliveries (event_id % 7 == 0 of the early half, new
#             ids, ORIGINAL old timestamps): filtered against
#             wmA = maxA - delay (batch 0's eviction watermark) —
#             dropped iff hour-window end <= wmA (empirically
#             verified: the filter keys on WINDOW END, not row time).
#             A survivor whose window was already evicted re-creates
#             state and re-emits that window, so the sink can hold
#             two rows per window — the registered read SUMS them.
#   batch 3 — the tail [T_b1, max]: pushes the final watermark to
#             wmD = max_all - delay, flushing every window with
#             end <= wmD (append-mode emission cutoff).
#
# Both cutoffs are pure integer functions of the data, so the DuckDB
# oracle reproduces the whole lifecycle — including WHICH late rows
# were dropped — exactly.
#
# Determinism engineering: file order is pinned (mtime + lexicographic
# names); the delay is 90 min + 500 ms so the (millisecond-truncated)
# watermark can never coincide with an hour-aligned window end —
# the <= vs < eviction boundary is unreachable; Spark tracks event
# time in whole milliseconds, which the oracle mirrors with
# (us // 1000 - delay_ms) * 1000.
#
# Scale: state is one count per open (window, type); the watermark
# evicts every closed window, so state is bounded by lateness x key
# cardinality, independent of stream length — THE property that makes
# infinite-stream aggregation feasible.
# ---------------------------------------------------------------------------
_ST9_DELAY_MS = 5_400_500  # 90 min + 500 ms; never hour-aligned
_ST9_HOUR_US = 3_600_000_000


@register(
    "st9_watermark_late_drop",
    oracle=f"""
    WITH b AS (
      SELECT event_id, epoch_us(ts) AS us, event_type FROM events
    ), lim AS (
      SELECT (min(us) + max(us)) // 2 AS t_mid, max(us) AS max_all FROM b
    ), wm AS (
      SELECT ((max(us) // 1000) - {_ST9_DELAY_MS}) * 1000 AS wm1
      FROM b, lim WHERE us < t_mid
    ), survivors AS (
      SELECT us, event_type FROM b, lim WHERE us < t_mid
      UNION ALL
      SELECT us, event_type FROM b, lim WHERE us >= t_mid
      UNION ALL
      SELECT l.us, l.event_type
      FROM (SELECT us, event_type FROM b, lim
            WHERE us < t_mid AND event_id % 7 = 0) l, wm
      WHERE l.us - l.us % {_ST9_HOUR_US} + {_ST9_HOUR_US} > wm.wm1
    )
    SELECT s.us - s.us % {_ST9_HOUR_US} AS window_start_us,
           s.event_type,
           count(*) AS n_events
    FROM survivors s, lim
    WHERE s.us - s.us % {_ST9_HOUR_US} + {_ST9_HOUR_US}
          <= ((lim.max_all // 1000) - {_ST9_DELAY_MS}) * 1000
    GROUP BY 1, 2
    """,
)
def st9_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from voter_file_etl_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="st9_late_", dir=os.environ.get("TMPDIR", "/tmp"))
    ev = t(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us"), "event_type"
    )
    lims = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("m"), F.max("us").alias("mx")
    ).collect()[0]
    t_mid, t_b1 = lims["m"], (lims["m"] + lims["mx"]) // 2

    early = ev.filter(F.col("us") < t_mid)
    ontime = ev.filter((F.col("us") >= t_mid) & (F.col("us") < t_b1))
    late_redelivery = early.filter(F.col("event_id") % 7 == 0).withColumn(
        "event_id", F.col("event_id") + F.lit(100_000_000)
    )
    tail = ev.filter(F.col("us") >= t_b1)

    src = os.path.join(work, "src")
    os.makedirs(src)
    now = time.time()
    names = ["00_early", "01_ontime", "02_late", "03_tail"]
    # One write job stages all four batches: label each slice, union,
    # and let a single writer task emit one file per b= directory
    # (vs four separate scan+write jobs over the same events table).
    stage = os.path.join(work, "stage_b")
    (
        early.withColumn("b", F.lit(0))
        .unionByName(ontime.withColumn("b", F.lit(1)))
        .unionByName(late_redelivery.withColumn("b", F.lit(2)))
        .unionByName(tail.withColumn("b", F.lit(3)))
        .repartition(1)
        .write.partitionBy("b")
        .parquet(stage)
    )
    for i, name in enumerate(names):
        bdir = os.path.join(stage, f"b={i}")
        dst = os.path.join(src, f"{name}.parquet")
        if os.path.isdir(bdir):
            part = next(
                p for p in sorted(os.listdir(bdir)) if p.endswith(".parquet")
            )
            shutil.move(os.path.join(bdir, part), dst)
        else:  # empty slice: partitionBy wrote no dir; stage a 0-row file
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array([], pa.int64()),
                        "us": pa.array([], pa.int64()),
                        "event_type": pa.array([], pa.string()),
                    }
                ),
                dst,
            )
        mtime = now - 100 + 10 * i  # batch order pinned by mtime
        os.utime(dst, (mtime, mtime))

    stream = (
        spark.readStream.schema("event_id long, us long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(F.timestamp_micros("us").alias("ts"), "event_type")
        .withWatermark("ts", f"{_ST9_DELAY_MS} milliseconds")
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("st9_stream_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    # A window whose state was evicted before a surviving late row
    # arrived re-emits with the late-only count: sum the emissions.
    return (
        spark.table("st9_stream_out")
        .groupBy(
            F.unix_micros("w.start").alias("window_start_us"), F.col("event_type")
        )
        .agg(F.sum("n_events").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# ST16 — windowed distinct users on the stream: exact
# count-distinct per tumbling hour (the "unique visitors per window"
# number every traffic dashboard leads with). st1 counts events —
# distinct users is the harder streaming aggregate because its
# state is a per-window SET, not a counter; the watermark bounds
# that state to active windows exactly as §6 requires. Registered
# key is the batch form (same logical plan); run_distinct_stream
# executes it as a real AvailableNow stream, and the suite asserts
# stream == batch == oracle.
#
# Scale note: exact per-window distinct state is O(users-per-window)
# — the right default at dashboard grain; when windows get too hot,
# swap countDistinct for approx_count_distinct (HLL state, a28's
# sketch contract) in the SAME plan.
# ---------------------------------------------------------------------------
def _distinct_windowed(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_users",
            "n_events",
        )
    )


@register(
    "st16_stream_distinct_users",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def st16_stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _distinct_windowed(t(spark, sf_dir, "events"))


def run_distinct_stream(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """st16 as a real stream. Streaming forbids countDistinct, so the
    stream runs the SCALABLE formulation: dropDuplicates on
    (user_id, hour) — state evicted by the watermark because the
    hour timestamp is a dedup key — chained into a windowed count
    (multiple stateful operators, append mode). Two far-future
    sentinel files (user_id = -1, filtered after the dedup) advance
    the watermark so every real window flushes before AvailableNow
    stops — the st11/st13 staging pattern. The n_events column needs
    pre-dedup rows, so the stream emits n_users and the events count
    rides the batch plan; the suite compares n_users stream==batch.
    """
    import os
    import shutil
    import tempfile
    import time

    from voter_file_etl_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(
        prefix="st16_distinct_", dir=os.environ.get("TMPDIR", "/tmp")
    )
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    mx = ev.agg(F.max("us").alias("mx")).collect()[0]["mx"]
    day_us = 86_400_000_000
    sent = spark.createDataFrame(
        [(-1, mx + 10 * day_us), (-2, mx + 20 * day_us)],
        "user_id long, us long",
    )
    src = os.path.join(work, "src")
    os.makedirs(src)
    now = time.time()
    batches = [("00_data", ev.select("user_id", "us")), ("01_flush", sent)]
    for i, (name, df) in enumerate(batches):
        stage = os.path.join(work, f"stage_{name}")
        df.repartition(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in sorted(os.listdir(stage)) if p.endswith(".parquet")
        )
        dst = os.path.join(src, f"{name}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        mtime = now - 100 + 10 * i
        os.utime(dst, (mtime, mtime))

    stream = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("hour_ts", F.date_trunc("hour", F.timestamp_micros("us")))
        .withWatermark("hour_ts", "1 hour")
        .dropDuplicates(["user_id", "hour_ts"])
        .filter(F.col("user_id") >= 0)
        .groupBy(F.window("hour_ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_users",
        )
    )
    from voter_file_etl_spark.tables import stream_parallelism

    with stream_parallelism(spark):
        query = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("st16_stream_out")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.sql("SELECT * FROM st16_stream_out")
