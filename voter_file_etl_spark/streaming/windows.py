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
    # Declare the on-disk schema (ts is long nanos in the file) and
    # convert in-plan, exactly like the batch loader.
    from pyspark.sql import types as T

    from voter_file_etl_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # File-source streaming needs a directory; select the events file
    # with a glob filter so the source can track it for exactly-once.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
    )
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
    from pyspark.sql import types as T

    from voter_file_etl_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
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
    )
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
