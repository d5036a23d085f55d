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
from pyspark.sql import types as T

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import ensure_session_confs, t


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

    def source() -> DataFrame:
        return (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

    p, v = _sides(source())
    # Watermarks bound the state: views older than (watermark - 1h)
    # can never match a future purchase and are evicted.
    p = p.withWatermark("p_ts", "2 hours")
    v = v.withWatermark("v_ts", "2 hours")
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
