"""Streaming merge (upsert) sink via foreachBatch.

The reference's load loop continuously lands new files and upserts
them into the serving table (load.ts: createMany with skipDuplicates
into the Temp table, then an atomic publish). Structured Streaming's
native sinks are append/update-only; the production pattern for
"stream into an upserted table" is foreachBatch: each micro-batch is
merged into the current table snapshot with last-writer-wins
semantics, and the snapshot flips atomically (versioned directory =
the same blue/green publish the batch ETL uses).

Scale: the merge is one window-dedup over (current ∪ batch) keyed on
the upsert key — a shuffle proportional to the table, which is the
honest cost of file-format upserts without a log-structured table
format; with Delta/Iceberg the same foreachBatch body becomes a
MERGE INTO and the shuffle drops to touched files. The plan shape
(per-key argmax by event time) is unchanged either way.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import ensure_session_confs, t

_SRC_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_N_SRC_FILES = 4  # micro-batches with maxFilesPerTrigger=1


def run_upsert_stream(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """events -> N-file stream -> foreachBatch last-writer-wins merge
    into a versioned parquet snapshot -> final snapshot."""
    ensure_session_confs(spark)
    src_dir = os.path.join(work_dir, "src")
    # Stage the stream input as several files so availableNow +
    # maxFilesPerTrigger=1 exercises multi-batch merging, not a
    # single-batch load.
    (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "user_id",
            "event_type",
            "value",
        )
        .repartition(_N_SRC_FILES)
        .write.mode("overwrite")
        .parquet(src_dir)
    )

    key = ["user_id", "event_type"]
    win = W.partitionBy(*key).orderBy(F.desc("us"), F.desc("event_id"))
    version = {"n": 0}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        cur_dir = os.path.join(work_dir, f"state_v{version['n']}")
        nxt_dir = os.path.join(work_dir, f"state_v{version['n'] + 1}")
        if os.path.isdir(cur_dir):
            merged = spark.read.parquet(cur_dir).unionByName(batch_df)
        else:
            merged = batch_df
        (
            merged.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .write.mode("overwrite")
            .parquet(nxt_dir)
        )
        version["n"] += 1

    stream = (
        spark.readStream.schema(_SRC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    query = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = spark.read.parquet(os.path.join(work_dir, f"state_v{version['n']}"))
    return final.select(
        "user_id",
        "event_type",
        F.col("us").alias("last_us"),
        F.col("value").alias("last_value"),
        F.col("event_id").alias("last_event_id"),
    )


# ---------------------------------------------------------------------------
# ST7 — streaming upsert sink: last-writer-wins per (user_id,
# event_type), merged batch-by-batch. The oracle is the batch
# equivalent: per-key argmax by (event time, event_id) — merging
# per-key maxima across arbitrary batch splits equals the global
# maximum, which is why the check is exact no matter how the file
# source slices the stream.
# ---------------------------------------------------------------------------
@register(
    "st7_foreach_batch_upsert",
    oracle="""
    SELECT user_id, event_type, last_us, last_value, last_event_id
    FROM (
      SELECT user_id, event_type,
             epoch_us(ts) AS last_us, value AS last_value,
             event_id AS last_event_id,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def st7_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="st7_upsert_", dir=os.environ.get("TMPDIR", "/tmp"))
    return run_upsert_stream(spark, sf_dir, work)
