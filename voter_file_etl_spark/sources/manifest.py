"""Load-manifest bookkeeping (VoterFile table).

Reference: download.ts:86-92 inserts (Filename, State, Lines,
Loaded=false) after download; load.ts:98-108 skips files whose
manifest row has Loaded=true; load.ts:287-294 flips Loaded after the
atomic publish.

Spark-first: the manifest is a tiny parquet table; the "already
loaded" check is a broadcast left-anti join (never a per-file point
query), and updates are read-modify-overwrite of the tiny table —
cheap because the manifest is O(files), not O(rows).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from voter_file_etl_spark.schema import manifest_struct


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    if os.path.isdir(path) and any(
        n.endswith(".parquet") for n in os.listdir(path)
    ):
        return spark.read.parquet(path)
    return spark.createDataFrame([], manifest_struct())


def record_files(
    spark: SparkSession, path: str, files: list[tuple[str, str, int]]
) -> DataFrame:
    """Append manifest rows for (filename, state, line_count) triples,
    keeping the newest row per Filename (upsert-by-overwrite)."""
    now = datetime.now(tz=timezone.utc).replace(tzinfo=None)
    new = spark.createDataFrame(
        [(f, s, n, False, now) for f, s, n in files], manifest_struct()
    )
    # _src: the incoming record wins an updatedAt tie (two calls in
    # the same clock tick — e.g. frozen test clocks — must not leave
    # the winner to shuffle order).
    merged = (
        read_manifest(spark, path)
        .withColumn("_src", F.lit(0))
        .unionByName(new.withColumn("_src", F.lit(1)))
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("Filename").orderBy(
                    F.desc("updatedAt"), F.desc("_src")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    _overwrite_small(merged, path)
    return read_manifest(spark, path)


def mark_loaded(spark: SparkSession, path: str, filename: str) -> None:
    """Loaded=true after publish (load.ts:287-294)."""
    updated = read_manifest(spark, path).withColumn(
        "Loaded",
        F.when(F.col("Filename") == filename, F.lit(True)).otherwise(F.col("Loaded")),
    )
    _overwrite_small(updated, path)


def pending_files(files_df: DataFrame, manifest: DataFrame) -> DataFrame:
    """Files with no Loaded=true manifest row — broadcast left-anti
    (load.ts:98-108 as a relational op)."""
    loaded = manifest.filter(F.col("Loaded")).select(
        F.col("Filename").alias("filename")
    )
    return files_df.join(F.broadcast(loaded), "filename", "left_anti")


def _overwrite_small(df: DataFrame, path: str) -> None:
    # Manifest is tiny: materialize driver-side (so we never read and
    # write the same files in one job), write to a hidden staging dir,
    # and promote it with atomic FS renames. The manifest is the
    # system of record for Loaded flags — a bare overwrite deletes the
    # live copy before the writing job commits, so a failure there
    # would lose the entire load history (same hazard the etl.py
    # publish guards against).
    import uuid

    spark = df.sparkSession
    rows = df.collect()
    run_id = uuid.uuid4().hex[:12]
    parent = os.path.dirname(path.rstrip("/")) or "."
    staging = os.path.join(parent, f".mf_staging_{run_id}")
    retired = os.path.join(parent, f".mf_retired_{run_id}")
    # repartition(1), NOT coalesce(1): a coalesce directly over a
    # Python-built local relation (Arrow LocalTableScan) costs ~5 s
    # per write on Spark 4.1 where the repartition path takes ~0.5 s
    # (measured; parquet-scan-backed coalesce is unaffected). The
    # manifest is mutated once per loaded file, so this was the
    # dominant cost of the whole ETL loop.
    spark.createDataFrame(rows, df.schema).repartition(1).write.parquet(staging)

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(parent).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )

    def _p(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    if fs.exists(_p(path)):
        fs.rename(_p(path), _p(retired))
    fs.rename(_p(staging), _p(path))
    fs.delete(_p(retired), True)
