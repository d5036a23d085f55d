"""SparkSession factory with scale-posture defaults.

Local runs use local[N] (one JVM); the conf below is written so the
same code lands well on a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join selection) — on a real cluster this is what absorbs the skew
  of a CA-sized state vs a WY-sized state (SURVEY.md §7.6).
- shuffle.partitions sized to cores locally; on a cluster this should
  be ~2-3x total cores — AQE coalesces the excess.
- Session timezone pinned to UTC so timestamp semantics are stable
  across engines (and match the DuckDB oracle).
- Arrow enabled so any pandas-UDF path is vectorized, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Durable-checkpoint knob for iterative operators (VERDICT r3 #5).
# Unset (default): per-round lineage truncation uses localCheckpoint —
# blocks live on executor local storage, zero distributed-FS traffic,
# but a lost executor loses its blocks and fails the job. Set to a
# cluster-visible path (HDFS/S3/NFS) and every iterative operator
# (g3 BFS rounds, and anything else calling iter_checkpoint) switches
# to durable reliable checkpointing that survives executor loss, at
# the cost of one checkpoint-FS write per round.
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def iter_checkpoint(df):
    """Eagerly truncate an iterative algorithm's per-round lineage.

    The plan shape of the consuming operator is identical either way —
    downstream sees a leaf scan of materialized blocks; only WHERE the
    blocks live (executor-local vs checkpoint FS) changes.
    """
    ckpt_dir = os.environ.get(CHECKPOINT_DIR_ENV)
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def materialize(df):
    """Materialize a multiply-referenced frame once, durable-aware.

    The one sanctioned way to pin an intermediate so each consumer
    scans materialized blocks instead of re-executing the subtree
    (use as ``frame.transform(materialize)``). Same env switch as
    iter_checkpoint: executor-local blocks by default (zero
    distributed-FS traffic — blocks die with a lost executor and the
    job fails/recomputes from source), durable reliable checkpoint
    when $SPARK_GRAFT_CHECKPOINT_DIR names a cluster-visible path
    (VERDICT r13 #2: raw localCheckpoint call sites bypassed the
    switch, so executor loss at scale failed jobs the knob was built
    to protect). tests/test_source_discipline.py gates that no
    operator calls localCheckpoint directly.
    """
    return iter_checkpoint(df)


def get_spark(
    app_name: str = "voter_file_etl_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode the driver is the only JVM, so driver memory is the
    one memory knob; on a cluster the same conf applies per executor.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
