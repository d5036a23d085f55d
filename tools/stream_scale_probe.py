"""Streaming state-store scale probe (VERDICT r6 ask #7).

[archival-probe] — r6 state-store scale adjudication; re-run only if st-family state posture changes.

The st family's cost argument says its seconds are the ~1.1 s/trigger
micro-batch framework FLOOR, measured only at sf0.1. This probe
produces the two missing pieces of evidence:

1. FLOOR AMORTIZATION — a controlled 4-trigger replay (fixed trigger
   count, fixed 1,000-key cardinality) at 1x and 10x rows/trigger:
   if the floor is fixed cost, wall time grows far less than 10x.
   Run for both a JVM stateful aggregate (update-mode keyed count)
   and the Python state path (applyInPandasWithState passthrough).

2. STATE IS O(keys), NOT O(rows) — the state store's
   numRowsTotal/memoryUsedBytes from the query's final progress at
   both scales: rows x10 with keys fixed must leave state rows
   unchanged (== key cardinality) and memory ~flat.

3. REGISTRY REPLAY AT 10x — a probe dir whose events table is 10x
   sf0.1 (event_id remapped, user cardinality preserved, other
   tables copied), replayed through the top-cost registered st keys
   with the warm+clearCache protocol: their wall time must grow
   ≪10x, confirming the floor argument for the real operators.

Usage: python tools/stream_scale_probe.py [sf_dir] ; one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from typing import Any, Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402

from voter_file_etl_spark import registry  # noqa: E402
from voter_file_etl_spark.session import get_spark  # noqa: E402
from voter_file_etl_spark.tables import (  # noqa: E402
    normalize_events_ts,
    stream_parallelism,
    t,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_FILES = 4
N_KEYS = 1_000

REGISTRY_KEYS = [
    "st4_stateful_dedup",
    "st9_watermark_late_drop",
    "st11_stream_outer_join",
    "st13_sessionize_state",
    "st15_transform_with_state",
    "st19_exactly_once_sink",
]


def _stage_source(spark, rows_total: int) -> str:
    """4 chronological files, rows_total/4 rows each, N_KEYS users."""
    work = tempfile.mkdtemp(prefix="stscale_src_", dir="/tmp")
    src = os.path.join(work, "src")
    stage = os.path.join(work, "stage")
    (
        spark.range(rows_total)
        .select(
            (F.col("id") % N_KEYS).alias("user_id"),
            (F.col("id") * N_FILES / rows_total).cast("int").alias("q"),
            F.col("id").alias("us"),
        )
        .repartition(1)
        .write.partitionBy("q")
        .parquet(stage)
    )
    os.makedirs(src)
    now = time.time()
    for i in range(N_FILES):
        qdir = os.path.join(stage, f"q={i}")
        part = next(p for p in sorted(os.listdir(qdir)) if p.endswith(".parquet"))
        dst = os.path.join(src, f"0{i}.parquet")
        shutil.move(os.path.join(qdir, part), dst)
        os.utime(dst, (now - 100 + 10 * i,) * 2)
    return src


def _run(spark, out_df, name: str) -> tuple[float, dict]:
    ckpt = tempfile.mkdtemp(prefix=f"stscale_{name}_", dir="/tmp")
    start = time.perf_counter()
    with stream_parallelism(spark):
        q = (
            out_df.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    wall = round(time.perf_counter() - start, 3)
    state = {}
    prog = q.lastProgress or {}
    ops = prog.get("stateOperators") or []
    if ops:
        state = {
            "state_rows_total": sum(op.get("numRowsTotal", 0) for op in ops),
            "state_memory_bytes": sum(op.get("memoryUsedBytes", 0) for op in ops),
        }
    return wall, state


def _passthrough_state(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(p) for p in pdfs)
    prev = state.get[0] if state.exists else 0
    state.update((prev + n,))
    yield pd.DataFrame({"user_id": [key[0]], "n": [prev + n]})


def controlled_probe(spark) -> dict:
    # One throwaway replay first: the initial streaming query of the
    # session pays JIT/codegen/state-store-provider init that neither
    # scale should absorb (first probe run showed 1x SLOWER than 10x
    # purely from this).
    warm_src = _stage_source(spark, 400)
    warm = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(warm_src)
    )
    _run(spark, warm.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")), "warm")
    _run(
        spark,
        warm.groupBy("user_id").applyInPandasWithState(
            _passthrough_state,
            outputStructType="user_id long, n long",
            stateStructType="n long",
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        ),
        "warm_py",
    )
    out: dict = {}
    for label, rows in (("1x", 4_000), ("10x", 40_000)):
        src = _stage_source(spark, rows)
        stream = (
            spark.readStream.schema("user_id long, us long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        agg = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        w_jvm, s_jvm = _run(spark, agg, f"jvm_{label}")
        state_py = stream.groupBy("user_id").applyInPandasWithState(
            _passthrough_state,
            outputStructType="user_id long, n long",
            stateStructType="n long",
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        w_py, s_py = _run(spark, state_py, f"py_{label}")
        out[label] = {
            "rows_per_trigger": rows // N_FILES,
            "jvm_keyed_count": {"wall_sec": w_jvm, **s_jvm},
            "py_state_passthrough": {"wall_sec": w_py, **s_py},
        }
    return out


def build_probe_dir(spark) -> str:
    """sf0.1 tables with events replaced by a 10x version (event_id
    remapped by copy index, user cardinality and ts range preserved)."""
    target = "/tmp/sfprobe_stream"
    if os.path.isdir(target):
        shutil.rmtree(target)
    os.makedirs(target)
    for name in os.listdir(SF_DIR):
        if name.endswith(".parquet") and name != "events.parquet":
            s = os.path.join(SF_DIR, name)
            d = os.path.join(target, name)
            (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, d)
    ev = t(spark, SF_DIR, "events")
    big = (
        ev.crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("_c"))))
        .withColumn("event_id", F.col("event_id") * 10 + F.col("_c"))
        .drop("_c")
    )
    # events MUST land as a single FILE named events.parquet: the st
    # sources readStream with pathGlobFilter=events.parquet, which
    # matches file names — a directory of part-*.parquet files would
    # silently stream ZERO rows (caught by this probe's first run:
    # st4 read 0.27 s against "10x" data).
    stage = tempfile.mkdtemp(prefix="stscale_ev_", dir="/tmp")
    big.repartition(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(target, "events.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    return target


def registry_replay(spark, probe_dir: str) -> dict:
    registry.load_all()
    out: dict = {}
    for key in REGISTRY_KEYS:
        fn = registry.QUERIES[key]
        per_key = {}
        for label, d in (("sf0.1", SF_DIR), ("10x", probe_dir)):
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            spark.catalog.clearCache()
            start = time.perf_counter()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            per_key[label] = round(time.perf_counter() - start, 2)
            spark.catalog.clearCache()
        per_key["ratio_10x"] = (
            round(per_key["10x"] / per_key["sf0.1"], 2) if per_key["sf0.1"] else None
        )
        out[key] = per_key
    return out


def main() -> None:
    spark = get_spark("stream_scale_probe")
    controlled = controlled_probe(spark)
    probe_dir = build_probe_dir(spark)
    replay = registry_replay(spark, probe_dir)
    print(
        json.dumps(
            {
                "metric": "stream_scale_probe",
                "n_triggers": N_FILES,
                "n_keys": N_KEYS,
                "controlled": controlled,
                "registry_10x": replay,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
