"""Measure the structured-streaming fixed-cost floor (VERDICT r3 #7).

[archival-probe] — r3 trigger-floor measurement; re-run only if micro-batch trigger overhead changes.

st13/st7/st9 dominate the bench tail (5.8/4.9/3.9 s at sf0.1 in
round 3). The hypothesis to test: those seconds are the MICRO-BATCH
FRAMEWORK FLOOR — per-trigger planning + state-store lifecycle +
(for applyInPandasWithState) Python state-worker spin-up — not plan
waste in our operators. The three queries deliberately run the same
4-file availableNow+maxFilesPerTrigger=1 replay harness (4 triggers:
cross-batch state carry is the thing under test), so the floor is
4x the per-trigger fixed cost.

Two synthetic floors over a 4-file source whose TOTAL payload is 400
rows (data cost ~0):

  floor_stateless — readStream -> groupBy.count -> memory sink.
                    Per-trigger planning + offset-log + sink commit,
                    JVM only.
  floor_state_py  — same source through a passthrough
                    applyInPandasWithState (count per key). Adds the
                    state store + Arrow Python state workers.

Interpretation: a registered streaming query whose wall time is within
~1.5x of floor_state_py (x its batch count / 4) is AT the framework
floor — remaining optimization lives in trigger count or parallelism
(the stream_parallelism knob), not in the operator's plan.

Usage: python tools/stream_floor.py [sf_dir]; prints one JSON line.
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
from voter_file_etl_spark.tables import stream_parallelism  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_FILES = 4


def _stage_source(spark) -> str:
    work = tempfile.mkdtemp(prefix="floor_src_", dir=os.environ.get("TMPDIR", "/tmp"))
    src = os.path.join(work, "src")
    stage = os.path.join(work, "stage")
    (
        spark.range(400)
        .select(
            (F.col("id") % 40).alias("user_id"),
            (F.col("id") % N_FILES).cast("int").alias("q"),
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


def _run_query(spark, out_df_builder, name: str) -> float:
    ckpt = tempfile.mkdtemp(prefix=f"floor_{name}_", dir=os.environ.get("TMPDIR", "/tmp"))
    start = time.perf_counter()
    with stream_parallelism(spark):
        q = (
            out_df_builder.writeStream.outputMode("update")
            .format("memory")
            .queryName(f"floor_{name}")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return round(time.perf_counter() - start, 3)


def _passthrough_state(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(p) for p in pdfs)
    prev = state.get[0] if state.exists else 0
    state.update((prev + n,))
    yield pd.DataFrame({"user_id": [key[0]], "n": [prev + n]})


def main() -> None:
    spark = get_spark("stream_floor")
    src = _stage_source(spark)
    stream = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    stateless = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    t_stateless = _run_query(spark, stateless, "stateless")

    state_py = stream.groupBy("user_id").applyInPandasWithState(
        _passthrough_state,
        outputStructType="user_id long, n long",
        stateStructType="n long",
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    t_state_py = _run_query(spark, state_py, "state_py")

    registry.load_all()
    reg: dict[str, float] = {}
    for key in ("st9_watermark_late_drop", "st7_foreach_batch_upsert", "st13_sessionize_state"):
        fn = registry.QUERIES[key]
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        reg[key] = round(time.perf_counter() - start, 3)

    print(
        json.dumps(
            {
                "metric": "stream_floor",
                "n_triggers": N_FILES,
                "floor_stateless_sec": t_stateless,
                "floor_state_py_sec": t_state_py,
                **{f"{k}_sec": v for k, v in reg.items()},
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
