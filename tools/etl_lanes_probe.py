"""Measured evidence for run_load's cross-state lanes (round 6).

[archival-probe] — r6 load-lane adjudication; re-run only if run_load's lane scheduling changes.

Builds a 12-state load (10x e1's 3-state fixture volume: 600k rows
total, distributed TSV generation, one partitionBy write) and runs
the identical §3.1 pipeline twice — _STATE_LANES=1 (the old
sequential loader) vs 8 — on fresh warehouses. The claim under test:
per-state loads are independent jobs (reference orders files only
WITHIN a state, load.ts:79-113), so lanes turn wall time from
sum(states) toward max(state) + scheduler overlap, while results,
manifest state, and the published warehouse stay identical
(tests/test_etl_pipeline.py pins the equality; this tool records the
wall-time side).

Usage: python tools/etl_lanes_probe.py [n_states] [rows_per_state]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from voter_file_etl_spark.operators import etl
from voter_file_etl_spark.session import get_spark
from voter_file_etl_spark.sources import manifest as mf

N_STATES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROWS_PER_STATE = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000


def build_fixture(spark, base: str) -> list[tuple[str, str, int]]:
    files_dir = os.path.join(base, "files")
    os.makedirs(files_dir)
    k = F.col("id")
    blank = k % 11 == 0
    fx = (
        spark.range(N_STATES * ROWS_PER_STATE)
        .repartition(32)
        .select(
            F.concat(F.lit("N"), F.lpad((k % N_STATES).cast("string"), 2, "0")).alias("_state"),
            F.concat(F.lit("LAL"), k.cast("string")).alias("LALVOTERID"),
            F.concat(F.lit("Name"), (k % 997).cast("string")).alias("Voters_FirstName"),
            F.when(blank, F.lit("")).otherwise(
                F.concat((k % 80).cast("string"), F.lit(".25"))
            ).alias("Residence_Addresses_Latitude"),
            F.when(blank, F.lit("")).otherwise(
                F.concat(((k * 3) % 170).cast("string"), F.lit(".25"))
            ).alias("Residence_Addresses_Longitude"),
            F.concat(
                F.lit("City"), (k % 5).cast("string"),
                F.when(k % 7 == 0, F.lit(" (EST.)")).otherwise(F.lit("")),
            ).alias("Residence_Addresses_City"),
        )
    )
    stage = os.path.join(base, "_stage")
    (
        fx.repartition(N_STATES, "_state")
        .write.partitionBy("_state")
        .option("sep", "\t").option("header", True).option("emptyValue", "")
        .csv(stage)
    )
    recorded = []
    for i in range(N_STATES):
        state = f"N{i:02d}"
        name = f"{i + 1:02d}--{state}--2024-01-01.tab"
        (part,) = glob.glob(os.path.join(stage, f"_state={state}", "part-*.csv"))
        shutil.move(part, os.path.join(files_dir, name))
        recorded.append((name, state, ROWS_PER_STATE + 1))
    return recorded


def main() -> None:
    spark = get_spark("etl_lanes_probe")
    spark.range(1000).count()
    base = tempfile.mkdtemp(prefix="lanes_probe_")
    recorded = build_fixture(spark, base)
    files_dir = os.path.join(base, "files")

    out = {
        "metric": "etl_lanes_probe",
        "n_states": N_STATES,
        "rows_per_state": ROWS_PER_STATE,
    }
    for lanes in (1, 8):
        wh = os.path.join(base, f"wh_{lanes}")
        mfp = os.path.join(base, f"mf_{lanes}")
        mf.record_files(spark, mfp, recorded)
        etl._STATE_LANES = lanes
        t0 = time.perf_counter()
        results = etl.run_load(spark, files_dir, wh, mfp)
        out[f"lanes{lanes}_sec"] = round(time.perf_counter() - t0, 2)
        assert len(results) == N_STATES and all(r.reconciled for r in results)
        out[f"lanes{lanes}_rows"] = etl.read_voters(spark, wh).count()
    assert out["lanes1_rows"] == out["lanes8_rows"]
    out["speedup"] = round(out["lanes1_sec"] / out["lanes8_sec"], 2)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
