"""A/B probe adjudicating the r13 LogTable.merge survivor rewrite
(VERDICT r13 #1: the driver read st10 0.80x after the row_number
window became a max-struct aggregate).

Reproduces the merge's dedup subtree at st10 scale — current ∪ batch
over the events table keyed (user_id, event_type), ordered
(us, event_id, _src) — and times BOTH survivor shapes in the same
session, alternating, min-of-4, noop sink, with result equality
asserted (exceptAll both ways == 0).

Usage: python tools/probes/probe_merge_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from voter_file_etl_spark.session import get_spark
from voter_file_etl_spark.tables import t

SF = os.environ.get("SF", "/root/testdata/sf0.1")
KEY = ["user_id", "event_type"]
ORDER = ["us", "event_id"]

spark = get_spark("merge-ab-probe")
spark.range(1000).count()


def merged():
    """current ∪ batch at st10's per-run volume: the events table as
    'current', its replayed second half as the 'batch' (every batch
    row duplicates a current key — the worst case for the window,
    the best case for the aggregate's map-side partial)."""
    ev = t(spark, SF, "events").select(
        "event_id", F.unix_micros("ts").alias("us"), "user_id",
        "event_type", "value",
    )
    cur = ev.withColumn("_src", F.lit(0))
    batch = ev.filter(F.col("event_id") % 2 == 0).withColumn("_src", F.lit(1))
    return cur.unionByName(batch)


def window_shape():
    m = merged()
    w = W.partitionBy(*KEY).orderBy(
        *[F.desc(c) for c in ORDER], F.desc("_src")
    )
    return (
        m.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "event_type", "us", "event_id", "value")
    )


def aggregate_shape():
    m = merged()
    return (
        m.groupBy(*KEY)
        .agg(F.max(F.struct(*ORDER, "_src", "value")).alias("_w"))
        .select(
            *KEY,
            F.col("_w.us").alias("us"),
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.value").alias("value"),
        )
    )


def run(df) -> float:
    spark.catalog.clearCache()
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


if __name__ == "__main__":
    a = window_shape()
    b = aggregate_shape()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        "survivor shapes disagree"
    )
    # warm both plans once (codegen/JIT), then alternate min-of-4
    run(window_shape()); run(aggregate_shape())
    win, agg = [], []
    for _ in range(4):
        win.append(run(window_shape()))
        agg.append(run(aggregate_shape()))
    print(f"window   trials={[round(x,3) for x in win]} min={min(win):.3f}")
    print(f"aggregate trials={[round(x,3) for x in agg]} min={min(agg):.3f}")
    print(f"speedup (window/aggregate) = {min(win)/min(agg):.2f}x")
