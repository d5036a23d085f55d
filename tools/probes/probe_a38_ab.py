"""A/B probe adjudicating the r13 a38 single-pass rewrite (VERDICT
r13 #1: the driver's r13 refresh read a38 ~0.30x; the r14 in-suite
bench reads it 0.298 s vs r12's 0.346 s — this probe settles shape
vs environment with both shapes in one session, alternating,
min-of-4, equality asserted).

old (r12): three per-lag aggregates unioned — the daily rollup + lag
window subtree executes three times.
new (r13): ONE aggregate computes all 12 sufficient statistics, then
stack() unpivots.

Usage: python tools/probes/probe_a38_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark
from voter_file_etl_spark.tables import t

SF = os.environ.get("SF", "/root/testdata/sf0.1")

registry.load_all()
spark = get_spark("a38-ab-probe")
spark.range(1000).count()


def lagged():
    daily = (
        t(spark, SF, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice + 0.5d) as bigint))"
                " div count(*) as bigint)"
            ).alias("mean_usd")
        )
    )
    w = W.orderBy("day")
    return daily.select(
        F.col("mean_usd").alias("x"),
        F.lag("mean_usd", 1).over(w).alias("x1"),
        F.lag("mean_usd", 2).over(w).alias("x2"),
        F.lag("mean_usd", 3).over(w).alias("x3"),
    )


def old_shape():
    lg = lagged()

    def one(k: int):
        xk = F.col(f"x{k}")
        return lg.agg(
            F.lit(k).cast("int").alias("k"),
            F.count(xk).alias("n"),
            F.sum(F.col("x") * xk).alias("sxy"),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).alias("sx"),
            F.sum(xk).alias("sy"),
        )

    u = one(1).unionByName(one(2)).unionByName(one(3))
    return u.select(
        "k",
        F.col("n").cast("long").alias("n_pairs"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("cov_num"),
    )


def new_shape():
    return registry.QUERIES["a38_lag_autocovariance"](spark, SF)


def run(df) -> float:
    spark.catalog.clearCache()
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


if __name__ == "__main__":
    a, b = old_shape(), new_shape()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    run(old_shape()); run(new_shape())  # codegen warm-up
    old, new = [], []
    for _ in range(4):
        old.append(run(old_shape()))
        new.append(run(new_shape()))
    print(f"old trials={[round(x,3) for x in old]} min={min(old):.3f}")
    print(f"new trials={[round(x,3) for x in new]} min={min(new):.3f}")
    print(f"speedup (old/new) = {min(old)/min(new):.2f}x")
