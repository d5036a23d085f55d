"""Skew-bounded near-dup pair search (similarity.bounded_block_pairs):
a deliberately skewed block must (a) never put more than 2*cap rows in
one pandas group and (b) return exactly the same pairs as the naive
all-pairs computation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from voter_file_etl_spark.operators.similarity import bounded_block_pairs

CAP = 40
N_SKEW = 300  # one label holding 300 rows -> 8 sub-blocks at cap 40
DIM = 16


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(42)
    base = rng.integers(-50, 50, size=(12, DIM))
    rows = []
    for i in range(N_SKEW):
        # clusters of near-identical vectors so real pairs exist
        v = base[i % 12] + rng.integers(-1, 2, size=DIM)
        rows.append((i, "big", [int(x) for x in v]))
    for i in range(20):
        v = base[i % 3] + rng.integers(-1, 2, size=DIM)
        rows.append((1000 + i, "small", [int(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, label string, qv array<long>")
    return df.withColumn(
        "nq",
        F.expr(
            "aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        ),
    ).cache()


def _expected_pairs(rows, threshold):
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    out = set()
    for rs in by_label.values():
        rs = sorted(rs, key=lambda r: r["vec_id"])
        A = np.array([r["qv"] for r in rs], dtype="int64")
        n = np.sqrt(np.array([r["nq"] for r in rs], dtype="float64"))
        cos = (A @ A.T).astype("float64") / np.outer(n, n)
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                if cos[i, j] >= threshold:
                    out.add((rs[i]["vec_id"], rs[j]["vec_id"]))
    return out


def test_results_identical_to_naive_all_pairs(skewed):
    got = {
        (r["id1"], r["id2"])
        for r in bounded_block_pairs(skewed, threshold=0.98, cap=CAP).collect()
    }
    want = _expected_pairs(skewed.collect(), 0.98)
    assert got == want
    assert len(want) > 50  # the fixture really exercises the path


def test_no_group_exceeds_cap(skewed):
    """Reconstruct the (label, si, sj) group sizes the pandas stage
    sees and assert the hard bound; also assert the skewed label was
    actually split (the test would be vacuous otherwise)."""
    counts = skewed.groupBy("label").agg(F.count(F.lit(1)).alias("_bn"))
    sized = skewed.join(
        F.broadcast(
            counts.select(
                "label",
                F.ceil(F.col("_bn") * 2 / F.lit(CAP)).cast("int").alias("_nsub"),
            )
        ),
        "label",
    )
    keyed = (
        sized.withColumn(
            "_sub", F.pmod(F.xxhash64("vec_id"), F.col("_nsub")).cast("int")
        )
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)))
        .select(
            "label",
            F.least("_sub", "_k").alias("_si"),
            F.greatest("_sub", "_k").alias("_sj"),
        )
    )
    sizes = keyed.groupBy("label", "_si", "_sj").count().collect()
    assert max(r["count"] for r in sizes) <= 2 * CAP
    n_groups_big = sum(1 for r in sizes if r["label"] == "big")
    assert n_groups_big > 1  # skewed label split into multiple bounded tasks
