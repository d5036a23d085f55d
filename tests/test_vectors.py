"""Quantized vector math: exactness and agreement with numpy within
quantization error."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from voter_file_etl_spark.functions import vectors as V


def test_quantized_cosine_close_to_float(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(size=64).astype(np.float32)
    b = (a + rng.normal(scale=0.1, size=64).astype(np.float32)).astype(np.float32)
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "va array<float>, vb array<float>"
    )
    q = df.select(
        V.quantize("va").alias("qa"), V.quantize("vb").alias("qb")
    ).select(
        V.cosine(V.dot("qa", "qb"), V.sq_norm("qa"), V.sq_norm("qb")).alias("cos")
    )
    got = q.collect()[0]["cos"]
    want = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert math.isclose(got, want, abs_tol=1e-4)


def test_self_cosine_is_one(spark):
    v = [0.25, -0.5, 1.0, 0.125] * 16
    df = spark.createDataFrame([(v,)], "va array<float>")
    got = (
        df.select(V.quantize("va").alias("qa"))
        .select(V.cosine(V.dot("qa", "qa"), V.sq_norm("qa"), V.sq_norm("qa")).alias("c"))
        .collect()[0]["c"]
    )
    # cos(v, v) = n / (sqrt(n) * sqrt(n)) — exact up to one ulp of the
    # final double ops (identical ulp on every engine, so still
    # hash-stable cross-engine).
    assert math.isclose(got, 1.0, rel_tol=1e-12)
