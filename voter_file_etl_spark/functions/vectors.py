"""Vector math as Column expressions (no UDFs in the hot path).

Determinism-by-design: embeddings are quantized to integers
(floor(x * 1e6)) before any reduction, so dot products and norms are
*exact integer sums* — order-independent across shuffles and
bit-identical between Spark and the DuckDB oracle. The final cosine
is exact-int / (sqrt * sqrt), all IEEE-deterministic ops.

The quantized cosine differs from float cosine by < 1e-5 for unit-
scale embeddings — irrelevant for dedup/ANN ranking, and it buys
reproducibility that float reductions cannot give on a cluster.

At 100 TB these expressions run inside whole-stage codegen; for very
wide vectors a pandas_udf over Arrow batches is the fallback (see
operators/multimodal.py for the Arrow-batched pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000.0


def quantize(emb: str | Column) -> Column:
    """array<float> -> array<bigint>, exact and engine-portable."""
    name = emb if isinstance(emb, str) else None
    expr = name or "emb"
    return F.expr(
        f"transform({expr}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    )


def quantize_sql_duckdb(emb_expr: str) -> str:
    return (
        f"list_transform(CAST({emb_expr} AS DOUBLE[]), "
        f"x -> CAST(floor(x * {QUANT}) AS BIGINT))"
    )


def sq_norm(qv: str) -> Column:
    """Exact integer squared norm of a quantized vector column."""
    return F.expr(f"aggregate({qv}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")


def sq_norm_sql_duckdb(qv: str) -> str:
    return f"CAST(list_sum(list_transform({qv}, x -> x * x)) AS BIGINT)"


def dot(qa: str, qb: str) -> Column:
    """Exact integer dot product of two quantized vector columns."""
    return F.expr(
        f"aggregate(zip_with({qa}, {qb}, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def dot_arrow(qa: str | Column, qb: str | Column) -> Column:
    """Exact integer dot product via an Arrow-vectorized pandas UDF.

    Same result as dot() — integer sums are order-independent — but
    the reduction runs as one numpy matmul per Arrow batch instead of
    an interpreted per-element lambda chain. Spark's higher-order
    functions (zip_with/aggregate) sit outside whole-stage codegen,
    so on pair-heavy plans (candidate verification after a blocking
    join) the Arrow path is ~10x faster; int64 overflow is impossible
    for quantized unit-scale vectors (64 * (1e6)^2 ~ 6e13 << 2^63).
    """
    @F.pandas_udf("long")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        av = np.stack(a.to_numpy()).astype("int64", copy=False)
        bv = np.stack(b.to_numpy()).astype("int64", copy=False)
        return pd.Series((av * bv).sum(axis=1))

    return _dot(F.col(qa) if isinstance(qa, str) else qa,
                F.col(qb) if isinstance(qb, str) else qb)


def dot_sql_duckdb(qa: str, qb: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, len({qa}) + 1), "
        f"i -> {qa}[i] * {qb}[i])) AS BIGINT)"
    )


# --- wide (int128-class) variants, r8 ---------------------------------
# The bigint folds above overflow exactly when a SUM of quantized
# vectors enters the expression: centroid-sum components reach
# n * 1e6, so |sv|^2 ~ dim * n^2 * 1e12 leaves int64 at n ~ 2000
# (x55 at sf1.0, caught by the replay — the fold overflowed DURING
# aggregation, before any output cast could help). These fold in
# DECIMAL(38,0) on Spark / HUGEINT in DuckDB: exact, identical, and
# each per-element product still fits its own width by construction.


def sq_norm_wide(qv: str) -> Column:
    return F.expr(
        f"aggregate({qv}, CAST(0 AS DECIMAL(38,0)), "
        "(acc, x) -> acc + CAST(x AS DECIMAL(19,0)) * x)"
    )


def sq_norm_sql_duckdb_wide(qv: str) -> str:
    return f"list_sum(list_transform({qv}, x -> CAST(x AS HUGEINT) * x))"


def dot_wide(qa: str, qb: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({qa}, {qb}, (x, y) -> CAST(x AS DECIMAL(19,0)) * y), "
        "CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x)"
    )


def dot_sql_duckdb_wide(qa: str, qb: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({qa}) + 1), "
        f"i -> CAST({qa}[i] AS HUGEINT) * {qb}[i]))"
    )


def cosine(dot_col: Column, na: Column, nb: Column) -> Column:
    """dot / (|a| * |b|) from exact integer parts — deterministic."""
    return dot_col.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def cosine_sql(dot_e: str, na: str, nb: str) -> str:
    return (
        f"CAST({dot_e} AS DOUBLE) / "
        f"(sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
    )
