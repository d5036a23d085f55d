"""Fast exploded word n-grams (the zip-slice pattern).

Spark evaluates ``explode(transform(sequence(...), i -> ...))`` by
re-running the interpreted higher-order lambda for every OUTPUT row of
the generate — measured 4.9 s vs 0.16 s for an otherwise identical
3-gram explode over the sf0.1 documents table (SCALE.md, round-4 perf
pass). The scale-safe spelling splits the work: the cheap codegen
``arrays_zip(slice(...), ...)`` feeds the explode, and the string
concat happens AFTER the explode as a plain per-row codegen
expression. This module is the one place that pattern lives; every
n-gram/shingle producer in the package routes through it.

Semantics match ``transform(sequence(1, size(arr) - n + 1),
s -> concat_ws(' ', slice(arr, s, n)))`` for all array sizes —
including size < n, where ``greatest(size - n + 1, 0)`` yields empty
slices and the explode emits nothing (DuckDB ``range`` semantics;
Spark's ``sequence(1, 0)`` would run BACKWARD and fabricate garbage
grams, so the guard is load-bearing, not defensive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_rows(
    df: DataFrame,
    id_cols: list[str],
    arr_sql: str,
    n: int,
    alias: str = "g",
) -> DataFrame:
    """One row per word n-gram: ``id_cols + [alias]``.

    ``arr_sql`` is a SQL expression producing the token array (it is
    evaluated ONCE per input row in a projection — higher-order
    functions are fine there, just never as the explode argument).
    """
    m = f"greatest(size(_arr) - {n - 1}, 0)"
    zipped = ", ".join(f"slice(_arr, {i + 1}, {m})" for i in range(n))
    return (
        df.withColumn("_arr", F.expr(arr_sql))
        .select(
            *id_cols,
            F.expr(f"explode(arrays_zip({zipped}))").alias("_z"),
        )
        .select(
            *id_cols,
            F.concat_ws(" ", *[F.col(f"_z.{i}") for i in range(n)]).alias(
                alias
            ),
        )
    )
