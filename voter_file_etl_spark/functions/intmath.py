"""Portable exact integer arithmetic fragments.

Spark's `div` truncates toward zero; DuckDB's `//` floors. The two
agree only when every division operand is nonnegative, so any
cross-engine floor division over possibly-negative numerators must be
spelled with nonnegative operands on both sides. These builders emit
the SAME textual expression for both dialects (the div token is the
only difference), which is what keeps w30's interpolation and x94's
normalization bit-identical across engines — and they are property-
tested against mathematical floor in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(col: Column, digits: int) -> Column:
    """Engine-portable round-half-up-toward-+inf at ``digits`` decimals.

    ``F.round`` is OFF the table for cross-engine emissions: Spark
    rounds doubles HALF_UP on the exact binary value while DuckDB's
    ``round`` is half-even, and the two diverge the moment a tie lands
    on the emitted precision (x34 at sf1.0 — caught only at 50k docs).
    ``floor(x * 10^d + 0.5) / 10^d`` is pure IEEE multiply/add/floor/
    divide, bit-identical in both engines by construction; pair it
    with :func:`half_up_sql` in the oracle.

    Exactness bound: Spark's floor(double) lands in BIGINT (exact to
    2^63) but DuckDB's stays DOUBLE (exact to 2^53), so |x|*10^d must
    stay under 2^53 ≈ 9.0e15. Stats emissions (variance, covariance,
    correlation, percentiles, logs, z-scores, rates) are orders of
    magnitude inside that; UNBOUNDED money sums must instead use the
    a4 exact-integer pipeline (plans/aggregates.py).

    NaN/Inf transparency (ADVICE r9): the bare floor form diverges
    cross-engine on non-finite inputs — Spark's floor(double) returns
    BIGINT, collapsing NaN to 0 and saturating ±Inf to ±(2^63-1),
    while DuckDB's floor stays DOUBLE and propagates them. Both
    builders therefore guard with the SAME dialect-neutral predicate
    (isnan OR |x| = Inf → pass x through untouched), so
    half_up(NaN) = NaN and half_up(±Inf) = ±Inf on BOTH engines.
    NULL flows through the ELSE branch to NULL on both. The repeated
    references to ``col`` inside one projection are collapsed by
    subexpression elimination in both engines (Spark:
    spark.sql.subexpressionElimination.enabled, on by default inside
    whole-stage codegen; DuckDB: expression CSE) — this is NOT the
    cross-projection re-inline hazard the let-binding idiom exists
    for. Cross-engine passthrough is pinned in
    tests/test_properties.py.
    """
    scale = float(10**digits)
    rounded = F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    return F.when(
        F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), col
    ).otherwise(rounded)


def half_up_sql(expr: str, digits: int) -> str:
    """Dialect-neutral twin of :func:`half_up` — same textual IEEE
    expression, valid in BOTH DuckDB (oracles) and Spark SQL
    (selectExpr). The CAST keeps Spark's output DOUBLE: Spark parses
    the ``{scale}.0`` literal as DECIMAL and its floor() returns
    BIGINT, so without it the division would emit DECIMAL strings
    ('0.785714000') that hash-mismatch DuckDB's float64. Carries the
    same NaN/Inf passthrough guard as :func:`half_up` (see its
    docstring); ``isnan`` and ``CAST('Infinity' AS DOUBLE)`` parse
    identically in both dialects."""
    scale = 10**digits
    rounded = f"(CAST(floor(({expr}) * {scale}.0 + 0.5) AS DOUBLE) / {scale}.0)"
    return (
        f"(CASE WHEN isnan(CAST(({expr}) AS DOUBLE)) "
        f"OR abs(CAST(({expr}) AS DOUBLE)) = CAST('Infinity' AS DOUBLE) "
        f"THEN CAST(({expr}) AS DOUBLE) ELSE {rounded} END)"
    )


def floor_div_sql(num: str, den: str, div: str) -> str:
    """floor(num/den) for den > 0, using a truncating-or-flooring
    integer division token ``div`` ('div' for Spark, '//' for DuckDB)
    — correct under either semantics because both branches divide
    nonnegative operands."""
    return (
        f"(case when ({num}) >= 0 then ({num}) {div} ({den}) "
        f"else -(((-({num})) + ({den}) - 1) {div} ({den})) end)"
    )
