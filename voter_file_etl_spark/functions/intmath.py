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


def floor_div_sql(num: str, den: str, div: str) -> str:
    """floor(num/den) for den > 0, using a truncating-or-flooring
    integer division token ``div`` ('div' for Spark, '//' for DuckDB)
    — correct under either semantics because both branches divide
    nonnegative operands."""
    return (
        f"(case when ({num}) >= 0 then ({num}) {div} ({den}) "
        f"else -(((-({num})) + ({den}) - 1) {div} ({den})) end)"
    )
