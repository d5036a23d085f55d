"""Geohash encoding as a closed-form Column expression (no UDF).

The reference computes Residence_Addresses_GeoHash with the ngeohash
JS library at load time (/root/reference/load-s3.ts:186-193,
precision 8). A Python UDF here would put a per-row Python round-trip
in the hot path of a 100 TB load, so instead we use the closed form:

  a geohash is the base-32 rendering of the bit-interleave of
  floor((lon+180)/360 * 2^n) and floor((lat+90)/180 * 2^m)

where n/m are the per-axis bit counts (for precision 8: 20+20 bits).
That is pure integer/double arithmetic — Spark keeps it inside
whole-stage codegen, and the identical formula is emitted as DuckDB
SQL for the oracle, so both engines agree bit-for-bit.

Mechanical sanity: validated against the published geohash test
vectors (e.g. (42.605, -5.603) -> 'ezs42...') in tests/test_geohash.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _axis_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits): lon takes the even interleave positions."""
    total = 5 * precision
    return (total + 1) // 2, total // 2


def _scaled_sql(expr: str, lo: float, span: float, bits: int) -> str:
    """Integer-scale an axis value into [0, 2^bits)."""
    top = (1 << bits) - 1
    return (
        f"least(greatest(CAST(floor((({expr}) - ({lo})) / {span} "
        f"* {float(1 << bits)}) AS BIGINT), 0), {top})"
    )


def _bit_sql(src: str, shift: int, dialect: str) -> str:
    if dialect == "spark":
        return f"(shiftright({src}, {shift}) & 1)"
    return f"(({src} >> {shift}) & 1)"


def geohash_sql(lat_expr: str, lon_expr: str, precision: int, dialect: str) -> str:
    """Emit a geohash expression string for ``dialect`` in {spark, duckdb}.

    The generated text is large but machine-built; both dialects share
    the identical arithmetic so results match exactly.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    lon_bits, lat_bits = _axis_bits(precision)
    lon_s = _scaled_sql(lon_expr, -180.0, 360.0, lon_bits)
    lat_s = _scaled_sql(lat_expr, -90.0, 180.0, lat_bits)
    chars: list[str] = []
    for k in range(precision):
        terms: list[str] = []
        for m in range(5):
            i = 5 * k + m  # global interleave position, MSB first
            if i % 2 == 0:
                src, nbits = lon_s, lon_bits
            else:
                src, nbits = lat_s, lat_bits
            j = i // 2  # per-axis bit index, MSB first
            shift = (nbits - 1) - j
            weight = 1 << (4 - m)
            terms.append(f"{weight} * {_bit_sql(src, shift, dialect)}")
        idx = " + ".join(terms)
        chars.append(f"substr('{BASE32}', CAST(({idx}) AS INTEGER) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def geohash_col(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Geohash as a native Column expression (whole-stage codegen'd).

    NULL lat or lon yields NULL, matching the reference's guard
    (load-s3.ts:186-193 only computes when both are present).
    """
    lon_bits, lat_bits = _axis_bits(precision)

    def scaled(v: Column, lo: float, span: float, bits: int) -> Column:
        raw = F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(float(1 << bits)))
        return F.least(
            F.greatest(raw.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1)
        )

    lon_s = scaled(lon, -180.0, 360.0, lon_bits)
    lat_s = scaled(lat, -90.0, 180.0, lat_bits)
    alphabet = F.array(*[F.lit(c) for c in BASE32])

    chars: list[Column] = []
    for k in range(precision):
        idx: Column | None = None
        for m in range(5):
            i = 5 * k + m
            if i % 2 == 0:
                src, nbits = lon_s, lon_bits
            else:
                src, nbits = lat_s, lat_bits
            shift = (nbits - 1) - (i // 2)
            bit = F.shiftright(src, shift).bitwiseAND(F.lit(1))
            term = bit * F.lit(1 << (4 - m))
            idx = term if idx is None else idx + term
        chars.append(F.element_at(alphabet, idx.cast("int") + F.lit(1)))
    # greatest()/least() skip NULL operands in both Spark and DuckDB,
    # which would silently turn a missing coordinate into geohash
    # "00000000" — guard explicitly (load-s3.ts:186-193 only encodes
    # when both lat and lon are present).
    return F.when(lat.isNull() | lon.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(*chars)
    )


def geohash_text_col(lat_text: Column, lon_text: Column, precision: int = 8) -> Column:
    """Reference-faithful variant: lat/long arrive as TEXT columns
    (prisma/Voter.prisma:33-34) and are cast before encoding; any
    non-numeric or empty text yields NULL (try_cast — Spark 4 ANSI
    mode would otherwise throw on malformed text)."""
    return geohash_col(
        lat_text.try_cast("double"), lon_text.try_cast("double"), precision
    )
