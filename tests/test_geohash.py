"""Geohash closed-form encoding vs a pure-Python reference
implementation (the standard interval-halving algorithm), plus the
reference's NULL/text-typing quirks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.geohash import geohash_col, geohash_text_col


def ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook geohash (interval halving) — independent of the
    engine's bit-interleave closed form."""
    base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for k in range(precision):
        idx = 0
        for m in range(5):
            idx = (idx << 1) | bits[5 * k + m]
        out.append(base32[idx])
    return "".join(out)


CASES = [
    (42.605, -5.603),       # canonical 'ezs42...' vector
    (40.1, -88.2),
    (0.0, 0.0),
    (-33.8688, 151.2093),   # Sydney
    (89.9999, 179.9999),    # upper-corner clamp
    (-89.9999, -179.9999),
]


@pytest.mark.parametrize("precision", [4, 8])
def test_geohash_matches_reference(spark, precision):
    df = spark.createDataFrame(CASES, "lat double, lon double")
    got = [
        r["gh"]
        for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), precision).alias("gh")
        ).collect()
    ]
    want = [ref_geohash(lat, lon, precision) for lat, lon in CASES]
    assert got == want


def test_geohash_known_vector(spark):
    df = spark.createDataFrame([(42.605, -5.603)], "lat double, lon double")
    gh = df.select(geohash_col(F.col("lat"), F.col("lon"), 5).alias("gh")).collect()[0][0]
    assert gh == "ezs42"


def test_geohash_text_nulls_and_malformed(spark):
    df = spark.createDataFrame(
        [("40.1", "-88.2"), (None, "-88.2"), ("", "1.0"), ("abc", "2.0")],
        "lat string, lon string",
    )
    got = [
        r["gh"]
        for r in df.select(
            geohash_text_col(F.col("lat"), F.col("lon")).alias("gh")
        ).collect()
    ]
    assert got[0] == ref_geohash(40.1, -88.2, 8)
    assert got[1] is None and got[2] is None and got[3] is None
