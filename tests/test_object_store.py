"""Object-store source shim (sources/object_store.py): listObjectsV2
cap + LastModified-DESC + prefix semantics from load-s3.ts:76-104 and
the [start_file, end_file] walk from load-s3.ts:106-135, exercised
over file:// so the same Hadoop-FS code path serves s3a:// unchanged."""

from __future__ import annotations

import os

import pytest

from voter_file_etl_spark.sources.object_store import (
    list_objects,
    load_ordered,
    newest_matching,
)

HEADER = "LALVOTERID\tVoters_FirstName\tVoters_LastName\n"


def _write(base, name, mtime, rows=2):
    p = os.path.join(base, name)
    with open(p, "w") as f:
        f.write(HEADER)
        for i in range(rows):
            f.write(f"LAL{name[:2]}{i}\tF{i}\tL{i}\n")
    os.utime(p, (mtime, mtime))


@pytest.fixture(scope="module")
def bucket(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucket"))
    # Keys chosen so lexicographic order != recency order.
    _write(base, "01--AK--2024-01-01.tab", mtime=3_000)
    _write(base, "02--AL--2024-03-01.tab", mtime=9_000)  # newest
    _write(base, "03--AZ--2024-02-01.tab", mtime=6_000)
    _write(base, "zz-other.txt", mtime=9_999)  # prefix-filtered out
    return base


def test_listing_is_lexicographic_and_capped(spark, bucket):
    keys = [o.key for o in list_objects(spark, f"file://{bucket}")]
    assert keys == sorted(keys)
    assert len(keys) == 4
    capped = [o.key for o in list_objects(spark, f"file://{bucket}", max_keys=2)]
    # Cap applies to the lexicographic listing (listObjectsV2), so the
    # newest-but-late key never enters the window.
    assert capped == keys[:2]


def test_newest_matching_orders_by_mtime_desc(spark, bucket):
    keys = newest_matching(spark, f"file://{bucket}", prefix="0")
    assert keys == [
        "02--AL--2024-03-01.tab",
        "03--AZ--2024-02-01.tab",
        "01--AK--2024-01-01.tab",
    ]
    # Reference quirk preserved: max_keys caps BEFORE the prefix
    # filter, so a small cap can drop matching files entirely.
    assert newest_matching(spark, f"file://{bucket}", prefix="03", max_keys=2) == []


def test_load_ordered_window_and_state(spark, bucket):
    df = load_ordered(spark, f"file://{bucket}", prefix="0", start_file=0, end_file=1)
    got = df.select("state").distinct().collect()
    assert {r["state"] for r in got} == {"AL", "AZ"}  # newest two only
    assert df.count() == 4  # 2 rows per file
    # Full window picks up the oldest file as well.
    all_states = {
        r["state"]
        for r in load_ordered(spark, f"file://{bucket}", prefix="0")
        .select("state")
        .distinct()
        .collect()
    }
    assert all_states == {"AK", "AL", "AZ"}
