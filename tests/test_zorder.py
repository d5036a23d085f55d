"""Physical data-skipping claim behind l12_zorder_bins.

The registered query models file boundaries with ntile over the z
total order; this test does the REAL layout — repartitionByRange on
the Morton code + sortWithinPartitions — writes parquet, reads each
file's (p, s) min/max from its footer statistics, and asserts a
quarter-by-quarter box query prunes strictly more files than the
same data written in natural (unsorted) order, where every file's
bounding box spans the full key space.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from voter_file_etl_spark.plans.lifecycle import _Z_SPARK
from voter_file_etl_spark.tables import t


def _file_boxes(path: str) -> list[dict]:
    boxes = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        cols = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }
        box = {}
        for name in ("p", "s"):
            lo, hi = None, None
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(cols[name]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[name] = (lo, hi)
        boxes.append(box)
    return boxes


def _scanned(boxes: list[dict]) -> int:
    # box query: p <= 255 AND 512 <= s <= 767
    return sum(
        1
        for b in boxes
        if b["p"][0] <= 255 and b["s"][1] >= 512 and b["s"][0] <= 767
    )


def test_zorder_layout_skips_files(spark, sf_dir, tmp_path):
    d = (
        t(spark, sf_dir, "lineitem")
        .select(
            F.expr("l_partkey % 1024").alias("p"),
            F.expr("l_orderkey % 1024").alias("s"),
        )
        .withColumn("z", F.expr(_Z_SPARK))
    )
    zpath, npath = str(tmp_path / "zorder"), str(tmp_path / "natural")
    (
        d.repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    d.repartition(16).write.mode("overwrite").parquet(npath)

    zboxes, nboxes = _file_boxes(zpath), _file_boxes(npath)
    assert len(zboxes) == 16 and len(nboxes) == 16
    z_scan, n_scan = _scanned(zboxes), _scanned(nboxes)
    # natural order: uniform keys -> every file spans the key space
    assert n_scan == 16
    # z-order: the quarter x quarter box touches a small fraction
    assert z_scan <= 8, f"z-order scanned {z_scan}/16 files"
