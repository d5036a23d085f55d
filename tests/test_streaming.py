"""Streaming parity: the AvailableNow file-stream tumbling-window
aggregate must equal the batch plan over the same events."""

from __future__ import annotations

from voter_file_etl_spark.streaming.windows import run_tumbling_stream, st1_tumbling_window


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    batch = {
        tuple(r)
        for r in st1_tumbling_window(spark, sf_dir).collect()
    }
    streamed = {
        tuple(r)
        for r in run_tumbling_stream(spark, sf_dir, str(tmp_path / "ckpt")).collect()
    }
    assert streamed == batch
    assert len(batch) > 0
