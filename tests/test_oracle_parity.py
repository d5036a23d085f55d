"""Every registered query must match its DuckDB oracle — the same
check the driver runs (CORRECTNESS_r{N}.json), executed at sf0.001
for fast iteration. Run with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to mirror the driver's scale exactly."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare
from voter_file_etl_spark import registry

registry.load_all()


@pytest.mark.parametrize("key", sorted(registry.QUERIES))
def test_oracle_parity(key: str, spark, sf_dir: str) -> None:
    if key not in registry.ORACLE:
        df = registry.QUERIES[key](spark, sf_dir)
        assert df.count() >= 0
        return
    compare(key, spark, sf_dir, registry.QUERIES[key], registry.ORACLE[key])
