"""Executable preconditions for the d2 sf0.5 carve-out (VERDICT r10 ask #4).

SCALE.md's carve-out argument lets the round battery check
d2_fuzzy_dedup at sf0.5 instead of sf1.0 (82 s vs 155 s — the cost is
the ORACLE's deliberate brute-force block quadratic, not the engine).
The argument rests on two properties that were written down but not
pinned; these tests make them executable so a TESTDATA or generator
change can't silently invalidate the carve-out:

1. **Fixed-shape c_name.** sf_generate emits 'Customer#%09d' —
   fixed length, constant 9-char prefix — so the sound lev<=1
   prefilters (length banding, prefix/suffix pigeonhole) prune
   nothing and the oracle's only honest form IS the block quadratic.
   If names ever became variable-shaped, a cheaper sound oracle
   would exist and the carve-out's cost premise (and the pair-volume
   scaling math) would need re-deriving.
2. **No scale-dependent branch.** d2's Spark plan must be identical
   (modulo stats, paths, expression ids) across scale factors — the
   equivalence claim "both engines run the identical algorithm at
   either scale" fails the moment the operator gates on row counts
   the way m14 gates its broadcast.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_LARGE = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMALL), reason=f"testdata dir {SF_SMALL} absent"
)


def test_generated_cname_is_fixed_shape(spark, tmp_path):
    # Run the ACTUAL generator (the carve-out dirs /tmp/sf0.5 and
    # /tmp/sf1.0 are built by sf_generate) at a tiny scale and assert
    # the shape the argument relies on: every c_name matches
    # ^Customer#\d{9}$ (constant 9-char prefix, fixed 18-char length).
    from tools.sf_generate import generate

    out = str(tmp_path / "sfgen")
    generate(spark, out, scale=0.001)
    con = duckdb.connect()
    bad, total = con.execute(
        "SELECT count(*) FILTER (WHERE NOT regexp_full_match("
        "c_name, 'Customer#[0-9]{9}')), count(*) "
        f"FROM '{os.path.join(out, 'customer.parquet')}'"
    ).fetchone()
    assert total > 0
    assert bad == 0, (
        f"{bad}/{total} generated c_name values broke the fixed "
        "'Customer#%09d' shape — the d2 sf0.5 carve-out's cost "
        "premise (no sound prefilter exists) no longer holds; "
        "re-derive the argument in SCALE.md before trusting sf0.5"
    )


def test_driver_testdata_cname_matches_generator_shape():
    # The driver's own parquet must carry the same shape — d2's
    # correctness rows are checked against THIS data.
    con = duckdb.connect()
    for sf_dir in [d for d in (SF_SMALL, SF_LARGE) if os.path.isdir(d)]:
        bad, total = con.execute(
            "SELECT count(*) FILTER (WHERE NOT regexp_full_match("
            "c_name, 'Customer#[0-9]{9}')), count(*) "
            f"FROM '{os.path.join(sf_dir, 'customer.parquet')}'"
        ).fetchone()
        assert total > 0 and bad == 0, (sf_dir, bad, total)


def _normalized_plan(df) -> str:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    plan = re.sub(r"#\d+L?", "#_", plan)          # expression ids
    plan = re.sub(r"file:[^\s,\]]+", "path", plan)  # input locations
    plan = re.sub(r"Statistics\([^)]*\)", "Statistics(_)", plan)
    return plan


def test_d2_plan_has_no_scale_dependent_branch(spark):
    # Identical optimized logical plan at two scale factors (modulo
    # ids/paths/stats) — proves plan CONSTRUCTION never inspects the
    # data's size, which is what "identical algorithm at sf0.5 and
    # sf1.0" requires. (Physical strategy may legitimately differ
    # with stats; the logical program may not.)
    if not os.path.isdir(SF_LARGE):
        pytest.skip(f"{SF_LARGE} absent")
    import sys

    sys.path.insert(0, REPO)
    from voter_file_etl_spark import registry

    registry.load_all()
    q = registry.QUERIES["d2_fuzzy_dedup"]
    small = _normalized_plan(q(spark, SF_SMALL))
    large = _normalized_plan(q(spark, SF_LARGE))
    assert small == large, (
        "d2's optimized plan differs across scale factors — a "
        "scale-dependent branch invalidates the sf0.5 carve-out:\n"
        f"--- {SF_SMALL}\n{small}\n--- {SF_LARGE}\n{large}"
    )
