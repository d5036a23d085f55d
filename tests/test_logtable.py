"""Log-structured table format (sources/logtable.py) invariants.

The scale claim under l7/l8: a MERGE touches only the key-hash
buckets present in the batch — untouched data files are not opened or
rewritten (byte-identical across commits), the commit is atomic and
optimistic (os.link loses cleanly to a concurrent writer), and time
travel replays the log exactly.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from voter_file_etl_spark.sources.logtable import CommitConflict, LogTable


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seq bigint, payload string"
    )


def _table(spark, tmp_path):
    return LogTable(
        spark,
        str(tmp_path / "table"),
        key_cols=["k"],
        order_cols=["seq"],
        n_buckets=8,
    )


def _file_hashes(table: LogTable) -> dict[str, str]:
    out = {}
    for f in table.active_files():
        with open(os.path.join(table.root, f["path"]), "rb") as fh:
            out[f["path"]] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(64)]), work)
    before = _file_hashes(table)

    # Batch of ONE key -> exactly one bucket touched.
    v = table.merge(_mk(spark, [(7, 2, "v2-7")]), work)
    entry = table.history()[v]
    touched = {a["bucket"] for a in entry["adds"]}
    assert len(touched) == 1

    after = _file_hashes(table)
    untouched_before = {p: h for p, h in before.items() if p in after}
    # Every surviving pre-merge file is byte-identical...
    assert all(after[p] == h for p, h in untouched_before.items())
    # ...and only the one touched bucket's files were replaced.
    replaced = set(before) - set(after)
    assert replaced == set(entry["removes"])
    assert all(f"-b{list(touched)[0]:05d}-" in p for p in replaced)

    # Semantics: key 7 updated, all others unchanged.
    rows = {r["k"]: r["payload"] for r in table.snapshot().collect()}
    assert rows[7] == "v2-7" and rows[3] == "v1-3" and len(rows) == 64


def test_last_writer_wins_total_order(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(1, 5, "late"), (1, 2, "early")]), work)
    table.merge(_mk(spark, [(1, 3, "middle")]), work)  # older than seq=5
    rows = table.snapshot().collect()
    assert len(rows) == 1 and rows[0]["payload"] == "late"


def test_commit_is_atomic_and_optimistic(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(1, 1, "a")]), work)
    # A concurrent writer already published version 1: the link(2)
    # publish must fail (not silently clobber)...
    with open(table._entry_path(1), "w") as f:
        f.write('{"version": 1, "adds": [], "removes": []}')
    with pytest.raises(CommitConflict):
        table._commit(1, [], [])
    # ...and a fresh merge re-reads the log, REBASES past the foreign
    # commit, and lands as version 2.
    assert table.merge(_mk(spark, [(2, 1, "b")]), work) == 2
    assert table.snapshot().count() == 2


def test_time_travel_replays_log(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, "v1") for k in range(10)]), work)
    table.merge(_mk(spark, [(k, 2, "v2") for k in range(5)]), work)
    table.merge(_mk(spark, [(99, 1, "new")]), work)

    v0 = {r["k"]: r["payload"] for r in table.snapshot(0).collect()}
    assert v0 == {k: "v1" for k in range(10)}
    v1 = {r["k"]: r["payload"] for r in table.snapshot(1).collect()}
    assert v1 == {k: ("v2" if k < 5 else "v1") for k in range(10)}
    v2 = table.snapshot(2)
    assert v2.count() == 11 and v2.filter("k = 99").count() == 1


def test_vacuum_keeps_only_live_files(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, "v1") for k in range(16)]), work)
    table.merge(_mk(spark, [(k, 2, "v2") for k in range(16)]), work)
    removed = table.vacuum()
    assert removed  # superseded v0 files were reclaimed
    live = {f["path"] for f in table.active_files()}
    on_disk = {
        os.path.join("data", n)
        for n in os.listdir(os.path.join(table.root, "data"))
    }
    assert on_disk == live
    assert table.snapshot().count() == 16  # head still fully readable


def test_delete_is_physical_erasure(spark, tmp_path):
    import glob

    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(64)]), work)
    before = _file_hashes(table)

    doomed = spark.createDataFrame([(7,), (13,)], "k bigint")
    v = table.delete(doomed, work)
    entry = table.history()[v]
    touched = {a["bucket"] for a in entry["adds"]}
    # Only the buckets containing the subjects were rewritten...
    after = _file_hashes(table)
    survivors = {p: h for p, h in before.items() if p in after}
    assert all(after[p] == h for p, h in survivors.items())
    assert set(before) - set(after) == set(entry["removes"])
    # ...the snapshot no longer has the keys...
    assert table.snapshot().filter("k IN (7, 13)").count() == 0
    assert table.snapshot().count() == 62
    # ...time travel still shows them until vacuum...
    assert table.snapshot(v - 1).filter("k IN (7, 13)").count() == 2
    table.vacuum()
    # ...and after vacuum NO file on disk contains them (GDPR).
    files = glob.glob(str(tmp_path / "table" / "data" / "*.parquet"))
    assert files
    raw = spark.read.parquet(*files)
    assert raw.filter("k IN (7, 13)").count() == 0
    assert raw.count() == 62
    assert touched  # delete actually touched something


def test_change_feed_classifies_ops(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(1, 1, "a"), (2, 1, "b")]), work)
    table.merge(_mk(spark, [(2, 5, "b2"), (3, 1, "c")]), work)
    table.delete(_mk(spark, [(1, 0, "")]).select("k"), work)

    v0 = {(r["k"], r["op"]) for r in table.changes(0).collect()}
    assert v0 == {(1, "insert"), (2, "insert")}

    v1 = {r["k"]: r for r in table.changes(1).collect()}
    assert v1[3]["op"] == "insert" and v1[3]["old_seq"] is None
    assert v1[2]["op"] == "update"
    assert (v1[2]["old_seq"], v1[2]["new_seq"]) == (1, 5)
    # k=1 did not change at v1: even if its bucket was rewritten it
    # must be filtered out of the feed, not reported as an update.
    assert 1 not in v1

    v2 = {r["k"]: r for r in table.changes(2).collect()}
    assert v2[1]["op"] == "delete" and v2[1]["new_seq"] is None
    # replaying ops over the feed reconstructs the live key set
    live = set()
    for v in range(table.latest_version() + 1):
        for r in table.changes(v).collect():
            live.discard(r["k"])
            if r["op"] != "delete":
                live.add(r["k"])
    assert live == {r["k"] for r in table.snapshot().collect()}


def test_logtable_cache_pristine_after_mutators(spark, sf_dir):
    # l9/l15 mutate a COPY of the session-cached pristine build; the
    # shared build must stay intact so read-only queries (l7/l8/l11/
    # l13) keep their results whatever order the driver runs keys in.
    from voter_file_etl_spark import registry

    registry.load_all()
    before = {
        tuple(r)
        for r in registry.QUERIES["l7_txn_log_merge"](spark, sf_dir).collect()
    }
    registry.QUERIES["l9_gdpr_delete"](spark, sf_dir).collect()  # mutator
    registry.QUERIES["l15_vacuum"](spark, sf_dir).collect()  # mutator
    after = {
        tuple(r)
        for r in registry.QUERIES["l7_txn_log_merge"](spark, sf_dir).collect()
    }
    assert after == before and len(before) > 0


def test_stream_parallelism_restores_on_error(spark):
    from voter_file_etl_spark.tables import stream_parallelism

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with stream_parallelism(spark, 3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_dv_delete_rewrites_nothing(spark, tmp_path):
    # Merge-on-read: after delete_with_vectors every data file must be
    # byte-identical; only a sidecar and a log entry may appear.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(64)]), work)
    before = _file_hashes(table)

    table.delete_with_vectors(_mk(spark, [(k, 0, "x") for k in range(0, 64, 4)]), work)
    assert _file_hashes(table) == before, "DV delete rewrote a data file"
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == {k for k in range(64) if k % 4 != 0}


def test_dv_supersede_is_cumulative(spark, tmp_path):
    # A second DV commit folds the first: exactly one active sidecar,
    # masking the union of both delete sets.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(32)]), work)
    table.delete_with_vectors(_mk(spark, [(1, 0, "x"), (2, 0, "x")]), work)
    first_dv = table.active_dv()
    table.delete_with_vectors(_mk(spark, [(3, 0, "x")]), work)
    second_dv = table.active_dv()
    assert first_dv != second_dv
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == set(range(32)) - {1, 2, 3}


def test_dv_time_travel_reads_unmasked_prefix(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    v0 = table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(16)]), work)
    table.delete_with_vectors(_mk(spark, [(5, 0, "x")]), work)
    assert {r["k"] for r in table.snapshot(v0).collect()} == set(range(16))
    assert 5 not in {r["k"] for r in table.snapshot().collect()}


def test_vacuum_keeps_active_dv(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(16)]), work)
    table.delete_with_vectors(_mk(spark, [(5, 0, "x")]), work)
    table.delete_with_vectors(_mk(spark, [(6, 0, "x")]), work)
    removed = table.vacuum()
    # the superseded first sidecar is dead; the active one survives
    assert any("dv-v" in p for p in removed)
    assert os.path.exists(os.path.join(table.root, table.active_dv()))
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == set(range(16)) - {5, 6}


def test_purge_applies_and_retires_dv(spark, tmp_path):
    # REORG-style purge: masked rows physically leave the files, the
    # sidecar retires ("dv": null commit), unmasked files stay
    # byte-identical, and reads return to the mask-free path.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(64)]), work)
    table.delete_with_vectors(_mk(spark, [(4, 0, "x"), (5, 0, "x")]), work)
    masked_files = {
        r["_file"]
        for r in spark.read.parquet(
            os.path.join(table.root, table.active_dv())
        ).select("_file").distinct().collect()
    }
    before = _file_hashes(table)
    table.purge_deletes(work)
    assert table.active_dv() is None
    after = _file_hashes(table)
    for path, h in before.items():
        if os.path.basename(path) not in masked_files and path in after:
            assert after[path] == h, f"unmasked file {path} was rewritten"
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == set(range(64)) - {4, 5}
    # a second DV delete starts a fresh mask on the purged table
    table.delete_with_vectors(_mk(spark, [(6, 0, "x")]), work)
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == set(range(64)) - {4, 5, 6}


def test_restore_rolls_back_without_rewrite(spark, tmp_path):
    # RESTORE: the head becomes version k's file set via one log
    # entry — no data file is written, moved, or rewritten; history
    # stays append-only; a DV in force at k is restored with it.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    v0 = table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(16)]), work)
    table.delete_with_vectors(_mk(spark, [(3, 0, "x")]), work)
    v2 = table.merge(_mk(spark, [(k, 2, f"v2-{k}") for k in range(4)]), work)
    data_before = _file_hashes(table)
    table.restore(v0)
    assert {r["k"]: r["payload"] for r in table.snapshot().collect()} == {
        k: f"v1-{k}" for k in range(16)
    }
    assert table.active_dv() is None  # v0 predates the DV
    # restore to the DV-masked middle state
    table.restore(v2 - 1)
    rows = {r["k"] for r in table.snapshot().collect()}
    assert rows == set(range(16)) - {3}
    # no data file was touched by either restore
    for path, h in data_before.items():
        full = os.path.join(table.root, path)
        if os.path.exists(full):
            with open(full, "rb") as fh:
                assert hashlib.md5(fh.read()).hexdigest() == h


def test_shallow_clone_is_zero_copy_and_independent(spark, tmp_path):
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(32)]), work)
    src_before = _file_hashes(table)

    clone = table.clone_to(str(tmp_path / "clone"))
    # zero-copy: every clone data file shares its inode with the source
    for f in clone.active_files():
        st = os.stat(os.path.join(clone.root, f["path"]))
        assert st.st_nlink >= 2, f["path"]
    assert {tuple(r) for r in clone.snapshot().collect()} == {
        tuple(r) for r in table.snapshot().collect()
    }
    # divergent write in the clone leaves the source untouched
    clone.delete(_mk(spark, [(k, 0, "x") for k in range(0, 32, 2)]),
                 str(tmp_path / "cwork"))
    assert _file_hashes(table) == src_before
    assert {r["k"] for r in table.snapshot().collect()} == set(range(32))
    assert {r["k"] for r in clone.snapshot().collect()} == set(range(1, 32, 2))


def test_losing_writer_cannot_clobber_committed_data(spark, tmp_path):
    # Two writers race for the same version: the loser stages and
    # MOVES its data files into the table root before its commit
    # fails. Without writer-unique file names those moves overwrite
    # the winner's already-committed files (same (version, bucket, i)
    # triple) — silent corruption the link(2) race never sees. The
    # loser must (1) raise CommitConflict, (2) leave the winner's
    # files byte-identical, (3) clean up its own orphans, and (4)
    # succeed on retry with the sequential-merge result.
    import unittest.mock as mock

    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, "base") for k in range(32)]), work)
    base_version = table.latest_version()

    # Writer A wins the next version.
    table.merge(_mk(spark, [(k, 2, "A") for k in range(0, 32, 2)]), work)
    winner_hashes = _file_hashes(table)

    # Writer B raced A: it read the log BEFORE A committed, so its
    # merge targets the same version A just took.
    with mock.patch.object(
        LogTable, "latest_version", return_value=base_version
    ):
        with pytest.raises(CommitConflict):
            table.merge(_mk(spark, [(k, 3, "B") for k in range(1, 32, 2)]), work)

    # Winner's committed bytes are untouched, and the loser left no
    # orphans: every file on disk is referenced by SOME log version
    # (dead-but-historical files legitimately remain for time travel).
    assert _file_hashes(table) == winner_hashes
    data_dir = os.path.join(table.root, "data")
    referenced = {
        os.path.basename(a["path"])
        for e in table.history()
        for a in e["adds"]
    }
    assert set(os.listdir(data_dir)) == referenced

    # Loser retries on the fresh base and lands cleanly.
    table.merge(_mk(spark, [(k, 3, "B") for k in range(1, 32, 2)]), work)
    rows = {
        r["k"]: r["payload"] for r in table.snapshot().collect()
    }
    assert all(rows[k] == "A" for k in range(0, 32, 2))
    assert all(rows[k] == "B" for k in range(1, 32, 2))


def test_checkpoint_bounds_log_replay(spark, tmp_path):
    # After checkpoint(), snapshot/active_files must read ONLY the
    # checkpoint file plus tail entries — not the full log prefix —
    # and produce byte-identical state to the full replay.
    import unittest.mock as mock

    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    for seq in range(6):  # versions 0..5
        table.merge(
            _mk(spark, [(k, seq, f"s{seq}") for k in range(seq, 32, 3)]), work
        )
    full = table.active_files()
    ck = table.checkpoint()
    assert ck == 5
    table.merge(_mk(spark, [(k, 9, "post") for k in range(0, 8)]), work)  # v6

    reads: list[str] = []
    real = LogTable._read_json

    def counting(self, path):
        reads.append(os.path.basename(path))
        return real(self, path)

    with mock.patch.object(LogTable, "_read_json", counting):
        files = table.active_files()
    assert any(n.startswith("checkpoint-") for n in reads), reads
    # tail-only: checkpoint + v6 entry (+ nothing from v0..v5)
    assert "00000000.json" not in reads and "00000005.json" not in reads, reads

    # state correctness: checkpointed replay == logical expectation
    with mock.patch.object(
        LogTable, "latest_checkpoint", return_value=None
    ):
        unchecked = table.active_files()
    assert files == unchecked
    # pre-checkpoint time travel still replays from entries alone
    assert table.active_files(3) is not None
    rows = {r["k"]: r["payload"] for r in table.snapshot().collect()}
    assert all(rows[k] == "post" for k in range(8))


def test_retention_vacuum_keeps_window_versions_readable(spark, tmp_path):
    # vacuum(retain_last=2): the newest two snapshots stay fully
    # readable (time travel inside the window survives GC); files
    # referenced ONLY by older versions are reclaimed.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    for seq in range(4):  # versions 0..3
        table.merge(
            _mk(spark, [(k, seq, f"s{seq}") for k in range(16)]), work
        )
    removed = table.vacuum(retain_last=2)
    assert removed  # v0/v1-only files reclaimed
    # head and head-1 replay cleanly...
    assert table.snapshot(3).count() == 16
    assert {r["payload"] for r in table.snapshot(2).collect()} == {"s2"}
    # ...and a pre-window replay now references deleted files.
    with pytest.raises(Exception):
        table.snapshot(0).count()


def test_merge_schema_evolution_adds_column(spark, tmp_path):
    # A batch carrying a NEW column merges cleanly: pre-existing rows
    # read back null for it, updated rows carry it, untouched-bucket
    # files keep their old physical schema (byte-identical), and
    # time travel to the pre-evolution version still works.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(32)]), work)
    before = _file_hashes(table)

    evolved = spark.createDataFrame(
        [(7, 2, "v2-7", "feed-x")],
        "k bigint, seq bigint, payload string, origin string",
    )
    v = table.merge(evolved, work)
    entry = table.history()[v]
    touched = {a["bucket"] for a in entry["adds"]}
    assert len(touched) == 1

    after = _file_hashes(table)
    survivors = {p: h for p, h in before.items() if p in after}
    assert all(after[p] == h for p, h in survivors.items())

    rows = {r["k"]: r for r in table.snapshot().collect()}
    assert rows[7]["origin"] == "feed-x" and rows[7]["payload"] == "v2-7"
    assert rows[3]["origin"] is None and rows[3]["payload"] == "v1-3"
    assert len(rows) == 32
    # pre-evolution time travel: no origin column required to exist
    assert table.snapshot(0).count() == 32


def test_delete_after_schema_evolution_keeps_new_column(spark, tmp_path):
    # delete() rewrites touched buckets by reading their active files,
    # which can span schema generations after an evolving merge — the
    # read must mergeSchema or survivors silently lose later-added
    # columns.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(32)]), work)
    evolved = spark.createDataFrame(
        [(7, 2, "v2-7", "feed-x"), (9, 2, "v2-9", "feed-y")],
        "k bigint, seq bigint, payload string, origin string",
    )
    table.merge(evolved, work)
    # delete a key whose bucket ALSO holds an evolved row, forcing a
    # mixed-generation rewrite of that bucket
    table.delete(_mk(spark, [(7, 0, "x")]), work)
    rows = {r["k"]: r for r in table.snapshot().collect()}
    assert 7 not in rows and len(rows) == 31
    assert rows[9]["origin"] == "feed-y"
    assert rows[3]["origin"] is None and rows[3]["payload"] == "v1-3"


def test_purge_after_schema_evolution_keeps_new_column(spark, tmp_path):
    # purge_deletes() must derive its column list from the MERGED
    # schema of the masked files, not from any single (possibly
    # oldest-generation) file.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(32)]), work)
    evolved = spark.createDataFrame(
        [(7, 2, "v2-7", "feed-x"), (9, 2, "v2-9", "feed-y")],
        "k bigint, seq bigint, payload string, origin string",
    )
    table.merge(evolved, work)
    table.delete_with_vectors(_mk(spark, [(7, 0, "x"), (3, 0, "x")]), work)
    table.purge_deletes(work)
    assert table.active_dv() is None
    rows = {r["k"]: r for r in table.snapshot().collect()}
    assert set(rows) == set(range(32)) - {3, 7}
    assert rows[9]["origin"] == "feed-y"
    assert rows[4]["origin"] is None and rows[4]["payload"] == "v1-4"


def test_purge_conflict_loser_cleans_up(spark, tmp_path):
    # Two maintenance writers racing the same version: the loser's
    # commit fails with CommitConflict, its token-suffixed files are
    # unlinked, and the winner's state is untouched.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(16)]), work)
    table.delete_with_vectors(_mk(spark, [(3, 0, "x")]), work)
    stale_head = table.latest_version()
    racer = stale_head + 1
    # winner takes the version the purge is about to claim; the loser
    # still sees the stale head (the real interleaving: both writers
    # read the log before either commits)
    table._commit(racer, [], [])
    real_latest = table.latest_version
    table.latest_version = lambda: stale_head
    try:
        with pytest.raises(CommitConflict):
            table.purge_deletes(work)
    finally:
        table.latest_version = real_latest
    # loser left no orphan purge files behind
    data_dir = os.path.join(table.root, "data")
    live = {os.path.basename(f["path"]) for f in table.active_files()}
    dv = table.active_dv()
    if dv is not None:
        live.add(os.path.basename(dv))
    orphans = [
        n
        for n in os.listdir(data_dir)
        if n.startswith(f"v{racer:08d}-") and n not in live
    ]
    assert orphans == []
    # masked read still correct; a retried purge on the fresh base works
    assert {r["k"] for r in table.snapshot().collect()} == set(range(16)) - {3}
    table.purge_deletes(work)
    assert table.active_dv() is None
    assert {r["k"] for r in table.snapshot().collect()} == set(range(16)) - {3}


def test_restore_outside_retention_window_raises(spark, tmp_path):
    # After vacuum GC's files outside the retention window, restore to
    # such a version must refuse up front instead of committing a head
    # whose snapshot would fail on missing parquet files.
    table = _table(spark, tmp_path)
    work = str(tmp_path / "work")
    v0 = table.merge(_mk(spark, [(k, 1, f"v1-{k}") for k in range(16)]), work)
    table.merge(_mk(spark, [(k, 2, f"v2-{k}") for k in range(16)]), work)
    head_before = table.latest_version()
    table.vacuum(retain_last=1)
    with pytest.raises(ValueError, match="retention window"):
        table.restore(v0)
    # the refused restore left no new commit and the head still reads
    assert table.latest_version() == head_before
    assert {r["payload"] for r in table.snapshot().collect()} == {
        f"v2-{k}" for k in range(16)
    }
