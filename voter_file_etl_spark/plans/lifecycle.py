"""Table lifecycle (SURVEY.md §2.13).

The reference publishes atomically by renaming Voter{ST}Temp over the
live table inside a transaction (load.ts:256-308). Spark-first
equivalent for READER atomicity: mode("overwrite") through the
file-commit protocol — readers of the old snapshot are unaffected
until commit, never seeing a mix. Note the FAILURE semantics differ:
a bare overwrite deletes the target before the writing job commits,
so a failed job loses the old copy — acceptable for these derived
demo outputs (re-runnable from source), NOT for durable state. The
production publish (operators/etl.py) and the manifest writer
(sources/manifest.py) therefore stage to a hidden dir and promote
via atomic FS renames; l2 here verifies the read-back contract of
overwrite itself.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t

# Every scratch dir this module creates (pristine LogTable builds and
# the per-query work/mutable-copy dirs) is registered here and removed
# at interpreter exit, so long sessions don't accumulate TMPDIR litter.
_TMPDIRS: list[str] = []


def _tmpdir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix, dir=os.environ.get("TMPDIR", "/tmp"))
    _TMPDIRS.append(d)
    return d


@atexit.register
def _cleanup_tmpdirs() -> None:
    for d in _TMPDIRS:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "l2_overwrite_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def l2_overwrite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.gettempdir(), "voter_file_etl_spark", "l2_publish")
    os.makedirs(out, exist_ok=True)
    customer = t(spark, sf_dir, "customer")
    # "blue" publish: a stale slice that must be fully replaced...
    customer.filter(F.col("c_custkey") % 2 == 0).write.mode("overwrite").parquet(out)
    # ...then the "green" publish atomically overwrites with the truth.
    customer.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# L4 — MERGE-style upsert without a transactional table format:
# target ⟗ source on the PK, source wins on match (update), both
# sides keep their exclusives (insert / retain). This is the
# incremental-load alternative to the reference's whole-table swap —
# one full-outer shuffle on the key, then an atomic overwrite
# publish. (On Delta/Iceberg this is MERGE INTO; the plan shape is
# identical.)
# ---------------------------------------------------------------------------
@register(
    "l4_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 4 <> 0
    ), source AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10.00 AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           CAST(coalesce(s.price, t.price) AS DOUBLE) AS price
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def l4_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    target = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("t_key"),
        F.col("o_orderstatus").alias("t_status"),
        price.alias("t_price"),
    )
    source = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("s_key"),
        F.lit("U").alias("s_status"),
        (price + F.lit(10.00).cast("decimal(18,2)")).alias("s_price"),
    )
    merged = target.join(source, target.t_key == source.s_key, "full_outer")
    return merged.select(
        F.coalesce("s_key", "t_key").alias("o_orderkey"),
        F.coalesce("s_status", "t_status").alias("o_orderstatus"),
        F.coalesce("s_price", "t_price").cast("double").alias("price"),
    )


# ---------------------------------------------------------------------------
# L5 — schema evolution across snapshots: the reference's migration
# history adds columns over time (migration 20240618150602 added the
# district columns; read_tsv already tolerates narrower inputs). The
# table-side equivalent: snapshots written before the migration lack
# the new column; mergeSchema=true reads the union schema and
# back-fills NULL, so old snapshots stay readable forever without a
# rewrite. Snapshot v=1 (even order keys) predates the migration and
# omits o_orderpriority; v=2 carries it. The aggregate proves the
# merged read: v1 rows have zero non-null priorities, v2 all, and the
# exact-decimal price sum shows no row was lost or duplicated.
#
# Scale: mergeSchema unions footer schemas at planning time (driver-
# side, O(files) — use a fixed read schema once it stabilizes);
# per-file reads stay columnar and NULL back-fill is free.
# ---------------------------------------------------------------------------
@register(
    "l5_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS v,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_priority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def l5_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = os.path.join(tempfile.gettempdir(), "voter_file_etl_spark", "l5_evolve")
    orders = t(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "v=1"))
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "v=2"))
    )
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", base)
        .parquet(base)
    )
    return merged.groupBy("v").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("n_priority"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# L7 — log-structured MERGE: the table-format answer to the
# reference's continuous upsert loop (load.ts:256-308 swaps a whole
# Temp table per load; VERDICT r2 named the O(table)-per-batch rewrite
# as the remaining scale gap). Here the events table arrives as 4
# deterministic batches (event_id % 4), each MERGEd into a
# sources/logtable.py LogTable: an atomic JSON commit log over plain
# parquet where every merge rewrites ONLY the key-hash buckets the
# batch touches (file-level pruning planned from log metadata —
# untouched files are never opened; tests/test_logtable.py asserts
# byte-identity). Last-writer-wins per user_id ordered by (event
# time, event_id) is a total order, so incremental merges equal the
# global argmax no matter how batches slice the stream — which is
# exactly what the oracle computes.
# ---------------------------------------------------------------------------
_L7_N_BATCHES = 4

# Pristine 4-merge LogTable builds, keyed by (Spark app, sf_dir).
# Seven registered queries start from the identical table; building
# it once per session is the same fixture-reuse policy as the
# bucketed-join tables (j9) — the registered queries then time the
# operation under test (time travel, CDC, vacuum, ...), not the
# repeated construction of their shared input. Builds are serialized
# by _LOGTABLE_LOCK so concurrent callers can't race to build twice
# and orphan one copy; dirs are atexit-cleaned via _tmpdir.
_LOGTABLE_CACHE: dict[tuple[str, str], str] = {}
_LOGTABLE_LOCK = threading.Lock()


def _build_logtable(spark: SparkSession, sf_dir: str, work: str, mutable: bool = False):
    from voter_file_etl_spark.sources.logtable import LogTable

    def attach(root: str) -> "LogTable":
        return LogTable(
            spark,
            root,
            key_cols=["user_id"],
            order_cols=["us", "event_id"],
            n_buckets=16,
        )

    cache_key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    with _LOGTABLE_LOCK:
        pristine = _LOGTABLE_CACHE.get(cache_key)
        if pristine is None or not os.path.isdir(os.path.join(pristine, "_log")):
            cache_work = _tmpdir("logtable_cache_")
            events = t(spark, sf_dir, "events").select(
                "event_id",
                F.unix_micros("ts").alias("us"),
                "user_id",
                "event_type",
                "value",
            )
            table = attach(os.path.join(cache_work, "table"))
            for i in range(_L7_N_BATCHES):
                table.merge(
                    events.filter(F.col("event_id") % _L7_N_BATCHES == i), cache_work
                )
            pristine = table.root
            _LOGTABLE_CACHE[cache_key] = pristine
    if mutable:
        # Mutating queries (delete/vacuum) get their own copy so the
        # shared pristine build is never perturbed.
        root = os.path.join(work, "table")
        shutil.copytree(pristine, root)
        return attach(root)
    return attach(pristine)


@register(
    "l7_txn_log_merge",
    oracle="""
    SELECT user_id, last_us, last_event_id, last_value
    FROM (
      SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
             value AS last_value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def l7_txn_log_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l7_logtable_")
    table = _build_logtable(spark, sf_dir, work)
    return table.snapshot().select(
        "user_id",
        F.col("us").alias("last_us"),
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


# ---------------------------------------------------------------------------
# L8 — time travel over the same commit log: snapshot(v) replays log
# entries 0..v, so "the table after the first k batches" is a pure
# driver-side file-list computation — no data rewrite, no copy. The
# query reads EVERY version of the l7 table and fingerprints each
# (row count + exact sums); the oracle rebuilds version k as the
# argmax over batches 0..k (event_id % 4 <= k). A replay bug in the
# log — a remove not applied, an add leaking across versions —
# changes some version's fingerprint and hash-mismatches.
# ---------------------------------------------------------------------------
@register(
    "l8_time_travel",
    oracle="""
    WITH w AS (
      SELECT g.v, e.user_id, e.event_id,
             row_number() OVER (
               PARTITION BY g.v, e.user_id
               ORDER BY epoch_us(e.ts) DESC, e.event_id DESC) AS rn
      FROM events e
      JOIN (VALUES (0), (1), (2), (3)) AS g(v) ON e.event_id % 4 <= g.v
    )
    SELECT CAST(v + 1 AS BIGINT) AS n_batches,
           count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM w WHERE rn = 1
    GROUP BY v
    """,
)
def l8_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l8_travel_")
    table = _build_logtable(spark, sf_dir, work)
    per_version = [
        table.snapshot(v)
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("event_id").alias("sum_last_id"),
        )
        .withColumn("n_batches", F.lit(v + 1).cast("long"))
        for v in range(table.latest_version() + 1)
    ]
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out.select("n_batches", "n_keys", "sum_last_id")


# ---------------------------------------------------------------------------
# L9 — GDPR hard delete on the commit-log table: erase every row for
# a keyed subject set (user_id % 10 == 3 here), with the same
# touched-buckets-only cost model as the MERGE — the deletion list
# broadcasts, only buckets containing subjects are rewritten, and
# vacuum() then physically removes the superseded files so the
# erased rows exist in no file at all (tests/test_logtable.py scans
# raw data files to prove it). This is the reference's per-state
# reload answered at row granularity: deleting one voter does not
# rewrite the state, only the key's bucket.
# ---------------------------------------------------------------------------
@register(
    "l9_gdpr_delete",
    oracle="""
    SELECT event_type, count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND user_id % 10 <> 3
    GROUP BY event_type
    """,
)
def l9_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l9_gdpr_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    subjects = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .filter(F.col("user_id") % 10 == 3)
        .distinct()
    )
    table.delete(subjects, work)
    table.vacuum()
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L6 — small-file compaction: the table-maintenance operation every
# 100 TB lake needs (streaming sinks and per-batch loads accumulate
# thousands of KB-sized files per partition; scan throughput dies on
# file-open overhead and footer reads). A fragmented copy of events
# is written (40 round-robin writer tasks × every partition -> 40
# files per partition), then compacted by repartitioning ON the
# partition column so each partition's rows land in exactly one
# writer task -> exactly 1 file per partition. The registered output
# measures REAL file counts from the committed directories; the
# oracle pins n_files_after = 1, was_fragmented = TRUE, and exact
# row preservation — a compaction that loses rows or leaves
# fragments hash-mismatches. (The before-count is reported as a
# boolean, not the exact 40: a round-robin task with zero rows of a
# sparse type writes no file there, so the exact count depends on
# the row distribution the driver generated.)
#
# Scale: compaction is one shuffle keyed on the partition column (at
# production scale, repartition(N, col) with N sized to target file
# size, or AQE-coalesced rebalance); the directory listing is driver
# bookkeeping O(partitions), the same role the reference's manifest
# plays.
# ---------------------------------------------------------------------------
_L6_SMALL_TASKS = 40


@register(
    "l6_compaction",
    oracle="""
    SELECT event_type,
           TRUE AS was_fragmented,
           1 AS n_files_after,
           count(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
)
def l6_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    base = _tmpdir("l6_compact_")
    small = os.path.join(base, "small")
    compact = os.path.join(base, "compact")

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    # Fragmented layout: 40 round-robin tasks each hold rows of every
    # event_type, so every partition directory gets 40 small files.
    ev.repartition(_L6_SMALL_TASKS).write.partitionBy("event_type").parquet(small)

    frag = spark.read.parquet(small)
    # The partition directories ARE the distinct types (a dir exists
    # iff rows of that type were committed), so the writer count
    # comes from the same listing files_per_type() does — no
    # scan+distinct job over the fragmented table (r13).
    n_types = len(glob.glob(os.path.join(small, "event_type=*")))
    # Compact: repartition ON the partition column -> one writer task
    # per event_type -> one file per partition directory.
    frag.repartition(n_types, "event_type").write.partitionBy("event_type").parquet(
        compact
    )

    def files_per_type(root: str) -> dict[str, int]:
        out = {}
        for d in glob.glob(os.path.join(root, "event_type=*")):
            etype = os.path.basename(d).split("=", 1)[1]
            out[etype] = len(glob.glob(os.path.join(d, "*.parquet")))
        return out

    before, after = files_per_type(small), files_per_type(compact)
    layout = spark.createDataFrame(
        [(k, before[k], after.get(k, 0)) for k in sorted(before)],
        "event_type string, n_files_before int, n_files_after int",
    )
    counts = (
        spark.read.parquet(compact)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return counts.join(F.broadcast(layout), "event_type").select(
        "event_type",
        (F.col("n_files_before") > F.col("n_files_after")).alias("was_fragmented"),
        "n_files_after",
        "n_rows",
    )


# ---------------------------------------------------------------------------
# L10 — SCD Type-2 history build: collapse an event-grained history
# (every order a customer placed) into validity intervals per
# attribute state — the warehouse pattern for "what was this
# customer's status ON date D". Change rows are detected with lag()
# (first row or status != previous), then valid_to chains from the
# NEXT change's valid_from via lead(); the open interval is the
# current state. The reference keeps only the latest snapshot per
# voter (load.ts swaps whole tables); SCD2 is what a 100 TB lake
# keeps instead so history is queryable without replaying loads.
#
# Scale: two window passes over the SAME (custkey, date, key)
# ordering — Catalyst plans one exchange + one sort, with the second
# window reusing the first's partitioning (no re-shuffle).
# ---------------------------------------------------------------------------
@register(
    "l10_scd2_history",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), chg AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
      FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    )
    SELECT o_custkey AS custkey, o_orderstatus AS status,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS DATE) AS valid_to,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             IS NULL AS is_current
    FROM chg
    """,
)
def l10_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = t(spark, sf_dir, "orders")
    chg = (
        orders.withColumn("prev_status", F.lag("o_orderstatus").over(win))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    nxt = F.lead("o_orderdate").over(win)
    return chg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        nxt.cast("date").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# L11 — CDC change feed off the commit log: for each of the four l7
# merge commits, LogTable.changes(v) reads ONLY the files that commit
# added/removed (O(touched buckets), never O(table)) and classifies
# every key as insert / update / delete — Delta's "change data feed"
# re-expressed over the plain-parquet log. The oracle rebuilds every
# version's winner per user (argmax over batches 0..v) and diffs
# adjacent versions with lag(), so a replay bug — an add leaking, a
# remove skipped, an unchanged row reported as changed — produces a
# row-level mismatch, not just a count drift.
# ---------------------------------------------------------------------------
@register(
    "l11_change_feed",
    oracle="""
    WITH win AS (
      SELECT g.v, e.user_id, epoch_us(e.ts) AS us, e.event_id,
             row_number() OVER (PARTITION BY g.v, e.user_id
               ORDER BY epoch_us(e.ts) DESC, e.event_id DESC) AS rn
      FROM events e JOIN (VALUES (0), (1), (2), (3)) AS g(v)
        ON e.event_id % 4 <= g.v
    ), st AS (
      SELECT v, user_id, us, event_id FROM win WHERE rn = 1
    ), ch AS (
      SELECT v, user_id, us AS new_us, event_id AS new_event_id,
             lag(us) OVER w AS old_us,
             lag(event_id) OVER w AS old_event_id,
             row_number() OVER w AS k
      FROM st WINDOW w AS (PARTITION BY user_id ORDER BY v)
    )
    SELECT CAST(v AS BIGINT) AS version, user_id,
           CASE WHEN k = 1 THEN 'insert'
                WHEN new_event_id <> old_event_id THEN 'update' END AS op,
           new_us, new_event_id, old_us, old_event_id
    FROM ch WHERE k = 1 OR new_event_id <> old_event_id
    """,
)
def l11_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l11_cdc_")
    table = _build_logtable(spark, sf_dir, work)
    out = None
    for v in range(table.latest_version() + 1):
        feed = table.changes(v).withColumn("version", F.lit(v).cast("long"))
        out = feed if out is None else out.unionByName(feed)
    return out.select(
        "version", "user_id", "op",
        "new_us", "new_event_id", "old_us", "old_event_id",
    )


# ---------------------------------------------------------------------------
# L12 — Z-order clustering for data skipping: interleave the bits of
# two independent dimensions (l_partkey%1024, l_orderkey%1024 — both
# span the full 10-bit range at every SF; suppkey does not) into a
# Morton code, lay rows out in z order, and cut the layout into 16
# equal file-sized bins (ntile over the z total order — the query
# models the file boundaries; the physical write is
# repartitionByRange(z) + sortWithinPartitions, asserted in
# tests/test_zorder.py). Per bin we report the (min,max) bounding box
# of BOTH dimensions plus whether a quarter×quarter box query
# p<=255 AND 512<=s<=767 would scan it — with z-order the box
# touches a small fraction of bins; range-partitioning on either
# single key would leave the other dimension's bounds full-width and
# prune nothing. The interleave is 20 integer bit terms, identical
# arithmetic in both engines.
# ---------------------------------------------------------------------------
_Z_SPARK = " + ".join(
    f"shiftleft(shiftright(p, {i}) & 1, {2 * i}) + "
    f"shiftleft(shiftright(s, {i}) & 1, {2 * i + 1})"
    for i in range(10)
)
_Z_DUCK = " + ".join(
    f"(((p >> {i}) & 1) << {2 * i}) + (((s >> {i}) & 1) << {2 * i + 1})"
    for i in range(10)
)


@register(
    "l12_zorder_bins",
    oracle=f"""
    WITH d AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey % 1024 AS p, l_orderkey % 1024 AS s
      FROM lineitem
    ), b AS (
      SELECT p, s,
             ntile(16) OVER (ORDER BY {_Z_DUCK}, l_orderkey, l_linenumber)
               AS bin
      FROM d
    )
    SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
           min(p) AS pmin, max(p) AS pmax,
           min(s) AS smin, max(s) AS smax,
           CAST((min(p) <= 255 AND max(s) >= 512 AND min(s) <= 767)
                AS INTEGER) AS scanned
    FROM b GROUP BY bin
    """,
)
def l12_zorder_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_partkey % 1024").alias("p"),
        F.expr("l_orderkey % 1024").alias("s"),
    )
    z = d.withColumn("z", F.expr(_Z_SPARK))
    binned = z.withColumn(
        "bin",
        F.ntile(16).over(W.orderBy("z", "l_orderkey", "l_linenumber")),
    )
    return (
        binned.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("p").alias("pmin"),
            F.max("p").alias("pmax"),
            F.min("s").alias("smin"),
            F.max("s").alias("smax"),
        )
        .withColumn(
            "scanned",
            (
                (F.col("pmin") <= 255)
                & (F.col("smax") >= 512)
                & (F.col("smin") <= 767)
            ).cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# L13 — incremental aggregate-view maintenance from the change feed:
# the classic "materialized view over CDC" pattern (Delta CDF / Kafka
# + summary table).  A per-shard aggregate of the LogTable
# (shard = last_event_id % 8 → n_users, sum of last event_id) is
# maintained WITHOUT ever re-scanning the snapshot: each commit's
# change feed becomes +1/-1 weighted delta rows (insert → +new,
# update → +new -old, delete → -old), folded per version and
# cumulatively summed across versions.  The query emits the view
# state after EVERY version; the oracle recomputes each version's
# aggregate from scratch — incremental maintenance must equal full
# recompute at every step, so a single missed preimage or leaked add
# anywhere in the log hash-mismatches.
#
# Scale: each step reads O(changed buckets) — never the table — and
# the fold is a single groupBy over delta rows, the exact shape a
# 100 TB summary-table pipeline needs.  The version×shard spine is
# 32 rows; the window cumsum runs on the folded aggregate, not data.
# ---------------------------------------------------------------------------
@register(
    "l13_incremental_agg_view",
    oracle=f"""
    WITH w AS (
      SELECT g.v, e.user_id, e.event_id,
             row_number() OVER (
               PARTITION BY g.v, e.user_id
               ORDER BY epoch_us(e.ts) DESC, e.event_id DESC) AS rn
      FROM events e
      JOIN (VALUES (0), (1), (2), (3)) AS g(v)
        ON e.event_id % {_L7_N_BATCHES} <= g.v
    )
    SELECT CAST(v + 1 AS BIGINT) AS n_batches,
           event_id % 8 AS shard,
           count(*) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM w WHERE rn = 1
    GROUP BY v, shard
    """,
)
def l13_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    work = _tmpdir("l13_view_")
    table = _build_logtable(spark, sf_dir, work)
    n_versions = table.latest_version() + 1

    deltas = None
    for v in range(n_versions):
        # Each version's change feed (parquet reads + full-outer
        # join) is referenced twice below (plus AND minus legs);
        # localCheckpoint materializes it once per version (r13).
        ch = table.changes(v).transform(materialize)
        plus = ch.filter(F.col("op").isin("insert", "update")).select(
            F.lit(v).alias("version"),
            (F.col("new_event_id") % 8).alias("shard"),
            F.lit(1).cast("long").alias("dn"),
            F.col("new_event_id").alias("did"),
        )
        minus = ch.filter(F.col("op").isin("update", "delete")).select(
            F.lit(v).alias("version"),
            (F.col("old_event_id") % 8).alias("shard"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("old_event_id")).alias("did"),
        )
        step = plus.unionByName(minus)
        deltas = step if deltas is None else deltas.unionByName(step)

    folded = deltas.groupBy("version", "shard").agg(
        F.sum("dn").alias("dn"), F.sum("did").alias("did")
    )
    # version×shard spine so shards quiet in a version still carry
    # their running state forward (32 rows — driver-trivial)
    spine = spark.range(n_versions).select(F.col("id").alias("version")).crossJoin(
        spark.range(8).select(F.col("id").alias("shard"))
    )
    cum = Window.partitionBy("shard").orderBy("version").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(folded, ["version", "shard"], "left")
        .select(
            "version",
            "shard",
            F.coalesce("dn", F.lit(0)).alias("dn"),
            F.coalesce("did", F.lit(0)).alias("did"),
        )
        .select(
            (F.col("version") + 1).alias("n_batches"),
            "shard",
            F.sum("dn").over(cum).alias("n_users"),
            F.sum("did").over(cum).alias("sum_last_id"),
        )
        .filter(F.col("n_users") > 0)
    )


# ---------------------------------------------------------------------------
# L15 — vacuum: after the 4-merge LogTable build, every bucket
# rewrite has left its previous file unreferenced; vacuum() must
# delete exactly the unreferenced data files and must not perturb
# the head snapshot. The registered result carries the snapshot
# aggregate (oracle-checked against the batch argmax) plus two
# invariant flags computed from the table's own bookkeeping: disk
# holds precisely the active file set after vacuum, and the snapshot
# row count is unchanged across it. At 100 TB vacuum is the
# storage-cost control loop: O(file listing) driver work, zero data
# movement, bounded only by the commit log's retention policy.
# ---------------------------------------------------------------------------
@register(
    "l15_vacuum",
    oracle="""
    SELECT count(*) AS n_keys, 1 AS disk_matches_active, 1 AS snapshot_stable
    FROM (SELECT DISTINCT user_id FROM events)
    """,
)
def l15_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l15_vac_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    before = table.snapshot().count()
    table.vacuum()
    data_dir = os.path.join(table.root, "data")
    on_disk = {os.path.join("data", n) for n in os.listdir(data_dir)}
    active = {f["path"] for f in table.active_files()}
    after = table.snapshot().agg(F.count(F.lit(1)).alias("n_keys"))
    return after.select(
        "n_keys",
        F.lit(1 if on_disk == active else 0).alias("disk_matches_active"),
        (F.col("n_keys") == F.lit(before)).cast("int").alias("snapshot_stable"),
    )


# ---------------------------------------------------------------------------
# L16 — deletion-vector delete (merge-on-read): the modern lakehouse
# delete path (Delta deletion vectors / Iceberg v2 position
# deletes). l9 ERASES by rewriting every touched bucket file — the
# copy-on-write path, O(touched data) per delete. This key deletes
# the same way production formats do when deletes are frequent and
# small: matching rows are located by (file, row_index) from parquet
# scan metadata and masked via a tiny position-delete sidecar; NO
# data file is rewritten (tests/test_logtable.py asserts
# byte-identity), and snapshot() applies the mask with a broadcast
# anti-join. Two successive DV commits exercise the cumulative
# supersede (second sidecar folds the first), and the aggregate
# proves the masked snapshot equals the plain SQL filter.
#
# Scale: per-delete cost is O(touched files read + matches written)
# — no rewrite amplification; read-side cost is one broadcast
# anti-join of O(deleted positions). DV-heavy files fall back to the
# rewrite path at compaction (l6), exactly Delta's documented model.
# ---------------------------------------------------------------------------
@register(
    "l16_position_deletes",
    oracle="""
    SELECT event_type, count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND user_id % 7 <> 2 AND user_id % 11 <> 5
    GROUP BY event_type
    """,
)
def l16_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l16_dv_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    users = t(spark, sf_dir, "events").select("user_id").distinct()
    table.delete_with_vectors(
        users.filter(F.col("user_id") % 7 == 2), work
    )
    table.delete_with_vectors(
        users.filter(F.col("user_id") % 11 == 5), work
    )
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L17 — deletion-vector purge (Delta's REORG TABLE ... APPLY
# (PURGE)): the maintenance half of l16's merge-on-read lifecycle.
# Frequent small deletes accumulate as cheap position masks; ONE
# purge rewrites only the masked files without those rows, retires
# the sidecar ("dv": null commit), and returns reads to the
# mask-free fast path — O(masked files) rewrite paying for ALL
# accumulated deletes at once, with unmasked files byte-identical
# (tests/test_logtable.py::test_purge_applies_and_retires_dv).
# The aggregate proves the purged table equals the plain SQL filter
# AND that a vacuum after purge leaves exactly the mask-free state.
# ---------------------------------------------------------------------------
@register(
    "l17_dv_purge",
    oracle="""
    SELECT event_type, count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND user_id % 9 <> 4
    GROUP BY event_type
    """,
)
def l17_dv_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l17_purge_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    users = t(spark, sf_dir, "events").select("user_id").distinct()
    table.delete_with_vectors(users.filter(F.col("user_id") % 9 == 4), work)
    table.purge_deletes(work)
    table.vacuum()
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L18 — RESTORE to a prior version (Delta's RESTORE TABLE ... TO
# VERSION AS OF): the bad-deploy undo. l8 time travel READS an old
# version; restore makes it the HEAD again with one append-only log
# entry and ZERO data movement — the later commits stay replayable
# (auditable), and DV state as of the target version is restored
# with it (tests/test_logtable.py::
# test_restore_rolls_back_without_rewrite proves no file is
# touched). Here the table takes all four merges, then restores to
# the version holding only the first two batches; the aggregate
# must equal the argmax over exactly those batches.
# ---------------------------------------------------------------------------
@register(
    "l18_restore",
    oracle=f"""
    SELECT event_type, count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events WHERE event_id % {_L7_N_BATCHES} <= 1
    )
    WHERE rn = 1
    GROUP BY event_type
    """,
)
def l18_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l18_restore_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    # versions 0..3 are the four batch merges; version 1 holds
    # batches {0, 1}
    table.restore(1)
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L19 — shallow clone (Delta's CREATE TABLE ... SHALLOW CLONE): a
# zero-copy sandbox over the production table — the clone's log is a
# copy, its data files are hardlinks to the same inodes, and writes
# after the clone diverge freely (tests/test_logtable.py::
# test_shallow_clone_is_zero_copy_and_independent proves inode
# sharing AND source isolation). Here the fixture is cloned, a
# GDPR-style delete runs IN THE CLONE (the dev/test rehearsal that
# motivates clones), and the registered output is the clone's
# snapshot — while the shared pristine fixture stays byte-identical
# for every other key (the cache-isolation test covers that).
# ---------------------------------------------------------------------------
@register(
    "l19_shallow_clone",
    oracle="""
    SELECT event_type, count(*) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM (
      SELECT user_id, event_type, event_id,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND user_id % 13 <> 6
    GROUP BY event_type
    """,
)
def l19_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l19_clone_")
    source = _build_logtable(spark, sf_dir, work)  # shared pristine build
    clone = source.clone_to(os.path.join(work, "clone"))
    users = t(spark, sf_dir, "events").select("user_id").distinct()
    clone.delete(users.filter(F.col("user_id") % 13 == 6), work)
    return clone.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L20 — write-audit-publish (WAP): every batch lands in a STAGING
# directory, a data-quality audit runs against the staged files
# only, and exactly the batches that pass are atomically promoted
# into the published table (a same-filesystem rename — the POSIX
# form of Iceberg's branch-commit / Delta's staged-commit WAP
# pattern). The reference's per-file load loop (load.ts:256-308)
# trusts its input; this is the gate a production voter-file load
# puts in front of publish. Batch 1 here carries injected negative
# totals, so its audit fails and the published table provably never
# contains it — the report's published_total column is READ BACK
# from the published directory after each decision, not inferred.
#
# Scale: the audit is one filter+count over the staged batch (scan
# of just-written files, map-side combine); publish is a metadata
# rename, O(1) data movement. The report is O(batches) driver rows.
# ---------------------------------------------------------------------------
_L20_N_BATCHES = 3


@register(
    "l20_write_audit_publish",
    oracle="""
    WITH r AS (
      SELECT o_orderkey % 3 AS batch_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 3 = 1 AND o_orderkey % 7 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      FROM orders GROUP BY 1
    )
    SELECT batch_id, n_rows, n_bad, n_bad = 0 AS published,
           CAST(sum(CASE WHEN n_bad = 0 THEN n_rows ELSE 0 END)
                OVER (ORDER BY batch_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS published_total
    FROM r
    """,
)
def l20_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l20_wap_")
    staging = os.path.join(work, "staging")
    published = os.path.join(work, "published")
    os.makedirs(published, exist_ok=True)
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    report = []
    for i in range(_L20_N_BATCHES):
        batch = orders.filter(F.col("o_orderkey") % _L20_N_BATCHES == i)
        if i == 1:
            # Simulated upstream corruption: some totals arrive negated.
            batch = batch.select(
                "o_orderkey",
                F.when(
                    F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice")
                )
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
            )
        stage_dir = os.path.join(staging, f"batch={i}")
        # The audit rides the staging WRITE as observe() accumulators
        # (r13, the e3/e7 pattern — guide §1.2): the metrics are
        # computed over exactly the rows landing in the staged batch,
        # so the separate read-back aggregation job (one full scan of
        # the just-written files per batch) is gone. The publish
        # decision and the post-decision published read-back are
        # unchanged.
        from pyspark.sql import Observation

        obs = Observation(f"l20_audit_{i}")
        batch.observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("o_totalprice").isNull()
                    | (F.col("o_totalprice") <= 0)
                    | F.col("o_orderkey").isNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_bad"),
        ).write.mode("overwrite").parquet(stage_dir)
        audit = obs.get
        ok = audit["n_bad"] == 0
        if ok:
            # Write-audit-publish integrity (ADVICE r13): observe()
            # validates the rows IN FLIGHT; before publishing, verify
            # the PERSISTED files agree — a metadata-only count (the
            # parquet row-group counts; no column is read) catches a
            # corrupt/partial staged write that in-flight metrics
            # cannot see, at a fraction of the old full-column
            # read-back aggregation this replaced in r13.
            n_back = spark.read.parquet(stage_dir).count()
            if n_back != audit["n_rows"]:
                raise RuntimeError(
                    f"l20 staged batch {i}: persisted rows {n_back} != "
                    f"observed {audit['n_rows']} — refusing to publish"
                )
            # Atomic publish: same-filesystem rename of the staged
            # batch directory into the published table.
            os.rename(stage_dir, os.path.join(published, f"batch={i}"))
        # Read back what a consumer of the published table sees NOW.
        if os.listdir(published):
            visible = spark.read.parquet(
                os.path.join(published, "batch=*")
            ).count()
        else:
            visible = 0
        report.append((i, audit["n_rows"], audit["n_bad"], ok, visible))
    return spark.createDataFrame(
        report,
        "batch_id bigint, n_rows bigint, n_bad bigint,"
        " published boolean, published_total bigint",
    )


# ---------------------------------------------------------------------------
# L21 — concurrent writers with optimistic-commit retry: two writers
# MERGE disjoint event batches into the same LogTable at the same
# time from two threads. Whoever loses the link(2) version race gets
# CommitConflict, re-reads the log, and retries on the fresh base —
# the Delta/Iceberg optimistic-concurrency loop. Because
# last-writer-wins is a TOTAL order ((us, event_id) descending), the
# final snapshot is independent of which writer lands first, so the
# racing table equals the oracle's global argmax no matter how the
# race resolves. Writer-unique data-file names make the loser's
# pre-commit file moves harmless (see logtable.py merge; regression:
# tests/test_logtable.py::test_losing_writer_cannot_clobber_committed_data).
# n_commits is read back from the log — both writers land exactly
# once (retries never double-commit).
#
# Scale: each merge still touches only its batch's buckets; the
# conflict loop costs one log re-read + one re-stage per collision,
# never an O(table) rewrite.
# ---------------------------------------------------------------------------
@register(
    "l21_concurrent_merge_retry",
    oracle="""
    WITH w AS (
      SELECT user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(3 AS BIGINT) AS n_commits
    FROM w WHERE rn = 1 GROUP BY event_type
    """,
)
def l21_concurrent_merge_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.sources.logtable import CommitConflict, LogTable

    work = _tmpdir("l21_race_")
    events = t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
    )
    table = LogTable(
        spark,
        os.path.join(work, "table"),
        key_cols=["user_id"],
        order_cols=["us", "event_id"],
        n_buckets=8,
    )
    table.merge(events.filter(F.col("event_id") % 3 == 0), os.path.join(work, "w0"))

    def writer(tag: str, batch) -> None:
        for _ in range(8):  # optimistic loop: re-read log, re-merge
            try:
                table.merge(batch, os.path.join(work, f"w_{tag}"))
                return
            except CommitConflict:
                continue
        raise RuntimeError("writer starved past 8 retries")

    threads = [
        threading.Thread(
            target=writer, args=(tag, events.filter(F.col("event_id") % 3 == m))
        )
        for tag, m in (("a", 1), ("b", 2))
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    n_commits = table.latest_version() + 1
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.expr("cast(floor(value * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("sum_cents"),
        F.lit(n_commits).cast("long").alias("n_commits"),
    )


# ---------------------------------------------------------------------------
# L22 — log checkpointing: fold the commit-log prefix into one
# checkpoint file (Delta's _last_checkpoint role) so replay walks
# checkpoint + tail instead of every entry — the bound on SCALE.md's
# documented "driver-side O(versions) bookkeeping" caveat. This key
# checkpoints the shared 4-merge table (on a mutable copy), lands
# one MORE merge on top, and reads the head THROUGH the checkpointed
# replay path; the oracle is the global argmax over all events, so a
# checkpoint that froze stale state, dropped a tail entry, or leaked
# a removed file hash-mismatches at row level.
# tests/test_logtable.py::test_checkpoint_bounds_log_replay proves
# the replay reads ONLY checkpoint + tail (instrumented read count)
# and that pre-checkpoint time travel still works.
#
# Scale: checkpoint write is O(active files) driver JSON, done once
# per N commits; every subsequent read is O(tail). Data files are
# untouched.
# ---------------------------------------------------------------------------
@register(
    "l22_log_checkpoint",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id,
           CAST(5 AS BIGINT) AS n_commits
    FROM w WHERE rn = 1 GROUP BY event_type
    """,
)
def l22_log_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l22_ckpt_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    table.checkpoint()  # folds versions 0..3
    events = t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
    )
    # One more merge AFTER the checkpoint: the head read must combine
    # checkpointed state with the tail entry. Re-merging a subset of
    # already-present rows is idempotent under total-order LWW, so
    # the head equals the global argmax the oracle computes.
    table.merge(events.filter(F.col("event_id") % 5 == 0), work)
    n_commits = table.latest_version() + 1
    return table.snapshot().groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("event_id").cast("long").alias("sum_last_id"),
        F.lit(n_commits).cast("long").alias("n_commits"),
    )


# ---------------------------------------------------------------------------
# L23 — retention-window vacuum: GC with ``retain_last=2`` keeps the
# newest two snapshots fully readable — the production retention
# posture (Delta retains by hours; versions are this format's
# clock), closing the documented "head-only vacuum kills all time
# travel" caveat. The key vacuums the shared 4-merge table (mutable
# copy), then reads BOTH retained versions through the post-GC log
# and fingerprints them — a replay that touched a reclaimed file
# would throw, a wrong retention set would hash-mismatch.
# tests/test_logtable.py::test_retention_vacuum_keeps_window_versions_readable
# additionally proves pre-window replays now fail and files
# referenced only by expired versions were reclaimed.
#
# Scale: GC work is O(files on disk) name-set arithmetic over the
# retained versions' manifests — no data reads.
# ---------------------------------------------------------------------------
@register(
    "l23_retention_vacuum",
    oracle="""
    WITH w AS (
      SELECT g.v, e.user_id, e.event_id,
             row_number() OVER (
               PARTITION BY g.v, e.user_id
               ORDER BY epoch_us(e.ts) DESC, e.event_id DESC) AS rn
      FROM events e
      JOIN (VALUES (2), (3)) AS g(v) ON e.event_id % 4 <= g.v
    )
    SELECT CAST(v + 1 AS BIGINT) AS n_batches,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM w WHERE rn = 1
    GROUP BY v
    """,
)
def l23_retention_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l23_retain_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    table.vacuum(retain_last=2)
    out = None
    for v in (2, 3):
        snap = table.snapshot(v).agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("event_id").cast("long").alias("sum_last_id"),
        ).select(
            F.lit(v + 1).cast("long").alias("n_batches"),
            "n_keys",
            "sum_last_id",
        )
        out = snap if out is None else out.unionByName(snap)
    return out


# ---------------------------------------------------------------------------
# L24 — schema evolution through the table-format MERGE: the second
# batch arrives carrying a NEW column (channel) that the first
# generation of files has never seen; the merge unions with
# allowMissingColumns and the snapshot reads with mergeSchema, so
# old rows surface null for the added column — Delta's
# mergeSchema-on-write semantics over the plain-parquet log
# (l5 demonstrates the same idea for raw parquet dirs; this is the
# governed-table version, where untouched buckets keep their old
# physical schema byte-identical:
# tests/test_logtable.py::test_merge_schema_evolution_adds_column).
# LWW winners decide who carries the column, which is exactly what
# the oracle computes.
#
# Scale: unchanged merge cost model — only touched buckets rewrite;
# schema width is a logical union, not a physical rewrite.
# ---------------------------------------------------------------------------
@register(
    "l24_merge_schema_evolution",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_channel,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id
    FROM w WHERE rn = 1 GROUP BY event_type
    """,
)
def l24_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.sources.logtable import LogTable

    work = _tmpdir("l24_evolve_")
    events = t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
    )
    table = LogTable(
        spark,
        os.path.join(work, "table"),
        key_cols=["user_id"],
        order_cols=["us", "event_id"],
        n_buckets=8,
    )
    table.merge(events.filter(F.col("event_id") % 2 == 0), work)
    evolved = events.filter(F.col("event_id") % 2 == 1).withColumn(
        "channel", F.concat(F.lit("ch-"), (F.col("user_id") % 3).cast("string"))
    )
    table.merge(evolved, work)
    snap = table.snapshot()
    return snap.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("channel").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_channel"),
        F.sum("event_id").cast("long").alias("sum_last_id"),
    )


# ---------------------------------------------------------------------------
# L25 — orphan-file audit: reconcile the data directory against the
# commit log — every on-disk file must be referenced by some log
# version (live or historical), and every referenced file must
# exist on disk. The pre-vacuum storage audit every governed lake
# runs (orphans = wasted storage or, worse, a writer that moved
# files without committing — the bug class l21's race fix closed);
# missing files = corruption. Runs over the shared 4-merge table;
# both violation counts must be zero, which the oracle pins along
# with the real file/reference totals derived from the same batch
# arithmetic the table was built with.
#
# Scale: pure driver-side name-set arithmetic over the log and one
# directory listing — O(files) metadata, no data reads.
# ---------------------------------------------------------------------------
@register(
    "l25_orphan_audit",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_commits,
           CAST(0 AS BIGINT) AS n_orphans,
           CAST(0 AS BIGINT) AS n_missing,
           TRUE AS disk_matches_log
    """,
)
def l25_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l25_audit_")
    table = _build_logtable(spark, sf_dir, work)
    referenced = {
        a["path"] for e in table.history() for a in e["adds"]
    }
    data_dir = os.path.join(table.root, "data")
    on_disk = {
        os.path.join("data", n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    }
    n_orphans = len(on_disk - referenced)
    n_missing = len(referenced - on_disk)
    return spark.createDataFrame(
        [
            (
                table.latest_version() + 1,
                n_orphans,
                n_missing,
                n_orphans == 0 and n_missing == 0 and len(on_disk) > 0,
            )
        ],
        "n_commits bigint, n_orphans bigint, n_missing bigint,"
        " disk_matches_log boolean",
    )


# ---------------------------------------------------------------------------
# L26 — MERGE full sync (WHEN NOT MATCHED BY SOURCE): mirror a target
# to a source feed in one pass — matched rows update, source-only
# rows insert, and target-only rows DELETE *conditionally* (only
# open-status rows are retired; closed history is kept). This is the
# MERGE clause l4's upsert doesn't exercise, and the semantics behind
# every "sync table to feed" job. The action column makes the
# row-level decision auditable.
#
# Scale: one full-outer join on the key — the same single-shuffle
# shape as l4; the delete condition is a residual filter, never a
# second pass.
# ---------------------------------------------------------------------------
@register(
    "l26_merge_full_sync",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 4 <> 0
    ), source AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1000 AS cents
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
                  THEN 'update'
                WHEN s.o_orderkey IS NOT NULL THEN 'insert'
                ELSE 'keep' END AS action,
           CASE WHEN s.o_orderkey IS NOT NULL THEN 'U'
                ELSE t.o_orderstatus END AS status,
           coalesce(s.cents, t.cents) AS cents
    FROM target t FULL OUTER JOIN source s
      ON t.o_orderkey = s.o_orderkey
    WHERE s.o_orderkey IS NOT NULL
       OR t.o_orderstatus <> 'O'
    """,
)
def l26_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
    target = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("t_key"),
        F.col("o_orderstatus").alias("t_status"),
        cents.alias("t_cents"),
    )
    source = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("s_key"),
        (cents + 1000).alias("s_cents"),
    )
    merged = target.join(source, target.t_key == source.s_key, "full_outer")
    return merged.filter(
        F.col("s_key").isNotNull() | (F.col("t_status") != "O")
    ).select(
        F.coalesce("s_key", "t_key").alias("o_orderkey"),
        F.when(
            F.col("s_key").isNotNull() & F.col("t_key").isNotNull(), "update"
        )
        .when(F.col("s_key").isNotNull(), "insert")
        .otherwise("keep")
        .alias("action"),
        F.when(F.col("s_key").isNotNull(), "U")
        .otherwise(F.col("t_status"))
        .alias("status"),
        F.coalesce("s_cents", "t_cents").alias("cents"),
    )


# ---------------------------------------------------------------------------
# L27 — bitemporal as-of query: the dimension carries BOTH valid time
# (when the fact was true in the world) and transaction time (when
# the warehouse learned it). Versions come from per-customer status
# changes (the j15 SCD2 construction); every 7th customer's covering
# version is CORRECTED 30 days after it was first recorded (old row
# closed in txn time, replacement row opened). The query answers
# "status at valid date V" under two knowledge dates — what we knew
# shortly after V vs what we know now — and flags rows where the
# correction changed the answer. l8 time-travels txn time only, j15
# joins valid time only; audit-grade warehouses need both axes.
#
# Scale: the as-of filters are per-row predicates over the version
# table (no join to a calendar); the two knowledge views join on
# custkey, one shuffle each, windows partitioned by custkey.
# ---------------------------------------------------------------------------
@register(
    "l27_bitemporal_asof",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), iv AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    ), bt AS (
      SELECT custkey, status, valid_from, valid_to,
             valid_from AS txn_from,
             CASE WHEN custkey % 7 = 0
                  THEN valid_from + INTERVAL 30 DAY END AS txn_to
      FROM iv
      UNION ALL
      SELECT custkey, 'C', valid_from, valid_to,
             valid_from + INTERVAL 30 DAY, NULL
      FROM iv WHERE custkey % 7 = 0
    ), t1 AS (
      SELECT custkey, status FROM bt
      WHERE valid_from <= TIMESTAMP '1995-06-15'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '1995-06-15')
        AND txn_from <= TIMESTAMP '1995-07-01'
        AND (txn_to IS NULL OR txn_to > TIMESTAMP '1995-07-01')
    ), t2 AS (
      SELECT custkey, status FROM bt
      WHERE valid_from <= TIMESTAMP '1995-06-15'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '1995-06-15')
        AND txn_from <= TIMESTAMP '1998-01-01'
        AND (txn_to IS NULL OR txn_to > TIMESTAMP '1998-01-01')
    )
    SELECT t1.custkey,
           t1.status AS status_known_then,
           t2.status AS status_known_now,
           CAST(CASE WHEN t1.status <> t2.status THEN 1 ELSE 0 END
                AS BIGINT) AS was_revised
    FROM t1 JOIN t2 ON t1.custkey = t2.custkey
    """,
)
def l27_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = (
        orders.withColumn("prev_status", F.lag("o_orderstatus").over(win))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(win).alias("valid_to"),
        )
    )
    bt = iv.select(
        "custkey",
        "status",
        "valid_from",
        "valid_to",
        F.col("valid_from").alias("txn_from"),
        F.expr(
            "case when custkey % 7 = 0"
            " then valid_from + interval 30 day end"
        ).alias("txn_to"),
    ).unionByName(
        iv.filter(F.col("custkey") % 7 == 0).select(
            "custkey",
            F.lit("C").alias("status"),
            "valid_from",
            "valid_to",
            F.expr("valid_from + interval 30 day").alias("txn_from"),
            F.lit(None).cast("timestamp").alias("txn_to"),
        )
    )

    def asof(valid: str, txn: str, suffix: str):
        return bt.filter(
            (F.col("valid_from") <= F.lit(valid).cast("timestamp"))
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") > F.lit(valid).cast("timestamp"))
            )
            & (F.col("txn_from") <= F.lit(txn).cast("timestamp"))
            & (
                F.col("txn_to").isNull()
                | (F.col("txn_to") > F.lit(txn).cast("timestamp"))
            )
        ).select("custkey", F.col("status").alias(f"status_{suffix}"))

    t1 = asof("1995-06-15", "1995-07-01", "known_then")
    t2 = asof("1995-06-15", "1998-01-01", "known_now")
    return t1.join(t2, "custkey").select(
        "custkey",
        "status_known_then",
        "status_known_now",
        F.expr(
            "cast(case when status_known_then <> status_known_now"
            " then 1 else 0 end as bigint)"
        ).alias("was_revised"),
    )


# ---------------------------------------------------------------------------
# L28 — dynamic partition overwrite: rewrite ONLY the partitions the
# incoming batch touches, leaving sibling partitions' files
# untouched — the daily-reload mode that makes partitioned tables
# safely re-runnable (static overwrite would drop the whole table
# first; an append would duplicate). The batch rewrites the 'O'
# partition with discounted cents; 'F' and 'P' must survive
# byte-for-byte. The readback rollup proves exactly that.
#
# Scale: the overwrite's write amplification is bounded by the
# touched partitions, not the table; the readback is a pruned
# partitioned scan.
# ---------------------------------------------------------------------------
@register(
    "l28_dynamic_partition_overwrite",
    oracle="""
    WITH final AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderstatus = 'O'
                  THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) - 100
                  ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             END AS cents
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY o_orderstatus
    """,
)
def l28_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    out = tempfile.mkdtemp(
        prefix="l28_dynover_", dir=os.environ.get("TMPDIR", "/tmp")
    )
    path = os.path.join(out, "tbl")
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    batch = base.filter(F.col("o_orderstatus") == "O").withColumn(
        "cents", F.col("cents") - 100
    )
    (
        batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# L29 — SCD Type 3 dimension: one row per customer carrying the
# CURRENT status, the immediately-previous status, and when the
# change happened — the limited-history trade-off between SCD1
# (overwrite, no history) and l10's SCD2 (full row-version history).
# Built from the same change-point construction as j15, keeping only
# the last two versions per key.
#
# Scale: one customer-partitioned window pass to find change points,
# a rank to keep two rows per key, and a pivot-style rollup — no
# joins at all.
# ---------------------------------------------------------------------------
@register(
    "l29_scd3_dimension",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), iv AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate AS valid_from, o_orderkey AS okey
      FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    ), ranked AS (
      SELECT custkey, status, valid_from,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY valid_from DESC, okey DESC) AS r
      FROM iv
    )
    SELECT custkey,
           max(CASE WHEN r = 1 THEN status END) AS current_status,
           max(CASE WHEN r = 2 THEN status END) AS prev_status,
           CAST(max(CASE WHEN r = 1 THEN valid_from END) AS TIMESTAMP)
             AS changed_at
    FROM ranked WHERE r <= 2 GROUP BY custkey
    """,
)
def l29_scd3_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = (
        orders.withColumn("prev", F.lag("o_orderstatus").over(win))
        .filter(
            F.col("prev").isNull()
            | (F.col("prev") != F.col("o_orderstatus"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("valid_from"),
            F.col("o_orderkey").alias("okey"),
        )
    )
    rw = W.partitionBy("custkey").orderBy(
        F.desc("valid_from"), F.desc("okey")
    )
    ranked = iv.withColumn("r", F.row_number().over(rw)).filter(
        F.col("r") <= 2
    )
    return ranked.groupBy("custkey").agg(
        F.max(F.when(F.col("r") == 1, F.col("status"))).alias(
            "current_status"
        ),
        F.max(F.when(F.col("r") == 2, F.col("status"))).alias("prev_status"),
        F.max(F.when(F.col("r") == 1, F.col("valid_from"))).alias(
            "changed_at"
        ),
    )


# ---------------------------------------------------------------------------
# L30 — MERGE idempotency: apply the SAME update batch twice (the
# at-least-once redelivery every queue eventually produces) and
# prove the table state is identical to applying it once — the
# last-writer-wins key semantics make the merge a set operation, not
# an append. The oracle computes the apply-once expectation; a
# duplicated batch that leaked through as extra rows or re-won the
# order tie-break would hash-mismatch.
#
# Scale: two bucket-pruned merges on a mutable copy of the cached
# fixture; the proof is the snapshot rollup, not a row dump.
# ---------------------------------------------------------------------------
@register(
    "l30_merge_idempotency",
    oracle="""
    WITH updated AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END
               AS value,
             CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS bumped
      FROM events
    ), latest AS (
      SELECT user_id, us, event_id, value, bumped,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY us DESC, event_id DESC) AS rn
      FROM updated
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(event_id) AS BIGINT) AS sum_last_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(sum(bumped) AS BIGINT) AS n_bumped_last
    FROM latest WHERE rn = 1
    """,
)
def l30_merge_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = _tmpdir("l30_idem_")
    table = _build_logtable(spark, sf_dir, work, mutable=True)
    batch = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            "user_id",
            "event_type",
            (F.col("value") + 1.0).alias("value"),
        )
    )
    table.merge(batch, work)
    table.merge(batch, work)  # redelivery: must be a no-op state-wise
    snap = table.snapshot().select(
        "user_id",
        "event_id",
        "value",
        F.expr(
            "cast(case when event_id % 5 = 0 then 1 else 0 end as bigint)"
        ).alias("bumped"),
    )
    return snap.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("event_id").cast("long").alias("sum_last_id"),
        F.sum(F.expr("cast(floor(value * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("sum_cents"),
        F.sum("bumped").cast("long").alias("n_bumped_last"),
    )
