"""Full-schema sf1.0 testdata generator (r8).

[standing-gate] — per-round battery (sf1.0/sf0.5 replays).

The driver generates sf{0.001,0.01,0.1}; the family scale probes
(scale_probe/multimodal_probe/stream_scale_probe) generate documents/
embeddings/events at 10x. This tool completes the set: ALL TEN tables
at sf1.0 (10x the bench scale — 6M-row lineitem, 1.5M orders, 1M
events, 50k docs, 20k vectors), schema-identical to the driver's
parquet (column names, physical types, single FILE per table so both
`spark.read.parquet` and DuckDB file views work, and the streaming
sources' `pathGlobFilter=events.parquet` contract holds).

Values are hash-derived from the row id (seed-free, shuffle-free,
executor-parallel at any scale) and mimic the driver's observed
domains: contiguous 0-based keys, Customer#%09d / Supplier#%09d
names, Brand#1..25, the 5 market segments / order priorities / event
types, order dates in 1995..2001 with shipdate = orderdate + 0..94
days, l_linenumber 1..7 WITH duplicates (the driver's data has
duplicate (l_orderkey, l_linenumber) pairs — dedup keys rely on
them existing). region/nation are copied verbatim from sf0.1 (fixed
dimensions; keys assume exactly 25 nations / 5 regions).

Correctness use: driver_sim compares Spark vs DuckDB on the SAME
files, so distribution differences vs the driver's generator do not
weaken the parity check — only domain plausibility matters, which is
what the mimicry preserves.

Usage: python tools/sf_generate.py [target_dir] [scale]
(defaults: /tmp/sf1.0, scale 1.0; `tools/sf_generate.py /tmp/sf0.5
0.5` builds the d2 carve-out set — VERDICT r9 #4)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUSES = ["F", "O", "P"]
_RETURNFLAGS = ["A", "N", "R"]
_LINESTATUSES = ["F", "O"]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_ADJ = "large hot blue old new small red green dim bold".split()
_NOUN = "ring bolt plate tube rod cap gear pin cam hub".split()
_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]


def _pick(options, *hash_cols):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, F.pmod(F.xxhash64(*hash_cols), F.lit(len(options))).cast("int") + 1)


def _u(lo: float, hi: float, *hash_cols):
    """Hash-uniform double in [lo, hi], 2 decimal places."""
    frac = F.pmod(F.xxhash64(*hash_cols), F.lit(1_000_000)) / 1_000_000.0
    return F.round(F.lit(lo) + frac * (hi - lo), 2)


# Row groups per table: a repartition(1) Spark write makes ONE row
# group per file, and DuckDB parallelizes scans BY ROW GROUP — the
# r9 replay found scalar-heavy oracles (simhash, levenshtein blocks)
# pinned to a single thread for 10+ minutes at sf1.0. Rewriting with
# bounded row groups is a pure layout change (identical rows/schema)
# that lets DuckDB use every core; Spark splits by byte range and is
# indifferent either way.
_ROW_GROUP_ROWS = {
    "documents": 2048,
    "embeddings": 2048,
    "customer": 16384,
    "supplier": 4096,
    "part": 16384,
    "orders": 65536,
    "lineitem": 262144,
    "events": 65536,
}


def _regroup(path: str, rows_per_group: int) -> None:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    pq.write_table(tbl, path, row_group_size=rows_per_group, compression="snappy")


def _write_single(df, out_dir: str, name: str) -> None:
    """One parquet FILE named <name>.parquet (the driver's layout),
    re-chunked to parallelizable row groups."""
    stage = os.path.join(out_dir, f"_stage_{name}")
    df.repartition(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in sorted(os.listdir(stage)) if p.endswith(".parquet"))
    dest = os.path.join(out_dir, f"{name}.parquet")
    os.replace(os.path.join(stage, part), dest)
    shutil.rmtree(stage)
    if name in _ROW_GROUP_ROWS:
        _regroup(dest, _ROW_GROUP_ROWS[name])


def generate(spark, out_dir: str, scale: float = 1.0) -> None:
    # The driver's files store TIMESTAMP(MICROS); Spark 4 defaults to
    # nanos for NTZ — pin micros so sf1.0 exercises the same physical
    # type every consumer (and normalize_events_ts) sees at sf0.1.
    #
    # ``scale`` multiplies the TPC-H-ish row counts (sf0.5 = half of
    # sf1.0; used for the d2 battery carve-out, VERDICT r9 #4).
    # region/nation are fixed dimensions and documents/embeddings come
    # from scale_probe at its own fixed probe size regardless of
    # ``scale`` — the carve-out consumers only read the scaled facts.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    n_customer = max(1, int(N_CUSTOMER * scale))
    n_supplier = max(1, int(N_SUPPLIER * scale))
    n_part = max(1, int(N_PART * scale))
    n_orders = max(1, int(N_ORDERS * scale))
    n_events = max(1, int(N_EVENTS * scale))
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )

    ids = lambda n: spark.range(n).repartition(32)  # noqa: E731

    customer = ids(n_customer).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(25)).cast("int").alias("c_nationkey"),
        _u(-999.99, 9999.99, "id", F.lit(2)).alias("c_acctbal"),
        _pick(_SEGMENTS, "id", F.lit(3)).alias("c_mktsegment"),
    )
    _write_single(customer, out_dir, "customer")

    supplier = ids(n_supplier).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)).cast("int").alias("s_nationkey"),
        _u(-999.99, 9999.99, "id", F.lit(5)).alias("s_acctbal"),
    )
    _write_single(supplier, out_dir, "supplier")

    part = ids(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick(_ADJ, "id", F.lit(6)), _pick(_NOUN, "id", F.lit(7))).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(25)) + 1).cast("string")).alias("p_brand"),
        _pick(_TYPES, "id", F.lit(9)).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(10)), F.lit(50)) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + F.pmod(F.col("id"), F.lit(1000)) / 10.0).alias("p_retailprice"),
    )
    _write_single(part, out_dir, "part")

    date0 = F.to_timestamp(F.lit("1995-01-01"))
    orders = ids(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_customer)).alias("o_custkey"),
        _pick(_STATUSES, "id", F.lit(12)).alias("o_orderstatus"),
        _u(1000.0, 500000.0, "id", F.lit(13)).alias("o_totalprice"),
        (date0 + F.make_dt_interval(F.pmod(F.xxhash64("id", F.lit(14)), F.lit(2405)))).cast("timestamp_ntz").alias("o_orderdate"),
        _pick(_PRIORITIES, "id", F.lit(15)).alias("o_orderpriority"),
    )
    _write_single(orders, out_dir, "orders")

    li = (
        ids(n_orders)
        .select(
            F.col("id").alias("l_orderkey"),
            (date0 + F.make_dt_interval(F.pmod(F.xxhash64("id", F.lit(14)), F.lit(2405)))).alias("_odate"),
            F.explode(
                F.sequence(F.lit(1), F.pmod(F.xxhash64("id", F.lit(16)), F.lit(7)) + 1)
            ).alias("i"),
        )
        .select(
            "l_orderkey",
            F.pmod(F.xxhash64("l_orderkey", "i", F.lit(17)), F.lit(n_part)).alias("l_partkey"),
            F.pmod(F.xxhash64("l_orderkey", "i", F.lit(18)), F.lit(n_supplier)).alias("l_suppkey"),
            (F.pmod(F.xxhash64("l_orderkey", "i", F.lit(19)), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
            (F.pmod(F.xxhash64("l_orderkey", "i", F.lit(20)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
            _u(900.0, 105000.0, "l_orderkey", "i", F.lit(21)).alias("l_extendedprice"),
            (F.pmod(F.xxhash64("l_orderkey", "i", F.lit(22)), F.lit(11)) / 100.0).alias("l_discount"),
            (F.pmod(F.xxhash64("l_orderkey", "i", F.lit(23)), F.lit(9)) / 100.0).alias("l_tax"),
            _pick(_RETURNFLAGS, "l_orderkey", "i", F.lit(24)).alias("l_returnflag"),
            _pick(_LINESTATUSES, "l_orderkey", "i", F.lit(25)).alias("l_linestatus"),
            (F.col("_odate") + F.make_dt_interval(F.pmod(F.xxhash64("l_orderkey", "i", F.lit(26)), F.lit(95)) + 1)).cast("timestamp_ntz").alias("l_shipdate"),
        )
    )
    _write_single(li, out_dir, "lineitem")

    ts0 = F.to_timestamp(F.lit("2024-01-01"))
    events = ids(n_events).select(
        F.col("id").alias("event_id"),
        (
            ts0
            + F.make_dt_interval(
                F.lit(0),
                F.lit(0),
                F.lit(0),
                F.pmod(F.xxhash64("id", F.lit(27)), F.lit(30 * 86_400 * 1_000_000)) / 1_000_000.0,
            )
        ).cast("timestamp_ntz").alias("ts"),
        # max(1, ...): at scales where n_customer < 10 the row-count
        # guards hold but this divisor would be 0 — pmod by 0 yields
        # NULL/degenerate user_ids (ADVICE r10 #3).
        F.pmod(
            F.xxhash64("id", F.lit(28)), F.lit(max(1, n_customer // 10))
        ).alias("user_id"),
        _pick(_EVENT_TYPES, "id", F.lit(29)).alias("event_type"),
        _u(0.0, 560.21, "id", F.lit(30)).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit(31)), F.lit(100)).cast("string"), F.lit("}")).alias("props"),
    )
    _write_single(events, out_dir, "events")

    # documents (50k) + embeddings (20k): the probe generator already
    # mimics the driver's schemas and vocabulary exactly — but writes
    # parquet DIRECTORIES; collapse each to the driver's single-FILE
    # layout (DuckDB's file views cannot read a directory).
    from tools import scale_probe

    scale_probe.generate(spark, out_dir)
    for name in ("documents", "embeddings"):
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isdir(path):
            df = spark.read.parquet(path)
            if name == "documents":  # driver stores n_chars as int64
                df = df.withColumn("n_chars", F.col("n_chars").cast("long"))
            tmp = os.path.join(out_dir, f"_one_{name}")
            df.repartition(1).write.mode("overwrite").parquet(tmp)
            part = next(p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet"))
            shutil.rmtree(path)
            os.replace(os.path.join(tmp, part), path)
            shutil.rmtree(tmp)
        # Outside the isdir branch (ADVICE r9): the row-group split is
        # a property of the FILE, not of how scale_probe laid it out —
        # a single-file write must still be re-chunked for DuckDB's
        # per-row-group scan parallelism. Guarded like _write_single.
        if name in _ROW_GROUP_ROWS:
            _regroup(path, _ROW_GROUP_ROWS[name])


def main() -> None:
    from voter_file_etl_spark.session import get_spark

    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    spark = get_spark("sf_generate")
    generate(spark, target, scale)
    for f in sorted(os.listdir(target)):
        p = os.path.join(target, f)
        if os.path.isfile(p):
            print(f"{f}: {os.path.getsize(p):,} bytes")


if __name__ == "__main__":
    main()
