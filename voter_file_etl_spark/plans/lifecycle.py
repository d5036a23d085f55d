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

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t


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
# L6 — small-file compaction: the table-maintenance operation every
# 100 TB lake needs (streaming sinks and per-batch loads accumulate
# thousands of KB-sized files per partition; scan throughput dies on
# file-open overhead and footer reads). A fragmented copy of events
# is written (40 round-robin writer tasks × every partition -> 40
# files per partition), then compacted by repartitioning ON the
# partition column so each partition's rows land in exactly one
# writer task -> exactly 1 file per partition. The registered output
# measures REAL file counts from the committed directories, and the
# oracle pins the expected layout (40 -> 1) plus exact row
# preservation — a compaction that loses rows or leaves fragments
# hash-mismatches.
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
    oracle=f"""
    SELECT event_type,
           {_L6_SMALL_TASKS} AS n_files_before,
           1 AS n_files_after,
           count(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
)
def l6_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    base = tempfile.mkdtemp(prefix="l6_compact_", dir=os.environ.get("TMPDIR", "/tmp"))
    small = os.path.join(base, "small")
    compact = os.path.join(base, "compact")

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    # Fragmented layout: 40 round-robin tasks each hold rows of every
    # event_type, so every partition directory gets 40 small files.
    ev.repartition(_L6_SMALL_TASKS).write.partitionBy("event_type").parquet(small)

    frag = spark.read.parquet(small)
    n_types = frag.select("event_type").distinct().count()  # tiny collect
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
        "event_type", "n_files_before", "n_files_after", "n_rows"
    )
