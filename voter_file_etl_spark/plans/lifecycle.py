"""Table lifecycle (SURVEY.md §2.13).

The reference publishes atomically by renaming Voter{ST}Temp over the
live table inside a transaction (load.ts:256-308). Spark-first
equivalent: mode("overwrite") through the file-commit protocol — the
new data becomes visible only at commit, readers of the old snapshot
are unaffected, and a failed job leaves the previous table intact.
The operators/etl.py module exposes the full publish routine; this
query verifies the read-back contract.
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
