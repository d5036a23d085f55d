"""Set operations (SURVEY.md §2.9).

The engine's replacement for the reference's 51 per-state tables is a
single dataset, so union-by-name across state slices is the bread-
and-butter op; intersect/except give the replace-older-file semantics
(download.ts:49-57) a relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t


@register(
    "u1_union",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE")
    bld = customer.filter(F.col("c_mktsegment") == "BUILDING")
    return auto.select("c_custkey", "c_mktsegment").unionByName(
        bld.select("c_custkey", "c_mktsegment")
    )


@register(
    "u2_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


@register(
    "u3_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer").select("c_custkey")
    orderers = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.subtract(orderers)  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# U4 — snapshot diff (CDC shape): the reference replaces a state's
# live table wholesale on each load (blue/green swap, load.ts:256-308);
# the diff between consecutive snapshots — added / removed / changed
# keys — is what an incremental consumer actually wants. Modeled as a
# full outer join on the PK with change classification; one shuffle
# on the key, partial-agg'd counts.
# ---------------------------------------------------------------------------
@register(
    "u4_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderstatus <> new.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS change,
           count(*) AS n
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    GROUP BY 1
    """,
)
def u4_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_orderstatus").alias("v_old")
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(F.col("o_orderkey") % 5 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("v_new"),
    )
    change = (
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("v_old") != F.col("v_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, old.k_old == new.k_new, "full_outer")
        .select(change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# U5 — EXCEPT ALL: multiset difference (each occurrence counts —
# removing one load's rows from a snapshot must subtract per-copy,
# not per-distinct-value, or re-loaded duplicates silently survive).
# Spark's exceptAll implements bag semantics via per-value counts;
# the output aggregates to (value, count) so the multiset result is
# order-free and hashable.
# ---------------------------------------------------------------------------
@register(
    "u5_except_all",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM (
      SELECT o_orderpriority FROM orders
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    ) GROUP BY o_orderpriority
    """,
)
def u5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.select("o_orderpriority")
    b = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderpriority")
    return a.exceptAll(b).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
