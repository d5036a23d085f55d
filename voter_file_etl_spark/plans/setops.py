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
