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


# ---------------------------------------------------------------------------
# D3 — column-level snapshot drift: u4 answers "WHICH rows changed
# between snapshots"; data-diff tooling also needs "WHICH COLUMNS
# drifted, how much". Two deterministic customer snapshots (v1
# perturbs acctbal for custkey%10=3, mktsegment for %10=4, drops
# %50=7) are full-outer-joined on the PK and every compared column
# contributes added/removed/changed counts via one unpivoted
# aggregate. One PK-keyed shuffle; the per-column comparison is
# map-side; output is |columns| rows regardless of table size —
# the drift report a 100 TB reconciliation job ships nightly.
# ---------------------------------------------------------------------------
@register(
    "d3_column_drift",
    oracle="""
    WITH v0 AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    ), v1 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 10 = 4 THEN 'DRIFTED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 50 <> 7
    ), j AS (
      SELECT v0.c_custkey AS k0, v1.c_custkey AS k1,
             v0.c_acctbal AS a0, v1.c_acctbal AS a1,
             v0.c_mktsegment AS m0, v1.c_mktsegment AS m1
      FROM v0 FULL OUTER JOIN v1 ON v0.c_custkey = v1.c_custkey
    )
    SELECT col,
           count(CASE WHEN k0 IS NULL THEN 1 END) AS n_added,
           count(CASE WHEN k1 IS NULL THEN 1 END) AS n_removed,
           count(CASE WHEN k0 IS NOT NULL AND k1 IS NOT NULL
                       AND changed THEN 1 END) AS n_changed
    FROM (
      SELECT k0, k1, 'c_acctbal' AS col,
             a0 IS DISTINCT FROM a1 AS changed FROM j
      UNION ALL
      SELECT k0, k1, 'c_mktsegment',
             m0 IS DISTINCT FROM m1 FROM j
    ) GROUP BY col
    """,
)
def d3_column_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    v1 = base.filter(F.col("c_custkey") % 50 != 7).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 3, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 10 == 4, F.lit("DRIFTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    j = base.alias("v0").join(
        v1.alias("v1"), F.col("v0.c_custkey") == F.col("v1.c_custkey"), "full"
    ).select(
        F.col("v0.c_custkey").alias("k0"),
        F.col("v1.c_custkey").alias("k1"),
        F.col("v0.c_acctbal").alias("a0"),
        F.col("v1.c_acctbal").alias("a1"),
        F.col("v0.c_mktsegment").alias("m0"),
        F.col("v1.c_mktsegment").alias("m1"),
    )
    per_col = j.select(
        "k0",
        "k1",
        F.lit("c_acctbal").alias("col"),
        (~F.col("a0").eqNullSafe(F.col("a1"))).alias("changed"),
    ).unionByName(
        j.select(
            "k0",
            "k1",
            F.lit("c_mktsegment").alias("col"),
            (~F.col("m0").eqNullSafe(F.col("m1"))).alias("changed"),
        )
    )
    return per_col.groupBy("col").agg(
        F.count(F.when(F.col("k0").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("k1").isNull(), 1)).alias("n_removed"),
        F.count(
            F.when(
                F.col("k0").isNotNull()
                & F.col("k1").isNotNull()
                & F.col("changed"),
                1,
            )
        ).alias("n_changed"),
    )


# ---------------------------------------------------------------------------
# U6 — union by NAME with missing columns: the schema-evolution
# union (two vintages of a feed share some columns; the older one
# lacks the new fields) — Spark's unionByName(allowMissingColumns=
# True) vs positional UNION, which would silently misalign. Missing
# fields must surface as NULLs, proven by per-side null counts over
# the combined set. DuckDB spells the identical semantics UNION ALL
# BY NAME.
#
# Scale: unions are metadata-only (no shuffle); the rollup keys on
# the 2-value side marker.
# ---------------------------------------------------------------------------
@register(
    "u6_union_by_name",
    oracle="""
    WITH u AS (
      SELECT 'v1' AS side, c_custkey, c_name,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL BY NAME
      SELECT 'v2' AS side, c_custkey, c_mktsegment
      FROM customer WHERE c_custkey % 2 = 1
    )
    SELECT side,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(c_name) AS BIGINT) AS n_name_null,
           CAST(count(*) - count(c_mktsegment) AS BIGINT) AS n_seg_null,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS sum_cents
    FROM u GROUP BY side
    """,
)
def u6_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    v1 = customer.filter(F.col("c_custkey") % 2 == 0).select(
        F.lit("v1").alias("side"),
        "c_custkey",
        "c_name",
        F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    v2 = customer.filter(F.col("c_custkey") % 2 == 1).select(
        F.lit("v2").alias("side"), "c_custkey", "c_mktsegment"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("side").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("c_name")).cast("long").alias(
            "n_name_null"
        ),
        (F.count(F.lit(1)) - F.count("c_mktsegment")).cast("long").alias(
            "n_seg_null"
        ),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# U7 — INTERSECT ALL: bag-semantics intersection (per-value
# multiplicity = min of the two sides), the set-op family's last
# member (u2 is distinct-INTERSECT, u5 is EXCEPT ALL). Spark lowers
# intersectAll to a counted left-semi shape, not a distinct — the
# multiplicities prove it.
#
# Scale: one shuffle per side on the compared columns, like every
# set op; the rollup certifies the min-multiplicity contract
# without emitting duplicate rows.
# ---------------------------------------------------------------------------
@register(
    "u7_intersect_all",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderkey % 3 <> 0
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    ) GROUP BY o_orderpriority
    """,
)
def u7_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderpriority")
    b = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderpriority")
    return (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# U8 — snapshot diff with COLUMN provenance: u4 says which rows
# changed; this says which COLUMNS changed in each row, as a bitmask
# (bit 0 status, bit 1 price, bit 2 priority) plus a readable list —
# the payload a CDC consumer needs to apply partial updates. The v2
# snapshot is synthesized with disjoint per-column edits (status
# flipped where key%5=0, price bumped where key%7=0, priority
# rewritten where key%11=0), so single- and multi-column changes both
# occur.
#
# Scale: one co-partitioned self-join on the key; the mask is
# map-side arithmetic; unchanged rows are filtered before the join
# output widens.
# ---------------------------------------------------------------------------
@register(
    "u8_diff_column_provenance",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderpriority AS pri
      FROM orders
    ), v2 AS (
      SELECT k,
             CASE WHEN k % 5 = 0 THEN 'X' ELSE st END AS st,
             CASE WHEN k % 7 = 0 THEN cents + 500 ELSE cents END AS cents,
             CASE WHEN k % 11 = 0 THEN '9-NONE' ELSE pri END AS pri
      FROM v1
    )
    SELECT a.k AS o_orderkey,
           CAST(CASE WHEN a.st <> b.st THEN 1 ELSE 0 END
              + CASE WHEN a.cents <> b.cents THEN 2 ELSE 0 END
              + CASE WHEN a.pri <> b.pri THEN 4 ELSE 0 END AS BIGINT)
             AS changed_mask,
           concat_ws(',',
             CASE WHEN a.st <> b.st THEN 'status' END,
             CASE WHEN a.cents <> b.cents THEN 'price' END,
             CASE WHEN a.pri <> b.pri THEN 'priority' END) AS changed_cols
    FROM v1 a JOIN v2 b ON a.k = b.k
    WHERE a.st <> b.st OR a.cents <> b.cents OR a.pri <> b.pri
    """,
)
def u8_diff_column_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.col("o_orderpriority").alias("pri"),
    )
    v2 = v1.select(
        "k",
        F.expr("case when k % 5 = 0 then 'X' else st end").alias("st2"),
        F.expr("case when k % 7 = 0 then cents + 500 else cents end").alias(
            "cents2"
        ),
        F.expr("case when k % 11 = 0 then '9-NONE' else pri end").alias(
            "pri2"
        ),
    )
    j = v1.join(v2, "k").filter(
        (F.col("st") != F.col("st2"))
        | (F.col("cents") != F.col("cents2"))
        | (F.col("pri") != F.col("pri2"))
    )
    return j.select(
        F.col("k").alias("o_orderkey"),
        F.expr(
            "cast(case when st <> st2 then 1 else 0 end"
            " + case when cents <> cents2 then 2 else 0 end"
            " + case when pri <> pri2 then 4 else 0 end as bigint)"
        ).alias("changed_mask"),
        F.concat_ws(
            ",",
            F.expr("case when st <> st2 then 'status' end"),
            F.expr("case when cents <> cents2 then 'price' end"),
            F.expr("case when pri <> pri2 then 'priority' end"),
        ).alias("changed_cols"),
    )
