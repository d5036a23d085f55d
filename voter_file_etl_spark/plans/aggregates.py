"""Aggregations (SURVEY.md §2.5).

The reference's aggregate surface is count-reconciliation
(load.ts:235-254); the loaded tables' index workload implies
group-by-count on demographics, household aggregation by FamilyID,
and turnout rollups (prisma/Voter.prisma:589-602 — see SURVEY.md
§2.5). All are partial+final hash aggregates in Spark (map-side
combine before the exchange), which is exactly the shape that holds
at 100 TB: the shuffle carries one row per (group, partition), not
per input row.

Engine-boundary float policy: sums run in DECIMAL (exact, so shuffle
order can't perturb the result) and cast to DOUBLE only at the end;
averages divide two exact values in double space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t


def _dec(col: str, prec: str = "18,2"):
    return F.col(col).cast(f"decimal({prec})")


# ---------------------------------------------------------------------------
# A2 — count reconciliation. Reference: load.ts:240-254 (DB count vs
# manifest line count, tolerance 1000). Port: scan count vs distinct
# key count, tolerance check in-plan. On a cluster this is two
# map-side-combined counts and a 1-row crossJoin — no data movement.
# ---------------------------------------------------------------------------
@register(
    "a2_reconcile",
    oracle="""
    SELECT a.cnt_rows, b.cnt_keys,
           (a.cnt_rows - b.cnt_keys) <= 1000 AS within_tolerance
    FROM (SELECT count(*) AS cnt_rows FROM lineitem) a,
         (SELECT count(*) AS cnt_keys
          FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) b
    """,
)
def a2_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rows = li.agg(F.count(F.lit(1)).alias("cnt_rows"))
    keys = (
        li.select("l_orderkey", "l_linenumber")
        .distinct()
        .agg(F.count(F.lit(1)).alias("cnt_keys"))
    )
    return rows.crossJoin(keys).select(
        "cnt_rows",
        "cnt_keys",
        ((F.col("cnt_rows") - F.col("cnt_keys")) <= 1000).alias("within_tolerance"),
    )


# ---------------------------------------------------------------------------
# A4 — group-by-count with layered measures (TPC-H Q1 shape; the
# party/age/gender group-by-count implied by Voter.prisma:589-592).
# ---------------------------------------------------------------------------
@register(
    "a4_groupby_count",
    oracle="""
    WITH q AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_bp,
             CAST(floor(l_tax * 10000 + 0.5) AS BIGINT) AS tax_bp
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ), s AS (
      SELECT l_returnflag, l_linestatus,
             count(*) AS count_order,
             sum(qty_c) AS sq,
             sum(cents) AS sb,
             sum(cents * (10000 - disc_bp)) AS sd,
             sum(cents * (10000 - disc_bp) * (10000 + tax_bp)) AS sc
      FROM q GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, count_order,
           CAST(CAST(sq AS BIGINT) AS DOUBLE) / 100 AS sum_qty,
           CAST(CAST(sb AS BIGINT) AS DOUBLE) / 100 AS sum_base_price,
           CAST(CAST(sd AS BIGINT) AS DOUBLE) / 1000000 AS sum_disc_price,
           CAST(CAST((sc + 5000) // 10000 AS BIGINT) AS DOUBLE) / 1000000
               AS sum_charge,
           (CAST(CAST(sq AS BIGINT) AS DOUBLE) / 100) / count_order AS avg_qty
    FROM s
    """,
)
def a4_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-integer quantization end to end (the w21/a83 discipline),
    # r8: the previous form summed exact DECIMALs but emitted them via
    # a decimal(38,6)->double cast, which is only cross-engine-exact
    # while the numerator < 2^53 — the sf1.0 replay caught sum_charge
    # (~2.8e16 micro-units) converting 1 ulp apart. Every money column
    # now flows floor(x*scale + 0.5) per row (exact: inputs are 2/4dp
    # doubles) -> decimal(38,0)-exact sum -> portable integer DIV
    # half-up rounding to micro-units -> ONE int64->double cast (the
    # only conversion both engines correctly round by construction)
    # and an identical IEEE division. Deterministic up to the int64
    # micro-unit ceiling (~9.2e18 micro = $9.2T per group; past that,
    # rescale the DIV to cents — the structure is the invariant).
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    qty_c = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_bp = F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
    tax_bp = F.floor(F.col("l_tax") * 10000 + F.lit(0.5)).cast("long")
    big = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            big(qty_c).alias("_sq"),
            big(cents).alias("_sb"),
            big(cents * (10000 - disc_bp)).alias("_sd"),
            big(cents * (10000 - disc_bp) * (10000 + tax_bp)).alias("_sc"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "count_order",
            (F.expr("CAST(_sq DIV 1 AS DOUBLE)") / 100).alias("sum_qty"),
            (F.expr("CAST(_sb DIV 1 AS DOUBLE)") / 100).alias("sum_base_price"),
            (F.expr("CAST(_sd DIV 1 AS DOUBLE)") / 1000000).alias("sum_disc_price"),
            (F.expr("CAST((_sc + 5000) DIV 10000 AS DOUBLE)") / 1000000).alias(
                "sum_charge"
            ),
            (
                (F.expr("CAST(_sq DIV 1 AS DOUBLE)") / 100) / F.col("count_order")
            ).alias("avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# A5 — household aggregation. Reference: Mailing_Families_FamilyID
# grouping (prisma/Voter.prisma:54-55,597); HHCount is the
# precomputed version our engine derives. orders.o_custkey plays the
# FamilyID role on the star schema.
# ---------------------------------------------------------------------------
@register(
    "a5_household_agg",
    oracle="""
    SELECT o_custkey AS family_id,
           count(*) AS hh_count,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(min(o_orderdate) AS DATE) AS first_order
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 2
    """,
)
def a5_household_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("family_id"))
        .agg(
            F.count(F.lit(1)).alias("hh_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            F.min("o_orderdate").cast("date").alias("first_order"),
        )
        .filter(F.col("hh_count") >= 2)
    )


# ---------------------------------------------------------------------------
# A6 — multiple exact distinct counts per group. The naive
# `agg(countDistinct, countDistinct, countDistinct)` plans as an
# Expand node that multiplies every input row by the number of
# distinct aggregates BEFORE the shuffle — the classic 100 TB
# expand-blowup. Instead: one dedup-then-count aggregation per key
# column (partial HashAggregate dedups map-side, so each shuffle
# carries only the DISTINCT (flag, key) pairs), joined on the tiny
# group key. Three pruned 2-column scans replace one 4-column scan —
# columnar scans are cheap; shuffled rows are not. a11 (HLL
# approx_count_distinct) remains the single-pass path when estimates
# suffice. Gate: tests/test_plan_quality.py asserts this plan has no
# Expand node.
# ---------------------------------------------------------------------------
@register(
    "a6_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def distinct_count(col: str, alias: str) -> DataFrame:
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    return (
        distinct_count("l_partkey", "n_parts")
        .join(distinct_count("l_suppkey", "n_supps"), "l_returnflag")
        .join(distinct_count("l_orderkey", "n_orders"), "l_returnflag")
    )


# ---------------------------------------------------------------------------
# A7 — hierarchy rollup (region > nation, standing in for the
# state > county > district hierarchy of prisma/Voter.prisma:103-126).
# ---------------------------------------------------------------------------
@register(
    "a7_rollup",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def a7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# A13 — max_by / min_by (argmax aggregates): "which order was the
# customer's most expensive" without a window + filter round-trip.
# The ordering value carries a unique tie-break (price scaled exact-
# decimal + key) so both engines pick the same row.
# ---------------------------------------------------------------------------
@register(
    "a13_argmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) * 10000000 + o_orderkey)
             AS priciest_order,
           arg_min(o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) * 10000000 + o_orderkey)
             AS cheapest_order,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def a13_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ordv = F.col("o_totalprice").cast("decimal(18,2)") * 10000000 + F.col("o_orderkey")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ordv).alias("priciest_order"),
        F.min_by("o_orderkey", ordv).alias("cheapest_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A14 — variance / stddev / covariance / correlation from EXACT
# decimal power sums. Built-in stddev/corr merge float partials in
# partition order — fine statistically, but not bit-stable across
# cluster sizes. Summing x, x², xy in exact DECIMAL makes the moment
# computation a pure function of the data (any DOP, any engine), and
# only the final normalize/sqrt runs in float, rounded at the
# boundary. sum(x²) for 6M rows of (18,2) values fits decimal(38,4)
# with ~15 digits to spare.
# ---------------------------------------------------------------------------
@register(
    "a14_stats_exact",
    oracle=f"""
    SELECT l_returnflag,
           {half_up_sql("(CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
                        " / (n - 1)", 4)} AS var_qty,
           {half_up_sql("sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
                        " / (n - 1))", 4)} AS std_qty,
           {half_up_sql("(CAST(sxy AS DOUBLE) - CAST(s AS DOUBLE) * CAST(sp AS DOUBLE) / n)"
                        " / (n - 1)", 4)} AS cov_qty_price
    FROM (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
             sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sq,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
             sum(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def a14_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s"),
        F.sum(q * q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(q * p).alias("sxy"),
    )
    var = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    cov = (
        F.col("sxy").cast("double")
        - F.col("s").cast("double") * F.col("sp").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    # half_up, not F.round: x34's half-up-vs-half-even tie class
    # (|var|*1e4 « 2^53, well inside the idiom's exactness bound).
    return sums.select(
        "l_returnflag",
        half_up(var, 4).alias("var_qty"),
        half_up(F.sqrt(var), 4).alias("std_qty"),
        half_up(cov, 4).alias("cov_qty_price"),
    )


# ---------------------------------------------------------------------------
# A15 — exact per-group mode (most frequent value, lexicographic
# tiebreak): two-level aggregate — count per (group, value), then
# argmax via one row_number window over the tiny (group, value)
# count table. The shuffles are keyed on (group, value) then group;
# no Expand, no collect.
# ---------------------------------------------------------------------------
@register(
    "a15_mode",
    oracle="""
    SELECT o_orderstatus, priority_mode, n_mode FROM (
      SELECT o_orderstatus, o_orderpriority AS priority_mode,
             count(*) AS n_mode,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def a15_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_mode")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("n_mode"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("priority_mode"),
            "n_mode",
        )
    )


# ---------------------------------------------------------------------------
# A16 — weighted median: the 50%-of-total-WEIGHT order statistic
# (median price weighted by quantity — "the price at which half the
# VOLUME trades", not half the rows). Expressed as one cumulative-
# weight window per group + a conditional min: the first price whose
# running weight reaches half the group total. All weight arithmetic
# stays in exact DECIMAL with a total order (price, orderkey,
# linenumber), so the picked row — and therefore the double output —
# is identical across engines and cluster sizes.
#
# Scale: one shuffle keyed on the group, per-partition sort, running
# sum — the same WindowExec shape as w3; no second pass, no collect.
# ---------------------------------------------------------------------------
@register(
    "a16_weighted_median",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_quantity AS DECIMAL(18,2)) AS wgt,
             l_orderkey, l_linenumber
      FROM lineitem
    ), cum AS (
      SELECT l_returnflag, price,
             sum(wgt) OVER (PARTITION BY l_returnflag
                            ORDER BY price, l_orderkey, l_linenumber) AS cw,
             sum(wgt) OVER (PARTITION BY l_returnflag) AS tw
      FROM base
    )
    SELECT l_returnflag,
           CAST(min(CASE WHEN cw * 2 >= tw THEN price END) AS DOUBLE)
             AS weighted_median,
           CAST(max(tw) AS DOUBLE) AS total_weight
    FROM cum GROUP BY l_returnflag
    """,
)
def a16_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("decimal(18,2)").alias("wgt"),
        "l_orderkey",
        "l_linenumber",
    )
    # r13 NEGATIVE RESULT, kept as the original one-exchange window:
    # a two-level pre-aggregate per (flag, price) before the window
    # (the a70 discipline) was built and measured — but extendedprice
    # is near-unique per row (distinct (flag, price) = 594,330 of
    # 600,000 rows at sf0.1, reduction 1.01x), so the pre-agg reduced
    # nothing and just added a second full Exchange (bench read
    # 1.17 -> 2.37 s). The window-over-rows shape stays; at a scale
    # where the 3-partition sort became the wall, the right fix is
    # the a70 bucketed two-level PREFIX SUM (range-bucket the prices,
    # per-bucket cumsum + broadcast bucket offsets), not a pre-agg
    # keyed on a near-unique column.
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "price",
        F.sum("wgt").over(wcum).alias("cw"),
        F.sum("wgt").over(wall).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price")))
        .cast("double").alias("weighted_median"),
        F.max("tw").cast("double").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# A17 — exact-sum correlation / covariance: Pearson corr(quantity,
# price) per return flag, computed from the five exact DECIMAL power
# sums (n, Σx, Σy, Σxy, Σx², Σy²) rather than the engine's native
# corr() — native implementations use different one-pass update
# formulas whose float error differs by engine, while power sums in
# DECIMAL are exact in any aggregation order. Only the final formula
# runs in double (correctly-rounded ops in identical order on both
# sides, then round to 6dp).
#
# Scale: one partial+final agg — the five sums travel as one row per
# (group, map partition); no second pass, no window.
# ---------------------------------------------------------------------------
@register(
    "a17_corr_covar",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {half_up_sql("(CAST(n AS DOUBLE) * sxy - sx * sy)"
                        " / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
                        " * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))", 6)}
             AS corr_qp,
           {half_up_sql("(sxy - sx * sy / CAST(n AS DOUBLE))"
                        " / CAST(n AS DOUBLE)", 6)}
             AS covar_pop_qp
    FROM s
    """,
)
def a17_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    prc = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).cast("double").alias("sx"),
        F.sum(prc).cast("double").alias("sy"),
        F.sum(qty * qty).cast("double").alias("sxx"),
        F.sum(prc * prc).cast("double").alias("syy"),
        F.sum(qty * prc).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    # half_up, not F.round: x34's half-up-vs-half-even tie class
    # (|corr| ≤ 1 and |covar| « 2^53/1e6, inside the idiom's bound).
    corr = half_up(
        (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
        6,
    )
    covar = half_up(
        (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / nd, 6
    )
    return s.select(
        "l_returnflag", "n", corr.alias("corr_qp"), covar.alias("covar_pop_qp")
    )


# ---------------------------------------------------------------------------
# A18 — fixed-width histogram with empty-bin densification: bin
# counts over account balance INCLUDING zero-count bins (generated
# bin spine LEFT JOIN counts) — the chart-ready histogram every BI
# layer wants, where a missing bin must read 0, not vanish. Bin ids
# are integer floor-division of DECIMAL cents, so bin edges are
# exact — no float boundary can put a row in different bins on
# different engines.
#
# Scale: one partial+final agg for the counts; the spine is
# sequence() over the fixed bin range (a few hundred rows) —
# broadcast, never a shuffle.
# ---------------------------------------------------------------------------
_HIST_WIDTH = 100  # dollars per bin


@register(
    "a18_histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(floor(min(CAST(c_acctbal AS DECIMAL(18,2)) / {_HIST_WIDTH}))
                  AS BIGINT) AS lo,
             CAST(floor(max(CAST(c_acctbal AS DECIMAL(18,2)) / {_HIST_WIDTH}))
                  AS BIGINT) AS hi
      FROM customer
    ), spine AS (
      SELECT unnest(range(lo, hi + 1)) AS bin FROM bounds
    ), counts AS (
      SELECT CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) / {_HIST_WIDTH})
                  AS BIGINT) AS bin,
             count(*) AS n
      FROM customer GROUP BY 1
    )
    SELECT s.bin,
           CAST(s.bin * {_HIST_WIDTH} AS DOUBLE) AS lo_edge,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN counts c ON s.bin = c.bin
    """,
)
def a18_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    bin_of = F.floor(
        F.col("c_acctbal").cast("decimal(18,2)") / _HIST_WIDTH
    ).cast("bigint")
    counts = cust.select(bin_of.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = cust.agg(
        F.min(bin_of).alias("lo"), F.max(bin_of).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("bin")
    )
    return spine.join(counts, "bin", "left").select(
        "bin",
        (F.col("bin") * _HIST_WIDTH).cast("double").alias("lo_edge"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# A19 — boolean + bitwise aggregates: bool_and/bool_or answer
# "does EVERY/ANY row in the group satisfy P" in one pass (the
# validation shape: does every file in a load have coords, did any
# row fail a cast — validate-voter-row.ts's file-level verdicts);
# bit_and/bit_or/bit_xor fold flag words (the xor fold doubles as an
# order-insensitive set fingerprint: a lost or duplicated orderkey
# flips it). All six are exact-integer/boolean — no float hazard —
# and every one has a partial+final (map-side combine) form, so the
# plan is a single exchange regardless of group fan-in.
# ---------------------------------------------------------------------------
@register(
    "a19_bool_bit_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_finished,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 400000.0) AS any_over_400k,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a19_bool_bit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


# ---------------------------------------------------------------------------
# A21 — column profiling: per-column null rate / distinct count /
# min / max in ONE pass — the data-quality report every load job
# runs before publish (the engine-side generalization of the
# reference's per-row validation, validate-voter-row.ts, which
# checks values but never summarizes a column). Columns are stacked
# map-side (Expand: k rows per input row for the k profiled
# columns), then a single groupBy(col_name) shuffle computes every
# statistic; profiling the full 339-column voter schema would batch
# columns to bound the expansion factor.
# ---------------------------------------------------------------------------
@register(
    "a21_column_profile",
    oracle="""
    WITH vals AS (
      SELECT 'c_mktsegment' AS col_name, c_mktsegment AS val FROM customer
      UNION ALL SELECT 'c_name', c_name FROM customer
      UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
      UNION ALL SELECT 'segment_nullable', nullif(c_mktsegment, 'BUILDING')
        FROM customer
    )
    SELECT col_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           count(DISTINCT val) AS n_distinct,
           min(val) AS min_val,
           max(val) AS max_val
    FROM vals GROUP BY col_name
    """,
)
def a21_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    stacked = t(spark, sf_dir, "customer").select(
        F.expr(
            "stack(4, "
            "'c_mktsegment', c_mktsegment, "
            "'c_name', c_name, "
            "'c_nationkey', CAST(c_nationkey AS STRING), "
            "'segment_nullable', nullif(c_mktsegment, 'BUILDING')"
            ") AS (col_name, val)"
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("val").isNull()).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# A27 — key-skew profile: the diagnostic run before keying a 100 TB
# shuffle. Orders-per-customer counts, top-10 heaviest keys with
# exact integer ppm shares and the cumulative share of the head —
# the number that decides between a plain hash join and salting
# (j8). Physical shape: one partial+final count aggregation, then
# TakeOrderedAndProject on 10 rows; the window rank/cumsum runs on
# those 10 rows only, never on the full key set.
# ---------------------------------------------------------------------------
@register(
    "a27_key_skew_profile",
    oracle="""
    WITH per AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ), tot AS (SELECT count(*) AS t FROM orders),
    top AS (
      SELECT o_custkey, n FROM per ORDER BY n DESC, o_custkey LIMIT 10
    )
    SELECT row_number() OVER (ORDER BY n DESC, o_custkey) AS rnk,
           o_custkey AS custkey,
           CAST(n AS BIGINT) AS n_orders,
           CAST(n * 1000000 // t AS BIGINT) AS share_ppm,
           CAST(sum(n) OVER (ORDER BY n DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // t AS BIGINT) AS cum_share_ppm
    FROM top, tot
    """,
)
def a27_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").select("o_custkey")
    tot = orders.agg(F.count(F.lit(1)).alias("t"))
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("o_custkey"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("n"), F.asc("o_custkey"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).alias("rnk"),
            F.col("o_custkey").alias("custkey"),
            F.col("n").alias("n_orders"),
            F.expr("n * 1000000 div t").alias("share_ppm"),
            F.sum("n").over(cum).alias("cum_n"),
            F.col("t"),
        )
        .select(
            "rnk",
            "custkey",
            "n_orders",
            "share_ppm",
            F.expr("cum_n * 1000000 div t").alias("cum_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# A28 — mergeable distinct-count sketches (Apache DataSketches HLL,
# built into Spark): one HLL sketch of o_custkey per order-month
# partition, unioned into a corpus-wide estimate — the pattern that
# replaces count(DISTINCT) at 100 TB, where per-partition sketches
# are built map-side, merged in O(sketch) not O(rows), and stored
# next to the partition for incremental refresh (new month = one new
# sketch + re-union, never a re-scan). The registered result is the
# EXACT distinct count plus a flag that the sketch estimate landed
# within 5% — HLL at lgK=12 has σ≈1.6%, so the flag is
# deterministic-in-practice and makes the sketch's accuracy, not
# just its existence, the thing the oracle checks.
# ---------------------------------------------------------------------------
@register(
    "a28_hll_sketch_merge",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_exact, 1 AS est_ok FROM orders
    """,
)
def a28_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
    )
    per_month = orders.groupBy("ym").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    est = per_month.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("n_est")
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(5) / F.lit(100)
        )
        .cast("int")
        .alias("est_ok"),
    )


# ---------------------------------------------------------------------------
# A32 — declarative data-quality expectations (the Great
# Expectations / dbt-test shape the reference's loader validation
# implies): each rule is one aggregate over the scanned table —
# range check, domain check, NOT NULL check, and a referential-
# integrity orphan check (anti-join) — emitted as (rule, n_checked,
# n_violations, passed). One pass per table + one broadcast-able
# anti-join; at 100 TB every rule stays a map-side predicate counted
# in the same partial aggregate, so the whole suite costs one scan.
# ---------------------------------------------------------------------------
@register(
    "a32_data_quality_checks",
    oracle="""
    SELECT 'orders_price_range' AS rule,
           count(*) AS n_checked,
           count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                      THEN 1 END) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_status_domain', count(*),
           count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
    FROM orders
    UNION ALL
    SELECT 'customer_name_not_null', count(*),
           count(CASE WHEN c_name IS NULL THEN 1 END)
    FROM customer
    UNION ALL
    SELECT 'orders_custkey_integrity', count(*),
           count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def a32_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")

    def rule(df: DataFrame, name: str, violated) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.count(F.when(violated, 1)).alias("n_violations"),
        ).select(
            F.lit(name).alias("rule"), "n_checked", "n_violations"
        )

    price = rule(
        orders,
        "orders_price_range",
        (F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1_000_000),
    )
    domain = rule(
        orders,
        "orders_status_domain",
        ~F.col("o_orderstatus").isin("O", "F", "P"),
    )
    notnull = rule(cust, "customer_name_not_null", F.col("c_name").isNull())
    integrity = rule(
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        ),
        "orders_custkey_integrity",
        F.col("c_custkey").isNull(),
    )
    return price.unionByName(domain).unionByName(notnull).unionByName(integrity)


# ---------------------------------------------------------------------------
# A34 — Benford first-digit screen: fraud/corruption forensics for
# financial columns (organic magnitudes follow log-uniform leading
# digits; fabricated or truncated feeds don't). One map-side
# first-digit extraction + a 9-group aggregate, with the expected
# Benford share in exact basis points (floor(log10 ratios
# pre-computed as literals — no float logs cross engines).
# ---------------------------------------------------------------------------
_A34_BENFORD_BP = {d: int(10000 * __import__("math").log10(1 + 1 / d)) for d in range(1, 10)}


@register(
    "a34_benford_first_digit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), e AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d}, {bp})" for d, bp in _A34_BENFORD_BP.items())})
        AS t(digit, expected_bp)
    )
    SELECT d.digit,
           count(*) AS n,
           count(*) * 10000 // (SELECT count(*) FROM d) AS observed_bp,
           max(e.expected_bp) AS expected_bp
    FROM d JOIN e ON d.digit = e.digit
    GROUP BY d.digit
    """,
)
def a34_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    # In-plan scalar: the corpus total rides along as a broadcast 1-row
    # aggregate (same discipline as a33) — no eager driver-side count at
    # plan-build time, so the scan cost lands in execution, not setup.
    tot = d.agg(F.count(F.lit(1)).alias("total"))
    e = t(spark, sf_dir, "orders").sparkSession.createDataFrame(
        list(_A34_BENFORD_BP.items()), "digit long, expected_bp long"
    )
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(e), "digit")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("n * 10000 div total").alias("observed_bp"),
            "expected_bp",
        )
    )


# ---------------------------------------------------------------------------
# A35 — robust outlier screen (median absolute deviation): flag
# account balances farther than 3 MADs from their segment median —
# the robust alternative to z-scores (a14's mean/stddev are dragged
# by the very outliers being hunted; the median/MAD pair is not).
#
# Exactness discipline: balances quantize to QUARTER-cents (x400) so
# every median — the average of two central values — is an exact
# even integer, deviations and the 3xMAD comparison stay pure int64,
# and both engines' interpolating percentile agrees bit-for-bit.
# Shape: two grouped exact percentiles with the O(segments) medians
# broadcast back between them — the global-stats-then-map pattern,
# no self-join of the fact.
# ---------------------------------------------------------------------------
@register(
    "a35_mad_outliers",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 4 AS qc
      FROM customer
    ), m AS (
      SELECT seg, CAST(floor(median(qc) + 0.5) AS BIGINT) AS med
      FROM q GROUP BY seg
    ), d AS (
      SELECT q.seg, med, abs(qc - med) AS dev
      FROM q JOIN m USING (seg)
    ), md AS (
      SELECT seg, CAST(floor(median(dev) + 0.5) AS BIGINT) AS mad
      FROM d GROUP BY seg
    )
    SELECT d.seg AS c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           max(med) AS median_qc,
           max(mad) AS mad_qc
    FROM d JOIN md USING (seg)
    GROUP BY d.seg
    """,
)
def a35_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (
            F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)") * 4
        ).alias("qc"),
    )
    m = q.groupBy("seg").agg(
        F.expr("cast(floor(percentile(qc, 0.5d) + 0.5d) as bigint)").alias("med")
    )
    d = q.join(F.broadcast(m), "seg").select(
        "seg", "med", F.abs(F.col("qc") - F.col("med")).alias("dev")
    )
    md = d.groupBy("seg").agg(
        F.expr("cast(floor(percentile(dev, 0.5d) + 0.5d) as bigint)").alias("mad")
    )
    return (
        d.join(F.broadcast(md), "seg")
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.max("med").alias("median_qc"),
            F.max("mad").alias("mad_qc"),
        )
    )


# ---------------------------------------------------------------------------
# A36 — two-sample Kolmogorov-Smirnov distance: the standard drift
# test between two empirical distributions (here URGENT vs LOW order
# prices — a data-quality guard that catches "the new feed's price
# distribution shifted" where mean/stddev checks like a14/a32 miss
# shape changes). KS = max_x |F1(x) - F2(x)|, and the max always
# lands on an observed value, so it is exact over the distinct-value
# table.
#
# Scale: the empirical CDF is a prefix sum over distinct values —
# naively one global window = one reducer holding every distinct
# price. Instead the scan is TWO-LEVEL, the distributed prefix-sum
# pattern: per-value counts roll up to value-range buckets (bounded
# row count), bucket totals get the only global window (O(buckets)
# rows), and each value's CDF = its bucket's offset + a
# WITHIN-BUCKET running sum (window PARTITIONED by bucket — fully
# parallel). No single-partition pass ever sees more than one
# bucket's distinct values. All integer: CDFs compare via the
# cross-multiplied form |f1*n2 - f2*n1| so no division happens until
# the final basis-point cast.
# ---------------------------------------------------------------------------
_A36_BUCKET = 65536  # cents per CDF bucket (~$655)


@register(
    "a36_ks_two_sample",
    oracle=f"""
    WITH s AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g2
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), pv AS (
      SELECT v, v // {_A36_BUCKET} AS bkt,
             CAST(sum(g1) AS BIGINT) AS c1, CAST(sum(g2) AS BIGINT) AS c2
      FROM s GROUP BY v
    ), bk AS (
      SELECT bkt,
             CAST(coalesce(sum(sum(c1)) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off1,
             CAST(coalesce(sum(sum(c2)) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off2
      FROM pv GROUP BY bkt
    ), cdf AS (
      SELECT pv.v,
             bk.off1 + CAST(sum(pv.c1) OVER (PARTITION BY pv.bkt
               ORDER BY pv.v) AS BIGINT) AS f1,
             bk.off2 + CAST(sum(pv.c2) OVER (PARTITION BY pv.bkt
               ORDER BY pv.v) AS BIGINT) AS f2
      FROM pv JOIN bk ON pv.bkt = bk.bkt
    ), tot AS (
      SELECT CAST(sum(g1) AS BIGINT) AS n1, CAST(sum(g2) AS BIGINT) AS n2
      FROM s
    )
    SELECT tot.n1, tot.n2,
           CAST(max(abs(cdf.f1 * tot.n2 - cdf.f2 * tot.n1)) * 10000
                // (tot.n1 * tot.n2) AS BIGINT) AS ks_bp
    FROM cdf CROSS JOIN tot
    GROUP BY tot.n1, tot.n2
    """,
)
def a36_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias("v"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("g1"),
            F.when(F.col("o_orderpriority") == "5-LOW", 1)
            .otherwise(0)
            .alias("g2"),
        )
    )
    # pv feeds THREE consumers (bucket offsets, the CDF join, and the
    # totals) — materialize once (r13, the a49/x4 discipline).
    pv = (
        s.groupBy("v")
        .agg(
            F.sum("g1").cast("long").alias("c1"),
            F.sum("g2").cast("long").alias("c2"),
        )
        .withColumn("bkt", F.expr(f"v div {_A36_BUCKET}"))
        .transform(materialize)
    )
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    bk = (
        pv.groupBy("bkt")
        .agg(F.sum("c1").alias("s1"), F.sum("c2").alias("s2"))
        .select(
            "bkt",
            F.coalesce(F.sum("s1").over(wb), F.lit(0))
            .cast("long")
            .alias("off1"),
            F.coalesce(F.sum("s2").over(wb), F.lit(0))
            .cast("long")
            .alias("off2"),
        )
    )
    wv = W.partitionBy("bkt").orderBy("v")
    cdf = pv.join(bk, "bkt").select(
        "v",
        (F.col("off1") + F.sum("c1").over(wv)).cast("long").alias("f1"),
        (F.col("off2") + F.sum("c2").over(wv)).cast("long").alias("f2"),
    )
    # Totals re-aggregate FROM the per-value table (sum of c1/c2 ==
    # sum of g1/g2 by construction) — the old shape re-scanned orders
    # a second time just for the two scalars (r13, the a37 marginals
    # discipline).
    tot = pv.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.expr(
                "cast(max(abs(f1 * n2 - f2 * n1)) * 10000 div (n1 * n2) as bigint)"
            ).alias("ks_bp")
        )
    )


# ---------------------------------------------------------------------------
# A37 — chi-square test of independence (mktsegment x nation bucket):
# the categorical complement to a36's KS — "did the joint
# distribution of two labels drift from independence". The statistic
# is computed in the cross-multiplied integer form: each cell
# contributes (o*N - r*c)^2 * 10000 div (N*r*c), i.e. chi2 scaled to
# basis points, so no float crosses the engine boundary.
#
# Scale: one O(cells) contingency aggregate (partial+final over a
# bounded R x C key domain), row/col marginals re-aggregated FROM the
# cell table (no second corpus pass), and N as a broadcast 1-row
# scalar. Nothing after the first aggregate touches corpus-sized
# data.
# ---------------------------------------------------------------------------
@register(
    "a37_chi_square",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, c_nationkey % 5 AS bkt,
             CAST(count(*) AS BIGINT) AS o
      FROM customer GROUP BY seg, bkt
    ), rows_ AS (
      SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY seg
    ), cols_ AS (
      SELECT bkt, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY bkt
    ), tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT seg) AS BIGINT) AS nr,
             CAST(count(DISTINCT bkt) AS BIGINT) AS nc
      FROM cells
    )
    SELECT tot.nr * tot.nc AS n_cells,
           (tot.nr - 1) * (tot.nc - 1) AS df,
           CAST(sum((cells.o * tot.n - rows_.r * cols_.c)
                    * (cells.o * tot.n - rows_.r * cols_.c) * 10000
                    // (tot.n * rows_.r * cols_.c)) AS BIGINT) AS chi2_bp
    FROM cells
    JOIN rows_ ON cells.seg = rows_.seg
    JOIN cols_ ON cells.bkt = cols_.bkt
    CROSS JOIN tot
    GROUP BY tot.nr, tot.nc
    """,
)
def a37_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The contingency table is referenced four times (cells, row
    # margins, column margins, totals); localCheckpoint materializes
    # the tiny (n_segs x n_buckets) frame once instead of scanning +
    # aggregating customer once per reference (r13, guide §1.2).
    cells = (
        t(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (F.col("c_nationkey") % 5).alias("bkt"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .transform(materialize)
    )
    rows_ = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("r"))
    cols_ = cells.groupBy("bkt").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("seg").cast("long").alias("nr"),
        F.countDistinct("bkt").cast("long").alias("nc"),
    )
    return (
        cells.join(F.broadcast(rows_), "seg")
        .join(F.broadcast(cols_), "bkt")
        .crossJoin(F.broadcast(tot))
        .groupBy("nr", "nc")
        .agg(
            F.expr(
                "cast(sum((o * n - r * c) * (o * n - r * c) * 10000 "
                "div (n * r * c)) as bigint)"
            ).alias("chi2_bp")
        )
        .select(
            (F.col("nr") * F.col("nc")).alias("n_cells"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("df"),
            "chi2_bp",
        )
    )


# ---------------------------------------------------------------------------
# A38 — lag-k autocovariance of the daily revenue series (k=1,2,3):
# the seasonality probe behind forecasting features. Covariance is
# emitted as the EXACT integer numerator n*Sxy - Sx*Sy over per-day
# MEAN order value (whole dollars — cents would push n*Sxy past
# 2^63: day-mean ~1.5e7 cents squared, summed over ~2.4k days, times
# n again is ~1e21) — dollar means bound every product far under
# 2^63 for any calendar-bounded day count, and no division/sqrt means
# no float ever crosses engines (Pearson r needs a sqrt; the
# numerator's sign+magnitude carries the same signal).
#
# Scale: the corpus collapses to an O(days) series in one grouped
# aggregate; lags are windows over that bounded series (a few
# thousand rows for any realistic date range — the window's
# single-partition stage sees days, never orders).
# ---------------------------------------------------------------------------
@register(
    "a38_lag_autocovariance",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                  // count(*) AS BIGINT) AS mean_usd
      FROM orders GROUP BY day
    ), lagged AS (
      SELECT mean_usd AS x,
             lag(mean_usd, 1) OVER (ORDER BY day) AS x1,
             lag(mean_usd, 2) OVER (ORDER BY day) AS x2,
             lag(mean_usd, 3) OVER (ORDER BY day) AS x3
      FROM daily
    )
    SELECT k,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num
    FROM (
      SELECT 1 AS k, count(x1) AS n, sum(x * x1) AS sxy,
             sum(CASE WHEN x1 IS NOT NULL THEN x END) AS sx, sum(x1) AS sy
      FROM lagged
      UNION ALL
      SELECT 2, count(x2), sum(x * x2),
             sum(CASE WHEN x2 IS NOT NULL THEN x END), sum(x2)
      FROM lagged
      UNION ALL
      SELECT 3, count(x3), sum(x * x3),
             sum(CASE WHEN x3 IS NOT NULL THEN x END), sum(x3)
      FROM lagged
    )
    """,
)
def a38_lag_autocovariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice + 0.5d) as bigint))"
                " div count(*) as bigint)"
            ).alias("mean_usd")
        )
    )
    w = W.orderBy("day")
    lagged = daily.select(
        F.col("mean_usd").alias("x"),
        F.lag("mean_usd", 1).over(w).alias("x1"),
        F.lag("mean_usd", 2).over(w).alias("x2"),
        F.lag("mean_usd", 3).over(w).alias("x3"),
    )

    # ONE aggregate computes all three lags' sufficient statistics
    # (12 values) in a single pass, then stack() unpivots the 1-row
    # result — the r13 shape. The old per-k aggregates unioned three
    # frames, each re-running the daily rollup + lag window (guide
    # §1.2: don't compute the same subtree three times).
    def stats(k: int) -> list:
        xk = F.col(f"x{k}")
        return [
            F.count(xk).alias(f"n{k}"),
            F.sum(F.col("x") * xk).alias(f"sxy{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).alias(f"sx{k}"),
            F.sum(xk).alias(f"sy{k}"),
        ]

    one = lagged.agg(*stats(1), *stats(2), *stats(3))
    u = one.selectExpr(
        "stack(3, "
        + ", ".join(
            f"cast({k} as int), n{k}, sxy{k}, sx{k}, sy{k}" for k in (1, 2, 3)
        )
        + ") as (k, n, sxy, sx, sy)"
    )
    return u.select(
        "k",
        F.col("n").cast("long").alias("n_pairs"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("cov_num"),
    )


# ---------------------------------------------------------------------------
# A39 — Gini concentration per segment: the inequality screen run on
# any value distribution before sampling/weighting decisions (is this
# segment's balance mass concentrated in a few whales?). Formula is
# the rank form G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i))
# over ascending-sorted x, computed on SHIFTED cents (+100000, since
# acctbal can be negative and Gini needs a non-negative support);
# emitted as exact integer basis points plus the raw numerator/
# denominator pair.
#
# Exactness/overflow: all terms are int64. At sf0.1 the per-segment
# numerator is ~1e13 and num*10000 ~1e17, comfortably inside 2^63;
# the crossover is ~sf3 per segment, at which point the emitted
# (gini_num, gini_den) columns are the overflow-proof form and the
# *10000 step moves to DECIMAL(38,0) — noted here so the knob is
# explicit.
#
# Scale: rank assignment is a per-segment window (parallel across
# segments), then one grouped aggregate — two shuffles on the segment
# key, no self-join, no global sort.
# ---------------------------------------------------------------------------
@register(
    "a39_gini",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000 AS sx,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT),
                        c_custkey) AS i
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(2 * sum(i * sx) - (count(*) + 1) * sum(sx) AS BIGINT)
             AS gini_num,
           CAST(count(*) * sum(sx) AS BIGINT) AS gini_den,
           CAST((2 * sum(i * sx) - (count(*) + 1) * sum(sx)) * 10000
                // (count(*) * sum(sx)) AS BIGINT) AS gini_bp
    FROM ranked GROUP BY c_mktsegment
    """,
)
def a39_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cents = F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
    ranked = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (cents + F.lit(100000)).alias("sx"),
        F.row_number()
        .over(W.partitionBy("c_mktsegment").orderBy(cents, F.col("c_custkey")))
        .alias("i"),
    )
    g = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * F.col("sx")).alias("six"),
        F.sum("sx").alias("s"),
    )
    num = F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("s")
    den = F.col("n") * F.col("s")
    return g.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        F.expr(
            "cast((2 * six - (n + 1) * s) * 10000 div (n * s) as bigint)"
        ).alias("gini_bp"),
    )


# ---------------------------------------------------------------------------
# A41 — OLS trend per group: is order value drifting up or down over
# time, per priority class? The regression-slope screen behind every
# "metric trending" alert. Two-level shape copied from a38: the
# corpus first collapses to an O(days) daily series (day index,
# daily mean dollars — both exact integers), then the OLS sums run
# over that bounded table, so no slope term ever multiplies two
# corpus-sized sums.
#
# Overflow audit: n <= 2400 days, x <= 2400, y <= 1e6 dollars;
# num = n*Sxy - Sx*Sy <= ~1.5e16, den = n*Sxx - Sx^2 <= ~4e13 —
# int64 throughout AT ANY sf (the daily collapse makes the bounds
# sf-independent). slope_milli decomposes the division as
# q*1000 + r*1000/den on |num| (r*1000 <= 4e16), with the sign
# applied last — truncation toward zero on both engines, avoiding
# the floor-vs-truncate divergence on negative integer division
# (DuckDB // floors, Spark div truncates).
# ---------------------------------------------------------------------------
@register(
    "a41_ols_trend",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS x,
             CAST(sum(CAST(floor(o_totalprice) AS BIGINT))
                  // count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ), sums AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT o_orderpriority,
           n AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS trend_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS trend_den,
           CAST(CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END * (
             (abs(n * sxy - sx * sy) // (n * sxx - sx * sx)) * 1000
             + (abs(n * sxy - sx * sy) % (n * sxx - sx * sx)) * 1000
               // (n * sxx - sx * sx)
           ) AS BIGINT) AS slope_milli
    FROM sums
    """,
)
def a41_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01")
            )
            .cast("long")
            .alias("x"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice) as bigint))"
                " div count(*) as bigint)"
            ).alias("y")
        )
    )
    sums = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    q = F.expr("abs(n * sxy - sx * sy) div (n * sxx - sx * sx)")
    return sums.select(
        "o_orderpriority",
        F.col("n").alias("n_days"),
        num.cast("long").alias("trend_num"),
        den.cast("long").alias("trend_den"),
        (
            F.when(num >= 0, F.lit(1)).otherwise(F.lit(-1))
            * (q * 1000 + F.expr(
                "abs(n * sxy - sx * sy) % (n * sxx - sx * sx) * 1000"
                " div (n * sxx - sx * sx)"
            ))
        )
        .cast("long")
        .alias("slope_milli"),
    )


# ---------------------------------------------------------------------------
# A42 — sketch-based set-overlap estimate: how many customers are
# active in BOTH of two date ranges, answered with HLL sketches and
# inclusion-exclusion (|A and B| ~ est(A) + est(B) - est(A union B))
# — the cross-source audience-overlap pattern where the sets live in
# different partitions/systems and only O(sketch) state may move.
# Union-of-sketches comes free (hll_union two 1-row aggregates), so
# the intersection estimate costs three estimates and zero extra
# scans. a28's oracle discipline: the registered result is the EXACT
# overlap plus a flag that the estimate landed within 10% — HLL at
# the default lgK=12 has sigma~1.6% per term, and the planted ranges
# overlap heavily, so the flag is deterministic-in-practice (checked
# by driver_sim at sf0.001/0.01/0.1).
#
# Scale: two sketch aggregates (map-side partial, O(sketch) merge),
# one 1-row crossJoin, and the exact-truth intersect — which is the
# measurement harness, not the production path (at 100 TB only the
# sketches are computed).
# ---------------------------------------------------------------------------
@register(
    "a42_sketch_overlap",
    oracle="""
    SELECT CAST((
      SELECT count(*) FROM (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate < DATE '1998-01-01'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
      )
    ) AS BIGINT) AS n_exact_overlap, 1 AS est_ok
    """,
)
def a42_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    in_a = F.col("o_orderdate") < "1998-01-01"
    in_b = F.col("o_orderdate") >= "1996-01-01"
    sk = orders.agg(
        F.hll_sketch_agg(F.when(in_a, F.col("o_custkey"))).alias("ska"),
        F.hll_sketch_agg(F.when(in_b, F.col("o_custkey"))).alias("skb"),
    )
    est = sk.select(
        F.hll_sketch_estimate("ska").alias("ea"),
        F.hll_sketch_estimate("skb").alias("eb"),
        F.hll_sketch_estimate(F.hll_union("ska", "skb")).alias("eu"),
    ).select((F.col("ea") + F.col("eb") - F.col("eu")).alias("est_inter"))
    exact = (
        orders.filter(in_a)
        .select("o_custkey")
        .intersect(orders.filter(in_b).select("o_custkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_overlap"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact_overlap",
        F.when(
            F.abs(F.col("est_inter") - F.col("n_exact_overlap")) * 10
            <= F.col("n_exact_overlap"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("est_ok"),
    )


# ---------------------------------------------------------------------------
# A48 — ordered string aggregation (Spark 4's listagg WITHIN GROUP ≡
# DuckDB's string_agg ORDER BY): the reference renders per-region
# roll-up reports as delimited name lists (SURVEY.md §2.6 report
# surface); this is that shape as a first-class ordered aggregate,
# including a computed "name:count" list that rides a pre-aggregated
# customer rollup.
#
# Scale: the ordered list is only safe because the group payload is
# bounded (25 nations / 5 regions); at 100 TB the same plan holds for
# any bounded-cardinality dimension rollup — the customer count
# aggregates FIRST (map-side combine on c_nationkey), and only the
# 25-row result carries strings into the listagg.
# ---------------------------------------------------------------------------
@register(
    "a48_string_agg",
    oracle="""
    WITH cc AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs
      FROM customer GROUP BY c_nationkey
    ), n2 AS (
      SELECT n.n_regionkey, n.n_name,
             coalesce(cc.n_custs, 0) AS n_custs
      FROM nation n LEFT JOIN cc ON cc.c_nationkey = n.n_nationkey
    )
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n2.n_name, '|' ORDER BY n2.n_name) AS nation_list,
           string_agg(n2.n_name || ':' || CAST(n2.n_custs AS VARCHAR),
                      '|' ORDER BY n2.n_name) AS nation_custs
    FROM n2 JOIN region r ON r.r_regionkey = n2.n_regionkey
    GROUP BY r.r_name
    """,
)
def a48_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    cc = cust.groupBy(F.col("c_nationkey").alias("n_nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_custs")
    )
    n2 = (
        nat.join(cc, "n_nationkey", "left")
        .select(
            "n_regionkey",
            "n_name",
            F.coalesce("n_custs", F.lit(0)).alias("n_custs"),
        )
        .join(
            F.broadcast(
                reg.select(
                    F.col("r_regionkey").alias("n_regionkey"), "r_name"
                )
            ),
            "n_regionkey",
        )
    )
    return n2.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.expr(
            "listagg(n_name, '|') within group (order by n_name)"
        ).alias("nation_list"),
        F.expr(
            "listagg(n_name || ':' || cast(n_custs as string), '|')"
            " within group (order by n_name)"
        ).alias("nation_custs"),
    )


# ---------------------------------------------------------------------------
# A50 — RFM segmentation: recency / frequency / monetary quintiles
# per customer, folded into a 3-digit segment code, reported as the
# segment-size distribution with per-segment averages. The canonical
# CRM / voter-engagement scoring rollup (the reference's per-person
# activity rollups feed exactly this kind of outreach tiering).
# Recency is integer days from the corpus max order date (an in-plan
# 1-row broadcast, not a driver-side constant); quintiles are
# ntile(5) windows over the bounded per-customer rollup.
#
# Scale: one groupBy(custkey) with map-side combine builds the RFM
# triple; the three ntile windows run over that rollup (rows =
# customers, not orders); the final segment rollup is bounded (125
# codes). ntile ties resolve by the window's full deterministic
# ORDER BY (metric, custkey). An unpartitioned ntile funnels the
# customer rollup through one task — fine while customers fit one
# executor's sort spill; past that, swap to the broadcast-cutpoint
# form (percentile_approx quintile boundaries as a 1-row broadcast,
# then a map-side CASE bucket — value-boundary quantiles instead of
# ntile's equal-count buckets, the trade RFM tooling accepts).
# ---------------------------------------------------------------------------
@register(
    "a50_rfm_segmentation",
    oracle="""
    WITH mx AS (
      SELECT max(o_orderdate) AS maxd FROM orders
    ), rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT maxd FROM mx))
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m,
             recency_days, frequency, monetary_cents
      FROM rfm
    )
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(recency_days) AS BIGINT) AS sum_recency_days,
           CAST(sum(frequency) AS BIGINT) AS sum_orders,
           CAST(sum(monetary_cents) AS BIGINT) AS sum_cents
    FROM scored GROUP BY 1
    """,
)
def a50_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = t(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("maxd", "lastd").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    scored = rfm.select(
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(W.orderBy("recency_days", "o_custkey")).alias("r"),
        F.ntile(5)
        .over(W.orderBy(F.desc("frequency"), "o_custkey"))
        .alias("f"),
        F.ntile(5)
        .over(W.orderBy(F.desc("monetary_cents"), "o_custkey"))
        .alias("m"),
    )
    return scored.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("long")
        .alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("recency_days").cast("long").alias("sum_recency_days"),
        F.sum("frequency").cast("long").alias("sum_orders"),
        F.sum("monetary_cents").cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# A54 — referential-integrity audit: the warehouse health report a
# nightly load runs before publishing — orphaned facts (lineitems
# whose order vanished), childless parents (orders with no lines),
# customers with no orders, and orders pointing at missing
# customers. Every check is an ANTI-JOIN count (the scalable
# spelling — never NOT IN with its null traps, never a driver-side
# diff) plus the denominator, reported in basis points. The
# reference loads per-state files with no cross-file integrity
# gate; this is that gate.
#
# Scale: four left-anti joins, each on the natural key its check
# audits; key-only projections mean the shuffles carry join keys,
# not payloads. AQE handles the fact-fact sizes.
# ---------------------------------------------------------------------------
@register(
    "a54_referential_audit",
    oracle="""
    WITH checks AS (
      SELECT 'orphan_lineitems' AS check_name,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_total
      UNION ALL
      SELECT 'orders_without_lines',
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey)),
             (SELECT CAST(count(*) AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'customers_without_orders',
             (SELECT CAST(count(*) AS BIGINT) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey)),
             (SELECT CAST(count(*) AS BIGINT) FROM customer)
      UNION ALL
      SELECT 'orders_orphan_customer',
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT CAST(count(*) AS BIGINT) FROM orders)
    )
    SELECT check_name, n_violations, n_total,
           CAST(10000 * n_violations // n_total AS BIGINT) AS violation_bp
    FROM checks
    """,
)
def a54_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey")

    def check(name, violations, total_df):
        v = violations.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        n = total_df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        return v.crossJoin(F.broadcast(n)).select(
            F.lit(name).alias("check_name"),
            "n_violations",
            "n_total",
            F.expr("10000 * n_violations div n_total").alias("violation_bp"),
        )

    rows = [
        check(
            "orphan_lineitems",
            li.join(
                orders.select("o_orderkey"),
                li["l_orderkey"] == orders["o_orderkey"],
                "left_anti",
            ),
            li,
        ),
        check(
            "orders_without_lines",
            orders.join(
                li, orders["o_orderkey"] == li["l_orderkey"], "left_anti"
            ),
            orders,
        ),
        check(
            "customers_without_orders",
            cust.join(
                orders.select("o_custkey"),
                cust["c_custkey"] == orders["o_custkey"],
                "left_anti",
            ),
            cust,
        ),
        check(
            "orders_orphan_customer",
            orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
            ),
            orders,
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# A55 — Pareto concentration curve: rank customers by lifetime
# revenue, cut into deciles, and report each decile's share of total
# revenue in basis points plus the cumulative share — the "what
# fraction of donors produce 80% of funds" curve (a39's Gini is the
# scalar summary; this is the curve itself). Exact integer cents
# end to end; decile boundaries are ntile over the customer rollup
# with the custkey tiebreak.
#
# Scale: same posture as a50 — the revenue triple aggregates first
# (map-side combine), the single global ntile runs over customers
# (broadcast-cutpoint escape documented at a50), and the output is
# a bounded 10-row rollup.
# ---------------------------------------------------------------------------
@register(
    "a55_pareto_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM rev
    ), tot AS (
      SELECT sum(cents) AS total FROM rev
    ), byd AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM ranked GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_customers, cents,
           CAST(10000 * cents // t.total AS BIGINT) AS share_bp,
           CAST(10000 * sum(cents) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                // t.total AS BIGINT) AS cum_share_bp
    FROM byd CROSS JOIN tot t
    """,
)
def a55_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.ntile(10)
        .over(W.orderBy(F.desc("cents"), "o_custkey"))
        .alias("decile"),
    )
    tot = rev.agg(F.sum("cents").alias("total"))
    byd = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("cents"),
    )
    return (
        byd.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            "cents",
            F.expr("10000 * cents div total").alias("share_bp"),
            F.expr("10000 * sum(cents) over (order by decile"
                   " rows between unbounded preceding and current row)"
                   " div total").alias("cum_share_bp"),
        )
    )


# ---------------------------------------------------------------------------
# A56 — ABC analysis: parts classified by cumulative revenue share
# (A = the head of the curve to 80%, B = to 95%, C = the tail) —
# the inventory-management canon, a55's curve turned into a
# per-item classification. The class boundary uses the cumulative
# share INCLUDING the current part (ties broken by partkey), so
# assignment is deterministic; all shares are integer bp off exact
# cents.
#
# Scale: revenue per part aggregates map-side; the ranking/cumsum
# windows run over the part rollup (the a50 ntile caveat and its
# broadcast-cutpoint escape apply at extreme part counts); the
# report is a bounded 3-row rollup.
# ---------------------------------------------------------------------------
@register(
    "a56_abc_analysis",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT sum(cents) AS total FROM rev
    ), ranked AS (
      SELECT cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    ), classed AS (
      SELECT cents,
             CASE WHEN 100 * cum <= 80 * t.total THEN 'A'
                  WHEN 100 * cum <= 95 * t.total THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot t
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(10000 * sum(cents) // (SELECT total FROM tot) AS BIGINT)
             AS share_bp
    FROM classed GROUP BY abc
    """,
)
def a56_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)"))
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").alias("total"))
    w_cum = W.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    ranked = rev.select(
        "cents", F.sum("cents").over(w_cum).alias("cum")
    ).crossJoin(F.broadcast(tot))
    classed = ranked.select(
        "cents",
        "total",
        F.when(100 * F.col("cum") <= 80 * F.col("total"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("cents"),
        F.expr("10000 * sum(cents) div max(total)").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# A59 — top-N + OTHER: brand revenue with every brand outside the
# top 10 folded into one OTHER row — the cardinality cap every
# report applies before a chart (and every privacy reviewer asks
# for before a release: small categories aggregate away). Rank by
# the full deterministic order, fold with a CASE on rank, re-roll;
# OTHER carries its member count so nothing silently disappears.
#
# Scale: brand rollup with map-side combine (bounded key), rank
# over the bounded rollup, second bounded rollup — raw rows are
# touched once.
# ---------------------------------------------------------------------------
@register(
    "a59_topn_plus_other",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
               AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ), ranked AS (
      SELECT brand, cents,
             row_number() OVER (ORDER BY cents DESC, brand) AS r
      FROM rev
    )
    SELECT CASE WHEN r <= 10 THEN brand ELSE 'OTHER' END AS brand,
           CAST(count(*) AS BIGINT) AS n_brands,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM ranked
    GROUP BY 1
    """,
)
def a59_topn_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").alias("cents")
    )
    part = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    rev = li.join(part, "l_partkey").groupBy("brand").agg(
        F.sum("cents").alias("cents")
    )
    ranked = rev.select(
        "brand",
        "cents",
        F.row_number().over(W.orderBy(F.desc("cents"), "brand")).alias("r"),
    )
    return (
        ranked.select(
            F.when(F.col("r") <= 10, F.col("brand"))
            .otherwise("OTHER")
            .alias("brand"),
            "cents",
        )
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brands"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# A64 — accumulating-snapshot cycle times: the Kimball milestone
# pattern — per order, the lag from order date to FIRST shipment
# and the shipping window (first to last line shipped), rolled up
# per priority as exact integer day statistics. The ops metric
# behind "are urgent orders actually faster"; the per-order
# milestone row is the accumulating snapshot itself.
#
# Scale: lineitem aggregates to per-order milestones in one
# map-side-combined groupBy on l_orderkey, joins orders on the same
# key (co-partitioned), then a bounded 5-row rollup.
# ---------------------------------------------------------------------------
@register(
    "a64_cycle_time",
    oracle="""
    WITH ms AS (
      SELECT l_orderkey, min(l_shipdate) AS first_ship,
             max(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(date_diff('day', o.o_orderdate, ms.first_ship))
                // count(*) AS BIGINT) AS mean_days_to_ship,
           CAST(max(date_diff('day', o.o_orderdate, ms.first_ship))
                AS BIGINT) AS max_days_to_ship,
           CAST(sum(date_diff('day', ms.first_ship, ms.last_ship))
                // count(*) AS BIGINT) AS mean_ship_window_days
    FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def a64_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    ms = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    j = orders.join(ms, "o_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "sum(datediff(first_ship, o_orderdate)) div count(1)"
        ).alias("mean_days_to_ship"),
        F.max(F.datediff("first_ship", "o_orderdate"))
        .cast("long")
        .alias("max_days_to_ship"),
        F.expr(
            "sum(datediff(last_ship, first_ship)) div count(1)"
        ).alias("mean_ship_window_days"),
    )


# ---------------------------------------------------------------------------
# A68 — exact distinct counting via bitmap words: the bitmap-index
# rollup every OLAP engine (Doris/ClickHouse/Kylin) uses when exact
# COUNT(DISTINCT id) must survive re-aggregation. Pack each user_id
# into bit (id % 32) of word (id div 32), OR the masks per
# (event_type, word), popcount and sum. Unlike count(distinct) the
# intermediate (the word bitmap) is mergeable, so the same state
# serves rollups across dimensions without re-expanding the ids.
#
# Scale: two pipelined aggregations — the first compresses up to 32
# ids into one 8-byte word with MAP-SIDE partial bit_or (the expand
# that makes count-distinct shuffles explode never happens); the
# second sums O(distinct/32) popcounts. Both stay in whole-stage
# codegen.
# ---------------------------------------------------------------------------
@register(
    "a68_bitmap_distinct",
    oracle="""
    WITH m AS (
      SELECT event_type, user_id // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
               AS bm
      FROM events GROUP BY event_type, user_id // 32
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(bit_count(bm)) AS BIGINT) AS n_users
    FROM m GROUP BY event_type
    """,
)
def a68_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, cast(user_id % 32 as int))")
        ).alias("bm")
    )
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("bm")).cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# A70 — equi-DEPTH histogram (a18 is equi-width): 8 buckets holding
# ~n/8 rows each, the representation query optimizers keep because
# equal-population buckets bound selectivity error where equal-width
# buckets collapse under skew. A distinct value belongs to the bucket
# of its LAST row's global rank ((cum-1)*8 div n), so heavy values
# never split across buckets.
#
# Scale: the global rank is the a36 two-level prefix sum — per-value
# counts, within-price-bucket partitioned cumsum, plus ONE global
# window over O(buckets) bucket sums; the total row count rides in as
# a broadcast 1-row crossJoin. No single partition ever holds the
# distinct-value set.
# ---------------------------------------------------------------------------
@register(
    "a70_equidepth_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ), s AS (
      SELECT cents, c, sum(c) OVER (ORDER BY cents) AS cum FROM v
    ), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM v)
    SELECT CAST((cum - 1) * 8 // n AS BIGINT) AS bucket,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo_c,
           CAST(max(cents) AS BIGINT) AS hi_c
    FROM s CROSS JOIN nn
    GROUP BY 1
    """,
)
def a70_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    vc = orders.select(
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        )
    ).groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    b = vc.withColumn("bkt", F.expr("cents div 1000000"))
    within = b.withColumn(
        "cumw",
        F.sum("c").over(
            W.partitionBy("bkt")
            .orderBy("cents")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    boff = (
        b.groupBy("bkt")
        .agg(F.sum("c").alias("bs"))
        .withColumn(
            "off",
            F.sum("bs").over(
                W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
        .select("bkt", "off")
    )
    nn = vc.agg(F.sum("c").cast("long").alias("n"))
    ranked = (
        within.join(F.broadcast(boff), "bkt")
        .crossJoin(F.broadcast(nn))
        .withColumn("cum", F.expr("coalesce(off, 0L) + cumw"))
    )
    return (
        ranked.withColumn("bucket", F.expr("cast((cum - 1) * 8 div n as bigint)"))
        .groupBy("bucket")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.min("cents").cast("long").alias("lo_c"),
            F.max("cents").cast("long").alias("hi_c"),
        )
    )


# ---------------------------------------------------------------------------
# A71 — data-freshness audit: per event type, the last event time,
# how many days it lags the table's global high-water mark, and the
# trailing-30-day volume — the staleness table an on-call reads
# before trusting a partition. "Now" is the global max ts (never
# wall-clock: deterministic and replay-safe).
#
# Scale: one map-side-combined groupBy plus a broadcast 1-row global
# max; no windows, no second scan (the global max reuses the
# per-type maxima).
# ---------------------------------------------------------------------------
@register(
    "a71_freshness_audit",
    oracle="""
    WITH per AS (
      SELECT event_type, max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_total
      FROM events GROUP BY event_type
    ), hw AS (SELECT max(last_ts) AS hwm FROM per),
    recent AS (
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_30d
      FROM events e CROSS JOIN hw
      WHERE e.ts > hw.hwm - INTERVAL 30 DAY
      GROUP BY e.event_type
    )
    SELECT p.event_type,
           CAST(p.last_ts AS TIMESTAMP) AS last_ts,
           CAST(date_diff('day', CAST(p.last_ts AS DATE),
                          CAST(hw.hwm AS DATE)) AS BIGINT) AS days_behind,
           p.n_total,
           CAST(coalesce(r.n_30d, 0) AS BIGINT) AS n_30d
    FROM per p CROSS JOIN hw
    LEFT JOIN recent r ON p.event_type = r.event_type
    """,
)
def a71_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    hw = per.agg(F.max("last_ts").alias("hwm"))
    recent = (
        ev.crossJoin(F.broadcast(hw))
        .filter(F.expr("ts > hwm - interval 30 day"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_30d"))
    )
    return (
        per.crossJoin(F.broadcast(hw))
        .join(recent, "event_type", "left")
        .select(
            "event_type",
            "last_ts",
            F.expr(
                "cast(datediff(cast(hwm as date), cast(last_ts as date))"
                " as bigint)"
            ).alias("days_behind"),
            "n_total",
            F.expr("cast(coalesce(n_30d, 0L) as bigint)").alias("n_30d"),
        )
    )


# ---------------------------------------------------------------------------
# A84 — largest-remainder (Hamilton) apportionment: allocate an
# integer budget of 10,000 basis points across nations exactly
# proportional to revenue, the constrained-integer-allocation problem
# behind budget splits, seat apportionment, and pro-rata settlement.
# Floor shares via integer division, then the leftover points go to
# the largest remainders (nation-key tie-break) — the allocation sums
# to the budget EXACTLY, which no rounding scheme guarantees.
#
# Scale: one groupBy(nation) collapses the fact; totals ride a 1-row
# broadcast crossJoin (the a33/a34 discipline); the remainder rank is
# a window over O(nations) rows. All integer arithmetic — product
# bounded by budget x total_cents < 2^63 up to ~sf10^3.
# ---------------------------------------------------------------------------
@register(
    "a84_proportional_allocation",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), tot AS (SELECT sum(cents) AS tc FROM rev),
    fl AS (
      SELECT nation, cents,
             (10000 * cents) // tc AS fl,
             (10000 * cents) % tc AS rem
      FROM rev, tot
    ), lo AS (SELECT 10000 - sum(fl) AS leftover FROM fl),
    rk AS (
      SELECT nation, cents, fl, rem,
             row_number() OVER (ORDER BY rem DESC, nation) AS r
      FROM fl
    )
    SELECT nation,
           CAST(cents AS BIGINT) AS cents,
           CAST(fl + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_bp
    FROM rk, lo
    """,
)
def a84_proportional_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = (
        o.join(F.broadcast(c), "o_custkey")
        .join(
            F.broadcast(n),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(F.sum("cents").alias("cents"))
    )
    tot = rev.agg(F.sum("cents").alias("tc"))
    fl = rev.crossJoin(F.broadcast(tot)).select(
        "nation",
        "cents",
        F.expr("(10000 * cents) div tc").alias("fl"),
        F.expr("(10000 * cents) % tc").alias("rem"),
    )
    lo = fl.agg((F.lit(10000) - F.sum("fl")).alias("leftover"))
    rk = fl.select(
        "nation",
        "cents",
        "fl",
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("rem").desc(), "nation"))
        .alias("r"),
    )
    return rk.crossJoin(F.broadcast(lo)).select(
        "nation",
        F.col("cents").cast("long").alias("cents"),
        F.expr(
            "cast(fl + case when r <= leftover then 1 else 0 end as bigint)"
        ).alias("alloc_bp"),
    )
