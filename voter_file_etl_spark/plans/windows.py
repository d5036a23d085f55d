"""Window functions, sorts, limits, top-k (SURVEY.md §2.7-§2.8).

Implied by the reference workload: household ranking (eldest voter
per Mailing_Families_FamilyID), resume offsets as row_number, and
"largest households" style top-k. All windows partition by a key —
the 100 TB-safe shape (a global unpartitioned window appears only in
the offset ports, where it is semantic parity for a driver-side file
slice, never a data-scale operation; at scale resume is file-granular).

Ordering columns always end with a unique key so rank/lag results are
deterministic and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.intmath import floor_div_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _by_cust():
    return W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


# ---------------------------------------------------------------------------
# W1 — row_number: first order per customer (eldest-voter-per-family).
# ---------------------------------------------------------------------------
@register(
    "w1_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_date
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumn("rn", F.row_number().over(_by_cust()))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("first_date")
        )
    )


# ---------------------------------------------------------------------------
# W2 — rank / dense_rank: top account balances per nation.
# ---------------------------------------------------------------------------
@register(
    "w2_rank_dense_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, rnk, drnk
    FROM (SELECT c_nationkey, c_custkey,
                 rank() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS rnk,
                 dense_rank() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS drnk
          FROM customer)
    WHERE rnk <= 5
    """,
)
def w2_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# W3 — aggregate over a running frame (running turnout of SURVEY §2.7).
# DECIMAL running sum: the frame order is deterministic, so the exact
# arithmetic makes both engines agree bit-for-bit.
# ---------------------------------------------------------------------------
@register(
    "w3_agg_over_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w3_agg_over_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    frame = _by_cust().rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(frame).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# W4 — lag/lead: order-to-order deltas (election-to-election change
# across the per-year columns prisma/Voter.prisma:84-100).
# ---------------------------------------------------------------------------
@register(
    "w4_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_key,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_key,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                - lag(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS price_delta
    FROM orders
    """,
)
def w4_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    price = _dec("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(_by_cust()).alias("prev_key"),
        F.lead("o_orderkey").over(_by_cust()).alias("next_key"),
        (price - F.lag(price).over(_by_cust())).cast("double").alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# O1 — multi-column order-by (file ordering by numeric prefix,
# utils.ts:18-23 / LastModified desc, load-s3.ts:87-91).
# ---------------------------------------------------------------------------
@register(
    "o1_order_by",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def o1_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("order_day")
    ).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))


# ---------------------------------------------------------------------------
# O3 — limit/offset slice (the --start/--end file window,
# load.ts:79-87). Deterministic because the sort key is unique.
# ---------------------------------------------------------------------------
@register(
    "o3_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 50
    """,
)
def o3_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(50).limit(20)


# ---------------------------------------------------------------------------
# O4 — top-k: Spark plans TakeOrderedAndProject (no global sort — each
# partition keeps k rows, the driver merges k·p). Ties broken by the
# unique key so the k-set is deterministic.
# ---------------------------------------------------------------------------
@register(
    "o4_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def o4_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# W6 — first_value / last_value / nth_value over a full-partition
# frame (first order, latest order, second order per customer) —
# tie-broken on the key so both engines agree on frame order.
# ---------------------------------------------------------------------------
@register(
    "w6_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w6_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


# ---------------------------------------------------------------------------
# W7 — percent_rank / cume_dist: relative standing within a group
# (the "top X% of donors per segment" shape). Both are exact count
# ratios — (rank-1)/(n-1) and n_at_or_before/n — so the doubles are
# bit-identical across engines given a total order (price DESC with
# key tiebreak).
# ---------------------------------------------------------------------------
@register(
    "w7_percent_rank_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey)
    """,
)
def w7_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc(F.col("o_totalprice").cast("decimal(18,2)")), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# W8 — time-RANGE window frame: per-user trailing 1-hour sum/count
# over events (the "activity in the last hour at each event" shape).
# Unlike w3's ROWS frame (a fixed row count), a RANGE frame bounds
# the frame by the ORDER-BY VALUE — peers with equal timestamps are
# all in-frame, and gaps in time shrink the frame — which is the
# correct semantics for time-windowed features. Ordered by integer
# epoch micros so the frame bound (3.6e9 µs) is exact arithmetic in
# both engines; the sum routes through DECIMAL so frame order can't
# perturb the double.
#
# Scale: one shuffle keyed on user_id, then a per-partition sort and
# a running frame — Spark's WindowExec keeps only the active frame
# buffered, so memory is O(frame), not O(partition).
# ---------------------------------------------------------------------------
_W8_FRAME_US = 3_600_000_000  # 1 hour in microseconds


@register(
    "w8_time_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           epoch_us(ts) AS us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
           CAST(count(*) OVER w AS BIGINT) AS hour_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_W8_FRAME_US} PRECEDING AND CURRENT ROW)
    """,
)
def w8_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_W8_FRAME_US, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "us",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
        .cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("hour_n"),
    )


# ---------------------------------------------------------------------------
# W9 — nth_value over a full-partition frame: "the 3rd-highest
# balance holder in each segment, shown on every row" — the
# benchmark-row pattern (compare each row to a fixed per-group
# reference row, no self-join). The frame must be UNBOUNDED
# PRECEDING..UNBOUNDED FOLLOWING on BOTH engines: with the default
# ORDER BY frame, rows before rank 3 would see NULL. Ties are broken
# by c_custkey so "3rd" is a total-order rank, identical across
# engines.
#
# Scale: one hash-exchange on the partition key + one sort; the
# unbounded frame materializes one partition's window buffer per
# task — bounded by the largest group, not the table.
# ---------------------------------------------------------------------------
@register(
    "w9_nth_value",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           first_value(c_name) OVER w AS top_name,
           nth_value(c_name, 3) OVER w AS third_name
    FROM customer
    WINDOW w AS (
      PARTITION BY c_mktsegment
      ORDER BY c_acctbal DESC, c_custkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w9_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    win = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_name").over(win).alias("top_name"),
        F.nth_value("c_name", 3).over(win).alias("third_name"),
    )


# ---------------------------------------------------------------------------
# W11 — resample to a regular daily grid with forward fill: the
# time-series gap-fill every metrics warehouse needs ("what was the
# user's last reading ON day D", sparse readings). Three steps, each
# a standard scale shape:
#   1. per (user, day) last value — one window keyed on the pair
#      (row_number desc over (us, event_id), exact tie-break);
#   2. per-user day spine — sequence(min_day, max_day) exploded
#      executor-side (never a driver loop; spine size = span days);
#   3. forward fill — last(value, ignorenulls) over the per-user
#      day order, one exchange reused from step 1's user hash.
# The filled value is a raw double CARRIED, never summed, so the
# cross-engine hash is exact with no decimal discipline needed.
# ---------------------------------------------------------------------------
_W11_DAY_US = 86_400_000_000


@register(
    "w11_resample_ffill",
    oracle=f"""
    WITH d AS (
      SELECT user_id, epoch_us(ts) // {_W11_DAY_US} AS day_idx,
             epoch_us(ts) AS us, event_id, value
      FROM events
    ), lp AS (
      SELECT user_id, day_idx, value FROM (
        SELECT user_id, day_idx, value,
               row_number() OVER (PARTITION BY user_id, day_idx
                 ORDER BY us DESC, event_id DESC) AS rn
        FROM d) WHERE rn = 1
    ), b AS (
      SELECT user_id, min(day_idx) AS mn, max(day_idx) AS mx
      FROM d GROUP BY user_id
    ), sp AS (
      SELECT user_id, unnest(generate_series(mn, mx)) AS day_idx FROM b
    ), j AS (
      SELECT sp.user_id, sp.day_idx, lp.value
      FROM sp LEFT JOIN lp
        ON sp.user_id = lp.user_id AND sp.day_idx = lp.day_idx
    )
    SELECT user_id, day_idx,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           value IS NOT NULL AS has_event
    FROM j
    """,
)
def w11_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_W11_DAY_US}").alias("day_idx"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    day_w = W.partitionBy("user_id", "day_idx").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    last_per_day = (
        ev.withColumn("rn", F.row_number().over(day_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day_idx", "value")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("day_idx").alias("mn"), F.max("day_idx").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day_idx"),
        )
    )
    ffill = (
        W.partitionBy("user_id")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return spine.join(last_per_day, ["user_id", "day_idx"], "left").select(
        "user_id",
        "day_idx",
        F.last("value", ignorenulls=True).over(ffill).alias("filled_value"),
        F.col("value").isNotNull().alias("has_event"),
    )


# ---------------------------------------------------------------------------
# W12 — cumulative distinct count over time ("distinct users to
# date, per day"): the naive window collect_set is O(distinct) state
# per row and collapses at scale; the scalable identity is
#   running_distinct(day) = running_sum(first-occurrence flags)
# — mark each user's FIRST day (one groupBy(user) min), count new
# users per day (one bounded groupBy(day)), and a running sum over
# the tiny per-day frame. Three shuffles, none keyed on anything
# wider than (user) / (day); no per-row set state anywhere.
# ---------------------------------------------------------------------------
@register(
    "w12_cumulative_distinct",
    oracle=f"""
    WITH f AS (
      SELECT user_id, min(epoch_us(ts) // {_W11_DAY_US}) AS first_day
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day_idx, count(*) AS new_users
      FROM f GROUP BY first_day
    )
    SELECT day_idx, new_users,
           CAST(sum(new_users) OVER (ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_users_to_date
    FROM per_day
    """,
)
def w12_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    first = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_W11_DAY_US}").alias("day_idx"),
        )
        .groupBy("user_id")
        .agg(F.min("day_idx").alias("first_day"))
    )
    per_day = first.groupBy(F.col("first_day").alias("day_idx")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    run = W.orderBy("day_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        "day_idx",
        "new_users",
        F.sum("new_users").over(run).cast("long").alias("distinct_users_to_date"),
    )


# ---------------------------------------------------------------------------
# W13 — moving median over a row frame: the robust counterpart of
# w3's moving average (one outlier order shouldn't drag a customer's
# trailing-spend trend). Median is NOT algebraic — each frame must
# rank its members — but over a bounded 5-row trailing frame the
# per-row cost is O(frame log frame) inside the partition-local
# window sort; the only shuffle is the hash partition on o_custkey.
# Determinism: prices go through integer cents, the exact-percentile
# median of <= 5 ints is either an int or an exact half, and both
# engines emit 2*median as a lossless BIGINT — no float hashing.
# ---------------------------------------------------------------------------
@register(
    "w13_moving_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(2 * median(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS med_cents_x2
    FROM orders
    """,
)
def w13_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            2
            * F.expr("percentile(cast(floor(o_totalprice * 100 + 0.5d) as bigint), 0.5)").over(w)
        )
        .cast("long")
        .alias("med_cents_x2"),
    )


# ---------------------------------------------------------------------------
# O5 — NULL-aware ordering semantics: ORDER BY with explicit NULLS
# FIRST/LAST and mixed directions — the sort-surface contract that
# differs silently between engines (Spark's default for DESC is
# nulls-last, Postgres's is nulls-first; explicit modifiers are the
# only portable spelling). A nullable key is derived in-plan
# (priority gaps to NULL), then top-40 under "NULL priority first,
# then price descending, orderkey tiebreak" — with LIMIT this plans
# TakeOrderedAndProject, so the NULL ordering is exercised inside
# the per-partition top-k comparator, not a full sort.
# ---------------------------------------------------------------------------
@register(
    "o5_nulls_ordering",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderpriority, '5-LOW') AS prio,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
    ORDER BY prio DESC NULLS FIRST, cents DESC, o_orderkey
    LIMIT 40
    """,
)
def o5_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    return d.orderBy(
        F.col("prio").desc_nulls_first(),
        F.col("cents").desc(),
        F.col("o_orderkey"),
    ).limit(40)


# ---------------------------------------------------------------------------
# W14 — running peak + drawdown per customer: cummax over the order
# history and the gap from it — the "how far below the best so far"
# shape (equity drawdown, QPS-vs-peak, model-metric regression
# tracking). One window partition per customer, running max is an
# algebraic frame aggregate (O(1) per row over the growing frame);
# no second pass, no self-join. Integer cents end-to-end.
# ---------------------------------------------------------------------------
@register(
    "w14_drawdown",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(max(cents) OVER w AS BIGINT) AS peak_cents,
           CAST(max(cents) OVER w - cents AS BIGINT) AS drawdown_cents
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def w14_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    return d.select(
        "o_custkey",
        "o_orderkey",
        F.max("cents").over(w).cast("long").alias("peak_cents"),
        (F.max("cents").over(w) - F.col("cents"))
        .cast("long")
        .alias("drawdown_cents"),
    )


# ---------------------------------------------------------------------------
# W15 — EWMA smoothing with exact dyadic weights: the metric-smoothing
# window every monitoring/curation dashboard runs (order-value trend
# per customer here; loss curves and throughput gauges at scale).
# A true infinite-memory EWMA is a linear recurrence Spark window
# frames cannot express; the standard distributed spelling bounds the
# memory to the last K points, where the dropped tail's weight is
# 2^-K of the total (K=8 -> 0.4%, below any dashboard's resolution).
#
# Exactness discipline: alpha = 1/2 makes every weight a power of two
# (2^(7-lag)), so numerator and denominator are pure int64 sums and
# the final smoothed value is one integer division — bit-identical
# across engines, no float accumulation order to disagree on.
#
# Scale: one shuffle on o_custkey; the lag-chain is partition-local
# with O(K) state per row and stays inside WholeStageCodegen (plain
# lag/coalesce expressions, no UDF). K is the memory/fidelity knob.
# ---------------------------------------------------------------------------
_W15_K = 8


@register(
    "w15_ewma",
    oracle=f"""
    SELECT o_custkey, o_orderkey, cents,
           CAST((
             {" + ".join(f"coalesce(lag(cents, {j}) OVER w, 0) * {2 ** (_W15_K - 1 - j)}" for j in range(_W15_K))}
           ) // (
             {" + ".join(f"CASE WHEN lag(cents, {j}) OVER w IS NULL THEN 0 ELSE {2 ** (_W15_K - 1 - j)} END" for j in range(_W15_K))}
           ) AS BIGINT) AS ewma_cents
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w15_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for j in range(_W15_K):
        weight = 2 ** (_W15_K - 1 - j)
        lagged = F.lag("cents", j).over(w)
        num = num + F.coalesce(lagged * F.lit(weight), F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0)
        )
    return d.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        # integer division (x - x % y) / y keeps the result pure int64
        # (matches the oracle's // floor-division on non-negative sums)
        ((num - num % den) / den).cast("long").alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# W16 — rolling regression slope: the per-entity trend detector
# (is this customer's spend rising?) as a windowed least-squares fit
# over the last 5 orders. a41 fits ONE global OLS line; this is the
# windowed sibling every monitoring dashboard actually plots.
#
# Exactness discipline: x is the order sequence number (row_number),
# y is cents; the slope is emitted as its EXACT integer numerator /
# denominator pair (n*Sxy - Sx*Sy, n*Sxx - Sx^2) instead of a float
# quotient, so parity is pure int64 — no division, no rounding
# policy, no floor-vs-truncate divergence.
#
# Scale: one shuffle on o_custkey serves BOTH window passes (the
# rank and the frame sums share partitioning), then map-side
# arithmetic. Frames are ROWS-bounded (5), so state per key is O(1).
# ---------------------------------------------------------------------------
@register(
    "w16_moving_slope",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), s AS (
      SELECT o_custkey, o_orderkey, cents,
             count(*) OVER w AS n,
             sum(rn) OVER w AS sx,
             sum(cents) OVER w AS sy,
             sum(rn * cents) OVER w AS sxy,
             sum(rn * rn) OVER w AS sxx
      FROM seq
      WINDOW w AS (PARTITION BY o_custkey ORDER BY rn
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey, cents,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
    FROM s WHERE n = 5
    """,
)
def w16_moving_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.row_number().over(_by_cust()).alias("rn"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("rn")
        .rowsBetween(-4, W.currentRow)
    )
    s = seq.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("rn").over(w).alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("rn") * F.col("cents")).over(w).alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).over(w).alias("sxx"),
    )
    return s.filter(F.col("n") == 5).select(
        "o_custkey",
        "o_orderkey",
        "cents",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
    )


# ---------------------------------------------------------------------------
# W17 — rolling median + MAD (robust rolling statistics): the
# outlier-resistant alternative to w3's rolling mean for per-entity
# monitoring — one wild order does not drag a 5-order median, and
# the MAD gives the robust spread that flags the NEXT wild order
# (a35 computes the global MAD screen; this is its windowed
# sibling). Frame values ride a bounded collect_list(5) per row;
# median and MAD are exact int64 element picks (sorted[2] of 5) —
# no interpolation, no floats, engine-identical by construction.
#
# Scale: one shuffle on o_custkey shared by the sequence rank and
# the ROWS frame; per-row state is the 5-element frame array —
# O(frame), never O(history).
# ---------------------------------------------------------------------------
@register(
    "w17_rolling_mad",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), framed AS (
      SELECT o_custkey, o_orderkey, cents, rn,
             list(cents) OVER (PARTITION BY o_custkey ORDER BY rn
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
               AS arr
      FROM seq
    ), med AS (
      SELECT o_custkey, o_orderkey, cents,
             list_sort(arr)[3] AS med5, arr
      FROM framed WHERE rn >= 5
    )
    SELECT o_custkey, o_orderkey, cents,
           CAST(med5 AS BIGINT) AS med5,
           CAST(list_sort(list_transform(arr, x -> abs(x - med5)))[3]
                AS BIGINT) AS mad5
    FROM med
    """,
)
def w17_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.row_number().over(_by_cust()).alias("rn"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("rn")
        .rowsBetween(-4, W.currentRow)
    )
    framed = seq.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        "rn",
        F.collect_list("cents").over(w).alias("arr"),
    ).filter(F.col("rn") >= 5)
    med = framed.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        "arr",
        F.element_at(F.array_sort("arr"), 3).alias("med5"),
    )
    return med.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        F.col("med5").cast("long").alias("med5"),
        F.element_at(
            F.array_sort(F.transform("arr", lambda x: F.abs(x - F.col("med5")))),
            3,
        )
        .cast("long")
        .alias("mad5"),
    )


# ---------------------------------------------------------------------------
# W18 — resample + BACKWARD fill: w11's mirror — gaps take the NEXT
# known observation (the imputation for backfilled corrections and
# "effective from" reference data, where the later record governs
# the gap before it), plus the days_to_next staleness column a
# freshness SLA reports on. Same daily spine; the fill window is
# (CURRENT ROW .. UNBOUNDED FOLLOWING) with first_value IGNORE
# NULLS.
#
# Scale: identical posture to w11 — spine explode bounded by the
# per-user day span, one user_id shuffle shared by the fill and
# staleness windows.
# ---------------------------------------------------------------------------
@register(
    "w18_resample_bfill",
    oracle=f"""
    WITH d AS (
      SELECT user_id, epoch_us(ts) // {_W11_DAY_US} AS day_idx,
             epoch_us(ts) AS us, event_id, value
      FROM events
    ), lp AS (
      SELECT user_id, day_idx, value FROM (
        SELECT user_id, day_idx, value,
               row_number() OVER (PARTITION BY user_id, day_idx
                 ORDER BY us DESC, event_id DESC) AS rn
        FROM d) WHERE rn = 1
    ), b AS (
      SELECT user_id, min(day_idx) AS mn, max(day_idx) AS mx
      FROM d GROUP BY user_id
    ), sp AS (
      SELECT user_id, unnest(generate_series(mn, mx)) AS day_idx FROM b
    ), j AS (
      SELECT sp.user_id, sp.day_idx, lp.value
      FROM sp LEFT JOIN lp
        ON sp.user_id = lp.user_id AND sp.day_idx = lp.day_idx
    )
    SELECT user_id, day_idx,
           first_value(value IGNORE NULLS) OVER w AS bfilled_value,
           CAST(first_value(CASE WHEN value IS NOT NULL THEN day_idx END
                            IGNORE NULLS) OVER w - day_idx AS BIGINT)
             AS days_to_next,
           value IS NOT NULL AS has_event
    FROM j
    WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """,
)
def w18_resample_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_W11_DAY_US}").alias("day_idx"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    day_w = W.partitionBy("user_id", "day_idx").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    last_per_day = (
        ev.withColumn("rn", F.row_number().over(day_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "day_idx", "value")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(F.min("day_idx").alias("mn"), F.max("day_idx").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day_idx"),
        )
    )
    bfill = (
        W.partitionBy("user_id")
        .orderBy("day_idx")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    j = spine.join(last_per_day, ["user_id", "day_idx"], "left")
    next_day = F.first(
        F.when(F.col("value").isNotNull(), F.col("day_idx")),
        ignorenulls=True,
    ).over(bfill)
    return j.select(
        "user_id",
        "day_idx",
        F.first("value", ignorenulls=True).over(bfill).alias(
            "bfilled_value"
        ),
        (next_day - F.col("day_idx")).cast("long").alias("days_to_next"),
        F.col("value").isNotNull().alias("has_event"),
    )


# ---------------------------------------------------------------------------
# W21 — rolling correlation between two daily series (order count vs
# order dollars) over a 14-day frame per priority: the bivariate
# rolling statistic behind "is volume decoupling from revenue"
# monitoring. All six sufficient statistics (n, Σx, Σy, Σx², Σy²,
# Σxy) are EXACT bigint window sums sharing one frame; only the
# final Pearson ratio touches doubles — num/√dx/√dy with IEEE
# correctly-rounded /,*,sqrt, so the identical expression text is
# bit-equal across engines, then floor(·1e4 + 0.5) quantizes to bp.
# Dollars (floor of totalprice) keep n·Σy² inside int64 through
# ~sf1; larger corpora would rescale y (the comment is the contract).
#
# Scale: the daily rollup aggregates first (map-side combine; rows =
# days × priorities, bounded); all six window sums share ONE
# exchange + sort on priority. Degenerate frames (zero variance)
# emit 0 by the guarded CASE.
# ---------------------------------------------------------------------------
@register(
    "w21_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ), s AS (
      SELECT priority, day, x, y,
             CAST(count(*) OVER w AS BIGINT) AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             sum(x * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY priority ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT priority, CAST(day AS DATE) AS day, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(floor(
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
                  * 10000 + 0.5) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS corr_bp
    FROM s
    """,
)
def w21_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.expr("cast(floor(o_totalprice) as bigint)"))
        .cast("long")
        .alias("y"),
    )
    w = W.partitionBy("priority").orderBy("day").rowsBetween(-13, 0)
    s = daily.select(
        "priority",
        "day",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    return s.select(
        "priority",
        F.col("day").cast("date").alias("day"),
        "n",
        F.expr(
            "case when n * sxx - sx * sx > 0 and n * syy - sy * sy > 0"
            " then cast(floor("
            "cast(n * sxy - sx * sy as double)"
            " / sqrt(cast(n * sxx - sx * sx as double))"
            " / sqrt(cast(n * syy - sy * sy as double))"
            " * 10000 + 0.5d) as bigint)"
            " else 0L end"
        ).alias("corr_bp"),
    )


# ---------------------------------------------------------------------------
# W22 — 3-sigma anomaly days, integer-exact: flag days whose order
# count deviates from the priority's mean by more than three
# standard deviations WITHOUT ever computing a float mean or sd —
# the test  n·(n·x − Σx)² > 9·(n·Σx² − (Σx)²)·n  is the 3-sigma
# rule with both sides multiplied through by n³ (population
# variance), so both engines compare exact int64/int128-free
# products. The alerting shape ops teams bolt onto a46/w21's
# monitors; CUSUM (w20) catches drifts, this catches spikes.
#
# Scale: one map-side-combined daily rollup; the per-priority
# moments attach as a broadcast (bounded 5-row aggregate); the flag
# is map-side arithmetic.
# ---------------------------------------------------------------------------
@register(
    "w22_sigma_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), mom AS (
      SELECT priority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY priority
    )
    SELECT d.priority,
           CAST(max(m.n) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN m.n * (m.n * d.x - m.sx) * (m.n * d.x - m.sx)
                              > 9 * (m.n * m.sxx - m.sx * m.sx) * m.n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(max((m.n * d.x - m.sx) * (m.n * d.x - m.sx) //
                    greatest(m.n, 1)) AS BIGINT) AS max_dev_sq_scaled
    FROM daily d JOIN mom m ON d.priority = m.priority
    GROUP BY d.priority
    """,
)
def w22_sigma_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    mom = daily.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    joined = daily.join(F.broadcast(mom), "priority")
    return joined.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_days"),
        F.sum(
            F.when(
                F.col("n")
                * (F.col("n") * F.col("x") - F.col("sx"))
                * (F.col("n") * F.col("x") - F.col("sx"))
                > 9 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.col("n"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_anomalies"),
        F.max(
            F.expr("(n * x - sx) * (n * x - sx) div greatest(n, 1L)")
        )
        .cast("long")
        .alias("max_dev_sq_scaled"),
    )


# ---------------------------------------------------------------------------
# W23 — month-over-month change: monthly revenue per priority with
# the delta and percent change vs the prior month in integer basis
# points (lag over the bounded monthly rollup) — the first chart of
# every BI dashboard, complementing w15 (smoothing), a41 (trend),
# and a46 (seasonality). date_trunc('month') is engine-identical;
# cents are exact integers; the first month of each series reports
# 0 deltas by COALESCE on both sides.
#
# Scale: map-side-combined monthly rollup, then ONE window exchange
# partitioned by priority over O(months) rows.
# ---------------------------------------------------------------------------
@register(
    "w23_mom_change",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, month, cents,
           CAST(cents - coalesce(lag(cents) OVER w, cents) AS BIGINT)
             AS delta_cents,
           CAST(10000 * (cents - coalesce(lag(cents) OVER w, cents))
                // coalesce(lag(cents) OVER w, cents) AS BIGINT)
             AS mom_bp
    FROM m
    WINDOW w AS (PARTITION BY priority ORDER BY month)
    """,
)
def w23_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("cents"),
    )
    w = W.partitionBy("priority").orderBy("month")
    prev = F.coalesce(F.lag("cents").over(w), F.col("cents"))
    return m.select(
        "priority",
        "month",
        "cents",
        (F.col("cents") - prev).cast("long").alias("delta_cents"),
        F.expr(
            "10000 * (cents - coalesce(lag(cents) over"
            " (partition by priority order by month), cents))"
            " div coalesce(lag(cents) over"
            " (partition by priority order by month), cents)"
        ).alias("mom_bp"),
    )


# ---------------------------------------------------------------------------
# W24 — rank migration (leaderboard deltas): nations ranked by
# yearly customer-order revenue, with each nation's rank change vs
# the prior year — the "who moved up" report (precinct turnout
# leaderboards in the reference's terms). Two window families
# compose: rank() within year (full tiebreak on the key), then
# lag() across years per nation; first-year rows report delta 0 via
# COALESCE on both sides. Exact integer cents.
#
# Scale: the year×nation rollup is bounded (7 years × 25 nations),
# so both windows run over ~175 rows after one map-side-combined
# aggregate of the join; the customer->nation attach is a broadcast.
# ---------------------------------------------------------------------------
@register(
    "w24_rank_migration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nation, yr, cents,
             CAST(rank() OVER (PARTITION BY yr
                               ORDER BY cents DESC, nation) AS BIGINT) AS rnk
      FROM rev
    )
    SELECT nation, yr, cents, rnk,
           CAST(coalesce(lag(rnk) OVER (PARTITION BY nation ORDER BY yr)
                         - rnk, 0) AS BIGINT) AS rank_delta
    FROM ranked
    """,
)
def w24_rank_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), "c_nationkey")
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("yr")
        )
        .agg(
            F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
            .cast("long")
            .alias("cents")
        )
    )
    w_rank = W.partitionBy("yr").orderBy(F.desc("cents"), "nation")
    w_lag = W.partitionBy("nation").orderBy("yr")
    ranked = rev.select(
        "nation", "yr", "cents", F.rank().over(w_rank).cast("long").alias("rnk")
    )
    return ranked.select(
        "nation",
        "yr",
        "cents",
        "rnk",
        F.coalesce(F.lag("rnk").over(w_lag) - F.col("rnk"), F.lit(0))
        .cast("long")
        .alias("rank_delta"),
    )


# ---------------------------------------------------------------------------
# W25 — local peak detection: days whose revenue strictly exceeds
# every day in the surrounding ±3-row neighborhood — the discrete
# local-maxima sweep behind spike annotation on monitoring charts
# (w22 flags statistical outliers; this finds shape extrema
# regardless of magnitude). The neighborhood maxima come from two
# frames over ONE sort (preceding-3 and following-3); strict >
# against both makes peaks unambiguous under ties.
#
# Scale: bounded daily rollup per priority, one exchange, two
# frames sharing the sort; output is peaks only.
# ---------------------------------------------------------------------------
@register(
    "w25_local_peaks",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ), n AS (
      SELECT priority, day, cents,
             max(cents) OVER (PARTITION BY priority ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS prev_max,
             max(cents) OVER (PARTITION BY priority ORDER BY day
               ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS next_max
      FROM daily
    )
    SELECT priority, CAST(day AS DATE) AS day, cents
    FROM n
    WHERE cents > coalesce(prev_max, -1) AND cents > coalesce(next_max, -1)
    """,
)
def w25_local_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"))
        .cast("long")
        .alias("cents")
    )
    w = W.partitionBy("priority").orderBy("day")
    n = daily.select(
        "priority",
        "day",
        "cents",
        F.max("cents").over(w.rowsBetween(-3, -1)).alias("prev_max"),
        F.max("cents").over(w.rowsBetween(1, 3)).alias("next_max"),
    )
    return n.filter(
        (F.col("cents") > F.coalesce("prev_max", F.lit(-1)))
        & (F.col("cents") > F.coalesce("next_max", F.lit(-1)))
    ).select("priority", F.col("day").cast("date").alias("day"), "cents")


# ---------------------------------------------------------------------------
# O6 — keyset pagination: fetch "the 50 rows after the 100th
# orderkey" with a WHERE key > boundary ... LIMIT 50 — the
# serving-layer pagination pattern that stays O(page) at any depth
# because the boundary predicate PUSHES TO THE SCAN, where
# OFFSET-based paging (o3) must produce and discard every earlier
# row. The boundary itself is computed in-plan (the 100th smallest
# key via a bounded top-k), so the page is deterministic at any sf.
#
# Scale: top-k for the boundary + a pushed-predicate scan + top-k
# for the page — no global sort, no offset scan-and-discard.
# ---------------------------------------------------------------------------
@register(
    "o6_keyset_pagination",
    oracle="""
    WITH boundary AS (
      SELECT max(o_orderkey) AS k FROM (
        SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100
      )
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders CROSS JOIN boundary
    WHERE o_orderkey > boundary.k
    ORDER BY o_orderkey LIMIT 50
    """,
)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    boundary = (
        orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(100)
        .agg(F.max("o_orderkey").alias("k"))
    )
    return (
        orders.crossJoin(F.broadcast(boundary))
        .filter(F.col("o_orderkey") > F.col("k"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
                "cents"
            ),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# W26 — growth streaks: the longest run of consecutive
# month-over-month revenue INCREASES per priority (and the count of
# such runs) — the momentum readout layered on w23's deltas using
# the gaps-and-islands anchor (month_index − run_index is constant
# along a streak). First months (no prior) break streaks by
# definition. Exact integer cents throughout.
#
# Scale: monthly rollup (bounded), ONE priority-partitioned sort
# shared by the lag and both row_numbers, bounded island rollup.
# ---------------------------------------------------------------------------
@register(
    "w26_growth_streaks",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ), flagged AS (
      SELECT priority, month,
             CASE WHEN cents > lag(cents) OVER w THEN 1 ELSE 0 END AS up,
             row_number() OVER w AS i
      FROM m WINDOW w AS (PARTITION BY priority ORDER BY month)
    ), runs AS (
      SELECT priority,
             i - row_number() OVER (
               PARTITION BY priority, up ORDER BY i) AS anchor,
             up
      FROM flagged
    ), streaks AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS len
      FROM runs WHERE up = 1 GROUP BY priority, anchor
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS up_months
    FROM streaks GROUP BY priority
    """,
)
def w26_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")).alias(
            "cents"
        )
    )
    w = W.partitionBy("priority").orderBy("month")
    flagged = m.select(
        "priority",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .otherwise(0)
        .alias("up"),
        F.row_number().over(w).alias("i"),
    )
    runs = flagged.select(
        "priority",
        "up",
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy("priority", "up").orderBy("i")
            )
        ).alias("anchor"),
    )
    streaks = (
        runs.filter(F.col("up") == 1)
        .groupBy("priority", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    return streaks.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("up_months"),
    )


# ---------------------------------------------------------------------------
# W27 — recency-decayed engagement score, integer-exact: each
# order's cents contribute shifted right by one bit per 30 days of
# age (a half-life-of-30-days decay expressed as integer shifts —
# cents >> (age div 30) — instead of the float pow every naive
# implementation reaches for and then can't reproduce across
# engines). Top-20 customers by decayed score with full tiebreak —
# the "who is warm right now" ranking every outreach queue runs.
# The anchor date is an in-plan broadcast.
#
# Scale: map-side age/shift arithmetic + one customer rollup + a
# bounded top-k (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@register(
    "w27_decay_score",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    scored AS (
      SELECT o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               // (1 << least(date_diff('day', o_orderdate,
                                        (SELECT maxd FROM mx)) // 30, 62))
               AS decayed_c
      FROM orders
    )
    SELECT o_custkey,
           CAST(sum(decayed_c) AS BIGINT) AS score_c,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM scored GROUP BY o_custkey
    ORDER BY score_c DESC, o_custkey LIMIT 20
    """,
)
def w27_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    scored = orders.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        F.expr(
            "cast(floor(o_totalprice * 100 + 0.5d) as bigint)"
            " div shiftleft(1L, cast(least(datediff(maxd, o_orderdate)"
            " div 30, 62) as int))"
        ).alias("decayed_c"),
    )
    return (
        scored.groupBy("o_custkey")
        .agg(
            F.sum("decayed_c").cast("long").alias("score_c"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .orderBy(F.desc("score_c"), "o_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# W28 — monthly percentile bands: exact p10/p50/p90 of order values
# per month as INTEGER ELEMENT PICKS (row_number against the
# month's count — the w13/w17 discipline, never interpolating
# percentile() whose float midpoints diverge across engines). The
# monitoring bands behind every "is this month's distribution
# normal" chart.
#
# Scale: one month-partitioned sort serves the rank and the count;
# the picks filter to 3 rows per month before the final pivot-style
# rollup.
# ---------------------------------------------------------------------------
@register(
    "w28_monthly_bands",
    oracle="""
    WITH v AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), ranked AS (
      SELECT month, cents,
             row_number() OVER (PARTITION BY month
                                ORDER BY cents, month) AS r,
             count(*) OVER (PARTITION BY month) AS n
      FROM v
    )
    SELECT month,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN r = (n - 1) * 10 // 100 + 1
                         THEN cents END) AS BIGINT) AS p10_c,
           CAST(max(CASE WHEN r = (n - 1) * 50 // 100 + 1
                         THEN cents END) AS BIGINT) AS p50_c,
           CAST(max(CASE WHEN r = (n - 1) * 90 // 100 + 1
                         THEN cents END) AS BIGINT) AS p90_c
    FROM ranked GROUP BY month
    """,
)
def w28_monthly_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    v = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    w = W.partitionBy("month").orderBy("cents", "month")
    ranked = v.select(
        "month",
        "cents",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("month")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("r") == F.expr(f"(n - 1) * {p} div 100 + 1"), F.col("cents")
        )
    ).cast("long")
    return ranked.groupBy("month").agg(
        F.max("n").cast("long").alias("n_orders"),
        pick(10).alias("p10_c"),
        pick(50).alias("p50_c"),
        pick(90).alias("p90_c"),
    )


# ---------------------------------------------------------------------------
# W29 — monthly OHLC bars over order values: open/close are the
# first/last order's value in event order (orderdate, then orderkey
# as the tiebreak, fused into ONE bigint sequence number so both
# engines pick the identical row), high/low/volume are plain
# extremes and sums. The candlestick shape every time-series
# dashboard draws, as a single map-side-combinable aggregation.
#
# Scale: one shuffle on month; min_by/max_by are declarative
# aggregates with partial (map-side) combine, so the reduce side
# sees one row per (partition, month) — never the raw orders.
# ---------------------------------------------------------------------------
@register(
    "w29_ohlc",
    oracle="""
    WITH v AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               * 10000000000 + o_orderkey AS seq
      FROM orders
    )
    SELECT month,
           CAST(arg_min(cents, seq) AS BIGINT) AS open_c,
           CAST(max(cents) AS BIGINT) AS high_c,
           CAST(min(cents) AS BIGINT) AS low_c,
           CAST(arg_max(cents, seq) AS BIGINT) AS close_c,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS volume_c
    FROM v GROUP BY month
    """,
)
def w29_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # seq = epoch_day * 1e10 + orderkey: unique per order (orderkey
    # < 1e10 at every TPC-H scale below SF~1300), total order,
    # identical arithmetic in DuckDB.
    v = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            * F.lit(10000000000).cast("long")
            + F.col("o_orderkey")
        ).alias("seq"),
    )
    return v.groupBy("month").agg(
        F.min_by("cents", "seq").cast("long").alias("open_c"),
        F.max("cents").cast("long").alias("high_c"),
        F.min("cents").cast("long").alias("low_c"),
        F.max_by("cents", "seq").cast("long").alias("close_c"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("volume_c"),
    )


# ---------------------------------------------------------------------------
# O7 — 2-D skyline (Pareto front): the orders no other order beats
# on BOTH price (lower is better) and recency (newer is better) —
# "cheapest for their recency". Domination is the standard strict
# pair: A dominates B iff A.price <= B.price AND A.day >= B.day with
# at least one strict.
#
# Scale: never the quadratic NOT-EXISTS the definition suggests.
# Collapse to distinct prices with their max day (only that candidate
# can survive its price class), then the classic sorted sweep
# ("keep a point iff its day exceeds the running max day over all
# strictly cheaper points") as a TWO-LEVEL prefix max — the a36
# empirical-CDF pattern: within-price-bucket partitioned windows plus
# one global window over O(buckets) bucket maxima — so no single
# partition ever holds the full distinct-price set.
# ---------------------------------------------------------------------------
@register(
    "o7_skyline",
    oracle="""
    WITH v AS (
      SELECT DISTINCT
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d
      FROM orders
    ), cand AS (
      SELECT cents, CAST(max(d) AS BIGINT) AS d FROM v GROUP BY cents
    ), s AS (
      SELECT cents, d,
             max(d) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM cand
    )
    SELECT cents AS price_c,
           CAST(DATE '1970-01-01' + INTERVAL (d) DAY AS DATE) AS order_date
    FROM s WHERE pm IS NULL OR d > pm
    """,
)
def o7_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    v = orders.select(
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    ).distinct()
    cand = v.groupBy("cents").agg(F.max("d").cast("long").alias("d"))
    # Two-level prefix max: $10k price buckets keep every partitioned
    # window bounded; the only global window runs over O(buckets) rows.
    b = cand.withColumn("bkt", F.expr("cents div 1000000"))
    in_bkt = b.withColumn(
        "run_prior",
        F.max("d").over(
            W.partitionBy("bkt")
            .orderBy("cents")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    bmax = b.groupBy("bkt").agg(F.max("d").alias("bd"))
    boff = bmax.withColumn(
        "bkt_prior",
        F.max("bd").over(
            W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
        ),
    ).select("bkt", "bkt_prior")
    joined = in_bkt.join(F.broadcast(boff), "bkt")
    # greatest() skips NULLs (repo gotcha) — exactly right here: a
    # NULL side means "no prior point", i.e. -infinity.
    survived = joined.withColumn(
        "pm", F.greatest("run_prior", "bkt_prior")
    ).filter(F.col("pm").isNull() | (F.col("d") > F.col("pm")))
    return survived.select(
        F.col("cents").alias("price_c"),
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int"))
        .alias("order_date"),
    )


# ---------------------------------------------------------------------------
# W30 — linear-interpolation resample: each order priority's daily
# revenue series, densified to its full day range, with missing days
# filled by LINEAR interpolation between the surrounding observed
# days (w11 forward-fills, w18 backward-fills; this draws the line).
# Edges clamp to the nearest observation. Interpolated cents use a
# floor division written portably (truncating div on made-positive
# operands), because Spark's `div` truncates while DuckDB's `//`
# floors — they disagree exactly when the slope is negative.
#
# Scale: spine explode is bounded by the series' day range; every
# window partitions by the series key; one shuffle joins spine to
# observations on (priority, day).
# ---------------------------------------------------------------------------
@register(
    "w30_resample_linterp",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS prio,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders GROUP BY 1, 2
    ), bounds AS (
      SELECT prio, min(d) AS d0, max(d) AS d1 FROM obs GROUP BY prio
    ), spine AS (
      SELECT prio, CAST(i AS BIGINT) AS d
      FROM bounds, unnest(range(d0, d1 + 1)) AS g(i)
    ), j AS (
      SELECT s.prio, s.d, o.v FROM spine s
      LEFT JOIN obs o ON s.prio = o.prio AND s.d = o.d
    ), f AS (
      SELECT prio, d, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY prio ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER
          (PARTITION BY prio ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY prio ORDER BY d
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER
          (PARTITION BY prio ORDER BY d
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT prio, CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS DATE) AS day,
      CAST(CASE
        WHEN v IS NOT NULL THEN v
        WHEN pv IS NULL THEN nv
        WHEN nv IS NULL THEN pv
        ELSE pv + (case when ((nv - pv) * (d - pd)) >= 0 then ((nv - pv) * (d - pd)) // (nd - pd) else -(((-((nv - pv) * (d - pd))) + (nd - pd) - 1) // (nd - pd)) end)
      END AS BIGINT) AS filled_c,
      CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_interp
    FROM f
    """,
)
def w30_resample_linterp(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    obs = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("prio", "d").agg(F.sum("cents").cast("long").alias("v"))
    # Materialized once (r13, the a49/x4 discipline): the daily
    # rollup (full orders scan + shuffle) feeds BOTH the spine bounds
    # and the left-join observation side; without the truncation each
    # reference re-runs the scan+aggregate.
    obs = obs.transform(materialize)
    spine = (
        obs.groupBy("prio")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "prio",
            F.explode(F.expr("sequence(d0, d1)")).alias("d"),
        )
    )
    j = spine.join(obs, ["prio", "d"], "left")
    wp = W.partitionBy("prio").orderBy("d")
    back = wp.rowsBetween(W.unboundedPreceding, 0)
    fwd = wp.rowsBetween(0, W.unboundedFollowing)
    f = j.select(
        "prio",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("d")), ignorenulls=True)
        .over(back)
        .alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("d")), ignorenulls=True)
        .over(fwd)
        .alias("nd"),
    )
    return f.select(
        "prio",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int"))
        .alias("day"),
        F.expr(
            """cast(case
                 when v is not null then v
                 when pv is null then nv
                 when nv is null then pv
                 else pv + (case when ((nv - pv) * (d - pd)) >= 0 then ((nv - pv) * (d - pd)) div (nd - pd) else -(((-((nv - pv) * (d - pd))) + (nd - pd) - 1) div (nd - pd)) end)
               end as bigint)"""
        ).alias("filled_c"),
        F.expr(
            "cast(case when v is null then 1 else 0 end as bigint)"
        ).alias("is_interp"),
    )


# ---------------------------------------------------------------------------
# W31 — time-series alignment: two sparse daily series (urgent vs
# low-priority revenue) aligned onto the UNION of their observation
# days, each side forward-filled, with the spread emitted per day —
# the pandas `.align(method='ffill')` operation as window plans.
# Alignment-then-compare is the prerequisite of every spread /
# ratio / hedge analysis; doing it with two ffill windows over one
# union spine avoids the as-of join per side.
#
# Scale: the spine is the distinct-day union (no cross join); both
# fills share ONE ordered window pass (two last_value ignore-nulls
# over the same window), and days before a series' first observation
# stay NULL rather than inventing data.
# ---------------------------------------------------------------------------
@register(
    "w31_series_align",
    oracle="""
    WITH a AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ), b AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1
    ), spine AS (
      SELECT day FROM a UNION SELECT day FROM b
    ), j AS (
      SELECT s.day, a.v AS av, b.v AS bv
      FROM spine s
      LEFT JOIN a ON s.day = a.day
      LEFT JOIN b ON s.day = b.day
    ), f AS (
      SELECT day,
        last_value(av IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS urgent_c,
        last_value(bv IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS low_c
      FROM j
    )
    SELECT day, urgent_c, low_c,
           CASE WHEN urgent_c IS NOT NULL AND low_c IS NOT NULL
                THEN urgent_c - low_c END AS spread_c
    FROM f
    """,
)
def w31_series_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")

    def series(prio: str, name: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderpriority") == prio)
            .select(F.col("o_orderdate").cast("date").alias("day"), cents.alias("c"))
            .groupBy("day")
            .agg(F.sum("c").cast("long").alias(name))
        )

    a = series("1-URGENT", "av")
    b = series("5-LOW", "bv")
    spine = a.select("day").union(b.select("day")).distinct()
    j = spine.join(a, "day", "left").join(b, "day", "left")
    # Single global day-ordered window: the aligned pair is ONE
    # series; at scale this would partition by instrument key — here
    # the one-pair case is the operator's own contract.
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    f = j.select(
        "day",
        F.last("av", ignorenulls=True).over(w).alias("urgent_c"),
        F.last("bv", ignorenulls=True).over(w).alias("low_c"),
    )
    return f.select(
        "day",
        "urgent_c",
        "low_c",
        F.expr(
            "case when urgent_c is not null and low_c is not null"
            " then urgent_c - low_c end"
        ).alias("spread_c"),
    )


# ---------------------------------------------------------------------------
# W32 — hottest streak (maximum subarray as windows): the contiguous
# run of days where a priority's revenue ran furthest ABOVE its own
# average — Kadane's algorithm expressed declaratively: center the
# daily series (scaled by n so it stays integer: v = n*daily -
# total), prefix-sum it, and the best gain ending at day j is
# P_j - min(0, min of earlier prefixes); one more argmax window
# names the streak's end day. No sequential recurrence, no UDF —
# the classic "O(n) algorithm" is two window passes.
#
# Scale: everything partitions by the series key; the centering
# total is a broadcast per-priority aggregate.
# ---------------------------------------------------------------------------
@register(
    "w32_hot_streak_window",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT prio, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s
      FROM d GROUP BY prio
    ), v AS (
      SELECT d.prio, d.day, d.c, t.n, t.s,
             t.n * d.c - t.s AS cv
      FROM d JOIN tot t ON d.prio = t.prio
    ), p0 AS (
      SELECT prio, day, n,
             sum(cv) OVER (PARTITION BY prio ORDER BY day) AS pf
      FROM v
    ), p AS (
      SELECT prio, day, n, pf,
             coalesce(min(pf)
               OVER (PARTITION BY prio ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS runmin
      FROM p0
    ), g AS (
      SELECT prio, day, n,
             pf - least(CAST(0 AS BIGINT), runmin) AS gain
      FROM p
    ), best AS (
      SELECT prio, day AS end_day, gain, n,
             row_number() OVER (PARTITION BY prio
                                ORDER BY gain DESC, day) AS r
      FROM g
    )
    SELECT prio, end_day,
           CAST(gain // n AS BIGINT) AS best_excess_c
    FROM best WHERE r = 1
    """,
)
def w32_hot_streak_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("prio", "day").agg(F.sum("cents").cast("long").alias("c"))
    tot = d.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    v = d.join(F.broadcast(tot), "prio").select(
        "prio", "day", "n", (F.col("n") * F.col("c") - F.col("s")).alias("cv")
    )
    wp = W.partitionBy("prio").orderBy("day")
    p = v.select(
        "prio",
        "day",
        "n",
        F.sum("cv").over(wp.rowsBetween(W.unboundedPreceding, 0)).alias("pf"),
    ).select(
        "prio",
        "day",
        "n",
        "pf",
        F.coalesce(
            F.min("pf").over(wp.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("runmin"),
    )
    g = p.select(
        "prio",
        "day",
        "n",
        (
            F.col("pf") - F.least(F.lit(0).cast("long"), F.col("runmin"))
        ).alias("gain"),
    )
    best = g.withColumn(
        "r",
        F.row_number().over(wp.orderBy(F.desc("gain"), "day")),
    ).filter(F.col("r") == 1)
    return best.select(
        "prio",
        F.col("day").alias("end_day"),
        F.expr("cast(gain div n as bigint)").alias("best_excess_c"),
    )


# ---------------------------------------------------------------------------
# W33 — rolling mode: the most frequent event type over each
# trailing 7-day window — a statistic no window frame computes
# (mode isn't an aggregate Spark or DuckDB expose over frames), so
# the a69 coverage trick applies: each (day, type) count CONTRIBUTES
# to the 7 windows it can influence (bounded 7x explode of the
# bounded daily rollup), then one argmax per window with a
# min-type tie-break. Never a per-window recount of raw events.
#
# Scale: the explode runs over the (days x types) rollup, not the
# events; windows partition by target day only in the final bounded
# argmax.
# ---------------------------------------------------------------------------
@register(
    "w33_rolling_mode",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), contrib AS (
      SELECT day + CAST(i AS INTEGER) AS target, event_type, n
      FROM d, unnest(range(0, 7)) AS g(i)
    ), win AS (
      SELECT target, event_type, CAST(sum(n) AS BIGINT) AS wn
      FROM contrib GROUP BY target, event_type
    ), days AS (SELECT DISTINCT day FROM d), ranked AS (
      SELECT w.target, w.event_type, w.wn,
             row_number() OVER (PARTITION BY w.target
                                ORDER BY w.wn DESC, w.event_type) AS r
      FROM win w JOIN days dd ON w.target = dd.day
    )
    SELECT target AS day, event_type AS mode_type, wn AS n_in_window
    FROM ranked WHERE r = 1
    """,
)
def w33_rolling_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = ev.select(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    contrib = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
        "event_type",
        "n",
    ).select(
        F.expr("date_add(day, cast(i as int))").alias("target"),
        "event_type",
        "n",
    )
    win = contrib.groupBy("target", "event_type").agg(
        F.sum("n").cast("long").alias("wn")
    )
    days = d.select("day").distinct()
    ranked = win.join(
        days, win.target == days.day
    ).withColumn(
        "r",
        F.row_number().over(
            W.partitionBy("target").orderBy(F.desc("wn"), "event_type")
        ),
    )
    return ranked.filter(F.col("r") == 1).select(
        F.col("target").alias("day"),
        F.col("event_type").alias("mode_type"),
        F.col("wn").alias("n_in_window"),
    )
