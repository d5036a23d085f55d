"""Temporal + event-stream batch operators over the events table.

The reference's event data is the per-election vote history
(prisma/Voter.prisma:84-100) — "what did this voter do, when" — and
its file pipeline is timestamp-ordered (LastModified sort,
load-s3.ts:87-91). This module adds the temporal operators that
workload implies once events are long-form: as-of join (latest state
at a point in time), range join (bucketing by value bands), sliding
and session windows (batch forms of SURVEY §2.11), and JSON
property extraction (events.props).

Scale notes:
- The as-of join is NOT a pairwise theta join: it is the union+sort
  formulation — tag both sides, sort each user's timeline once, and
  carry the last seen right-side value forward with a running window.
  One shuffle on user_id, O(n log n) per partition, no candidate
  blow-up. This is the standard distributed as-of (point-in-time
  correct) join shape.
- The range join broadcasts the tiny band table; Spark plans a
  BroadcastNestedLoopJoin whose inner loop is 3 comparisons/row.
- Sliding windows emit exactly duration/slide rows per event
  map-side (an Expand), then aggregate partial+final like any
  groupBy; state never materializes all windows.
- Session windows shuffle by user then merge sorted intervals —
  Spark's session_window does the merge in the agg operator.
- JSON extraction is a JVM-side expression (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t


# ---------------------------------------------------------------------------
# J6 — as-of join: for every purchase, the most recent view by the
# same user at-or-before the purchase (point-in-time enrichment).
# Oracle uses DuckDB's native ASOF JOIN; the Spark plan is the
# union+last_value formulation (scales as one sort, not one join).
# ---------------------------------------------------------------------------
@register(
    "j6_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS last_view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    # Views sort before purchases at equal ts (is_purchase asc) so an
    # exactly-simultaneous view is visible to the purchase, matching
    # ASOF's ts >= condition.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_purchase").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("last_view_ts").alias("last_view_us"),
        )
    )


# ---------------------------------------------------------------------------
# J7 — range (band) join: classify each part into a literal price
# band with a non-equi condition. Small side is a broadcast literal.
# ---------------------------------------------------------------------------
_BANDS = (("low", 0.0, 800.0), ("mid", 800.0, 1400.0), ("high", 1400.0, 1e18))


@register(
    "j7_range_join",
    oracle=f"""
    SELECT p_partkey, band, p_retailprice
    FROM part
    JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
         AS bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    """,
)
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    bands = spark.createDataFrame(list(_BANDS), "band string, lo double, hi double")
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .select("p_partkey", "band", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# ST2 — sliding window (2h window, 1h slide): every event lands in
# exactly 2 windows; Spark expands map-side, then one hash agg.
# ---------------------------------------------------------------------------
@register(
    "st2_sliding_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts) - k * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT 0 AS k UNION ALL SELECT 1) offs
    GROUP BY 1, 2
    """,
)
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# ST3 — session window (30-min inactivity gap) per user. Spark merges
# events whose ts falls strictly inside the previous session's
# [start, last_ts + gap); the oracle is the gaps-and-islands
# formulation with the identical boundary rule (new session iff
# diff >= gap).
# ---------------------------------------------------------------------------
@register(
    "st3_session_window",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM d
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def st3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# T6 — JSON property extraction (events.props) — JVM expression, no
# Python; sums in exact decimal across the engine boundary.
# ---------------------------------------------------------------------------
@register(
    "t6_json_funcs",
    oracle="""
    SELECT CAST(props->>'$.k' AS INTEGER) AS k,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def t6_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
