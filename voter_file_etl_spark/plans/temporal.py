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


# ---------------------------------------------------------------------------
# J11 — nearest-event join: for every purchase, the same user's view
# with the SMALLEST time distance in EITHER direction (j6's as-of is
# backward-only; sensor/event alignment usually wants nearest). Two
# running windows over one sorted pass — last view at-or-before and
# first view after — then a pure CASE picks the nearer side (ties
# prefer the backward view). Identical window formulation on both
# engines (explicit ROWS frames + total order on (ts, is_purchase,
# event_id)), so no reliance on engine-specific ASOF variants.
#
# Scale: one shuffle keyed on user_id + one per-partition sort feeds
# BOTH windows (same ordering, reversed frame) — never a pairwise
# |Δt| join, which would be quadratic per user.
# ---------------------------------------------------------------------------
@register(
    "j11_nearest_event_join",
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
             CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_us
      FROM events WHERE event_type IN ('purchase', 'view')
    ), spanned AS (
      SELECT event_id, user_id, us, is_purchase,
             last_value(view_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, is_purchase, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_view_us,
             last_value(view_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us DESC, is_purchase, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_view_us
      FROM tagged
    )
    SELECT event_id, user_id, us AS purchase_us,
           CASE
             WHEN prev_view_us IS NULL THEN next_view_us
             WHEN next_view_us IS NULL THEN prev_view_us
             WHEN us - prev_view_us <= next_view_us - us THEN prev_view_us
             ELSE next_view_us
           END AS nearest_view_us
    FROM spanned WHERE is_purchase = 1
    """,
)
def j11_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(
            F.col("event_type") == "view", F.unix_micros("ts")
        ).alias("view_us"),
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy(F.asc("us"), F.asc("is_purchase"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bwd = (
        W.partitionBy("user_id")
        .orderBy(F.desc("us"), F.asc("is_purchase"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    spanned = tagged.select(
        "event_id",
        "user_id",
        "us",
        "is_purchase",
        F.last("view_us", ignorenulls=True).over(fwd).alias("prev_view_us"),
        F.last("view_us", ignorenulls=True).over(bwd).alias("next_view_us"),
    )
    nearest = (
        F.when(F.col("prev_view_us").isNull(), F.col("next_view_us"))
        .when(F.col("next_view_us").isNull(), F.col("prev_view_us"))
        .when(
            F.col("us") - F.col("prev_view_us")
            <= F.col("next_view_us") - F.col("us"),
            F.col("prev_view_us"),
        )
        .otherwise(F.col("next_view_us"))
    )
    return spanned.filter(F.col("is_purchase") == 1).select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        nearest.alias("nearest_view_us"),
    )


# ---------------------------------------------------------------------------
# T11 — MAP-typed column round-trip: per-user event-type counts
# collected into a map<string,bigint> column (map_from_entries over
# collect_list), then exploded back to rows. Complex-type surface the
# array/json keys don't cover; registered output is post-explode
# scalars (no-complex-types rule), so the oracle checks that the trip
# through the MAP loses and reorders nothing — map_from_entries
# rejecting duplicate keys and explode preserving multiplicity are
# the semantics under test.
#
# Scale: one partial+final agg to counts, one map-side collect_list
# into the map (bounded: #event_types entries per user), one explode.
# ---------------------------------------------------------------------------
@register(
    "t11_map_funcs",
    oracle="""
    SELECT user_id, event_type, n,
           n_types,
           CAST(total AS BIGINT) AS total
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             CAST(count(*) OVER (PARTITION BY user_id) AS INTEGER) AS n_types,
             sum(count(*)) OVER (PARTITION BY user_id) AS total
      FROM events GROUP BY user_id, event_type
    )
    """,
)
def t11_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    exploded = mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.expr(
            "aggregate(map_values(m), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("total"),
        F.explode("m").alias("event_type", "n"),
    )
    return exploded.select("user_id", "event_type", "n", "n_types", "total")


# ---------------------------------------------------------------------------
# T16 — nested-JSON extraction: t6 parses the events stream's flat
# props; this exercises the DEEP surface (object-in-object, array
# element access, array length) that real event payloads have. The
# JSON string is constructed identically on both engines (shared
# concat — serialization formatting never crosses the boundary), and
# each engine parses it with its NATIVE parser: Spark from_json
# with a declared schema (ONE parse per row feeding every extracted
# field — four separate get_json_object calls would re-parse the
# payload four times, measured 2.7 s -> 1.3 s at sf0.1), DuckDB
# json_extract paths. Two independent parsers agreeing on every
# field is the check, the f9/t15 construct-then-invert pattern.
#
# Scale: map-side parse, one bounded-key rollup (5 priorities).
# ---------------------------------------------------------------------------
@register(
    "t16_json_nested",
    oracle="""
    WITH j AS (
      SELECT concat('{"k": ', o_orderkey,
                    ', "meta": {"p": "', o_orderpriority,
                    '", "s": "', o_orderstatus,
                    '"}, "items": [', o_custkey, ', ',
                    CAST(o_orderkey % 100 AS VARCHAR), ']}') AS js
      FROM orders
    )
    SELECT json_extract_string(js, '$.meta.p') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(js, '$.items[1]') AS BIGINT))
                AS BIGINT) AS sum_item1,
           CAST(sum(json_array_length(js, '$.items')) AS BIGINT)
             AS sum_len,
           min(json_extract_string(js, '$.meta.s')) AS min_status
    FROM j GROUP BY 1
    """,
)
def t16_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit('{"k": '),
            F.col("o_orderkey").cast("string"),
            F.lit(', "meta": {"p": "'),
            F.col("o_orderpriority"),
            F.lit('", "s": "'),
            F.col("o_orderstatus"),
            F.lit('"}, "items": ['),
            F.col("o_custkey").cast("string"),
            F.lit(", "),
            (F.col("o_orderkey") % 100).cast("string"),
            F.lit("]}"),
        ).alias("js")
    )
    parsed = j.select(
        F.from_json(
            "js",
            "k bigint, meta struct<p: string, s: string>, "
            "items array<bigint>",
        ).alias("o")
    )
    return (
        parsed.select(
            F.col("o.meta.p").alias("priority"),
            F.col("o.items").getItem(1).alias("item1"),
            F.size("o.items").alias("alen"),
            F.col("o.meta.s").alias("s"),
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("item1").cast("long").alias("sum_item1"),
            F.sum("alen").cast("long").alias("sum_len"),
            F.min("s").alias("min_status"),
        )
    )


# ---------------------------------------------------------------------------
# J21 — as-of join with a tolerance: j6's point-in-time enrichment
# plus the merge_asof(tolerance=...) contract — the nearest earlier
# view counts only if it is within 3 days of the purchase, else the
# enrichment is NULL (stale context is worse than none: the
# attribution-window rule every touch-model applies). Same
# union+sort last_value formulation as j6 — one partitioned sort,
# no join — with the tolerance applied as a post-mask, which is also
# exactly how the oracle spells it over DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
_J21_TOL_US = 3 * 24 * 3600 * 1000000


@register(
    "j21_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= {_J21_TOL_US}
                THEN epoch_us(v.ts) END AS view_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def j21_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    tagged = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "purchase").alias("is_p"),
        F.when(F.col("event_type") == "view", F.unix_micros("ts")).alias(
            "v_us"
        ),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "is_p")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = tagged.withColumn(
        "last_view_us", F.last("v_us", ignorenulls=True).over(w)
    )
    return enriched.filter(F.col("is_p")).select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        F.when(
            F.col("us") - F.col("last_view_us") <= _J21_TOL_US,
            F.col("last_view_us"),
        ).alias("view_us"),
    )


# ---------------------------------------------------------------------------
# T18 — VARIANT extraction (Spark 4.0's open semi-structured type,
# the Delta/Iceberg-era answer to string-JSON columns): the same
# deep payload as t16, but parsed ONCE into a VARIANT binary value
# and read with typed variant_get paths. Versus t16's from_json,
# VARIANT needs NO declared schema — the shredded binary encoding
# keeps path reads cheap while tolerating heterogeneous payloads,
# which is exactly the event-props situation (events.props carries
# per-type fields). The oracle reads the identical paths with
# DuckDB's JSON pointer functions — two independent semi-structured
# engines agreeing field-by-field.
#
# Scale: parse_json + variant_get are map-side codegen; one bounded
# rollup (5 priorities). At 100 TB the VARIANT column is what lands
# in parquet (shredding keeps scans pruned), not the raw string.
# ---------------------------------------------------------------------------
@register(
    "t18_variant_extract",
    oracle="""
    WITH j AS (
      SELECT concat('{"k": ', o_orderkey,
                    ', "meta": {"p": "', o_orderpriority,
                    '", "s": "', o_orderstatus,
                    '"}, "items": [', o_custkey, ', ',
                    CAST(o_orderkey % 100 AS VARCHAR), ']}') AS js
      FROM orders
    )
    SELECT json_extract_string(js, '$.meta.p') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(js, '$.items[1]') AS BIGINT))
                AS BIGINT) AS sum_item1,
           CAST(sum(CAST(json_extract(js, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           min(json_extract_string(js, '$.meta.s')) AS min_status
    FROM j GROUP BY 1
    """,
)
def t18_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit('{"k": '),
            F.col("o_orderkey").cast("string"),
            F.lit(', "meta": {"p": "'),
            F.col("o_orderpriority"),
            F.lit('", "s": "'),
            F.col("o_orderstatus"),
            F.lit('"}, "items": ['),
            F.col("o_custkey").cast("string"),
            F.lit(", "),
            (F.col("o_orderkey") % 100).cast("string"),
            F.lit("]}"),
        ).alias("js")
    )
    v = j.select(F.parse_json("js").alias("v"))
    return (
        v.select(
            F.expr("variant_get(v, '$.meta.p', 'string')").alias("priority"),
            F.expr("variant_get(v, '$.items[1]', 'long')").alias("item1"),
            F.expr("variant_get(v, '$.k', 'long')").alias("k"),
            F.expr("variant_get(v, '$.meta.s', 'string')").alias("s"),
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("item1").cast("long").alias("sum_item1"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("s").alias("min_status"),
        )
    )
