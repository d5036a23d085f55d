"""Behavioral analytics over the events stream: funnel conversion,
cohort retention, and gaps-and-islands streaks.

The reference's implied workload is voter-contact analytics (SURVEY.md
§2.6: per-person event rollups over the 251-index query surface);
these are the three canonical event-sequence shapes every OLAP engine
is asked for on top of that. All three are pure DataFrame plans —
equi-joins and window functions on integer microseconds and DATEs, no
floats — so results are bit-exact across engines.

Scale notes (100 TB posture):
- The funnel is K sequential groupBy/join rounds ALL keyed on
  user_id: AQE co-partitions them, so after the first shuffle every
  later stage is a local join (no re-partitioning); the per-step
  frames shrink monotonically (only converting users survive).
- Retention and islands shuffle once on user_id and once on the
  (cohort, offset) / island rollup — both bounded-cardinality keys.
- Islands uses a per-user window (ORDER BY within PARTITION BY
  user_id), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t

# ---------------------------------------------------------------------------
# A22 — event funnel: how many users complete signup -> view ->
# click -> purchase with STRICTLY increasing event times. Classic
# conversion funnel (the reference's voter-contact cadence reports
# are this shape over contact events). Each step is
#   min(us) of the step's event type AFTER the user's previous-step
#   time — one groupBy(user_id) per step, joined back; exact int64
# microseconds end to end.
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


@register(
    "a22_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t
      GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s3.t
      GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS step_no, 'signup' AS step,
           (SELECT count(*) FROM s1) AS n_users
    UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
    UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
    UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
    """,
)
def a22_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 single-scan shape (guide §1.2/§2.3): ONE groupBy(user_id)
    # collects each step's sorted event times (map-side partial
    # collect_list; nulls from the per-step when() never enter the
    # list), and the strictly-increasing chain is decided MAP-SIDE
    # per user: t_{k+1} = array_min(filter(times_{k+1}, x -> x > t_k))
    # — a null t_k nulls the filter predicate, so a broken chain stays
    # broken, exactly the join semantics. One final 1-row aggregate
    # counts all four steps and stack() unpivots (the a38/x40 shape).
    # The old per-step join chain re-executed every prefix per count
    # row — s1 ran 4x, s2 3x, ... (6 scans / 8 shuffles in the plan);
    # this is 1 scan + 1 user shuffle. A/B alternating min-of-3 at
    # sf0.1, equality asserted: 1.01 -> 0.60 s.
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .filter(F.col("event_type").isin(list(_FUNNEL_STEPS)))
    )
    # collect_set, not collect_list (r14, VERDICT r13 #3): the chain
    # logic is multiplicity-blind (array_min / strictly-greater filter
    # see values, not counts), so duplicate (user, step, us) deliveries
    # — the bot/replay hot-user shape — are deduped INSIDE the partial
    # aggregation buffer and never cross the shuffle. The per-user
    # array is bounded by DISTINCT event times per step (~8 MB even
    # for a 10^6-distinct-time bot, probed by
    # tools/probes/hot_user_probe.py); truly adversarial users past
    # that are a filter/cap decision upstream, not a funnel shape.
    per = ev.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_set(F.when(F.col("event_type") == s, F.col("us")))
            ).alias(f"a_{s}")
            for s in _FUNNEL_STEPS
        ]
    )
    chained = (
        per.select(F.array_min("a_signup").alias("t1"), "a_view", "a_click", "a_purchase")
        .select("t1", F.expr("array_min(filter(a_view, x -> x > t1))").alias("t2"), "a_click", "a_purchase")
        .select("t1", "t2", F.expr("array_min(filter(a_click, x -> x > t2))").alias("t3"), "a_purchase")
        .select("t1", "t2", "t3", F.expr("array_min(filter(a_purchase, x -> x > t3))").alias("t4"))
    )
    summary = chained.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.count("t4").alias("n4"),
    )
    return summary.selectExpr(
        "stack(4, 1L, 'signup', n1, 2L, 'view', n2, 3L, 'click', n3,"
        " 4L, 'purchase', n4) as (step_no, step, n_users)"
    )


# ---------------------------------------------------------------------------
# A23 — cohort retention: users grouped by the ISO week of their
# first event (both engines truncate weeks to Monday), counted as
# active in each later week; offset = whole weeks since the cohort
# week. Pure DATE/int arithmetic — datediff of two Monday-aligned
# dates is always a multiple of 7, so the integer division is exact.
# ---------------------------------------------------------------------------
@register(
    "a23_retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id,
             date_trunc('week', min(CAST(ts AS DATE))) AS cohort_week
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS DATE)) AS w
      FROM events
    )
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, act.w) // 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_active
    FROM act JOIN f ON act.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def a23_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 single-scan shape (the a22/a45 fold): ONE groupBy(user_id)
    # collects the user's distinct active weeks (map-side partial
    # collect_set — this IS the old act-distinct), and the cohort week
    # is array_min of the set (date_trunc is monotone, so the min of
    # the per-week truncs equals the trunc of the min date). Replaces
    # 2 events scans + distinct + join with 1 scan + 1 user shuffle.
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("w"),
    )
    per = ev.groupBy("user_id").agg(F.collect_set("w").alias("wks"))
    return (
        per.select(
            F.array_min("wks").alias("cohort_week"),
            F.explode("wks").alias("w"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff("w", "cohort_week") / F.lit(7))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select("cohort_week", "week_offset", "n_active")
    )


# ---------------------------------------------------------------------------
# W10 — gaps and islands: per user, runs of CONSECUTIVE active days.
# The classic trick: within a user, date minus row_number() (over
# dates ascending) is constant exactly along a gap-free run, so
# grouping on that anchor yields the islands. Longest streak breaks
# ties toward the earliest start so the argmax is deterministic.
# ---------------------------------------------------------------------------
@register(
    "w10_gaps_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), r AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
      FROM d
    ), isl AS (
      SELECT user_id, grp, count(*) AS len, min(d) AS start
      FROM r GROUP BY user_id, grp
    ), ranked AS (
      SELECT user_id, len, start,
             row_number() OVER (
               PARTITION BY user_id ORDER BY len DESC, start) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_islands,
             sum(len) OVER (PARTITION BY user_id) AS active_days
      FROM isl
    )
    SELECT user_id, CAST(n_islands AS BIGINT) AS n_islands,
           CAST(active_days AS BIGINT) AS active_days,
           len AS longest, start AS longest_start
    FROM ranked WHERE rn = 1
    """,
)
def w10_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    rn = W.partitionBy("user_id").orderBy("d")
    isl = (
        d.withColumn("grp", F.date_sub("d", F.row_number().over(rn)))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"), F.min("d").alias("start"))
    )
    pick = W.partitionBy("user_id").orderBy(F.desc("len"), F.asc("start"))
    per_user = W.partitionBy("user_id")
    return (
        isl.withColumn("rn", F.row_number().over(pick))
        .withColumn("n_islands", F.count(F.lit(1)).over(per_user))
        .withColumn("active_days", F.sum("len").over(per_user))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_islands").cast("long"),
            F.col("active_days").cast("long"),
            F.col("len").alias("longest"),
            F.col("start").alias("longest_start"),
        )
    )


# ---------------------------------------------------------------------------
# A24 — sweep-line concurrency: treat every event as a 10-minute
# session and find, per event type, the PEAK number of simultaneously
# open sessions and the earliest instant it is reached. The classic
# sweep: each session contributes (+1 at start, -1 at end), sorted by
# (time, delta, event_id) — delta ascending puts the -1 first at a
# shared instant, i.e. half-open [start, end) intervals — and a
# running ROWS sum is the live concurrency. One shuffle (partition by
# event_type), integer microseconds end to end; the explicit
# three-key ROWS frame sidesteps the cross-engine RANGE-peers trap.
# ---------------------------------------------------------------------------
_A24_DUR_US = 600 * 1_000_000


@register(
    "a24_sweepline_concurrency",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS us, 1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + {_A24_DUR_US}, -1, event_id
      FROM events
    ), run AS (
      SELECT event_type, us,
             sum(delta) OVER (
               PARTITION BY event_type ORDER BY us, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS live
      FROM pts
    )
    SELECT event_type,
           CAST(max(live) AS BIGINT) AS max_concurrent,
           min(us) FILTER (WHERE live = mx) AS at_us
    FROM (SELECT *, max(live) OVER (PARTITION BY event_type) AS mx FROM run)
    GROUP BY event_type
    """,
)
def a24_sweepline_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    pts = ev.select(
        "event_type", "us", F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        ev.select(
            "event_type",
            (F.col("us") + F.lit(_A24_DUR_US)).alias("us"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    sweep = W.partitionBy("event_type").orderBy("us", "delta", "event_id")
    run = pts.withColumn(
        "live",
        F.sum("delta").over(sweep.rowsBetween(W.unboundedPreceding, 0)),
    )
    peak = run.withColumn(
        "mx", F.max("live").over(W.partitionBy("event_type"))
    )
    return peak.groupBy("event_type").agg(
        F.max("live").cast("long").alias("max_concurrent"),
        F.min(F.when(F.col("live") == F.col("mx"), F.col("us"))).alias("at_us"),
    )


# ---------------------------------------------------------------------------
# A29 — marketing attribution: for every conversion (a 'purchase'
# event), credit the user's FIRST event ever (first-touch) and the
# event immediately BEFORE the purchase (last-touch), then roll up
# conversions and distinct converting users per (first, last) channel
# pair. The reference's voter-contact analog is "which outreach
# channel began / immediately preceded each successful contact".
# Both touches come from ONE window spec over (user_id, time) —
# Catalyst plans a single exchange + sort and evaluates first_value
# and lag in the same window operator; the rollup is a second
# bounded-cardinality shuffle (|event_types|^2 groups).
# A purchase that IS the user's first event has NULL last-touch and
# groups as its own row — identical NULL-grouping on both engines.
# ---------------------------------------------------------------------------
@register(
    "a29_attribution",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             first_value(event_type) OVER w AS first_touch,
             lag(event_type) OVER w AS last_touch
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT first_touch, last_touch,
           count(*) AS n_conversions,
           count(DISTINCT user_id) AS n_users
    FROM o WHERE event_type = 'purchase'
    GROUP BY first_touch, last_touch
    """,
)
def a29_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    touched = ev.select(
        "user_id",
        "event_type",
        F.first("event_type").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("first_touch"),
        F.lag("event_type").over(w).alias("last_touch"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# A31 — count-min sketch heavy hitters: estimate per-key frequencies
# in O(depth x width) memory instead of O(keys), then report the
# estimate next to the exact count for the tracked keys so the
# sketch's one-sided error (estimate >= truth, inflated only by
# collisions) is auditable in the result itself. The sketch rows use
# explicit universal-hash arithmetic ((a*k + b) mod p mod width) —
# NOT engine hash builtins, which differ between Spark and DuckDB —
# so both engines build bit-identical sketches. Build = one groupBy
# over (depth x width) cells after a bounded depth-x explode;
# at 100 TB the sketch is the map-side-combinable summary that
# answers "is key k hot" without materializing per-key counts.
# ---------------------------------------------------------------------------
_A31_P = 2_147_483_647  # Mersenne prime 2^31 - 1
_A31_W = 64
_A31_ROWS = ((3, 11), (5, 23), (7, 41), (11, 59))  # (a, b) per depth row


@register(
    "a31_cms_heavy_hitters",
    oracle=f"""
    WITH cells AS (
      SELECT r.d,
             ((r.a * user_id + r.b) % {_A31_P}) % {_A31_W} AS bucket,
             count(*) AS c
      FROM events,
           (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_A31_ROWS))})
             AS r(d, a, b)
      GROUP BY r.d, bucket
    ), tracked AS (
      SELECT user_id, count(*) AS exact_count FROM events
      WHERE user_id % 7 = 0 GROUP BY user_id
    ), est AS (
      SELECT t.user_id, t.exact_count, min(c.c) AS cms_estimate
      FROM tracked t
      CROSS JOIN (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_A31_ROWS))})
             AS r(d, a, b)
      JOIN cells c
        ON c.d = r.d
       AND c.bucket = ((r.a * t.user_id + r.b) % {_A31_P}) % {_A31_W}
      GROUP BY t.user_id, t.exact_count
    )
    SELECT user_id, exact_count, cms_estimate,
           cms_estimate >= exact_count AS never_undercounts
    FROM est
    """,
)
def a31_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id")
    rows = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_A31_ROWS)], "d int, a long, b long"
    )
    bucket = ((F.col("a") * F.col("user_id") + F.col("b")) % _A31_P) % _A31_W
    cells = (
        ev.crossJoin(F.broadcast(rows))  # bounded depth-x expansion
        .groupBy("d", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tracked = (
        ev.filter(F.col("user_id") % 7 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = tracked.crossJoin(F.broadcast(rows)).select(
        "user_id", "exact_count", "d", bucket.alias("bucket")
    )
    return (
        probes.join(cells, ["d", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .withColumn(
            "never_undercounts", F.col("cms_estimate") >= F.col("exact_count")
        )
    )


# ---------------------------------------------------------------------------
# A33 — rolling 7-day active users (WAU per day): the rolling
# DISTINCT that plain window frames cannot express scalably. The
# identity: a user is active-in-window on day D iff some active day
# falls in (D-6 .. D) — so explode each (user, active_day) to the
# next 7 days (BOUNDED 7x fan-out), dedup to (user, day), and count
# per day. Two bounded shuffles; no per-row distinct state, no
# collect_set. Days outside the observed range are trimmed so both
# engines agree on the frame.
# ---------------------------------------------------------------------------
@register(
    "a33_rolling_active_users",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {86_400_000_000} AS day
      FROM events
    ), lim AS (
      SELECT min(day) AS mn, max(day) AS mx FROM d
    ), fan AS (
      SELECT DISTINCT user_id, day + o.o AS day
      FROM d CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS o(o)
    )
    SELECT f.day, count(*) AS wau
    FROM fan f, lim
    WHERE f.day BETWEEN lim.mn AND lim.mx
    GROUP BY f.day
    """,
)
def a33_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    lim = d.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    fan = (
        d.select(
            "user_id",
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
        )
        .distinct()
    )
    return (
        fan.crossJoin(F.broadcast(lim))
        .filter(F.col("day").between(F.col("mn"), F.col("mx")))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


# ---------------------------------------------------------------------------
# A40 — conversion latency: a22 counts WHO converts; this measures
# HOW LONG conversion takes — per weekly first-click cohort, the
# time from a user's first click to their first purchase AFTER that
# click. The canonical time-to-convert report (voter first-contact to
# pledge latency in the reference's domain; signup-to-activation in
# product analytics).
#
# Exactness: all latency math is int64 microseconds (unix_micros /
# epoch_us); the cohort week is date_trunc('week'), ISO-Monday in
# both engines; avg is an explicit integer division.
#
# Scale: two filtered groupBy(user_id) aggregates and one equi-join
# on user_id — AQE co-partitions them so the join follows the first
# shuffle without a re-partition; the final rollup is on the bounded
# cohort-week key. No windows over raw events, no self-join of the
# full stream.
# ---------------------------------------------------------------------------
@register(
    "a40_conversion_lag",
    oracle="""
    WITH first_click AS (
      SELECT user_id, min(ts) AS fc
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), conv AS (
      SELECT f.user_id, f.fc, min(e.ts) AS fp
      FROM first_click f
      JOIN events e ON e.user_id = f.user_id
       AND e.event_type = 'purchase' AND e.ts > f.fc
      GROUP BY f.user_id, f.fc
    )
    SELECT CAST(date_trunc('week', fc) AS DATE) AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(sum(epoch_us(fp) - epoch_us(fc))
                // count(*) AS BIGINT) AS avg_lag_us,
           CAST(max(epoch_us(fp) - epoch_us(fc)) AS BIGINT) AS max_lag_us
    FROM conv GROUP BY 1
    """,
)
def a40_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("fc"))
        .groupBy("user_id", "fc")
        .agg(F.min("ts").alias("fp"))
    )
    lag_us = F.unix_micros("fp") - F.unix_micros("fc")
    return (
        conv.groupBy(
            F.date_trunc("week", "fc").cast("date").alias("cohort_week")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.expr(
                "cast(sum(unix_micros(fp) - unix_micros(fc))"
                " div count(*) as bigint)"
            ).alias("avg_lag_us"),
            F.max(lag_us).cast("long").alias("max_lag_us"),
        )
    )


# ---------------------------------------------------------------------------
# A43 — Markov transition matrix over the event stream: for every
# (from_type -> to_type) adjacent pair in each user's time-ordered
# history, the transition count and probability (integer basis
# points) — the behavioral model behind "what do users do after an
# error?", and the first-order sibling of x18's token bigram LM.
#
# Exactness: ordering is the (ts, event_id) total order; the
# probability is 10000 * n div row_total in pure int64 (both
# engines floor the non-negative quotient identically).
#
# Scale: one shuffle on user_id for the lag window, then a rollup
# on the bounded 5x5 type-pair domain; the row-total rides back on
# a broadcast join of the 5-row from-state aggregate.
# ---------------------------------------------------------------------------
@register(
    "a43_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT from_type, sum(n) AS row_total FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n,
           CAST(10000 * p.n // t.row_total AS BIGINT) AS prob_bp
    FROM pairs p JOIN totals t ON p.from_type = t.from_type
    """,
)
def a43_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(
                F.unix_micros("ts"), "event_id"
            )
        )
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").alias("row_total")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.expr("10000 * n div row_total").alias("prob_bp"),
    )


# ---------------------------------------------------------------------------
# A44 — event path-pattern matching (MATCH_RECOGNIZE-lite): collapse
# each user's time-ordered history into a journey string (one char
# per event type) and count CONSECUTIVE view->click->purchase and
# view->click motifs — the sequence-pattern query warehouses spell
# MATCH_RECOGNIZE and Spark lacks natively; the journey-string
# formulation expresses it with collect+replace, no UDF, no
# iterative state. Non-overlapping leftmost counting via the
# replace-shrinkage trick ((len - len(replace)) / motif_len) is
# engine-identical by definition; journey_md5 pins the ENTIRE
# per-user order, so any shuffle nondeterminism would hash-mismatch.
#
# Scale: one shuffle on user_id; per-user state is the bounded
# journey string (events per user, not corpus). At unbounded history
# sizes the same motif counts fold incrementally (count transitions
# with lag, a43's shape) — the string form is the audit-friendly
# variant.
# ---------------------------------------------------------------------------
@register(
    "a44_path_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS s,
             count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST((len(s) - len(replace(s, 'vcp', ''))) // 3 AS BIGINT)
             AS n_vcp,
           CAST((len(s) - len(replace(s, 'vc', ''))) // 2 AS BIGINT)
             AS n_vc,
           md5(s) AS journey_md5
    FROM seq
    """,
)
def a44_path_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ev")), lambda x: x["c"]
                ),
                "",
            ).alias("s"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.expr(
            "cast((length(s) - length(replace(s, 'vcp', ''))) div 3 as bigint)"
        ).alias("n_vcp"),
        F.expr(
            "cast((length(s) - length(replace(s, 'vc', ''))) div 2 as bigint)"
        ).alias("n_vc"),
        F.md5(F.col("s").cast("binary")).alias("journey_md5"),
    )


# ---------------------------------------------------------------------------
# A45 — windowed funnel (ClickHouse windowFunnel semantics): the
# deepest view -> click -> purchase level each user reaches with ALL
# steps inside a 7-day window anchored at the first step — a22's
# funnel counts ordered steps ever; real conversion analysis expires
# the journey (a view from January does not "convert" in June).
# Level rule: 3 if some view has a later click and that click a
# later purchase, purchase within 7 days of the view; 2 if some
# view has a later click within 7 days; 1 if any view; 0 otherwise.
# Output is the bounded level histogram.
#
# Scale: each level is a user-keyed equi-join with a time-band
# predicate (pair volume bounded by per-user event counts, the j16
# interval discipline), folded to per-user booleans by EXISTS-style
# semi-joins — never a per-user explode of all triples into the
# output. One rollup on the 4-value level domain.
# ---------------------------------------------------------------------------
_A45_WIN_US = 7 * 24 * 3600 * 1000000


@register(
    "a45_window_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ), users AS (
      SELECT DISTINCT user_id FROM ev
    ), l1 AS (
      SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'
    ), vc AS MATERIALIZED (
      -- MATERIALIZED pins the join ORDER (r8, caught at sf1.0): left
      -- to itself DuckDB joined clicks-to-purchases FIRST on their
      -- only direct predicate — the pure inequality p.us > c.us — an
      -- IEJoin whose intermediate is ~half of clicks x purchases
      -- (~2e10 rows at sf1.0, spilling past the disk). The engine's
      -- Spark plan builds the user-keyed view-click pairs first; the
      -- oracle must walk the same shape.
      SELECT v.user_id, v.us AS v_us, c.us AS c_us
      FROM ev v JOIN ev c
        ON c.user_id = v.user_id AND c.event_type = 'click'
       AND c.us > v.us AND c.us <= v.us + {_A45_WIN_US}
      WHERE v.event_type = 'view'
    ), l2 AS (
      SELECT DISTINCT user_id FROM vc
    ), l3 AS (
      SELECT DISTINCT vc.user_id
      FROM vc JOIN ev p
        ON p.user_id = vc.user_id AND p.event_type = 'purchase'
       AND p.us > vc.c_us AND p.us <= vc.v_us + {_A45_WIN_US}
    ), lev AS (
      SELECT u.user_id,
             CASE WHEN l3.user_id IS NOT NULL THEN 3
                  WHEN l2.user_id IS NOT NULL THEN 2
                  WHEN l1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS level
      FROM users u
      LEFT JOIN l1 ON u.user_id = l1.user_id
      LEFT JOIN l2 ON u.user_id = l2.user_id
      LEFT JOIN l3 ON u.user_id = l3.user_id
    )
    SELECT level, CAST(count(*) AS BIGINT) AS n_users
    FROM lev GROUP BY level
    """,
)
def a45_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 single-scan shape (the a22 rewrite applied to the windowed
    # variant): ONE groupBy(user_id) collects each step's sorted times
    # (map-side partial collect_list), and the deepest in-window level
    # is decided MAP-SIDE per user with short-circuiting exists()
    # chains — the EXISTS-triple semantics is literally the level
    # rule, and per-user work stays bounded by per-user event counts,
    # the same bound the old user-keyed pair joins had. Replaces 2
    # pair joins + 3 distincts + 3 left joins (one events scan per
    # step) with 1 scan + 1 user shuffle. A/B alternating min-of-3 at
    # sf0.1, equality asserted: 0.72 -> 0.43 s.
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    # collect_set (r14, VERDICT r13 #3): the EXISTS-triple rule is
    # multiplicity-blind, so duplicates dedup map-side in the partial
    # aggregate — see the a22 comment for the bound + hot-user probe.
    per = ev.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_set(F.when(F.col("event_type") == s, F.col("us")))
            ).alias(f"a_{s}")
            for s in ("view", "click", "purchase")
        ]
    )
    lev = per.select(
        F.expr(
            f"""cast(case
              when exists(a_view, v -> exists(a_click, c ->
                     c > v and c <= v + {_A45_WIN_US}
                     and exists(a_purchase, p ->
                       p > c and p <= v + {_A45_WIN_US}))) then 3
              when exists(a_view, v -> exists(a_click, c ->
                     c > v and c <= v + {_A45_WIN_US})) then 2
              when size(a_view) > 0 then 1
              else 0 end as int)"""
        ).alias("level")
    )
    return lev.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# A46 — day-of-week seasonality index: per (event_type, weekday),
# activity relative to that type's overall daily average, in integer
# basis points — the seasonal profile behind staffing/alerting
# baselines ("is Tuesday's error volume actually anomalous?").
# Cross-engine exactness: the index is the pure-int64 identity
# 10000 * n_dow * 7 div n_total (counts only — no float averages),
# and weekday numbering is pinned to ISO (1=Mon..7=Sun) on both
# sides: Spark dayofweek() is 1=Sun..7=Sat, so it is remapped.
#
# Scale: one partial/final rollup on the bounded 5x7 domain; the
# per-type totals ride a broadcast join back.
# ---------------------------------------------------------------------------
@register(
    "a46_dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT event_type, isodow(ts) AS dow FROM events
    ), c AS (
      SELECT event_type, dow, count(*) AS n_dow
      FROM d GROUP BY event_type, dow
    ), tot AS (
      SELECT event_type, sum(n_dow) AS n_total FROM c GROUP BY event_type
    )
    SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow,
           CAST(c.n_dow AS BIGINT) AS n_dow,
           CAST(10000 * c.n_dow * 7 // t.n_total AS BIGINT) AS index_bp
    FROM c JOIN tot t ON c.event_type = t.event_type
    """,
)
def a46_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark dayofweek: 1=Sunday..7=Saturday -> ISO 1=Monday..7=Sunday
    iso_dow = F.expr("((dayofweek(ts) + 5) % 7) + 1")
    c = (
        t(spark, sf_dir, "events")
        .select("event_type", iso_dow.alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n_dow"))
    )
    tot = c.groupBy("event_type").agg(F.sum("n_dow").alias("n_total"))
    return c.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("n_dow").cast("long").alias("n_dow"),
        F.expr("10000 * n_dow * 7 div n_total").alias("index_bp"),
    )


# ---------------------------------------------------------------------------
# A47 — ratio-to-report (contribution analysis): each nation's share
# of its region's customer account mass, and each region's share of
# the world total, in integer basis points — the percent-of-total
# window (Oracle's RATIO_TO_REPORT) every revenue dashboard leads
# with. Two levels prove the nesting: the inner window partitions
# by region, the outer is the global total.
#
# Exactness: shares are 10000 * part div total on NON-NEGATIVE cent
# sums (balances can be negative; the mass uses greatest(bal, 0)
# cents so the ratio denominator is monotone and both engines'
# integer floor agrees).
#
# Scale: one partial/final rollup to nation grain (25 rows), then
# window sums over the BOUNDED rollup — the fact table is touched
# once; no window ever runs over raw rows.
# ---------------------------------------------------------------------------
@register(
    "a47_ratio_to_report",
    oracle="""
    WITH n AS (
      SELECT c.c_nationkey AS nationkey, nt.n_regionkey AS regionkey,
             sum(CAST(floor(greatest(c.c_acctbal, 0) * 100 + 0.5)
                      AS BIGINT)) AS cents
      FROM customer c JOIN nation nt ON c.c_nationkey = nt.n_nationkey
      GROUP BY 1, 2
    )
    SELECT nationkey, regionkey, CAST(cents AS BIGINT) AS cents,
           CAST(10000 * cents //
                sum(cents) OVER (PARTITION BY regionkey) AS BIGINT)
             AS share_of_region_bp,
           CAST(10000 * sum(cents) OVER (PARTITION BY regionkey) //
                sum(cents) OVER () AS BIGINT) AS region_share_bp
    FROM n
    """,
)
def a47_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_regionkey").alias("regionkey"),
    )
    n = (
        cust.select(
            F.col("c_nationkey").alias("nationkey"),
            F.expr(
                "cast(floor(greatest(c_acctbal, 0d) * 100 + 0.5d) as bigint)"
            ).alias("cents"),
        )
        .groupBy("nationkey")
        .agg(F.sum("cents").alias("cents"))
        .join(F.broadcast(nat), "nationkey")
    )
    w_region = W.partitionBy("regionkey")
    w_all = W.partitionBy()
    return n.select(
        "nationkey",
        "regionkey",
        F.col("cents").cast("long").alias("cents"),
        F.sum("cents").over(w_region).alias("_rsum"),
        F.sum("cents").over(w_all).alias("_gsum"),
    ).select(
        "nationkey",
        "regionkey",
        "cents",
        F.expr("10000 * cents div _rsum").alias("share_of_region_bp"),
        F.expr("10000 * _rsum div _gsum").alias("region_share_bp"),
    )


# ---------------------------------------------------------------------------
# W19 — interval union (merged coverage): each event opens an
# activity interval [ts, ts + (1 + event_id % 600) s]; overlapping /
# touching intervals per user merge into islands and the output is
# per-user total covered microseconds. The canonical "union of
# intervals" sweep (uptime/SLA coverage, contact-session coverage
# over the reference's voter-contact events — SURVEY.md §2.6):
# prev-max-end via a window, island id as a running sum of gap
# flags, one rollup per island, one per user. Duration is pure
# integer arithmetic off event_id, so both engines agree bit-exactly.
#
# Scale: ONE shuffle on user_id serves both windows and the island
# rollup (same partitioning); per-user ordering only — no global
# sort. Island count is data-bounded (<= events per user).
# ---------------------------------------------------------------------------
@register(
    "w19_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + (1 + event_id % 600) * 1000000 AS e_us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s_us, e_us,
             CASE WHEN max(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, e_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) >= s_us THEN 0 ELSE 1 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s_us, e_us,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island_id
      FROM flagged
    ), merged AS (
      SELECT user_id, island_id,
             min(s_us) AS s_us, max(e_us) AS e_us,
             CAST(count(*) AS BIGINT) AS n_intervals
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(e_us - s_us) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def w19_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + (F.lit(1) + F.col("event_id") % 600) * F.lit(1000000)
        ).alias("e_us"),
    )
    order = [F.col("s_us"), F.col("e_us"), F.col("event_id")]
    w_prev = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "user_id",
        "s_us",
        "e_us",
        "event_id",
        F.when(F.max("e_us").over(w_prev) >= F.col("s_us"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s_us").alias("s_us"),
        F.max("e_us").alias("e_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_intervals").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("e_us") - F.col("s_us")).cast("long").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# A49 — market-basket brand affinity: for every pair of part brands
# bought in the same order, support (co-occurring orders),
# conditional confidence, and lift — the association-rule triple in
# integer basis points. Top-20 pairs by support with a full
# deterministic ordering.
#
# Scale: the (order, brand) table is a lineitem->part equi-join plus
# a distinct; the pair generator self-joins it ON ORDERKEY ONLY, so
# fanout per order is bounded by C(distinct brands per order, 2) —
# <= C(7,2) = 21 for TPC-H's <=7 lines/order, NEVER all brand pairs
# globally. Brand marginals (25 rows) and the order total (1 row)
# attach as broadcasts. 10000 * support * N fits bigint up to ~10^14
# orders.
# ---------------------------------------------------------------------------
@register(
    "a49_market_basket",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), tot AS (
      SELECT CAST(count(DISTINCT orderkey) AS BIGINT) AS n_orders FROM ob
    ), bs AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n_brand FROM ob GROUP BY brand
    ), pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS support
      FROM ob a JOIN ob b
        ON a.orderkey = b.orderkey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b, p.support,
           sa.n_brand AS supp_a, sb.n_brand AS supp_b,
           CAST(10000 * p.support // sa.n_brand AS BIGINT) AS conf_ab_bp,
           CAST(10000 * p.support * t.n_orders //
                (sa.n_brand * sb.n_brand) AS BIGINT) AS lift_bp
    FROM pairs p
    JOIN bs sa ON sa.brand = p.brand_a
    JOIN bs sb ON sb.brand = p.brand_b
    CROSS JOIN tot t
    ORDER BY p.support DESC, p.brand_a, p.brand_b
    LIMIT 20
    """,
)
def a49_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_partkey"
    )
    part = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    # ONE aggregate keyed on the order replaces distinct + orderkey
    # self-join (r13, guide §2.3/§2.4 — the _copurchase_edges shape):
    # collect_set dedups the order's brands exactly as the old
    # (orderkey, brand) .distinct() did, and the C(brands,2) pairs
    # per order are emitted map-side from the sorted set — the same
    # bounded <=C(7,2) fan-out the join produced, minus the distinct
    # Exchange and the join's second orderkey shuffle. Three
    # consumers (total, marginals, pairs) fan out of the grouped
    # frame, so it is materialized once (localCheckpoint — without it
    # Catalyst plans the join+aggregate subtree once PER consumer;
    # the old shape measured 20 parquet scans, 0 reused exchanges).
    ob = (
        li.join(part, "l_partkey")
        .groupBy("orderkey")
        .agg(F.array_sort(F.collect_set("brand")).alias("brands"))
        .transform(materialize)
    )
    tot = ob.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    bs = (
        ob.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_brand"))
    )
    pairs = (
        ob.withColumn(
            "prs",
            F.expr(
                "flatten(transform(brands, (x, i) ->"
                " transform(slice(brands, i + 2, size(brands) - i - 1),"
                " y -> struct(x AS brand_a, y AS brand_b))))"
            ),
        )
        .select(F.explode("prs").alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    sa = F.broadcast(bs.select(F.col("brand").alias("brand_a"), F.col("n_brand").alias("supp_a")))
    sb = F.broadcast(bs.select(F.col("brand").alias("brand_b"), F.col("n_brand").alias("supp_b")))
    return (
        pairs.join(sa, "brand_a")
        .join(sb, "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "support",
            "supp_a",
            "supp_b",
            F.expr("10000 * support div supp_a").alias("conf_ab_bp"),
            F.expr("10000 * support * n_orders div (supp_a * supp_b)").alias(
                "lift_bp"
            ),
        )
        .orderBy(F.col("support").desc(), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# W20 — CUSUM drift detection over the weekly order-volume series
# per priority: S_t = max(0, S_{t-1} + n·x_t − Σx) — the page-style
# cumulative-sum changepoint statistic, kept in exact integers by
# scaling deviations by the series length instead of dividing by it
# (dev_t = n·x_t − total ≡ n·(x_t − mean)). Alarm when S_t exceeds
# 2·total. The max(0, ·) reflection makes this a genuinely
# SEQUENTIAL recurrence — not window-expressible — so the series
# runs through applyInPandas per key while the oracle unrolls the
# identical recurrence as a recursive CTE.
#
# Scale: the recurrence runs on the BOUNDED weekly rollup (O(weeks)
# rows per key, ~320 here), never raw orders — the groupBy
# aggregates with map-side combine first, and Python sees only the
# rollup. One shuffle on priority; each group is a single Arrow
# batch.
# ---------------------------------------------------------------------------
@register(
    "w20_cusum_drift",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT o_orderpriority AS priority,
             date_trunc('week', o_orderdate) AS wk,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), idx AS (
      SELECT priority, x,
             row_number() OVER (PARTITION BY priority ORDER BY wk) AS i,
             count(*) OVER (PARTITION BY priority) AS n,
             sum(x) OVER (PARTITION BY priority) AS total
      FROM w
    ), rec AS (
      SELECT priority, i, n, total,
             greatest(0, n * x - total) AS s
      FROM idx WHERE i = 1
      UNION ALL
      SELECT b.priority, b.i, b.n, b.total,
             greatest(0, r.s + b.n * b.x - b.total)
      FROM rec r JOIN idx b ON b.priority = r.priority AND b.i = r.i + 1
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_weeks,
           CAST(sum(CASE WHEN s > 2 * total THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           CAST(max(s) AS BIGINT) AS max_s,
           CAST(coalesce(min(CASE WHEN s > 2 * total THEN i END), 0)
                AS BIGINT) AS first_alarm_week
    FROM rec GROUP BY priority
    """,
)
def w20_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    orders = t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("week", "o_orderdate").alias("wk"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    schema = (
        "priority string, n_weeks bigint, n_alarms bigint,"
        " max_s bigint, first_alarm_week bigint"
    )

    def cusum(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("wk").reset_index(drop=True)
        n = len(pdf)
        total = int(pdf["x"].sum())
        thr = 2 * total
        s = mx = alarms = first = 0
        for i, x in enumerate(pdf["x"].astype("int64"), start=1):
            s = max(0, s + n * int(x) - total)
            if s > mx:
                mx = s
            if s > thr:
                alarms += 1
                if first == 0:
                    first = i
        return pd.DataFrame(
            [
                {
                    "priority": pdf["priority"].iloc[0],
                    "n_weeks": n,
                    "n_alarms": alarms,
                    "max_s": mx,
                    "first_alarm_week": first,
                }
            ]
        )

    return weekly.groupBy("priority").applyInPandas(cusum, schema)


# ---------------------------------------------------------------------------
# A52 — Kaplan-Meier survival curve over user lifetimes: duration =
# days between a user's first and last event; a user whose last
# event falls on the corpus's final day is CENSORED (still active),
# everyone else is a churn event at their duration. The KM estimator
# S(t) = prod(1 - d_t/n_t) is emitted in log-space as an exact
# integer cumulative sum of floor(ln((n-d)/n)*1e6 + 0.5) micro-nat
# terms (the x27 quantize-then-sum discipline — no cross-engine
# product of floats). Rows where the entire remaining risk set
# churns (n_t = d_t, log S = -inf) are excluded on both sides; the
# curve is reported to the last finite level, the standard plotting
# convention. Churn/retention survival is the canonical lifecycle
# statistic for contact lists (does a voter stay reachable?).
#
# Scale: ONE user rollup (map-side combined) then all counts and
# windows run over the BOUNDED duration rollup (<= days in the
# corpus window); no joins, no Python.
# ---------------------------------------------------------------------------
@register(
    "a52_kaplan_meier",
    oracle="""
    WITH mx AS (
      SELECT max(CAST(ts AS DATE)) AS maxd FROM events
    ), life AS (
      SELECT user_id,
             date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
               AS dur,
             CASE WHEN max(CAST(ts AS DATE)) < (SELECT maxd FROM mx)
                  THEN 1 ELSE 0 END AS churned
      FROM events GROUP BY user_id
    ), byd AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS n_at,
             CAST(sum(churned) AS BIGINT) AS d_t
      FROM life GROUP BY dur
    ), risk AS (
      SELECT dur, d_t,
             sum(n_at) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_t
      FROM byd
    ), terms AS (
      SELECT dur, CAST(n_t AS BIGINT) AS at_risk, d_t,
             CAST(floor(ln(CAST(n_t - d_t AS DOUBLE) / n_t) * 1000000 + 0.5)
                  AS BIGINT) AS term_micro
      FROM risk WHERE d_t > 0 AND n_t > d_t
    )
    SELECT dur AS duration_days, at_risk, d_t AS n_events,
           CAST(sum(term_micro) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_log_surv_micro
    FROM terms
    """,
)
def a52_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    mx = ev.agg(F.max("d").alias("maxd"))
    life = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff("last_d", "first_d").alias("dur"),
            F.when(F.col("last_d") < F.col("maxd"), 1).otherwise(0).alias(
                "churned"
            ),
        )
    )
    byd = life.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.sum("churned").cast("long").alias("d_t"),
    )
    w_desc = (
        W.orderBy(F.col("dur").desc()).rowsBetween(W.unboundedPreceding, 0)
    )
    risk = byd.select(
        "dur", "d_t", F.sum("n_at").over(w_desc).cast("long").alias("n_t")
    )
    terms = risk.filter(
        (F.col("d_t") > 0) & (F.col("n_t") > F.col("d_t"))
    ).select(
        "dur",
        F.col("n_t").alias("at_risk"),
        "d_t",
        F.expr(
            "cast(floor(ln(cast(n_t - d_t as double) / n_t)"
            " * 1000000 + 0.5d) as bigint)"
        ).alias("term_micro"),
    )
    w_asc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    return terms.select(
        F.col("dur").alias("duration_days"),
        "at_risk",
        F.col("d_t").alias("n_events"),
        F.sum("term_micro").over(w_asc).cast("long").alias("cum_log_surv_micro"),
    )


# ---------------------------------------------------------------------------
# A53 — Holt linear-trend forecast of weekly order volume per
# priority: the two coupled exponential-smoothing recurrences
#   l_t = 0.5·x_t + 0.5·(l_{t-1} + b_{t-1})
#   b_t = 0.5·(l_t − l_{t-1}) + 0.5·b_{t-1}
# (α = β = 0.5 — exactly-representable doubles) with h-step-ahead
# forecasts l_n + h·b_n for h = 1..4. Like w20, the recurrence is
# genuinely sequential (not window-expressible): Python runs it via
# applyInPandas on the bounded weekly rollup while the oracle
# unrolls the IDENTICAL operation sequence as a recursive CTE —
# IEEE doubles with the same op order are bit-equal across engines,
# and outputs quantize to cents only at the boundary.
#
# Scale: identical posture to w20 — map-side-combined weekly
# aggregate first, recurrence over O(weeks) rows per key, one
# shuffle on priority.
# ---------------------------------------------------------------------------
@register(
    "a53_holt_forecast",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT o_orderpriority AS priority,
             date_trunc('week', o_orderdate) AS wk,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), idx AS (
      SELECT priority, CAST(x AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY priority ORDER BY wk) AS i,
             count(*) OVER (PARTITION BY priority) AS n
      FROM w
    ), rec AS (
      SELECT priority, i, n, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM idx WHERE i = 1
      UNION ALL
      SELECT v.priority, v.i, v.n,
             0.5 * v.x + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * v.x + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM rec r JOIN idx v ON v.priority = r.priority AND v.i = r.i + 1
    )
    SELECT priority,
           CAST(n AS BIGINT) AS n_weeks,
           CAST(floor(l * 100 + 0.5) AS BIGINT) AS level_c,
           CAST(floor(b * 100 + 0.5) AS BIGINT) AS trend_c,
           CAST(floor((l + 1 * b) * 100 + 0.5) AS BIGINT) AS f1_c,
           CAST(floor((l + 2 * b) * 100 + 0.5) AS BIGINT) AS f2_c,
           CAST(floor((l + 3 * b) * 100 + 0.5) AS BIGINT) AS f3_c,
           CAST(floor((l + 4 * b) * 100 + 0.5) AS BIGINT) AS f4_c
    FROM rec WHERE i = n
    """,
)
def a53_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    orders = t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("week", "o_orderdate").alias("wk"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    schema = (
        "priority string, n_weeks bigint, level_c bigint, trend_c bigint,"
        " f1_c bigint, f2_c bigint, f3_c bigint, f4_c bigint"
    )

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("wk").reset_index(drop=True)
        xs = [float(v) for v in pdf["x"]]
        l, b = xs[0], 0.0
        for x in xs[1:]:
            # Same op order as the oracle's recursive CTE: IEEE
            # doubles make the trajectories bit-equal across engines.
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        q = lambda v: int(math.floor(v * 100 + 0.5))  # noqa: E731
        return pd.DataFrame(
            [
                {
                    "priority": pdf["priority"].iloc[0],
                    "n_weeks": len(xs),
                    "level_c": q(l),
                    "trend_c": q(b),
                    "f1_c": q(l + 1 * b),
                    "f2_c": q(l + 2 * b),
                    "f3_c": q(l + 3 * b),
                    "f4_c": q(l + 4 * b),
                }
            ]
        )

    return weekly.groupBy("priority").applyInPandas(holt, schema)


# ---------------------------------------------------------------------------
# A57 — new vs returning customers by month: each order is NEW when
# it is the customer's first-ever order (row_number over the
# customer's order history with the orderkey tiebreak), rolled up
# monthly with the new-share in basis points — the growth metric
# behind every acquisition dashboard (first-time vs repeat voter
# contact in the reference's terms). Exact integers end to end.
#
# Scale: ONE window exchange on o_custkey (per-customer ordering
# only), then a bounded monthly rollup with map-side combine.
# ---------------------------------------------------------------------------
@register(
    "a57_new_vs_returning",
    oracle="""
    WITH flagged AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CASE WHEN row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) = 1
             THEN 1 ELSE 0 END AS is_new
      FROM orders
    )
    SELECT month,
           CAST(sum(is_new) AS BIGINT) AS n_new,
           CAST(count(*) - sum(is_new) AS BIGINT) AS n_returning,
           CAST(10000 * sum(is_new) // count(*) AS BIGINT) AS new_share_bp
    FROM flagged GROUP BY month
    """,
)
def a57_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("is_new"),
    )
    return flagged.groupBy("month").agg(
        F.sum("is_new").cast("long").alias("n_new"),
        (F.count(F.lit(1)) - F.sum("is_new")).cast("long").alias("n_returning"),
        F.expr("10000 * sum(is_new) div count(1)").alias("new_share_bp"),
    )


# ---------------------------------------------------------------------------
# A58 — repeat-purchase intervals: per market segment, the gaps (in
# days) between a customer's consecutive orders — repeat-engagement
# cadence (how often a reachable voter re-engages). lag() per
# customer produces the gaps; the segment rollup reports repeat
# customers, gap count, and min/mean/max gap — exact integers (mean
# by integer division).
#
# Scale: ONE window exchange on o_custkey; the segment attach is a
# broadcast of the customer projection... which is itself large, so
# it joins on the shuffle key instead — the join and the window
# SHARE the o_custkey partitioning (AQE reuses it), then a bounded
# 5-row rollup.
# ---------------------------------------------------------------------------
@register(
    "a58_repeat_intervals",
    oracle="""
    WITH gaps AS (
      SELECT c.c_mktsegment AS segment,
             date_diff('day',
               lag(o.o_orderdate) OVER (
                 PARTITION BY o.o_custkey
                 ORDER BY o.o_orderdate, o.o_orderkey),
               o.o_orderdate) AS gap_days
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_gap_days,
           CAST(sum(gap_days) // count(*) AS BIGINT) AS mean_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY segment
    """,
)
def a58_repeat_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.join(cust, "o_custkey")
        .select(
            "segment",
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.expr("sum(gap_days) div count(1)").alias("mean_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# E5 — the board pack: one long-format executive report (section,
# metric, value) computed as a single plan — total revenue, latest
# month-over-month change, latest new-customer share, 3-sigma
# anomaly-day count, and the top revenue decile's share. Each
# metric reuses a session operator's exact-integer formulation
# (w23, a57, w22, a55) but lands in ONE DataFrame so a scheduler
# ships ONE job and the numbers are mutually consistent (same scan
# snapshot — the property per-metric jobs lose when data lands
# between runs).
#
# Scale: five bounded aggregates unioned; the orders scan feeds
# monthly/daily/customer rollups that each combine map-side. All
# 1-row results; no metric touches raw rows twice in the same
# branch.
# ---------------------------------------------------------------------------
@register(
    "e5_board_pack",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), mom AS (
      SELECT month, cents,
             lag(cents) OVER (ORDER BY month) AS prev,
             row_number() OVER (ORDER BY month DESC) AS rn
      FROM monthly
    ), flagged AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CASE WHEN row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
             THEN 1 ELSE 0 END AS is_new
      FROM orders
    ), newest AS (
      SELECT month, CAST(10000 * sum(is_new) // count(*) AS BIGINT) AS bp,
             row_number() OVER (ORDER BY month DESC) AS rn
      FROM flagged GROUP BY month
    ), daily AS (
      SELECT o_orderpriority AS p, o_orderdate AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), mom2 AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY p
    ), anom AS (
      SELECT CAST(sum(CASE WHEN m.n * (m.n * d.x - m.sx) * (m.n * d.x - m.sx)
                                > 9 * (m.n * m.sxx - m.sx * m.sx) * m.n
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
      FROM daily d JOIN mom2 m ON d.p = m.p
    ), rev AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), pareto AS (
      SELECT CAST(10000 * sum(CASE WHEN decile = 1 THEN cents ELSE 0 END)
                  // sum(cents) AS BIGINT) AS top_decile_bp
      FROM (SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey)
                     AS decile FROM rev)
    )
    SELECT 'revenue' AS section, 'total_cents' AS metric,
           (SELECT CAST(sum(cents) AS BIGINT) FROM monthly) AS value
    UNION ALL
    SELECT 'revenue', 'latest_mom_bp',
           (SELECT CAST(10000 * (cents - prev) // prev AS BIGINT)
            FROM mom WHERE rn = 1)
    UNION ALL
    SELECT 'growth', 'latest_new_share_bp', (SELECT bp FROM newest WHERE rn = 1)
    UNION ALL
    SELECT 'health', 'sigma_anomaly_days', (SELECT n_anom FROM anom)
    UNION ALL
    SELECT 'concentration', 'top_decile_share_bp',
           (SELECT top_decile_bp FROM pareto)
    """,
)
def e5_board_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cents = F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")

    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(cents).alias("cents"))
    total = monthly.agg(F.sum("cents").cast("long").alias("value")).select(
        F.lit("revenue").alias("section"),
        F.lit("total_cents").alias("metric"),
        "value",
    )
    w_m = W.orderBy("month")
    mom = (
        monthly.select(
            "month", "cents", F.lag("cents").over(w_m).alias("prev")
        )
        .orderBy(F.desc("month"))
        .limit(1)
        .select(
            F.lit("revenue").alias("section"),
            F.lit("latest_mom_bp").alias("metric"),
            F.expr("10000 * (cents - prev) div prev").alias("value"),
        )
    )
    w_cust = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    newest = (
        orders.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.when(F.row_number().over(w_cust) == 1, 1).otherwise(0).alias(
                "is_new"
            ),
        )
        .groupBy("month")
        .agg(F.expr("10000 * sum(is_new) div count(1)").alias("value"))
        .orderBy(F.desc("month"))
        .limit(1)
        .select(
            F.lit("growth").alias("section"),
            F.lit("latest_new_share_bp").alias("metric"),
            "value",
        )
    )
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    mom2 = daily.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    anom = (
        daily.join(F.broadcast(mom2), "p")
        .agg(
            F.sum(
                F.when(
                    F.col("n")
                    * (F.col("n") * F.col("x") - F.col("sx"))
                    * (F.col("n") * F.col("x") - F.col("sx"))
                    > 9
                    * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * F.col("n"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("value")
        )
        .select(
            F.lit("health").alias("section"),
            F.lit("sigma_anomaly_days").alias("metric"),
            "value",
        )
    )
    rev = orders.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))
    pareto = (
        rev.select(
            "cents",
            F.ntile(10)
            .over(W.orderBy(F.desc("cents"), "o_custkey"))
            .alias("decile"),
        )
        .agg(
            F.expr(
                "10000 * sum(case when decile = 1 then cents else 0 end)"
                " div sum(cents)"
            ).alias("value")
        )
        .select(
            F.lit("concentration").alias("section"),
            F.lit("top_decile_share_bp").alias("metric"),
            "value",
        )
    )
    out = total
    for part in (mom, newest, anom, pareto):
        out = out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# A60 — seasonal-naive backtest: score the "same weekday last week"
# forecast against realized daily order counts — the baseline every
# real forecast (a53) must beat before it ships, reported as MAE
# and signed bias in integer basis points of realized volume.
# lag(7) over the daily series per priority; only days with a
# 7-back reference score.
#
# Scale: bounded daily rollup, ONE window exchange, 5-row report.
# ---------------------------------------------------------------------------
@register(
    "a60_backtest_naive",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), scored AS (
      SELECT priority, x,
             lag(x, 7) OVER (PARTITION BY priority ORDER BY day) AS pred
      FROM daily
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           CAST(10000 * sum(abs(x - pred)) // sum(x) AS BIGINT) AS mae_bp,
           CAST(10000 * sum(pred - x) // sum(x) AS BIGINT) AS bias_bp
    FROM scored WHERE pred IS NOT NULL
    GROUP BY priority
    """,
)
def a60_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = W.partitionBy("priority").orderBy("day")
    scored = daily.select(
        "priority", "x", F.lag("x", 7).over(w).alias("pred")
    ).filter(F.col("pred").isNotNull())
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.expr("10000 * sum(abs(x - pred)) div sum(x)").alias("mae_bp"),
        F.expr("10000 * sum(pred - x) div sum(x)").alias("bias_bp"),
    )


# ---------------------------------------------------------------------------
# A61 — comparable-cohort growth ("same-store sales"): 1996→1997
# revenue growth computed two ways — naively over everyone, and
# restricted to customers active in BOTH years — the correction
# that separates real per-customer growth from mix effects
# (churned + acquired customers). The comparable set is a semi-join
# of the two per-customer year rollups; both growth rates land in
# integer bp.
#
# Scale: one customer×year rollup (map-side combined) feeds both
# variants; the comparable filter is an inner self-join on
# custkey over that bounded rollup. 2-row report.
# ---------------------------------------------------------------------------
@register(
    "a61_same_store_growth",
    oracle="""
    WITH cy AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), pair AS (
      SELECT a.o_custkey, a.cents AS c96, b.cents AS c97
      FROM cy a JOIN cy b
        ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
    )
    SELECT 'all_customers' AS cohort,
           CAST((SELECT count(DISTINCT o_custkey) FROM cy) AS BIGINT)
             AS n_customers,
           CAST(10000 * ((SELECT sum(cents) FROM cy WHERE yr = 1997)
                         - (SELECT sum(cents) FROM cy WHERE yr = 1996))
                // (SELECT sum(cents) FROM cy WHERE yr = 1996) AS BIGINT)
             AS growth_bp
    UNION ALL
    SELECT 'comparable',
           CAST((SELECT count(*) FROM pair) AS BIGINT),
           CAST(10000 * ((SELECT sum(c97) FROM pair)
                         - (SELECT sum(c96) FROM pair))
                // (SELECT sum(c96) FROM pair) AS BIGINT)
    """,
)
def a61_same_store_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cy = (
        orders.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            "o_custkey", F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).alias("cents")
        )
        .transform(materialize)  # both cohorts and the pair join reuse it
    )
    a = cy.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("cents").alias("c96")
    )
    b = cy.filter(F.col("yr") == 1997).select(
        "o_custkey", F.col("cents").alias("c97")
    )
    pair = a.join(b, "o_custkey")
    all_row = cy.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.expr(
            "10000 * (sum(case when yr = 1997 then cents else 0 end)"
            " - sum(case when yr = 1996 then cents else 0 end))"
            " div sum(case when yr = 1996 then cents else 0 end)"
        ).alias("growth_bp"),
    ).select(
        F.lit("all_customers").alias("cohort"), "n_customers", "growth_bp"
    )
    comp_row = pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.expr(
            "10000 * (sum(c97) - sum(c96)) div sum(c96)"
        ).alias("growth_bp"),
    ).select(F.lit("comparable").alias("cohort"), "n_customers", "growth_bp")
    return all_row.unionByName(comp_row)


# ---------------------------------------------------------------------------
# A62 — holiday uplift: order volume and revenue on fixed-date
# holidays (Jan 1, Jul 4, Dec 25 — the dates that repeat across
# TPC-H's 1992-1998 span) vs the all-days baseline, as uplift in
# basis points — the promo/turnout-effect readout (election-day
# uplift in the reference's world). The holiday calendar is a
# literal predicate on (month, day), identical in both engines;
# daily averages stay exact by comparing cross-multiplied integer
# sums rather than dividing early.
#
# Scale: one daily rollup; the holiday flag is map-side arithmetic;
# 2-row report.
# ---------------------------------------------------------------------------
@register(
    "a62_holiday_uplift",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CASE WHEN (month(o_orderdate), day(o_orderdate)) IN
                       ((1, 1), (7, 4), (12, 25)) THEN 1 ELSE 0 END AS hol,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT CASE WHEN hol = 1 THEN 'holiday' ELSE 'baseline' END AS cohort,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(n) // count(*) AS BIGINT) AS mean_orders_per_day
    FROM daily GROUP BY hol
    """,
)
def a62_holiday_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    hol = (
        ((F.month("o_orderdate") == 1) & (F.dayofmonth("o_orderdate") == 1))
        | ((F.month("o_orderdate") == 7) & (F.dayofmonth("o_orderdate") == 4))
        | ((F.month("o_orderdate") == 12) & (F.dayofmonth("o_orderdate") == 25))
    )
    daily = orders.groupBy(
        F.col("o_orderdate").alias("day"),
        F.when(hol, 1).otherwise(0).alias("hol"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")).alias(
            "cents"
        ),
    )
    return daily.groupBy(
        F.when(F.col("hol") == 1, "holiday").otherwise("baseline").alias(
            "cohort"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.expr("sum(n) div count(1)").alias("mean_orders_per_day"),
    )


# ---------------------------------------------------------------------------
# A63 — champion/challenger forecast backtest: one-step-ahead Holt
# (a53's recurrence) vs the naive "same as last week" baseline
# (a60), scored as MAE in basis points over the same weekly series
# — the model-selection loop that decides which forecaster ships.
# The Holt trajectory is the identical op-order recurrence on both
# sides (Python loop vs recursive CTE — bit-equal IEEE doubles);
# each step's forecast for t+1 is l_t + b_t, quantized to cents
# before the error sum so the MAE is exact integer arithmetic.
#
# Scale: w20/a53's posture — the recurrence walks the bounded
# weekly rollup per key; scoring is a window join on the same
# partitioning.
# ---------------------------------------------------------------------------
@register(
    "a63_forecast_backtest",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT o_orderpriority AS priority,
             date_trunc('week', o_orderdate) AS wk,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ), idx AS (
      SELECT priority, CAST(x AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY priority ORDER BY wk) AS i
      FROM w
    ), rec AS (
      SELECT priority, i, x, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM idx WHERE i = 1
      UNION ALL
      SELECT v.priority, v.i, v.x,
             0.5 * v.x + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * v.x + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM rec r JOIN idx v ON v.priority = r.priority AND v.i = r.i + 1
    ), holt_pred AS (
      SELECT priority, i + 1 AS i,
             CAST(floor((l + b) * 100 + 0.5) AS BIGINT) AS pred_c
      FROM rec
    ), actual AS (
      SELECT priority, i, CAST(x * 100 AS BIGINT) AS x_c,
             lag(CAST(x * 100 AS BIGINT)) OVER (
               PARTITION BY priority ORDER BY i) AS naive_c
      FROM idx
    )
    SELECT a.priority,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(10000 * sum(abs(a.x_c - h.pred_c)) // sum(a.x_c) AS BIGINT)
             AS holt_mae_bp,
           CAST(10000 * sum(abs(a.x_c - a.naive_c)) // sum(a.x_c) AS BIGINT)
             AS naive_mae_bp
    FROM actual a JOIN holt_pred h ON h.priority = a.priority AND h.i = a.i
    WHERE a.naive_c IS NOT NULL
    GROUP BY a.priority
    """,
)
def a63_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    orders = t(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("week", "o_orderdate").alias("wk"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))

    schema = (
        "priority string, n_scored bigint, holt_mae_bp bigint,"
        " naive_mae_bp bigint"
    )

    def backtest(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("wk").reset_index(drop=True)
        xs = [float(v) for v in pdf["x"]]
        l, b = xs[0], 0.0
        holt_err = naive_err = tot = 0
        n_scored = 0
        for i in range(1, len(xs)):
            pred_c = int(math.floor((l + b) * 100 + 0.5))
            x_c = int(xs[i] * 100)
            naive_c = int(xs[i - 1] * 100)
            # score only steps where naive has a reference (i >= 1),
            # matching the oracle's naive IS NOT NULL filter
            n_scored += 1
            holt_err += abs(x_c - pred_c)
            naive_err += abs(x_c - naive_c)
            tot += x_c
            l_new = 0.5 * xs[i] + 0.5 * (l + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        return pd.DataFrame(
            [
                {
                    "priority": pdf["priority"].iloc[0],
                    "n_scored": n_scored,
                    "holt_mae_bp": 10000 * holt_err // tot,
                    "naive_mae_bp": 10000 * naive_err // tot,
                }
            ]
        )

    return weekly.groupBy("priority").applyInPandas(backtest, schema)


# ---------------------------------------------------------------------------
# A65 — growth decomposition: which region drove the 1996→1997
# revenue change? Each region's contribution in basis points of the
# 1996 total (contributions sum to the headline growth rate by
# construction) — the FP&A bridge/waterfall behind every "what
# moved the number" review. Exact integer cents; one shared
# denominator attached as a broadcast.
#
# Scale: orders joins the bounded customer->nation->region dim
# chain (broadcast), rolls up per (region, year), and the
# decomposition is arithmetic over the 10-row rollup.
# ---------------------------------------------------------------------------
@register(
    "a65_growth_contribution",
    oracle="""
    WITH ry AS (
      SELECT r.r_name AS region, year(o.o_orderdate) AS yr,
             sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE year(o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), wide AS (
      SELECT region,
             sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS c96,
             sum(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS c97
      FROM ry GROUP BY region
    ), tot AS (
      SELECT sum(c96) AS t96 FROM wide
    )
    SELECT w.region,
           CAST(w.c96 AS BIGINT) AS cents_1996,
           CAST(w.c97 AS BIGINT) AS cents_1997,
           CAST(10000 * (w.c97 - w.c96) // t.t96 AS BIGINT)
             AS contribution_bp
    FROM wide w CROSS JOIN tot t
    """,
)
def a65_growth_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("r_regionkey"),
    )
    reg = t(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    ry = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), "c_nationkey")
        .join(F.broadcast(reg), "r_regionkey")
        .groupBy("region", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).alias("cents")
        )
    )
    wide = ry.groupBy("region").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
            "c96"
        ),
        F.sum(F.when(F.col("yr") == 1997, F.col("cents")).otherwise(0)).alias(
            "c97"
        ),
    )
    tot = wide.agg(F.sum("c96").alias("t96"))
    return wide.crossJoin(F.broadcast(tot)).select(
        "region",
        F.col("c96").cast("long").alias("cents_1996"),
        F.col("c97").cast("long").alias("cents_1997"),
        F.expr("10000 * (c97 - c96) div t96").alias("contribution_bp"),
    )


# ---------------------------------------------------------------------------
# A66 — weekday × hour activity heatmap: the 7×24 grid of event
# counts plus distinct users per cell — the first chart on any
# engagement dashboard (best-contact-hour planning in the
# reference's terms). ISO weekday numbering matches across engines
# (Monday=1); the grid is bounded at 168 cells.
#
# Scale: one map-side projection + one bounded rollup.
# ---------------------------------------------------------------------------
@register(
    "a66_weekday_hour_heatmap",
    oracle="""
    SELECT CAST(isodow(ts::TIMESTAMP) AS BIGINT) AS weekday,
           CAST(hour(ts::TIMESTAMP) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def a66_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.dayofweek("ts").alias("dow_sun1"),
            F.hour("ts").alias("hour"),
            "user_id",
        )
        .select(
            # Spark dayofweek is Sunday=1; convert to ISO Monday=1.
            F.when(F.col("dow_sun1") == 1, 7)
            .otherwise(F.col("dow_sun1") - 1)
            .cast("long")
            .alias("weekday"),
            F.col("hour").cast("long").alias("hour"),
            "user_id",
        )
        .groupBy("weekday", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# A67 — cohort LTV triangle: customers grouped by acquisition year
# (their first order's year), revenue accumulated cumulatively by
# age-in-years — the lifetime-value table every subscription /
# donor program reads (cell [cohort, age] = total revenue the
# cohort has produced through that age). Exact integer cents; the
# cumulative runs over the bounded cohort×age rollup.
#
# Scale: first-order year via one per-customer window, revenue
# rollup on (cohort, age) with map-side combine, cumulative window
# over the bounded triangle (~7×7 cells).
# ---------------------------------------------------------------------------
@register(
    "a67_cohort_ltv",
    oracle="""
    WITH first_year AS (
      SELECT o_custkey, min(year(o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ), cells AS (
      SELECT f.cohort,
             year(o.o_orderdate) - f.cohort AS age,
             sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN first_year f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(cohort AS BIGINT) AS cohort,
           CAST(age AS BIGINT) AS age_years,
           CAST(cents AS BIGINT) AS cents,
           CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_ltv_cents
    FROM cells
    """,
)
def a67_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    first_year = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort")
    )
    cells = (
        orders.join(first_year, "o_custkey")
        .groupBy(
            "cohort",
            (F.year("o_orderdate") - F.col("cohort")).alias("age"),
        )
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).alias("cents")
        )
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return cells.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("age").cast("long").alias("age_years"),
        F.col("cents").cast("long").alias("cents"),
        F.sum("cents").over(w).cast("long").alias("cum_ltv_cents"),
    )


# ---------------------------------------------------------------------------
# A69 — DAU/MAU stickiness: per active day, the distinct users that
# day (DAU), the distinct users over the trailing 30 days (MAU), and
# DAU*10000 div MAU — the engagement ratio every growth dashboard
# tracks.
#
# Scale: trailing-window COUNT(DISTINCT) is the trap — a 30-day
# range-frame distinct window re-scans each user 30x AND needs a
# per-day distinct state. Instead: dedupe to (user, day) once, then
# each user-day COVERS the 30 output days it can keep the user active
# for (a bounded 30x explode), dedupe (user, covered_day), and MAU is
# a plain count per day — distinct-free, shuffle on (user, day) and
# day only. The same forward-coverage trick w19 uses for interval
# union.
# ---------------------------------------------------------------------------
@register(
    "a69_dau_mau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), cov AS (
      SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS cday
      FROM ud, unnest(range(0, 30)) AS g(i)
    ), mau AS (
      SELECT cday AS day, CAST(count(*) AS BIGINT) AS mau
      FROM cov GROUP BY cday
    )
    SELECT d.day, d.dau, m.mau,
           CAST(d.dau * 10000 // m.mau AS BIGINT) AS stickiness_bp
    FROM dau d JOIN mau m ON d.day = m.day
    """,
)
def a69_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cov = (
        ud.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("i"),
        )
        .select(
            "user_id",
            F.expr("date_add(day, cast(i as int))").alias("cday"),
        )
        .distinct()
    )
    mau = cov.groupBy(F.col("cday").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("mau")
    )
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        F.expr("cast(dau * 10000 div mau as bigint)").alias("stickiness_bp"),
    )


# ---------------------------------------------------------------------------
# E6 — warehouse ops-health pack: the morning on-call report as ONE
# long-format result — referential orphans (orders whose customer is
# missing), primary-key duplication, per-type event freshness lag vs
# the global high-water mark, and row balance by order status. Each
# leg is the cheapest plan for its check (anti-join, count-vs-
# distinct, broadcast 1-row high-water mark, plain rollup) and the
# union is a logical no-op.
#
# Scale: every leg is one shuffle or less; nothing materializes an
# intermediate wider than its rollup.
# ---------------------------------------------------------------------------
@register(
    "e6_ops_health",
    oracle="""
    WITH orphans AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ), dups AS (
      SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v
      FROM orders
    ), hw AS (SELECT max(ts) AS hwm FROM events),
    fresh AS (
      SELECT e.event_type,
             CAST(date_diff('day', CAST(max(e.ts) AS DATE),
                            CAST(max(hw.hwm) AS DATE)) AS BIGINT) AS v
      FROM events e CROSS JOIN hw GROUP BY e.event_type
    ), status AS (
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS v
      FROM orders GROUP BY o_orderstatus
    )
    SELECT 'orphan_orders' AS chk, 'all' AS dim, v FROM orphans
    UNION ALL
    SELECT 'dup_orderkeys', 'all', v FROM dups
    UNION ALL
    SELECT 'freshness_days_behind', event_type, v FROM fresh
    UNION ALL
    SELECT 'rows_by_status', o_orderstatus, v FROM status
    """,
)
def e6_ops_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")
    orphans = (
        orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .select(
            F.lit("orphan_orders").alias("chk"), F.lit("all").alias("dim"), "v"
        )
    )
    dups = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v")
    ).select(
        F.lit("dup_orderkeys").alias("chk"), F.lit("all").alias("dim"), "v"
    )
    # ONE events pass (r13): the global high-watermark is the max of
    # the per-type maxes, so it derives from the 5-row rollup instead
    # of a second full events scan; the rollup is checkpointed because
    # both the watermark and the freshness rows read it.
    per_type = (
        ev.groupBy("event_type")
        .agg(F.max("ts").alias("last_ts"))
        .transform(materialize)
    )
    hw = per_type.agg(F.max("last_ts").alias("hwm"))
    fresh = (
        per_type
        .crossJoin(F.broadcast(hw))
        .select(
            F.lit("freshness_days_behind").alias("chk"),
            F.col("event_type").alias("dim"),
            F.expr(
                "cast(datediff(cast(hwm as date), cast(last_ts as date))"
                " as bigint)"
            ).alias("v"),
        )
    )
    status = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    ).select(
        F.lit("rows_by_status").alias("chk"),
        F.col("o_orderstatus").alias("dim"),
        "v",
    )
    return orphans.unionByName(dups).unionByName(fresh).unionByName(status)


# ---------------------------------------------------------------------------
# A72 — revenue recognition (allocation with exact remainders): each
# order's value is recognized evenly over 1 + o_orderkey % 12 monthly
# slices starting at its order month; integer division would DROP
# cents, so the remainder lands on the first slice — sum of slices
# reconstructs every order exactly, and the rollup books recognized
# revenue per calendar month. The allocate-explode-reaggregate shape
# of every finance ETL.
#
# Scale: bounded <=12x explode per order, then one shuffle on the
# recognition month; conservation is enforced by arithmetic, not by a
# reconciliation pass.
# ---------------------------------------------------------------------------
@register(
    "a72_revenue_recognition",
    oracle="""
    WITH o AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m0,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(1 + o_orderkey % 12 AS BIGINT) AS k
      FROM orders
    ), slices AS (
      SELECT m0 + to_months(CAST(i AS INTEGER)) AS month,
             cents // k + CASE WHEN i = 0 THEN cents % k ELSE 0 END
               AS rec_c
      FROM o, unnest(range(0, k)) AS g(i)
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(sum(rec_c) AS BIGINT) AS recognized_c,
           CAST(count(*) AS BIGINT) AS n_slices
    FROM slices GROUP BY month
    """,
)
def a72_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    o = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m0"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.expr("cast(1 + o_orderkey % 12 as bigint)").alias("k"),
    )
    slices = o.select(
        "m0",
        "cents",
        "k",
        F.explode(F.expr("sequence(0, cast(k - 1 as int))")).alias("i"),
    ).select(
        F.expr("add_months(m0, i)").alias("month"),
        F.expr(
            "cents div k + case when i = 0 then cents % k else 0 end"
        ).alias("rec_c"),
    )
    return slices.groupBy("month").agg(
        F.sum("rec_c").cast("long").alias("recognized_c"),
        F.count(F.lit(1)).cast("long").alias("n_slices"),
    )


# ---------------------------------------------------------------------------
# A73 — revenue bridge (waterfall): each month's revenue delta
# decomposed into NEW (customer absent last month), EXPANSION (spent
# more), CONTRACTION (spent less), and CHURN (absent this month) —
# with the accounting identity end = start + new + expansion -
# contraction - churn holding EXACTLY in cents (enforced by a unit
# test, not hoped for). The month-over-month pairing is a full-outer
# self-join of the customer-month rollup against itself shifted one
# month.
#
# Scale: the rollup is one shuffle on (custkey, month); the shifted
# join is co-partitioned on the same key; the bridge is a bounded
# O(months) rollup.
# ---------------------------------------------------------------------------
@register(
    "a73_revenue_bridge",
    oracle="""
    WITH cm AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ), shifted AS (
      SELECT cust, m + INTERVAL 1 MONTH AS m, c AS c_prev FROM cm
    ), pair AS (
      SELECT coalesce(a.cust, b.cust) AS cust,
             CAST(coalesce(a.m, b.m) AS DATE) AS m,
             a.c, b.c_prev
      FROM cm a FULL OUTER JOIN shifted b
        ON a.cust = b.cust AND a.m = b.m
    )
    SELECT m,
      CAST(sum(coalesce(c_prev, 0)) AS BIGINT) AS start_c,
      CAST(sum(CASE WHEN c_prev IS NULL THEN c ELSE 0 END) AS BIGINT)
        AS new_c,
      CAST(sum(CASE WHEN c IS NOT NULL AND c_prev IS NOT NULL
                     AND c > c_prev THEN c - c_prev ELSE 0 END) AS BIGINT)
        AS expansion_c,
      CAST(sum(CASE WHEN c IS NOT NULL AND c_prev IS NOT NULL
                     AND c < c_prev THEN c_prev - c ELSE 0 END) AS BIGINT)
        AS contraction_c,
      CAST(sum(CASE WHEN c IS NULL THEN c_prev ELSE 0 END) AS BIGINT)
        AS churn_c,
      CAST(sum(coalesce(c, 0)) AS BIGINT) AS end_c
    FROM pair GROUP BY m
    """,
)
def a73_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cm = orders.select(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("cust", "m").agg(F.sum("cents").cast("long").alias("c"))
    shifted = cm.select(
        "cust", F.add_months("m", 1).alias("m"), F.col("c").alias("c_prev")
    )
    pair = cm.join(shifted, ["cust", "m"], "full_outer")
    return pair.groupBy("m").agg(
        F.sum(F.coalesce("c_prev", F.lit(0))).cast("long").alias("start_c"),
        F.sum(F.when(F.col("c_prev").isNull(), F.col("c")).otherwise(0))
        .cast("long")
        .alias("new_c"),
        F.sum(
            F.when(
                F.col("c").isNotNull()
                & F.col("c_prev").isNotNull()
                & (F.col("c") > F.col("c_prev")),
                F.col("c") - F.col("c_prev"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("expansion_c"),
        F.sum(
            F.when(
                F.col("c").isNotNull()
                & F.col("c_prev").isNotNull()
                & (F.col("c") < F.col("c_prev")),
                F.col("c_prev") - F.col("c"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("contraction_c"),
        F.sum(F.when(F.col("c").isNull(), F.col("c_prev")).otherwise(0))
        .cast("long")
        .alias("churn_c"),
        F.sum(F.coalesce("c", F.lit(0))).cast("long").alias("end_c"),
    )


# ---------------------------------------------------------------------------
# A74 — spatial hotspot detection: bucket events into a 50x50 grid
# (the j10 blocking discipline), then a cell is a hotspot iff its
# count is >= every 8-neighbor's count AND >= 2x the mean cell load.
# Local-max-over-neighborhood is the shape behind every density
# hotspot map, and the whole neighborhood comparison is EQUI-joins
# on shifted cell keys — never a distance join.
#
# Scale: per-cell counts are one map-side-combined shuffle; the
# 8-neighbor claims are a bounded 8x explode of the CELL table (not
# the events); the mean rides in as a broadcast 1-row aggregate.
# ---------------------------------------------------------------------------
@register(
    "a74_spatial_hotspots",
    oracle="""
    WITH cells AS (
      SELECT user_id % 50 AS cx, (user_id // 50) % 50 AS cy,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), claims AS (
      SELECT c.cx + dx.d AS jx, c.cy + dy.d AS jy, c.n
      FROM cells c,
           (VALUES (-1), (0), (1)) AS dx(d),
           (VALUES (-1), (0), (1)) AS dy(d)
      WHERE NOT (dx.d = 0 AND dy.d = 0)
    ), nmax AS (
      SELECT jx, jy, CAST(max(n) AS BIGINT) AS nbr_max
      FROM claims GROUP BY jx, jy
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total_n,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM cells
    )
    SELECT c.cx, c.cy, c.n,
           CAST(coalesce(m.nbr_max, 0) AS BIGINT) AS nbr_max
    FROM cells c
    LEFT JOIN nmax m ON c.cx = m.jx AND c.cy = m.jy
    CROSS JOIN tot
    WHERE c.n >= coalesce(m.nbr_max, 0)
      AND c.n * tot.n_cells >= 2 * tot.total_n
    """,
)
def a74_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("user_id % 50").alias("cx"),
        F.expr("(user_id div 50) % 50").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    claims = (
        cells.select(
            "cx", "cy", "n", F.explode(F.expr("sequence(-1, 1)")).alias("dx")
        )
        .select(
            "cx", "cy", "n", "dx",
            F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
        )
        .filter(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
            "n",
        )
    )
    nmax = claims.groupBy("jx", "jy").agg(
        F.max("n").cast("long").alias("nbr_max")
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("total_n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return (
        cells.join(
            nmax,
            (F.col("cx") == F.col("jx")) & (F.col("cy") == F.col("jy")),
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n") >= F.coalesce("nbr_max", F.lit(0)))
            & (F.col("n") * F.col("n_cells") >= 2 * F.col("total_n"))
        )
        .select(
            "cx",
            "cy",
            "n",
            F.coalesce("nbr_max", F.lit(0)).cast("long").alias("nbr_max"),
        )
    )


# ---------------------------------------------------------------------------
# A75 — 4-4-5 fiscal calendar rollup: map order dates onto the
# retail fiscal calendar (52-week years anchored 1992-01-01, four
# 13-week quarters of 4+4+5-week periods) with PURE integer
# arithmetic — no calendar dimension table to join, no UDF — and
# roll revenue up per fiscal (year, period). Same-length periods are
# what make retail comps comparable; the mapping is the operator.
#
# Scale: the fiscal keys are map-side column arithmetic; one shuffle
# for the bounded (year, period) rollup.
# ---------------------------------------------------------------------------
@register(
    "a75_fiscal_445_calendar",
    oracle="""
    WITH d AS (
      SELECT (CAST(o_orderdate AS DATE) - DATE '1992-01-01') AS off,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), f AS (
      SELECT cents,
             off // 364 AS fy,
             (off % 364) // 7 AS wk
      FROM d WHERE off >= 0
    )
    SELECT CAST(1992 + fy AS BIGINT) AS fiscal_year,
           CAST((wk // 13) * 3
                + CASE WHEN wk % 13 < 4 THEN 1
                       WHEN wk % 13 < 8 THEN 2 ELSE 3 END
                AS BIGINT) AS fiscal_period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM f GROUP BY 1, 2
    """,
)
def a75_fiscal_445_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    d = orders.select(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("long")
        .alias("off"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).filter(F.col("off") >= 0)
    f = d.select(
        "cents",
        F.expr("off div 364").alias("fy"),
        F.expr("(off % 364) div 7").alias("wk"),
    )
    return f.groupBy(
        F.expr("cast(1992 + fy as bigint)").alias("fiscal_year"),
        F.expr(
            "cast((wk div 13) * 3 + case when wk % 13 < 4 then 1"
            " when wk % 13 < 8 then 2 else 3 end as bigint)"
        ).alias("fiscal_period"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# A76 — 3-step Markov forecast (matrix powers): from a43's one-step
# transition matrix, where will a user's event type be THREE events
# from now — T^3 computed as two sparse matrix multiplies over the
# (from, to, prob) long form, entirely in exact scaled integers
# (milli -> micro -> nano, one final rescale), so both engines agree
# bit-for-bit without any float matrix library. The x94 discipline
# applied to chained joins instead of a Gram aggregate.
#
# Scale: the state space is O(event types), so every multiply is a
# join+groupBy over O(d^2) rows; only the transition EXTRACTION
# touches the events table (one window pass + one rollup).
# ---------------------------------------------------------------------------
@register(
    "a76_markov_3step",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type AS i, event_type AS j, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT i, sum(n) AS rt FROM pairs GROUP BY i
    ), t1 AS (
      SELECT p.i, p.j, CAST(1000 * p.n // t.rt AS BIGINT) AS p_milli
      FROM pairs p JOIN totals t ON p.i = t.i
    ), t2 AS (
      SELECT a.i, b.j, CAST(sum(a.p_milli * b.p_milli) AS BIGINT)
               AS p_micro2
      FROM t1 a JOIN t1 b ON a.j = b.i GROUP BY a.i, b.j
    ), t3 AS (
      SELECT a.i, b.j, CAST(sum(a.p_micro2 * b.p_milli) AS BIGINT)
               AS p_nano
      FROM t2 a JOIN t1 b ON a.j = b.i GROUP BY a.i, b.j
    )
    SELECT i AS from_type, j AS to_type,
           CAST(p_nano // 1000000 AS BIGINT) AS p3_milli
    FROM t3
    """,
)
def a76_markov_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = t(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
        )
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("i"), F.col("event_type").alias("j")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("i").agg(F.sum("n").alias("rt"))
    # t1 is O(event_types^2) rows but its build is the ONLY part that
    # touches the events table (window pass + rollup), and the two
    # matrix multiplies reference it THREE times — materialize once
    # (r13, the a49/x4 discipline: without it each reference re-runs
    # the full extraction).
    t1 = pairs.join(totals, "i").select(
        "i", "j", F.expr("cast(1000 * n div rt as bigint)").alias("p_milli")
    ).transform(materialize)
    a = t1.select(
        F.col("i"), F.col("j").alias("k"), F.col("p_milli").alias("pa")
    )
    b = t1.select(
        F.col("i").alias("k"), F.col("j"), F.col("p_milli").alias("pb")
    )
    t2 = (
        a.join(b, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("pa") * F.col("pb")).cast("long").alias("p_micro2"))
    )
    a2 = t2.select(
        "i", F.col("j").alias("k"), F.col("p_micro2").alias("pa")
    )
    t3 = (
        a2.join(b, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("pa") * F.col("pb")).cast("long").alias("p_nano"))
    )
    return t3.select(
        F.col("i").alias("from_type"),
        F.col("j").alias("to_type"),
        F.expr("cast(p_nano div 1000000 as bigint)").alias("p3_milli"),
    )


# ---------------------------------------------------------------------------
# A77 — forecast-interval coverage: backtest whether the naive
# "trailing-12-month mean +/- 2 sigma" interval actually contains
# the realized month ~95% of the time — the CALIBRATION check a60's
# point-error backtests don't ask. The sigma comparison is fully
# cross-multiplied integers ((12a - s1)^2 <= 4(12*s2 - s1^2), the
# w22 discipline — no sqrt, no float).
#
# WIDTH (r8, caught by the sf1.0 replay): in whole dollars the
# cross-multiplied terms leave int64 exactly when the data grows —
# at sf1.0 a month-priority cell is ~9e8 dollars, so s1^2 ~ 1.3e20
# and even s2's d*d window sum ~ 1.1e19 overflow BIGINT (ANSI Spark
# threw; non-ANSI would have wrapped silently). The comparison now
# runs in DECIMAL(38,0) on the Spark side and HUGEINT (int128) in
# DuckDB — both exact, identical semantics, headroom to ~1e38 (a
# ~1e14-dollar month cell, far past any physical retail scale).
#
# Scale: one month rollup, one priority-partitioned window pass for
# the two trailing sums, a bounded per-priority rollup.
# ---------------------------------------------------------------------------
@register(
    "a77_forecast_interval_coverage",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS prio,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  // 100 AS BIGINT) AS HUGEINT) AS d
      FROM orders GROUP BY 1, 2
    ), w AS (
      SELECT prio, month, d,
             sum(d) OVER (PARTITION BY prio ORDER BY month
                          ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS s1,
             sum(d * d) OVER (PARTITION BY prio ORDER BY month
                              ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
               AS s2,
             count(*) OVER (PARTITION BY prio ORDER BY month
                            ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING) AS n
      FROM m
    ), ev AS (
      SELECT prio,
             CASE WHEN (12 * d - s1) * (12 * d - s1)
                       <= 4 * (12 * s2 - s1 * s1)
                  THEN 1 ELSE 0 END AS covered
      FROM w WHERE n = 12
    )
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n_evaluated,
           CAST(sum(covered) AS BIGINT) AS n_covered,
           CAST(10000 * sum(covered) // count(*) AS BIGINT) AS coverage_bp
    FROM ev GROUP BY prio
    """,
)
def a77_forecast_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    m = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("prio", "month").agg(
        # decimal(18,0): d*d -> (37,0) stays inside Spark's 38-digit
        # cap with NO precision-loss rescale anywhere downstream.
        F.expr("cast(cast(sum(cents) div 100 as bigint) as decimal(18,0))").alias("d")
    )
    tw = (
        W.partitionBy("prio").orderBy("month").rowsBetween(-12, -1)
    )
    w = m.select(
        "prio",
        "d",
        F.sum("d").over(tw).alias("s1"),
        F.sum(F.col("d") * F.col("d")).over(tw).alias("s2"),
        F.count(F.lit(1)).over(tw).alias("n"),
    ).filter(F.col("n") == 12)
    ev = w.select(
        "prio",
        F.expr(
            "case when (12 * d - s1) * (12 * d - s1)"
            " <= 4 * (12 * s2 - s1 * s1) then 1 else 0 end"
        ).alias("covered"),
    )
    return ev.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_evaluated"),
        F.sum("covered").cast("long").alias("n_covered"),
        F.expr(
            "cast(10000 * sum(covered) div count(1) as bigint)"
        ).alias("coverage_bp"),
    )


# ---------------------------------------------------------------------------
# A78 — one-way ANOVA eta-squared: how much of daily-revenue
# variance the WEEKDAY explains — SS_between / SS_total over the
# ISO-weekday grouping, the variance-decomposition statistic behind
# every "is this seasonality real" call (a46 shows the per-day
# means; this quantifies their explanatory power). All sums are
# exact integers in kilodollars (bounds documented below); the only
# non-exact step is one integer floor division PER GROUP
# ((n * S_g^2) div n_g — 7 truncations of < 1 unit each), making the
# statistic deterministic by construction rather than
# float-summation-order-dependent.
#
# Widths (r8, widened after the sf1.0 replay caught the same class
# in a77): in int64 the n*S_g^2 term sat at 7e18 (78% of the
# ceiling) at sf1.0 and would throw around sf1.3. All cross products
# now run in DECIMAL(38,0) / HUGEINT — exact and identical; the first
# remaining ceiling is Spark's `div` returning LONG (per-group
# quotient ~9e18 ≈ sf~20 in kilodollar units; past that the unit
# divisor is the documented knob, as before) — and the two raw
# scaled-sum outputs are emitted // 1e6 (so
# the OUTPUT column also survives large sf in int64; eta2_bp is the
# statistic and is unchanged in meaning, bounded 0..10000).
#
# Scale: one day rollup, one bounded 7-group rollup, broadcast
# 1-row totals.
# ---------------------------------------------------------------------------
@register(
    "a78_anova_eta_squared",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
             CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  // 100000 AS BIGINT) AS HUGEINT) AS v
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(v) AS s,
             sum(v * v) AS ss
      FROM d
    ), grp AS (
      SELECT dow, CAST(count(*) AS HUGEINT) AS ng,
             sum(v) AS sg
      FROM d GROUP BY dow
    ), between_ss AS (
      SELECT sum((tot.n * grp.sg * grp.sg) // grp.ng) AS b
      FROM grp CROSS JOIN tot
    )
    SELECT CAST(tot.n AS BIGINT) AS n_days,
           CAST((between_ss.b - tot.s * tot.s) // 1000000 AS BIGINT)
               AS ssb_scaled,
           CAST((tot.n * tot.ss - tot.s * tot.s) // 1000000 AS BIGINT)
               AS sst_scaled,
           CAST(10000 * (between_ss.b - tot.s * tot.s)
                // (tot.n * tot.ss - tot.s * tot.s) AS BIGINT) AS eta2_bp
    FROM tot CROSS JOIN between_ss
    """,
)
def a78_anova_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("day").agg(
        # decimal(18,0): v*v -> (37,0) inside the 38-digit cap.
        F.expr(
            "cast(cast(sum(cents) div 100000 as bigint) as decimal(18,0))"
        ).alias("v")
    ).select(
        "day", "v", (F.weekday(F.col("day")) + 1).cast("long").alias("dow")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    grp = d.groupBy("dow").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("ng"),
        F.sum("v").alias("sg"),
    )
    b = (
        grp.crossJoin(F.broadcast(tot))
        .select(F.expr("(n * sg * sg) div ng").cast("decimal(38,0)").alias("t"))
        .agg(F.sum("t").alias("b"))
    )
    return (
        tot.crossJoin(F.broadcast(b))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.expr("cast((b - s * s) div 1000000 as bigint)").alias(
                "ssb_scaled"
            ),
            F.expr("cast((n * ss - s * s) div 1000000 as bigint)").alias(
                "sst_scaled"
            ),
            F.expr(
                "cast(10000 * (b - s * s) div (n * ss - s * s) as bigint)"
            ).alias("eta2_bp"),
        )
    )


# ---------------------------------------------------------------------------
# A79 — alert-rule backtest against planted truth: inject 3x revenue
# spikes on known days, then score TWO detection rules on precision/
# recall — the naive 2-sigma rule (whose mean and sigma the spikes
# themselves contaminate) vs the robust median/MAD rule (element-
# pick median, w17 discipline). The side-by-side quantifies WHY
# robust statistics exist: contamination drags sigma up and costs
# the naive rule recall. All comparisons are cross-multiplied
# integers in kilodollars; the daily series is calendar-bounded
# (~2.4k rows), so the global median picks are bounded like w31.
#
# Scale: one day rollup; two bounded global windows for the picks;
# broadcast 1-row moments.
# ---------------------------------------------------------------------------
@register(
    "a79_alert_rule_backtest",
    oracle="""
    WITH base AS (
      SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS ed,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  // 100000 AS BIGINT) AS v0
      FROM orders GROUP BY 1
    ), series AS (
      SELECT ed, CASE WHEN ed % 97 = 0 THEN v0 * 3 ELSE v0 END AS d,
             CASE WHEN ed % 97 = 0 THEN 1 ELSE 0 END AS truth
      FROM base
    ), mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS s,
             CAST(sum(d * d) AS BIGINT) AS ss
      FROM series
    ), med AS (
      SELECT CAST(max(CASE WHEN r = (n - 1) // 2 + 1 THEN d END)
                  AS BIGINT) AS m
      FROM (SELECT d, row_number() OVER (ORDER BY d, ed) AS r,
                   count(*) OVER () AS n
            FROM series)
    ), mad AS (
      SELECT CAST(max(CASE WHEN r = (n - 1) // 2 + 1 THEN dev END)
                  AS BIGINT) AS md
      FROM (SELECT abs(series.d - med.m) AS dev,
                   row_number() OVER (ORDER BY abs(series.d - med.m),
                                      series.ed) AS r,
                   count(*) OVER () AS n
            FROM series CROSS JOIN med)
    ), flags AS (
      SELECT s.truth,
             CASE WHEN (mom.n * s.d - mom.s) * (mom.n * s.d - mom.s)
                       > 4 * (mom.n * mom.ss - mom.s * mom.s)
                  THEN 1 ELSE 0 END AS f_naive,
             CASE WHEN abs(s.d - med.m) > 3 * mad.md
                  THEN 1 ELSE 0 END AS f_robust
      FROM series s CROSS JOIN mom CROSS JOIN med CROSS JOIN mad
    )
    SELECT rule,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(CASE WHEN tp + fp > 0
                THEN 10000 * tp // (tp + fp) ELSE 0 END AS BIGINT)
             AS precision_bp,
           CAST(CASE WHEN tp + fn > 0
                THEN 10000 * tp // (tp + fn) ELSE 0 END AS BIGINT)
             AS recall_bp
    FROM (
      SELECT 'naive_2sigma' AS rule,
             sum(CASE WHEN f_naive = 1 AND truth = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN f_naive = 1 AND truth = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN f_naive = 0 AND truth = 1 THEN 1 ELSE 0 END) AS fn
      FROM flags
      UNION ALL
      SELECT 'robust_mad',
             sum(CASE WHEN f_robust = 1 AND truth = 1 THEN 1 ELSE 0 END),
             sum(CASE WHEN f_robust = 1 AND truth = 0 THEN 1 ELSE 0 END),
             sum(CASE WHEN f_robust = 0 AND truth = 1 THEN 1 ELSE 0 END)
      FROM flags
    )
    """,
)
def a79_alert_rule_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("ed"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    ).groupBy("ed").agg(
        F.expr("cast(sum(cents) div 100000 as bigint)").alias("v0")
    )
    # The daily series (orders scan + rollup, O(days) rows) feeds FOUR
    # consumers (moments, median rank, MAD rank, the flag pass) —
    # materialize it once (r13, the a49/x4 discipline; without it
    # each consumer re-ran the scan+shuffle). The global median/MAD
    # rank windows downstream are bounded by this frame's row-count
    # CONTRACT — O(calendar days), fixed by the 7-year order calendar,
    # not by data volume (tools/window_audit.py DOCUMENTED_CONTRACTS);
    # if the series key ever became high-cardinality, the fix is the
    # a36 bucketed two-level rank.
    series = base.select(
        "ed",
        F.expr("case when ed % 97 = 0 then v0 * 3 else v0 end").alias("d"),
        F.expr("case when ed % 97 = 0 then 1 else 0 end").alias("truth"),
    ).transform(materialize)
    mom = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"),
    )
    ranked = series.select(
        "d",
        F.row_number().over(W.orderBy("d", "ed")).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    med = ranked.agg(
        F.max(
            F.when(F.col("r") == F.expr("(n - 1) div 2 + 1"), F.col("d"))
        ).cast("long").alias("m")
    )
    dev = series.crossJoin(F.broadcast(med)).select(
        "ed", F.expr("abs(d - m)").alias("dev")
    )
    rdev = dev.select(
        "dev",
        F.row_number().over(W.orderBy("dev", "ed")).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    mad = rdev.agg(
        F.max(
            F.when(F.col("r") == F.expr("(n - 1) div 2 + 1"), F.col("dev"))
        ).cast("long").alias("md")
    )
    flags = (
        series.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "truth",
            F.expr(
                "case when (n * d - s) * (n * d - s)"
                " > 4 * (n * ss - s * s) then 1 else 0 end"
            ).alias("f_naive"),
            F.expr(
                "case when abs(d - m) > 3 * md then 1 else 0 end"
            ).alias("f_robust"),
        )
    )

    # Both rules score in ONE aggregate pass over flags + stack()
    # (r13, the a38/x40 shape) — the old per-rule union executed the
    # flag pass twice.
    sums = flags.agg(
        *[
            F.sum(
                F.expr(f"case when {flag} = {fv} and truth = {tv} then 1 else 0 end")
            ).cast("long").alias(f"{name}_{m}")
            for flag, name in (("f_naive", "nv"), ("f_robust", "rb"))
            for m, fv, tv in (("tp", 1, 1), ("fp", 1, 0), ("fn", 0, 1))
        ]
    )
    both = sums.selectExpr(
        "stack(2, 'naive_2sigma', nv_tp, nv_fp, nv_fn,"
        " 'robust_mad', rb_tp, rb_fp, rb_fn) as (rule, tp, fp, fn)"
    )
    return both.select(
        "rule",
        "tp",
        "fp",
        "fn",
        F.expr(
            "cast(case when tp + fp > 0 then 10000 * tp div (tp + fp)"
            " else 0 end as bigint)"
        ).alias("precision_bp"),
        F.expr(
            "cast(case when tp + fn > 0 then 10000 * tp div (tp + fn)"
            " else 0 end as bigint)"
        ).alias("recall_bp"),
    )


# ---------------------------------------------------------------------------
# A80 — difference-in-differences: the 2x2 causal-inference
# workhorse — treatment (BUILDING-segment customers) vs control,
# before vs after the 1998-01-01 cutoff (mid-range of the 1995-2001 data); the DiD estimate is the
# treatment group's average-order-value change MINUS the control's
# (which nets out the common time trend a naive before/after
# comparison absorbs as "impact"). Cell averages are integer-cent
# floor divisions; the estimate composes from the four cells
# exactly.
#
# Scale: one broadcast dim join for the segment, one 4-cell rollup;
# the 2x2 pivot happens on four rows.
# ---------------------------------------------------------------------------
@register(
    "a80_diff_in_diff",
    oracle="""
    WITH cells AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treated,
             CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS after,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), p AS (
      SELECT
        max(CASE WHEN treated = 1 AND after = 0 THEN s // n END) AS tb,
        max(CASE WHEN treated = 1 AND after = 1 THEN s // n END) AS ta,
        max(CASE WHEN treated = 0 AND after = 0 THEN s // n END) AS cb,
        max(CASE WHEN treated = 0 AND after = 1 THEN s // n END) AS ca,
        max(CASE WHEN treated = 1 AND after = 0 THEN n END) AS n_tb,
        max(CASE WHEN treated = 1 AND after = 1 THEN n END) AS n_ta,
        max(CASE WHEN treated = 0 AND after = 0 THEN n END) AS n_cb,
        max(CASE WHEN treated = 0 AND after = 1 THEN n END) AS n_ca
      FROM cells
    )
    SELECT CAST(tb AS BIGINT) AS treat_before_avg_c,
           CAST(ta AS BIGINT) AS treat_after_avg_c,
           CAST(cb AS BIGINT) AS ctrl_before_avg_c,
           CAST(ca AS BIGINT) AS ctrl_after_avg_c,
           CAST((ta - tb) - (ca - cb) AS BIGINT) AS did_c,
           CAST(n_tb + n_ta + n_cb + n_ca AS BIGINT) AS n_orders
    FROM p
    """,
)
def a80_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .groupBy(
            F.expr(
                "case when c_mktsegment = 'BUILDING' then 1 else 0 end"
            ).alias("treated"),
            F.expr(
                "case when o_orderdate >= timestamp '1998-01-01'"
                " then 1 else 0 end"
            ).alias("after"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).cast("long").alias("s"),
        )
    )
    p = cells.agg(
        F.max(F.expr("case when treated = 1 and after = 0 then s div n end")).alias("tb"),
        F.max(F.expr("case when treated = 1 and after = 1 then s div n end")).alias("ta"),
        F.max(F.expr("case when treated = 0 and after = 0 then s div n end")).alias("cb"),
        F.max(F.expr("case when treated = 0 and after = 1 then s div n end")).alias("ca"),
        F.max(F.expr("case when treated = 1 and after = 0 then n end")).alias("n_tb"),
        F.max(F.expr("case when treated = 1 and after = 1 then n end")).alias("n_ta"),
        F.max(F.expr("case when treated = 0 and after = 0 then n end")).alias("n_cb"),
        F.max(F.expr("case when treated = 0 and after = 1 then n end")).alias("n_ca"),
    )
    return p.select(
        F.col("tb").cast("long").alias("treat_before_avg_c"),
        F.col("ta").cast("long").alias("treat_after_avg_c"),
        F.col("cb").cast("long").alias("ctrl_before_avg_c"),
        F.col("ca").cast("long").alias("ctrl_after_avg_c"),
        F.expr("cast((ta - tb) - (ca - cb) as bigint)").alias("did_c"),
        F.expr("cast(n_tb + n_ta + n_cb + n_ca as bigint)").alias(
            "n_orders"
        ),
    )


# ---------------------------------------------------------------------------
# A81 — price-volume-mix decomposition: each segment's 1996->1997
# revenue delta split into price effect ((avg2-avg1)*q1), volume
# effect (avg1*(q2-q1)), and the joint term — the finance bridge
# that answers "did we sell MORE or sell DEARER". Averages are
# integer-cent floor divisions, so the identity cannot hold to the
# cent by construction; instead of hiding that, the RESIDUAL (the
# truncation dust, |resid| < q1 + q2) is emitted as its own column
# and the decomposition reconciles EXACTLY: delta = price + volume
# + joint + residual, enforced by a unit test.
#
# Scale: one broadcast dim join, a 2-year x segment rollup, map-side
# arithmetic on the bounded cells.
# ---------------------------------------------------------------------------
@register(
    "a81_price_volume_mix",
    oracle="""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg,
             CAST(date_part('year', o.o_orderdate) AS BIGINT) AS yr,
             CAST(count(*) AS BIGINT) AS q,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE date_part('year', o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), p AS (
      SELECT seg,
             max(CASE WHEN yr = 1996 THEN q END) AS q1,
             max(CASE WHEN yr = 1997 THEN q END) AS q2,
             max(CASE WHEN yr = 1996 THEN s END) AS s1,
             max(CASE WHEN yr = 1997 THEN s END) AS s2
      FROM cells GROUP BY seg
    ), e AS (
      SELECT seg, q1, q2, s1, s2,
             s1 // q1 AS a1, s2 // q2 AS a2
      FROM p WHERE q1 IS NOT NULL AND q2 IS NOT NULL
    )
    SELECT seg,
           CAST(s2 - s1 AS BIGINT) AS delta_c,
           CAST((a2 - a1) * q1 AS BIGINT) AS price_effect_c,
           CAST(a1 * (q2 - q1) AS BIGINT) AS volume_effect_c,
           CAST((a2 - a1) * (q2 - q1) AS BIGINT) AS joint_effect_c,
           CAST((s2 - s1) - (a2 - a1) * q1 - a1 * (q2 - q1)
                - (a2 - a1) * (q2 - q1) AS BIGINT) AS residual_c
    FROM e
    """,
)
def a81_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.filter(F.year("o_orderdate").isin(1996, 1997))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("q"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)")
            ).cast("long").alias("s"),
        )
    )
    p = cells.groupBy("seg").agg(
        F.max(F.expr("case when yr = 1996 then q end")).alias("q1"),
        F.max(F.expr("case when yr = 1997 then q end")).alias("q2"),
        F.max(F.expr("case when yr = 1996 then s end")).alias("s1"),
        F.max(F.expr("case when yr = 1997 then s end")).alias("s2"),
    )
    # The decomposition is undefined for a segment absent in either
    # year — filter to both-present segments (matching the oracle).
    e = p.filter(
        F.col("q1").isNotNull() & F.col("q2").isNotNull()
    ).select(
        "seg", "q1", "q2", "s1", "s2",
        F.expr("s1 div q1").alias("a1"),
        F.expr("s2 div q2").alias("a2"),
    )
    return e.select(
        "seg",
        F.expr("cast(s2 - s1 as bigint)").alias("delta_c"),
        F.expr("cast((a2 - a1) * q1 as bigint)").alias("price_effect_c"),
        F.expr("cast(a1 * (q2 - q1) as bigint)").alias("volume_effect_c"),
        F.expr("cast((a2 - a1) * (q2 - q1) as bigint)").alias(
            "joint_effect_c"
        ),
        F.expr(
            "cast((s2 - s1) - (a2 - a1) * q1 - a1 * (q2 - q1)"
            " - (a2 - a1) * (q2 - q1) as bigint)"
        ).alias("residual_c"),
    )


# ---------------------------------------------------------------------------
# A82 — Wald–Wolfowitz runs test (up/down form) on the daily order
# series per priority class: are day-over-day moves random, or does
# the series trend/mean-revert? Counts maximal same-sign runs of the
# first difference (zeros dropped, the standard treatment) and emits
# the expected-run count under H0 in exact milli-units via integer
# division — no floats cross the engine boundary.
#
# Scale: one groupBy(day, priority) shrinks the fact to O(days x 5)
# rows BEFORE any window; the lag/run windows then partition by
# priority over that tiny frame — window state never sees fact-table
# cardinality.
# ---------------------------------------------------------------------------
@register(
    "a82_runs_test",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS pri, o_orderdate AS dd, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), diff AS (
      SELECT pri, dd,
             n - lag(n) OVER (PARTITION BY pri ORDER BY dd) AS df
      FROM d
    ), s AS (
      SELECT pri, dd, CASE WHEN df > 0 THEN 1 ELSE -1 END AS sg
      FROM diff WHERE df IS NOT NULL AND df <> 0
    ), r AS (
      SELECT pri, sg,
             CASE WHEN lag(sg) OVER (PARTITION BY pri ORDER BY dd)
                       IS DISTINCT FROM sg
                  THEN 1 ELSE 0 END AS brk
      FROM s
    )
    SELECT pri,
           CAST(count(*) FILTER (sg = 1) AS BIGINT) AS n_up,
           CAST(count(*) FILTER (sg = -1) AS BIGINT) AS n_down,
           CAST(sum(brk) AS BIGINT) AS n_runs,
           CAST((1000 * (count(*) + 2 * (count(*) FILTER (sg = 1))
                                     * (count(*) FILTER (sg = -1))))
                // count(*) AS BIGINT) AS exp_runs_milli
    FROM r GROUP BY pri
    """,
)
def a82_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderdate").alias("dd"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("pri").orderBy("dd")
    signs = (
        daily.select(
            "pri", "dd", (F.col("n") - F.lag("n").over(w)).alias("df")
        )
        .filter(F.col("df").isNotNull() & (F.col("df") != 0))
        .select(
            "pri", "dd",
            F.when(F.col("df") > 0, F.lit(1)).otherwise(F.lit(-1)).alias("sg"),
        )
    )
    runs = signs.select(
        "pri", "sg",
        F.when(
            ~F.lag("sg").over(w).eqNullSafe(F.col("sg")), F.lit(1)
        ).otherwise(F.lit(0)).alias("brk"),
    )
    n_up = F.sum(F.when(F.col("sg") == 1, 1).otherwise(0))
    n_dn = F.sum(F.when(F.col("sg") == -1, 1).otherwise(0))
    return runs.groupBy("pri").agg(
        n_up.cast("long").alias("n_up"),
        n_dn.cast("long").alias("n_down"),
        F.sum("brk").cast("long").alias("n_runs"),
        F.expr(
            "cast((1000 * (count(1) + 2 * sum(case when sg = 1 then 1 else 0 end)"
            " * sum(case when sg = -1 then 1 else 0 end)))"
            " div count(1) as bigint)"
        ).alias("exp_runs_milli"),
    )


# ---------------------------------------------------------------------------
# A83 — bootstrap confidence interval, the deterministic distributed
# form: 32 half-sample replicates (m-out-of-n bootstrap) assigned by
# ONE portable md5 digest per order row — replicate r keeps the row
# iff hex digit r+1 of md5(orderkey) is in 0..7 (exactly half of the
# 16 hex values, so each replicate is an independent-digit ~half
# sample) — the "resampling" is a pure map-side expression: no RNG,
# no driver loop, bit-identical on both engines. Each replicate's
# mean order value (integer cents, floor division) feeds an
# element-pick p05/p50/p95 over the 32 replicate means per segment —
# ranks 2, 16, and 31 of the (mean, replicate)-ordered list, fully
# tie-stable.
#
# One digest per ROW (not per (row, replicate)): the r7 form hashed
# the concat (orderkey, r) 32x per row, and the digest dominated the
# map cost (4.6 s isolated at sf0.1). The digest is let-bound through
# the single-element transform so projection collapse can't re-inline
# the md5 into the membership lambda (32 evaluations again); the
# explode then emits only the KEPT replicates (~16/row instead of
# 32-then-filter). Gated by test_expensive_expression_evaluates_once.
#
# Scale: the replicate explode is map-side and feeds ONE
# partial-aggregated groupBy((seg, r)) — 32x map work, shuffle rows
# O(segments x 32); the rank windows then act on that tiny frame.
# ---------------------------------------------------------------------------
@register(
    "a83_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT c.c_mktsegment AS seg, r.r AS r,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      CROSS JOIN (SELECT CAST(x AS BIGINT) AS r
                  FROM unnest(range(0, 32)) u(x)) r
      WHERE substr(md5(CAST(o.o_orderkey AS VARCHAR)),
                   CAST(r.r + 1 AS INT), 1) < '8'
    ), means AS (
      SELECT seg, r, count(*) AS n, sum(cents) // count(*) AS mean_c
      FROM reps GROUP BY 1, 2
    ), ranked AS (
      SELECT seg, r, mean_c,
             row_number() OVER (PARTITION BY seg
                                ORDER BY mean_c, r) AS rn
      FROM means
    )
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_reps,
           CAST(max(CASE WHEN rn = 2 THEN mean_c END) AS BIGINT) AS ci_lo_c,
           CAST(max(CASE WHEN rn = 16 THEN mean_c END) AS BIGINT) AS med_c,
           CAST(max(CASE WHEN rn = 31 THEN mean_c END) AS BIGINT) AS ci_hi_c
    FROM ranked GROUP BY seg
    """,
)
def a83_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    reps = orders.join(F.broadcast(cust), "o_custkey").selectExpr(
        "seg",
        "cents",
        # One md5 per row, let-bound (single-element transform) so
        # projection collapse can't substitute it into the membership
        # lambda; the explode emits only the kept replicate ids.
        "explode(flatten(transform("
        "  array(md5(cast(o_orderkey as string))),"
        "  h -> filter(sequence(0, 31),"
        "              r -> substring(h, r + 1, 1) < '8')))) AS r",
    )
    means = reps.groupBy("seg", "r").agg(
        F.expr("sum(cents) div count(1)").alias("mean_c")
    )
    w = W.partitionBy("seg").orderBy("mean_c", "r")
    ranked = means.select("seg", "r", "mean_c", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.max(F.when(F.col("rn") == 2, F.col("mean_c"))).cast("long").alias("ci_lo_c"),
        F.max(F.when(F.col("rn") == 16, F.col("mean_c"))).cast("long").alias("med_c"),
        F.max(F.when(F.col("rn") == 31, F.col("mean_c"))).cast("long").alias("ci_hi_c"),
    )
