"""Planted-skew stress harness for the salted-join strategy (j8).

[archival-probe] — salted-join stress adjudication; re-run only if j8/j18 salting strategy changes.

The TPC-H-ish testdata joins on near-uniform keys, so j8's salt never
actually fights real skew (VERDICT r3 #6). This harness PLANTS the
pathology: a fact table derived from sf0.1 lineitem in which one key
("the CA of the voter file") absorbs every 100th order's lineitems,
amplified x1000 — the hot key ends up holding ~6.0M of ~6.6M fact
rows, six orders of magnitude above the median key's 4. At 100 TB
the same shape is a few hundred GB landing on ONE reducer: the
straggler that defines job wall-clock.

Four strategies over the identical join + aggregate:

  plain    — sort-merge join on the raw key, AQE off. The hot key is
             one shuffle partition; one task does the hot half alone.
  blanket  — j8's textbook remedy applied indiscriminately: EVERY
             fact row gets a salt, the WHOLE dim explodes xSALT,
             join on (key, salt). Included to show its cost honestly:
             the xSALT dim inflation is paid on every key, hot or
             not, so at mild skew it LOSES to plain.
  targeted — salt ONLY the profiled-hot keys (a27_key_skew_profile
             is exactly that profiler): hot fact rows get salt
             0..SALT-1, cold rows salt 0; the dim explodes xSALT for
             hot keys only (array(0) otherwise). Dim inflation is
             O(hot_keys x SALT) ~ free; the hot partition still
             splits SALT ways. This is the 100 TB recipe.
  aqe      — plain plan, Spark's own adaptive skew-join splitting ON
             (spark.sql.adaptive.skewJoin, thresholds tuned down to
             see sf0.1 partitions). The runtime remedy the engine
             defaults to (session.py); recorded so manual salting is
             justified against it, not just against the strawman.

Broadcast is disabled throughout: orders at sf0.1 would fit under the
64 MB broadcast threshold and dissolve the shuffle entirely — the
right first move for a small dim, but this harness models the
fact-fact case where neither side broadcasts.

Usage: python tools/skew_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from voter_file_etl_spark.session import get_spark  # noqa: E402
from voter_file_etl_spark.tables import t  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
HOT_KEY = 42
SALT = 32
# Each hot row repeated x1000: the hot key ends up with ~6M of ~6.6M
# rows. Locally a single 32-thread JVM chews through small partitions
# so fast that only a genuinely dominant key surfaces the straggler
# a 1000-executor cluster would see from a few hundred GB on one
# reducer; this is that key, scaled to the laptop.
AMPLIFY = 1000


def build_fact(spark, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    hot = F.col("l_orderkey") % 100 == 0
    return li.select(
        F.when(hot, F.lit(HOT_KEY)).otherwise(F.col("l_orderkey")).alias("key"),
        "l_linenumber",
        "l_extendedprice",
        F.explode(
            F.sequence(F.lit(1), F.when(hot, F.lit(AMPLIFY)).otherwise(F.lit(1)))
        ).alias("rep"),
    )


def run(spark, fact, dim, mode: str) -> float:
    every = F.array(*[F.lit(s) for s in range(SALT)])
    if mode == "blanket":
        f = fact.withColumn(
            "salt", ((F.col("l_linenumber") + F.col("rep")) % SALT).cast("int")
        )
        d = dim.withColumn("salt", F.explode(every))
        joined = f.join(d, (f.key == d.o_orderkey) & (f.salt == d.salt))
    elif mode == "targeted":
        # Hot-key set known from a27_key_skew_profile-style profiling;
        # here it's the planted singleton. Cold keys keep salt 0 on
        # both sides — the dim explodes ONLY for hot keys.
        is_hot_f = F.col("key") == HOT_KEY
        f = fact.withColumn(
            "salt",
            F.when(
                is_hot_f,
                ((F.col("l_linenumber") + F.col("rep")) % SALT).cast("int"),
            ).otherwise(F.lit(0)),
        )
        d = dim.withColumn(
            "salt",
            F.explode(
                F.when(F.col("o_orderkey") == HOT_KEY, every).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
        joined = f.join(d, (f.key == d.o_orderkey) & (f.salt == d.salt))
    else:
        joined = fact.join(dim, fact.key == dim.o_orderkey)
    out = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).alias("s"),
    )
    out.write.format("noop").mode("overwrite").save()  # warm-up
    start = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def main() -> None:
    spark = get_spark("skew_bench")
    # Force the shuffle join the experiment is about.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = build_fact(spark, SF_DIR)
    dim = t(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")

    # Materialize the skewed fact once so fixture construction
    # (sequence/explode) is excluded from every measured join.
    fact = fact.localCheckpoint()
    n_rows = fact.count()
    n_hot = fact.filter(F.col("key") == HOT_KEY).count()

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_sec"] = run(spark, fact, dim, "plain")
    results["blanket_salt_sec"] = run(spark, fact, dim, "blanket")
    results["targeted_salt_sec"] = run(spark, fact, dim, "targeted")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Make AQE's splitter actually see the local-scale hot partition
    # (defaults target 256 MB partitions — far above sf0.1 sizes).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    results["aqe_skewjoin_sec"] = run(spark, fact, dim, "plain")
    # Restore engine defaults (get_spark pins these for the session).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(
        json.dumps(
            {
                "metric": "planted_skew_join",
                "sf_dir": SF_DIR,
                "fact_rows": n_rows,
                "hot_key_rows": n_hot,
                "hot_share": round(n_hot / n_rows, 3),
                "salt": SALT,
                **results,
                "targeted_speedup_vs_plain": round(
                    results["plain_sec"] / results["targeted_salt_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
