"""Measure single query keys as fully independent cold jobs.

[standing-gate] — on-demand standing tool (BENCH.md per-key adjudication).

Each key runs in its OWN subprocess with a fresh SparkSession and the
exact bench.py protocol (JVM warm-up action, one unmeasured warm-up
execution of the plan, clearCache, timed noop-sink execution), so the
number is free of every cross-query artifact a shared session can
introduce: CacheManager plan-matching subsidy, dead-persist eviction
churn, accumulated broadcast/JIT state. This is the measurement VERDICT
r5 #3 asks for — "a per-key isolated cold-cache number" — and the
closest local analogue of submitting the query as its own cluster job.

Usage:  python tools/isolated_bench.py KEY [KEY...] [--trials N]
Prints one line per key:  <key> trials=[a, b, c] median=M
and a final JSON line {key: median_sec}.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark

registry.load_all()
spark = get_spark("isolated-bench")
spark.range(1000).count()  # session/JVM warm-up, as bench.py does
fn = registry.QUERIES[{key!r}]
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
start = time.perf_counter()
fn(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print("ISOLATED_SEC=%.3f" % (time.perf_counter() - start))
"""


def measure(key: str, sf_dir: str, repo: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, key=key, sf_dir=sf_dir)],
        capture_output=True, text=True, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ISOLATED_SEC="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"{key}: no measurement in output\n{out.stderr[-2000:]}")


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    trials = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--trials"):
            if "=" in a:
                trials = int(a.split("=", 1)[1])
            else:
                trials = int(argv[i + 1])
                i += 1  # consume the value token (it is not a key)
        else:
            args.append(a)
        i += 1
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    medians: dict[str, float] = {}
    for key in args:
        runs = [measure(key, sf_dir, repo) for _ in range(trials)]
        medians[key] = round(statistics.median(runs), 3)
        print(f"{key} trials={runs} median={medians[key]}")
    print(json.dumps(medians))


if __name__ == "__main__":
    main()
