"""sf1.0 scale probe for the graph family (VERDICT r5 #6).

[archival-probe] — r5 graph-family sf1.0 adjudication; re-run only if the g-family fixpoints change.

Two synthetic lineitem tables, both 6M rows (10x the sf0.1 bench
scale, TPC-H sf1.0 shape: 1.5M orders x 4 items, 200k-part domain),
generated with Spark expressions — hash-derived, seed-free, fully
distributed:

- **uniform**: parts drawn uniformly per lineitem, the faithful TPC-H
  distribution. Its co-purchase graph (support>=2) stays ~3.6k edges
  at ANY scale factor (pair collisions scale as pairs^2/domain^2 —
  measured 3445 at sf0.01, 3573 at sf0.1), so on this table the g4/
  g6/g7 keys measure what actually dominates at 100 TB: the pair-
  derivation self-join over 6M lineitems, which is linear.
- **ring**: each order buys 4 CONSECUTIVE parts around a hash anchor,
  producing one giant structured component (~200k nodes, ~1.2M
  undirected edges, graph diameter ~67k) — the adversarial shape for
  iterative algorithms. This is what stresses the two disciplines
  connected_components documents: pointer-jumping (O(log diameter)
  rounds, not O(diameter)) and per-round lineage truncation (flat
  plan size across rounds).

Records, per VERDICT r5 #6: wall time per key at sf1.0, rounds-to-
fixpoint with per-round changed-label counts, per-round shuffled-row
volume (|labels| + |E_directed| per round — constant by construction,
reported once), and lineage-truncation confirmation (analyzed-plan
line count per round, flat == truncated).

Usage: python tools/graph_probe.py [target_base]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark

N_ROWS = 6_000_000
ITEMS_PER_ORDER = 4
N_PARTS = 200_000


def generate(spark, out_dir: str, shape: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    base = (
        spark.range(N_ROWS)
        .repartition(32)
        .withColumn("l_orderkey", (F.col("id") / ITEMS_PER_ORDER).cast("long"))
    )
    if shape == "uniform":
        part = F.pmod(F.xxhash64("id"), F.lit(N_PARTS))
    else:  # ring: 4 consecutive parts around the order's hash anchor
        anchor = F.pmod(F.xxhash64("l_orderkey"), F.lit(N_PARTS))
        part = F.pmod(anchor + F.pmod(F.col("id"), F.lit(ITEMS_PER_ORDER)), F.lit(N_PARTS))
    base.select("l_orderkey", part.cast("long").alias("l_partkey")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "lineitem.parquet"))


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe_graph"
    registry.load_all()
    from voter_file_etl_spark.operators.graph import (
        _g7_edges,
        connected_components,
    )

    spark = get_spark("graph_probe")
    out: dict = {"metric": "sf1_graph_probe", "n_rows": N_ROWS, "n_parts": N_PARTS}

    t0 = time.perf_counter()
    uniform_dir = os.path.join(target, "uniform")
    ring_dir = os.path.join(target, "ring")
    generate(spark, uniform_dir, "uniform")
    generate(spark, ring_dir, "ring")
    out["gen_sec"] = round(time.perf_counter() - t0, 2)

    # -- wall time per key on the faithful TPC-H sf1.0 distribution --
    times: dict[str, float] = {}
    for key in ["g4_connected_components", "g6_common_neighbors", "g7_k_core"]:
        fn = registry.QUERIES[key]
        fn(spark, uniform_dir).write.format("noop").mode("overwrite").save()  # warm
        # clear between warm and timed (bench.py protocol) so the
        # timed run cannot plan-match the warm run's cached persists
        spark.catalog.clearCache()
        start = time.perf_counter()
        fn(spark, uniform_dir).write.format("noop").mode("overwrite").save()
        times[key] = round(time.perf_counter() - start, 2)
        spark.catalog.clearCache()
    out["uniform_sec"] = times

    # graph shape on the uniform table, so the timings read correctly
    e_uni = _g7_edges(spark, uniform_dir).persist()
    out["uniform_edges"] = e_uni.count()
    deg = (
        e_uni.select(F.col("s").alias("n"))
        .unionAll(e_uni.select(F.col("d").alias("n")))
        .groupBy("n")
        .count()
    )
    out["uniform_max_degree"] = (deg.agg(F.max("count")).collect()[0][0]) or 0
    e_uni.unpersist()

    # -- g7 peel fixpoint on uniform: per-round surviving edge counts --
    edges = _g7_edges(spark, uniform_dir).persist()
    peel = []
    for _ in range(4):
        keep = (
            edges.select(F.col("s").alias("node"))
            .unionAll(edges.select(F.col("d").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter("deg >= 2")
            .select("node")
        )
        edges = (
            edges.join(keep, edges.s == keep.node, "left_semi")
            .join(keep, edges.d == keep.node, "left_semi")
            .localCheckpoint(eager=True)
        )
        peel.append(edges.count())
    out["g7_peel_edges_per_round"] = peel
    out["g7_fixpoint_by_round"] = next(
        (i + 1 for i in range(1, 4) if peel[i] == peel[i - 1]), None
    )

    # -- instrumented CC on the adversarial ring graph --
    t0 = time.perf_counter()
    e0 = _g7_edges(spark, ring_dir)
    sym = e0.unionByName(
        e0.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).select(F.col("s").alias("src"), F.col("d").alias("dst"))
    stats: list = []
    cc = connected_components(sym, max_iter=40, stats=stats)
    n_components = cc.select("component").distinct().count()
    out["ring_cc_sec"] = round(time.perf_counter() - t0, 2)
    out["ring_nodes"] = cc.count()
    out["ring_directed_edges"] = sym.count()
    out["ring_n_components"] = n_components
    out["ring_rounds"] = len(stats)
    out["ring_changed_per_round"] = [s["changed"] for s in stats]
    out["ring_plan_lines_per_round"] = [s["plan_lines"] for s in stats]
    # per-round shuffle volume (rows): neighbor propagation |E_dir| +
    # label union |V|, min-combine group |V|+|E_dir|, pointer-jump
    # join 2|V| — constant per round by construction.
    out["ring_rows_shuffled_per_round"] = (
        out["ring_directed_edges"] + 4 * out["ring_nodes"]
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
