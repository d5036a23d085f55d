"""Duplicate-skew probe for the dedup family (r8).

[archival-probe] — r8 duplicate-skew adjudication; re-run only if the dedup pair-emission posture changes.

SCALE.md's duplicate-skew posture note claims three measurable
things about a corpus where a large share of documents is
byte-identical (the crawl-data regime that killed m14's banding):

  1. EXACT dedup (x1) is flat-to-cheaper under duplication: the
     groupBy is a map-side partial agg, so k identical docs arrive at
     the reduce side as O(partitions) combined rows, never O(k).
  2. The pair-emitting MinHash key (x2) does quadratic work under
     duplication ONLY because its required OUTPUT is quadratic:
     generated candidate pairs stay within a small factor of the
     true >=threshold pairs (banding adds false-positive margin, not
     an asymptotic blowup beyond the contract).
  3. The cluster form (x17) — the actual 100 TB path for
     duplicate-heavy data — reduces the same corpus to O(docs)
     cluster rows.

This probe builds two 50k-doc corpora with the scale_probe generator
schema: NORMAL (all texts hash-unique, the standard generator) and
DUP10 (10% of doc_ids share ONE text — a 5k-doc clique), then measures wall time for
x1/x17 on both (d1 reads lineitem, which the generator does not build) and the candidate-vs-output ratio for the x2
banding on both. Timing protocol: warm run, clearCache, timed run
(min of 2), clearCache; run with NOTHING else on the machine.

Usage: python tools/dup_skew_probe.py [base_dir]
Prints one JSON line; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_probe import generate
from voter_file_etl_spark import registry
from voter_file_etl_spark.session import get_spark

PROBE_KEYS = ["x1_dedup_exact", "x17_dedup_clusters"]
DUP_SHARE_PCT = 10


def make_dup10(spark, src_dir: str, out_dir: str) -> None:
    """Copy the generated corpus, overwriting 10% of texts with ONE
    shared string (doc_id % 10 == 0). Embeddings copied unchanged."""
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    shared = (
        "the same exact document body repeated across the crawl "
        "snapshot boilerplate mirror copy"
    )
    dup = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, F.lit(shared)).otherwise(
            F.col("text")
        ),
    ).withColumn("n_chars", F.length("text"))
    dup.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    spark.read.parquet(os.path.join(src_dir, "embeddings.parquet")).coalesce(
        4
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def timed(spark, key: str, sf_dir: str) -> float:
    fn = registry.QUERIES[key]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    spark.catalog.clearCache()
    return round(best, 2)


def banding_volume(spark, sf_dir: str) -> dict:
    """x2's generated candidate pairs vs its required output pairs on
    the corpus THE KEY ITSELF builds (incl. its planted near-dups)."""
    from voter_file_etl_spark.operators import dedup as D
    from voter_file_etl_spark.tables import t

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz end marker")).alias("text"),
    )
    corpus = docs.unionByName(copies)
    bands = D.minhash_bands(D.shingle3(corpus)).persist()
    bucket = bands.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n"))
    row = bucket.select(
        F.max("n").alias("max_bucket"),
        F.sum(F.expr("n * (n - 1) div 2")).alias("cand_pairs"),
    ).collect()[0]
    bands.unpersist()
    out_pairs = registry.QUERIES["x2_dedup_minhash"](spark, sf_dir).count()
    n_docs = corpus.count()
    return {
        "max_band_bucket": int(row["max_bucket"]),
        "generated_candidate_pairs": int(row["cand_pairs"]),
        "required_output_pairs": int(out_pairs),
        "candidates_per_output_pair": round(row["cand_pairs"] / max(out_pairs, 1), 2),
        "all_pairs": n_docs * (n_docs - 1) // 2,
    }


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dupskew"
    registry.load_all()
    spark = get_spark("dup_skew_probe")
    normal = os.path.join(base, "normal")
    dup10 = os.path.join(base, "dup10")
    generate(spark, normal)
    make_dup10(spark, normal, dup10)

    times: dict[str, dict] = {}
    for key in PROBE_KEYS:
        times[key] = {
            "normal": timed(spark, key, normal),
            "dup10": timed(spark, key, dup10),
        }
        times[key]["ratio"] = (
            round(times[key]["dup10"] / times[key]["normal"], 2)
            if times[key]["normal"]
            else None
        )

    banding = {
        "normal": banding_volume(spark, normal),
        "dup10": banding_volume(spark, dup10),
    }
    print(
        json.dumps(
            {
                "metric": "dup_skew_probe",
                "dup_share_pct": DUP_SHARE_PCT,
                "n_docs": 50_000,
                "queries": times,
                "x2_banding": banding,
            }
        )
    )


if __name__ == "__main__":
    main()
