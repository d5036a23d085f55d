"""sf1.0 scale probe for the multimodal family (VERDICT r6 ask #4).

[archival-probe] — r6 m-family sf1.0 adjudication; re-run only if the decode/batch plumbing changes.

The m family was the only top-cost family with no 10x scaling table
(m14's linearity was known; the conv2d / integral-image / tile keys
were not probed). This probe reuses the scale_probe sf1.0 generator
(50k docs = 10x the sf0.1 driver dir, hash-derived, seed-free), then
times each representative m key at BOTH sf0.1 and the generated
sf1.0 under the corrected protocol (warm run, clearCache, timed run,
clearCache — the r6 finding: without the clear, persist-carrying keys
inherit a CacheManager subsidy), and records the per-task bound
evidence behind the family's O(corpus) claims:

  - payload bytes/doc for the PPM media path (max/avg octet_length of
    build_ppm_media's payload — the unit of work one Arrow batch row
    carries into the decode pandas UDFs);
  - Arrow batch ceiling: maxRecordsPerBatch x max bytes/doc bounds
    the peak bytes a single mapInPandas batch holds;
  - the structural per-doc bounds of the pixel-grid keys: 100 px/doc
    exploded (m20/m21), row/col window partitions of <= 10 rows, 5
    stencil taps/px — constants by construction, scale-free;
  - m14 banding: max phash band bucket and candidate pairs vs the
    all-pairs join the banding avoids.

Usage: python tools/multimodal_probe.py [target_dir] [key ...]
Prints one JSON line; paste into SCALE.md §14.
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

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_KEYS = [
    "m5_decode",
    "m9_png_decode",
    "m11_image_tiles",
    "m12_audio_energy",
    "m14_phash_near_dup",
    "m15_image_channel_stats",
    "m20_integral_image",
    "m21_conv2d_stencil",
]


def timed(spark, key: str, sf_dir: str) -> float:
    fn = registry.QUERIES[key]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    start = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = round(time.perf_counter() - start, 2)
    spark.catalog.clearCache()
    return out


def bound_evidence(spark, sf_dir: str) -> dict:
    from voter_file_etl_spark.operators import multimodal as M

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    media = M.build_ppm_media(docs.select("doc_id", "text"))
    stats = media.select(
        F.max(F.expr("octet_length(media)")).alias("max_b"),
        F.avg(F.expr("octet_length(media)")).alias("avg_b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    batch = int(
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    out = {
        "n_docs": stats["n"],
        "payload_max_bytes": stats["max_b"],
        "payload_avg_bytes": round(stats["avg_b"], 1),
        "arrow_max_records_per_batch": batch,
        "arrow_batch_peak_bytes_bound": batch * stats["max_b"],
        "m20_m21_px_per_doc": 100,
        "m20_window_partition_rows": 10,
        "m21_stencil_taps_per_px": 5,
    }

    # m14 banding bounds on the SAME corpus the key builds (planted
    # near-dups included).
    corpus = docs.select("doc_id", "text")
    raster = F.rpad(F.substring(M._ascii_text(), 1, M._IMG_N), M._IMG_N, " ")
    perturbed = F.concat(
        F.substring(raster, 1, M._IMG_N - 3),
        F.lit("~"),
        F.substring(raster, M._IMG_N - 1, 2),
    )
    full = corpus.select("doc_id", raster.alias("text")).unionByName(
        corpus.filter(F.col("doc_id") % 25 == 0).select(
            (-F.col("doc_id") - 1).alias("doc_id"), perturbed.alias("text")
        )
    )
    hashed = M.image_phash(M.build_ppm_media(full))
    groups = hashed.groupBy("phash").agg(F.count(F.lit(1)).alias("n_docs"))
    n_hashes = groups.count()
    n_bits = M._M14_BANDS * M._M14_BAND_BITS
    n_deltas = sum(
        __import__("math").comb(n_bits, k) for k in range(1, M._M14_HAM_MAX + 1)
    )
    out["m14_distinct_phashes"] = n_hashes
    out["m14_n_delta_masks"] = n_deltas
    # the delta-join's generated candidate volume: each hash emits the
    # masks whose XOR lands above it — exactly (n_hashes * n_deltas)/2
    # rows on average, LINEAR in distinct hashes and skew-immune.
    out["m14_generated_candidates"] = n_hashes * n_deltas // 2
    out["m14_surviving_pairs"] = registry.QUERIES["m14_phash_near_dup"](
        spark, sf_dir
    ).count()
    out["m14_all_pairs_avoided"] = n_hashes * (n_hashes - 1) // 2
    # banding saturation this replaced (kept for the SCALE.md story):
    mask = (1 << M._M14_BAND_BITS) - 1
    bands = groups.select(
        "phash",
        F.explode(F.expr(f"sequence(0, {M._M14_BANDS - 1})")).alias("i"),
    ).select(
        F.expr(f"(phash >> ({M._M14_BAND_BITS} * i)) & {mask}").alias("bv"),
        "i",
    )
    bucket = bands.groupBy("i", "bv").agg(F.count(F.lit(1)).alias("n"))
    out["m14_banding_max_bucket"] = bucket.agg(F.max("n")).collect()[0][0]
    out["m14_banding_candidate_pairs"] = bucket.agg(
        F.sum(F.expr("n * (n - 1) div 2"))
    ).collect()[0][0]
    return out


# Keys that get a THIRD scale point at 20x (100k docs): m20/m21's
# 2.9x-at-10x was the largest multimodal ratio, explained as fixed-
# cost amortization — one more point separates "sub-linear because
# overhead amortizes" from "linear with a big constant" (VERDICT r7
# ask #8). If the fixed-cost story holds, t(20x) - t(10x) ~= the
# marginal per-doc cost x 50k docs, i.e. the 10x->20x ratio should
# sit well under 2.0.
EXTRA_SCALE_KEYS = ("m20_integral_image", "m21_conv2d_stencil")


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1.0"
    keys = sys.argv[2:] or DEFAULT_KEYS
    registry.load_all()
    spark = get_spark("multimodal_probe")
    t0 = time.perf_counter()
    generate(spark, target)
    target20 = target.rstrip("/") + "_20x"
    generate(spark, target20, n_docs=100_000, n_vecs=20_000)
    gen_s = round(time.perf_counter() - t0, 2)

    times: dict[str, dict[str, float]] = {}
    for key in keys:
        times[key] = {
            "sf0.1": timed(spark, key, SF01),
            "sf1.0": timed(spark, key, target),
        }
        times[key]["ratio_10x"] = (
            round(times[key]["sf1.0"] / times[key]["sf0.1"], 2)
            if times[key]["sf0.1"]
            else None
        )
        if key in EXTRA_SCALE_KEYS:
            times[key]["sf2.0"] = timed(spark, key, target20)
            times[key]["ratio_10x_to_20x"] = (
                round(times[key]["sf2.0"] / times[key]["sf1.0"], 2)
                if times[key]["sf1.0"]
                else None
            )

    evidence = bound_evidence(spark, target)
    print(
        json.dumps(
            {
                "metric": "multimodal_sf1_probe",
                "dir": target,
                "gen_sec": gen_s,
                "queries": times,
                "bounds": evidence,
            }
        )
    )


if __name__ == "__main__":
    main()
