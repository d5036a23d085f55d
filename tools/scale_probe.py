"""sf1.0 scale probe for the dedup/ANN families (VERDICT r4 #6).

[archival-probe] — r4 dedup/ANN sf1.0 adjudication; superseded by sf1_battery for per-round use.

Generates sf1.0-scale `documents` (50k rows, 10x sf0.1) and
`embeddings` (20k rows) parquet deterministically — same schemas and
row-size distributions as the driver testdata, synthesized with Spark
expressions (hash-derived, seed-free, fully distributed) — then
replays the representative dedup/ANN keys end-to-end with the noop
sink and records:

  1. wall time per key at 100x the driver's correctness scale, and
  2. the per-task bound evidence behind the O(corpus) claims:
     - x26/x5 path: max (cell, sub_i, sub_j) pandas-group size vs the
       documented 2 * _BLOCK_CAP hard cap (bounded_block_pairs);
     - x12: max IVF cell size (the per-task Gram matmul input);
     - x2: max LSH band-bucket size and total candidate pairs vs the
       all-pairs count the banding avoids.

Usage: python tools/scale_probe.py [target_dir] [key ...]
Defaults: /tmp/sfprobe1.0 and the five verdict keys. Prints one JSON
line; paste the numbers into SCALE.md.
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

N_DOCS = 50_000
N_VECS = 20_000
_WORDS = (
    "spark query table column row scan filter join group agg sort hash "
    "shuffle batch stream window key value part order customer line item "
    "fast slow small large vector token text index cache disk"
).split()
_LANGS = ["en", "zh", "de", "fr", "es"]


def generate(
    spark, out_dir: str, n_docs: int = N_DOCS, n_vecs: int = N_VECS
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    words_arr = F.array(*[F.lit(w) for w in _WORDS])
    # 8..119 words per doc, word choice hash-derived from (doc_id, i):
    # deterministic, shuffle-free, and executor-parallel at any scale.
    n_words = (F.pmod(F.xxhash64(F.col("id"), F.lit(-1)), F.lit(112)) + 8).cast("int")
    text = F.expr(
        "array_join(transform(sequence(1, n_words), "
        "i -> element_at(words, cast(pmod(xxhash64(id, i), size(words)) + 1 as int))), ' ')"
    )
    docs = (
        spark.range(n_docs)
        .repartition(32)
        .withColumn("words", words_arr)
        .withColumn("n_words", n_words)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.element_at(
                F.array(*[F.lit(lang) for lang in _LANGS]),
                F.pmod(F.xxhash64("id", F.lit(-2)), F.lit(len(_LANGS))).cast("int") + 1,
            ).alias("lang"),
            F.concat(
                F.lit("src"), F.pmod(F.xxhash64("id", F.lit(-3)), F.lit(20))
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    emb = (
        spark.range(n_vecs)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), "
                "i -> cast((pmod(xxhash64(id, i), 2001) - 1000) / 1000.0 as float))"
            ).alias("embedding"),
            F.pmod(F.xxhash64("id", F.lit(-4)), F.lit(10)).cast("int").alias("label"),
        )
    )
    emb.coalesce(2).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def bound_evidence(spark, sf_dir: str) -> dict:
    """Recompute the exact per-task group sizes the bounded operators
    hand to pandas, via the operators' own helpers."""
    from pyspark.sql import Window as W

    from voter_file_etl_spark.operators import dedup as D
    from voter_file_etl_spark.operators import similarity as S

    out: dict = {"block_cap": S._BLOCK_CAP}

    corpus = S._corpus_spark(spark, sf_dir)
    cells = S.ivf_assign_cells(corpus.select("vec_id", "qv", "nq"))
    cell_sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    out["x12_max_cell"] = cell_sizes.agg(F.max("n")).collect()[0][0]
    out["x12_n_cells"] = cell_sizes.count()

    # x26/x5 bounded pair groups over the IVF cells: replicate
    # bounded_block_pairs' keying and measure the realized group sizes.
    counts = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("_bn"))
    nsub = F.ceil(F.col("_bn") * 2 / F.lit(S._BLOCK_CAP)).cast("int")
    sized = cells.join(
        F.broadcast(counts.select("cell", nsub.alias("_nsub"))), "cell"
    )
    rn = F.row_number().over(W.partitionBy("cell").orderBy("vec_id"))
    sub = F.pmod(rn - F.lit(1), F.col("_nsub")).cast("int")
    groups = (
        sized.withColumn("_sub", sub)
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)))
        .groupBy(
            "cell",
            F.least("_sub", "_k").alias("_si"),
            F.greatest("_sub", "_k").alias("_sj"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out["x26_max_pair_group"] = groups.agg(F.max("n")).collect()[0][0]
    out["x26_n_pair_groups"] = groups.count()

    # x2 LSH banding: biggest single band bucket (one join-task key)
    # and candidate pairs vs the all-pairs the banding avoids.
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz end marker")).alias("text"),
    )
    bands = D.minhash_bands(D.shingle3(docs.unionByName(copies)))
    bucket = bands.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("n"))
    out["x2_max_band_bucket"] = bucket.agg(F.max("n")).collect()[0][0]
    n_corpus = docs.count() + copies.count()
    out["x2_corpus_rows"] = n_corpus
    out["x2_candidate_pairs"] = (
        bucket.agg(F.sum(F.expr("n * (n - 1) div 2"))).collect()[0][0]
    )
    out["x2_all_pairs_avoided"] = n_corpus * (n_corpus - 1) // 2
    return out


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1.0"
    keys = sys.argv[2:] or [
        "x2_dedup_minhash",
        "x26_semdedup",
        "x6_ann_topk",
        "x12_ann_ivf",
        "m14_phash_near_dup",
    ]
    registry.load_all()
    spark = get_spark("scale_probe")
    t0 = time.perf_counter()
    generate(spark, target)
    gen_s = round(time.perf_counter() - t0, 2)

    times: dict[str, float] = {}
    for key in keys:
        fn = registry.QUERIES[key]
        fn(spark, target).write.format("noop").mode("overwrite").save()  # warm
        # bench.py protocol: clear between warm and timed, else the
        # timed run's internal persist()s plan-match the warm run's
        # still-cached intermediates and the measurement inherits the
        # CacheManager subsidy (the r5 finding; rounds 4-5 probe
        # numbers for persist-carrying keys were subsidized this way).
        spark.catalog.clearCache()
        start = time.perf_counter()
        fn(spark, target).write.format("noop").mode("overwrite").save()
        times[key] = round(time.perf_counter() - start, 2)
        spark.catalog.clearCache()

    evidence = bound_evidence(spark, target)
    print(
        json.dumps(
            {
                "metric": "sf1_scale_probe",
                "dir": target,
                "n_docs": N_DOCS,
                "n_vecs": N_VECS,
                "gen_sec": gen_s,
                "queries": times,
                "bounds": evidence,
            }
        )
    )


if __name__ == "__main__":
    main()
