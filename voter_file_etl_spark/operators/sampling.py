"""Deterministic sampling / splitting operators (north-star suite).

A training-data pipeline needs reproducible sampling: the same row
must land in the same split on every run, every engine, and every
cluster size. Random-number sampling (df.sample) cannot promise that
across engines, so these operators use HASH-based assignment —
md5(key) mod N — which is a pure function of the row key:

- x13_hash_sample      — take a deterministic ~k% sample.
- x14_stratified_sample — per-stratum hash sample (equal rate per
  group regardless of group size — the fix for skewed strata).
- x15_train_test_split — stable train/validation/test assignment.

Scale: all three are stateless map-side filters/projections — no
shuffle, no driver involvement, trivially parallel at any data size.
The md5-hex-prefix -> int trick keeps the bucket math in 32 bits on
both engines (conv/ from_hex of 8 hex chars), avoiding 128-bit
integers DuckDB and Spark disagree about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t


def _bucket(key: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars as
    a 32-bit int, mod buckets. Engine-portable and key-stable."""
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % buckets).alias(
        "bucket"
    )


def _bucket_sql(key: str, buckets: int = 100) -> str:
    # DuckDB: hex -> int via a 4-byte big-endian reinterpretation of
    # the first 8 hex chars.
    nib = (
        "CAST(CASE WHEN ascii(substr(md5({k}), {i}, 1)) >= 97 "
        "THEN ascii(substr(md5({k}), {i}, 1)) - 87 "
        "ELSE ascii(substr(md5({k}), {i}, 1)) - 48 END AS BIGINT)"
    )
    terms = " + ".join(
        f"{nib.format(k=key, i=i + 1)} * CAST({1 << (4 * (7 - i))} AS BIGINT)"
        for i in range(8)
    )
    return f"(CAST(({terms}) AS BIGINT) % {buckets})"


# ---------------------------------------------------------------------------
# X13 — deterministic ~10% sample of documents by content-stable key.
# ---------------------------------------------------------------------------
@register(
    "x13_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)")} < 10
    """,
)
def x13_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.filter(
        _bucket(F.col("doc_id").cast("string")) < 10
    ).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# X14 — stratified sample: the same 20% rate within every lang
# stratum, so skewed strata can't swamp the sample. Pure map filter —
# no per-group shuffle, unlike sampleBy's fraction dict, and exactly
# reproducible. A NULL lang coalesces to a sentinel on BOTH sides so
# the NULL stratum is sampled at the same rate instead of diverging
# (concat_ws skips NULLs; SQL || propagates them — neither is what we
# want for a stratum key).
# ---------------------------------------------------------------------------
@register(
    "x14_stratified_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_sampled,
           count(DISTINCT doc_id) AS n_distinct
    FROM documents
    WHERE {_bucket_sql(
        "coalesce(lang, '<null>') || ':' || CAST(doc_id AS VARCHAR)"
    )} < 20
    GROUP BY lang
    """,
)
def x14_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    key = F.concat(
        F.coalesce("lang", F.lit("<null>")),
        F.lit(":"),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.filter(_bucket(key) < 20)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.countDistinct("doc_id").alias("n_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# X15 — stable train/val/test split (80/10/10): every doc gets the
# same split on every run and in both engines; downstream stages can
# re-derive membership from the key alone.
# ---------------------------------------------------------------------------
@register(
    "x15_train_test_split",
    oracle=f"""
    SELECT split, count(*) AS n_docs
    FROM (
      SELECT CASE WHEN {_bucket_sql("'split:' || CAST(doc_id AS VARCHAR)")} < 80
                  THEN 'train'
                  WHEN {_bucket_sql("'split:' || CAST(doc_id AS VARCHAR)")} < 90
                  THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def x15_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    b = _bucket(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return docs.select(split).groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# X21 — context-window packing: assign documents to fixed-budget
# training sequences ("bins") by running token count within each
# source shard — the sequence-packing step between dedup and
# tokenizer. Streaming-greedy semantics: docs are packed in shard
# order and a bin closes when the budget would overflow; expressed as
# floor(cumulative_tokens_before / budget), one window sum per shard
# — no iterative bin-packing, no driver loop, shuffle keyed on the
# shard. (Boundary docs may straddle bins — the deterministic
# streaming tradeoff every packer at scale makes.)
# ---------------------------------------------------------------------------
_PACK_BUDGET = 2048


@register(
    "x21_context_packing",
    oracle=f"""
    WITH counted AS (
      SELECT source, doc_id,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM counted
    )
    SELECT source, doc_id, n_tokens,
           CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS bin
    FROM packed
    """,
)
def x21_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    ).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    counted = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    return counted.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _PACK_BUDGET
        ).cast("bigint").alias("bin"),
    )


# ---------------------------------------------------------------------------
# X23 — the end-to-end curation pipeline as ONE declarative plan:
# language filter -> quality gate (x9's heuristics) -> exact dedup
# (keep min doc_id per content hash) -> deterministic train/val/test
# assignment -> per-split stats. This is the composition the
# individual operators exist for; expressing it as a single DataFrame
# chain lets Catalyst pipeline the filters into the scan and run ONE
# shuffle for the dedup and ONE for the final rollup. At 100 TB the
# same plan is: scan (pruned+filtered) -> hash-agg -> hash-agg.
# ---------------------------------------------------------------------------
@register(
    "x23_curation_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, text,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents
      WHERE lang = 'en'
    ), gated AS (
      SELECT doc_id, text, n_words,
             CAST(length(text) - (n_words - 1) AS DOUBLE) / n_words AS awl
      FROM quality
      WHERE n_words >= 10 AND n_words <= 1000
    ), ok AS (
      SELECT doc_id, text, n_words FROM gated WHERE awl >= 2.0 AND awl <= 12.0
    ), deduped AS (
      SELECT min(doc_id) AS doc_id, min(n_words) AS n_words
      FROM ok GROUP BY md5(text)
    )
    SELECT CASE WHEN {_bucket_sql("'split:' || CAST(doc_id AS VARCHAR)")} < 80
                THEN 'train'
                WHEN {_bucket_sql("'split:' || CAST(doc_id AS VARCHAR)")} < 90
                THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM deduped
    GROUP BY split
    """,
)
def x23_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("long")
    quality = docs.filter(F.col("lang") == "en").select(
        "doc_id", "text", n_words.alias("n_words")
    )
    awl = (F.length("text") - (F.col("n_words") - 1)).cast("double") / F.col("n_words")
    ok = quality.filter(
        (F.col("n_words") >= 10) & (F.col("n_words") <= 1000)
    ).filter((awl >= 2.0) & (awl <= 12.0))
    deduped = ok.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"), F.min("n_words").alias("n_words")
    )
    b = _bucket(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return (
        deduped.select(split.alias("split"), "n_words")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
    )


# ---------------------------------------------------------------------------
# X25 — domain-mix resampling: hit a target per-domain sampling rate
# (the "20% web, 5% forums, 80% books" mixture step every pretraining
# corpus goes through). Rates are a pure function of the domain key —
# here a deterministic rate table over the source's numeric suffix —
# and assignment is the same md5-bucket filter as x13/x14, so the
# sample is reproducible on any engine at any parallelism.
#
# Scale: rate lookup + bucket filter are map-side expressions; the
# single shuffle is the per-domain audit aggregate. At 100 TB the
# rate table would be a broadcast dim instead of a CASE expression —
# same plan shape.
# ---------------------------------------------------------------------------
_MIX_RATES = {0: 80, 1: 50, 2: 25, 3: 10}  # src_num % 4 -> keep %


@register(
    "x25_domain_mix",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             CASE CAST(substr(source, 4) AS INTEGER) % 4
                  WHEN 0 THEN {_MIX_RATES[0]} WHEN 1 THEN {_MIX_RATES[1]}
                  WHEN 2 THEN {_MIX_RATES[2]} ELSE {_MIX_RATES[3]} END AS target_rate
      FROM documents
    )
    SELECT source, max(target_rate) AS target_rate,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {_bucket_sql("'mix:' || source || ':' || CAST(doc_id AS VARCHAR)")}
                         < target_rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM rated
    GROUP BY source
    """,
)
def x25_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # 2-arg substring (suffix to end of string), identical to the
    # oracle's substr(source, 4): no silent truncation past 10 chars,
    # and ANSI cast hard-errors on junk exactly like DuckDB's CAST.
    src_num = F.expr("substring(source, 4)").cast("int")
    rate = (
        F.when(src_num % 4 == 0, F.lit(_MIX_RATES[0]))
        .when(src_num % 4 == 1, F.lit(_MIX_RATES[1]))
        .when(src_num % 4 == 2, F.lit(_MIX_RATES[2]))
        .otherwise(F.lit(_MIX_RATES[3]))
    )
    key = F.concat(F.lit("mix:"), "source", F.lit(":"), F.col("doc_id").cast("string"))
    sampled = _bucket(key) < rate
    return docs.groupBy("source").agg(
        F.max(rate).alias("target_rate"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# X32 — temperature-based domain rebalancing (the multilingual /
# multi-domain mixing rule: sample domain i with probability
# proportional to p_i^(1/τ), here τ=2, normalized so the SMALLEST
# domain keeps rate 1.0 — large domains are downsampled ∝ 1/sqrt(n),
# flattening the mixture toward uniform). Unlike x25 (static
# per-domain rates), the rates here are DERIVED FROM the corpus
# itself: count per domain, global min, sqrt ratio. Sources fold into
# 4 deliberately skewed domains (12/4/3/1 sources) so the rates are
# non-trivial — the web/books/code/wiki imbalance every real mixture
# has.
#
# Determinism: sqrt and double division are correctly-rounded IEEE
# ops, so both engines compute bit-identical rates; membership is the
# md5-bucket pure function of the row key. Scale: the rate table is
# one tiny agg (n_domains rows) broadcast back; membership is then a
# stateless map-side filter — the same two-job shape at any corpus
# size.
# ---------------------------------------------------------------------------
_DOMAIN_SQL = (
    "CASE WHEN CAST(substr(source, 4) AS INTEGER) < 12 THEN 'web' "
    "WHEN CAST(substr(source, 4) AS INTEGER) < 16 THEN 'books' "
    "WHEN CAST(substr(source, 4) AS INTEGER) < 19 THEN 'code' "
    "ELSE 'wiki' END"
)
_DOMAIN_SPARK = (
    "CASE WHEN CAST(substring(source, 4) AS INT) < 12 THEN 'web' "
    "WHEN CAST(substring(source, 4) AS INT) < 16 THEN 'books' "
    "WHEN CAST(substring(source, 4) AS INT) < 19 THEN 'code' "
    "ELSE 'wiki' END"
)


@register(
    "x32_temperature_mix",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_DOMAIN_SQL} AS domain FROM documents
    ), c AS (
      SELECT domain, count(*) AS n_docs FROM d GROUP BY domain
    ), m AS (
      SELECT min(n_docs) AS minn FROM c
    ), r AS (
      SELECT domain, n_docs,
             {half_up_sql("sqrt(CAST(minn AS DOUBLE) / CAST(n_docs AS DOUBLE))", 6)}
               AS rate
      FROM c, m
    )
    SELECT d.domain, max(r.n_docs) AS n_docs, max(r.rate) AS rate,
           CAST(sum(CASE WHEN {_bucket_sql("'tmx:' || d.domain || ':' || CAST(d.doc_id AS VARCHAR)")}
                         < CAST(floor(r.rate * 100) AS BIGINT)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM d JOIN r ON d.domain = r.domain
    GROUP BY d.domain
    """,
)
def x32_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DOMAIN_SPARK).alias("domain")
    )
    counts = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    minn = counts.agg(F.min("n_docs").alias("minn"))
    rates = counts.crossJoin(F.broadcast(minn)).select(
        "domain",
        "n_docs",
        # half_up, not F.round: rate is emitted AND feeds the
        # floor(rate*100) sampling threshold (x34's tie class).
        half_up(
            F.sqrt(F.col("minn").cast("double") / F.col("n_docs").cast("double")), 6
        ).alias("rate"),
    )
    key = F.concat(F.lit("tmx:"), "domain", F.lit(":"), F.col("doc_id").cast("string"))
    joined = docs.join(F.broadcast(rates), "domain")
    sampled = _bucket(key) < F.floor(F.col("rate") * 100).cast("bigint")
    return joined.groupBy("domain").agg(
        F.max("n_docs").alias("n_docs"),
        F.max("rate").alias("rate"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )


# ---------------------------------------------------------------------------
# X51 — nucleus (top-p) data selection: per source, take the
# highest-quality documents until their cumulative token mass
# reaches 80% of the source's total — the data-selection analog of
# nucleus sampling, and the budgeted-curation shape ("best docs
# first, stop at the token budget") a 100 TB pipeline runs per
# domain. Quality rank = (longest docs first, doc_id tiebreak);
# token mass = whitespace token count (integer-exact). One window
# pass per source (rank + running sum share one exchange) and a
# bounded per-source aggregate; no floats cross engines (the 80%
# cut compares 100 * running <= 80 * total in integers).
# ---------------------------------------------------------------------------
@register(
    "x51_nucleus_selection",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source
               ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
             sum(n_tokens) OVER (PARTITION BY source) AS total
      FROM d
    )
    SELECT source,
           count(*) AS n_selected,
           CAST(max(run) AS BIGINT) AS tokens_selected,
           CAST(max(total) AS BIGINT) AS tokens_total
    FROM ranked
    WHERE 100 * run <= 80 * total
    GROUP BY source
    """,
)
def x51_nucleus_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.expr("filter(split(text, ' '), w -> w != '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    w = W.partitionBy("source")
    run = (
        w.orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = d.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(run).alias("run"),
        F.sum("n_tokens").over(w).alias("total"),
    )
    return (
        ranked.filter(100 * F.col("run") <= 80 * F.col("total"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.max("run").cast("long").alias("tokens_selected"),
            F.max("total").cast("long").alias("tokens_total"),
        )
    )


# ---------------------------------------------------------------------------
# X54 — deterministic reservoir sample: EXACTLY k documents, uniform
# over the corpus, stable across runs/engines/parallelism. Classic
# reservoir sampling is sequential; the distributed equivalent is
# rank-by-random-key and take the k smallest — here the "random" key
# is md5(doc_id), so the reservoir is content-addressed instead of
# RNG-seeded (re-running over a grown corpus keeps every surviving
# doc's key, the property incremental curation needs). x13's hash
# sample fixes the RATE; this fixes the COUNT.
#
# Scale: plans as TakeOrderedAndProject — each partition keeps its
# local k smallest keys, the driver merges O(partitions * k) rows;
# no global sort, no full shuffle (gated in test_plan_quality).
# ---------------------------------------------------------------------------
_X54_K = 100


@register(
    "x54_reservoir_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS rk
    FROM documents
    ORDER BY rk, doc_id
    LIMIT {_X54_K}
    """,
)
def x54_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("rk"),
        )
        .orderBy("rk", "doc_id")
        .limit(_X54_K)
    )


# ---------------------------------------------------------------------------
# X57 — token-budget waterfill: given per-source token supplies and a
# corpus-wide budget (here 50% of total tokens), allocate each source
# min(its supply, a common cap c) where c is the waterfilling level
# solving sum(min(s_i, c)) = budget — the standard fair-allocation
# answer to "small sources keep everything, giants get capped" when
# planning a training mixture (x25 fixes rates per domain; this
# DERIVES them from a budget).
#
# Closed-form in one window pass, all integers: sort sources by
# supply ascending; the smallest k* - 1 sources fit under an equal
# share of what's left and are fully funded; k* is the first that
# doesn't, and every source from k* on gets the integer cap
# (budget - prefix) div (remaining). No iteration, no floats; with
# O(sources) rows the windows are trivially cheap at any corpus size
# (the heavy part — per-source token counts — is the usual map-side
# partial aggregate).
# ---------------------------------------------------------------------------
@register(
    "x57_token_budget_fill",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
               AS BIGINT) AS supply
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(supply) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(supply) // 2 AS BIGINT) AS b
      FROM d
    ), r AS (
      SELECT source, supply,
             CAST(row_number() OVER (ORDER BY supply, source) AS BIGINT) AS k,
             CAST(coalesce(sum(supply) OVER (ORDER BY supply, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS prefix
      FROM d
    ), j AS (
      SELECT r.*, tot.n, tot.b FROM r CROSS JOIN tot
    ), c AS (
      SELECT min(k) AS kstar FROM j WHERE supply * (n - k + 1) > b - prefix
    ), cap AS (
      SELECT CAST((j.b - j.prefix) // (j.n - j.k + 1) AS BIGINT) AS cap
      FROM j JOIN c ON j.k = c.kstar
    )
    SELECT source, supply,
           CAST(CASE WHEN c.kstar IS NULL OR j.k < c.kstar
                     THEN supply ELSE cap.cap END AS BIGINT) AS alloc,
           CAST(10000 * (CASE WHEN c.kstar IS NULL OR j.k < c.kstar
                              THEN supply ELSE cap.cap END) // j.b AS BIGINT)
             AS share_bp
    FROM j CROSS JOIN c LEFT JOIN cap ON TRUE
    """,
)
def x57_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            F.size(F.expr("filter(split(text, ' '), w -> w != '')"))
            .cast("long")
            .alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("supply"))
    )
    tot = d.agg(
        F.sum("supply").alias("t"),
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(supply) div 2").alias("b"),
    )
    w = W.orderBy("supply", "source")
    r = d.select(
        "source",
        "supply",
        F.row_number().over(w).cast("long").alias("k"),
        F.coalesce(
            F.sum("supply").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("prefix"),
    )
    j = r.crossJoin(F.broadcast(tot))
    c = j.filter(
        F.col("supply") * (F.col("n") - F.col("k") + 1)
        > F.col("b") - F.col("prefix")
    ).agg(F.min("k").alias("kstar"))
    cap = (
        j.crossJoin(F.broadcast(c))
        .filter(F.col("k") == F.col("kstar"))
        .select(
            F.expr("(b - prefix) div (n - k + 1)").cast("long").alias("cap")
        )
    )
    funded = F.col("kstar").isNull() | (F.col("k") < F.col("kstar"))
    alloc = F.when(funded, F.col("supply")).otherwise(F.col("cap"))
    return (
        j.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(cap))
        .select(
            "source",
            "supply",
            alloc.cast("long").alias("alloc"),
            F.expr(
                "cast(10000 * (case when kstar is null or k < kstar "
                "then supply else cap end) div b as bigint)"
            ).alias("share_bp"),
        )
    )


# ---------------------------------------------------------------------------
# X59 — quantile normalization: map each document's length to its
# within-language quantile (basis points) so downstream quality
# thresholds ("drop the shortest 5%") transfer across languages with
# wildly different length distributions — the calibration step
# before any cross-lingual length filter. rank-1 over n-1 is the
# standard empirical-CDF estimator (percent_rank), computed here in
# pure integer arithmetic: ties share a rank (ORDER BY value only),
# so equal lengths get equal quantiles in both engines.
#
# Scale: one window per language partition — parallel across langs;
# within a hot language the sort is the unavoidable cost of exact
# ranks (approximate quantiles via a12's percentile_approx are the
# escape hatch when exactness isn't required).
# ---------------------------------------------------------------------------
@register(
    "x59_quantile_normalize",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CAST(CASE WHEN n - 1 = 0 THEN 0
                     ELSE (rnk - 1) * 10000 // (n - 1) END AS BIGINT)
             AS len_quantile_bp
    FROM (
      SELECT doc_id, lang, n_chars,
             CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT)
               AS rnk,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM documents
    )
    """,
)
def x59_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    wl = W.partitionBy("lang").orderBy("n_chars")
    wn = W.partitionBy("lang")
    return (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.rank().over(wl).cast("long").alias("rnk"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(
                "cast(case when n - 1 = 0 then 0 "
                "else (rnk - 1) * 10000 div (n - 1) end as bigint)"
            ).alias("len_quantile_bp"),
        )
    )


# ---------------------------------------------------------------------------
# X60 — winsorization: clip each language's document lengths at the
# exact within-language p05/p95 before computing summary stats, the
# robust alternative to dropping outliers (a35 flags them; this
# bounds their influence while keeping the rows). percentile_disc is
# used on BOTH engines (Spark WITHIN GROUP / DuckDB quantile_disc) —
# discrete percentiles return an actual observed value, so every
# number stays integer end-to-end.
#
# Scale: two passes over the corpus — a per-lang grouped percentile
# (partial-aggregated; the sketch state is per-group, not per-row)
# broadcast back onto the rows, then one map-side clip + grouped
# sum. No window over raw rows at all.
# ---------------------------------------------------------------------------
@register(
    "x60_winsorize",
    oracle="""
    WITH q AS (
      SELECT lang,
             CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS p05,
             CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95
      FROM documents GROUP BY lang
    )
    SELECT d.lang, q.p05, q.p95,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN d.n_chars < q.p05 THEN 1
                         WHEN d.n_chars > q.p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped,
           CAST(sum(least(greatest(d.n_chars, q.p05), q.p95)) AS BIGINT)
             AS sum_winsorized
    FROM documents d JOIN q ON d.lang = q.lang
    GROUP BY d.lang, q.p05, q.p95
    """,
)
def x60_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    q = (
        docs.groupBy("lang")
        .agg(
            F.expr(
                "cast(percentile_disc(0.05) within group (order by n_chars)"
                " as bigint)"
            ).alias("p05"),
            F.expr(
                "cast(percentile_disc(0.95) within group (order by n_chars)"
                " as bigint)"
            ).alias("p95"),
        )
    )
    return (
        docs.join(F.broadcast(q), "lang")
        .groupBy("lang", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("n_chars") < F.col("p05"))
                    | (F.col("n_chars") > F.col("p95")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
            F.sum(F.least(F.greatest("n_chars", "p05"), "p95"))
            .cast("long")
            .alias("sum_winsorized"),
        )
    )


# ---------------------------------------------------------------------------
# X61 — training-shard assignment + balance audit: a tokenized
# corpus ships to trainers as S hash-assigned shards, and the job
# that writes them must prove the shards are balanced (a straggler
# shard = a straggler data-loader for the whole cluster). Assignment
# is a pure multiplicative hash (Knuth constant — engine-identical
# integer arithmetic, unlike hash() whose algorithm differs between
# Spark and DuckDB) — deterministic, stateless, no shuffle beyond the
# per-shard rollup whose key domain is fixed at S. The audit emits
# per-shard doc/token tallies plus each shard's deviation from the
# ideal equal split in basis points — the number an SLO would gate.
# ---------------------------------------------------------------------------
_X61_SHARDS = 16


@register(
    "x61_shard_balance",
    oracle=f"""
    WITH d AS (
      SELECT (doc_id * 2654435761) % {_X61_SHARDS} AS shard,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_tokens
      FROM documents
    ), s AS (
      SELECT shard, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM d GROUP BY shard
    ), tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS t FROM s
    )
    SELECT s.shard, s.n_docs, s.tokens,
           CAST(abs(s.tokens * {_X61_SHARDS} - tot.t) * 10000
                // (tot.t) AS BIGINT) AS imbalance_bp
    FROM s CROSS JOIN tot
    """,
)
def x61_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        ((F.col("doc_id") * 2654435761) % _X61_SHARDS).alias("shard"),
        F.size(F.expr("filter(split(text, ' '), w -> w != '')")).alias(
            "n_tokens"
        ),
    )
    s = d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    )
    tot = s.agg(F.sum("tokens").cast("long").alias("t"))
    return s.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "tokens",
        F.expr(
            f"cast(abs(tokens * {_X61_SHARDS} - t) * 10000 div t as bigint)"
        ).alias("imbalance_bp"),
    )


# ---------------------------------------------------------------------------
# X68 — mixture upsampling (epoch replication): the OTHER half of
# domain mixing. x25/x32 downsample overrepresented domains; real
# recipes also REPLICATE small, high-value domains (wiki/books make
# several epochs per training run while web makes <1). Target here
# is the uniform mixture: every domain is replicated up to the
# LARGEST domain's size — factor f = maxn/n in exact milli-units,
# each doc materialized ceil-or-floor(f) times (integer part + one
# extra copy for the hash-gated fractional remainder, so the
# achieved count is within one doc of target per domain,
# deterministically).
#
# The Spark side MATERIALIZES replicas with explode(sequence(1,
# n_copies)) — the real pipeline output; the oracle pins the exact
# multiplicity per doc in closed form (checksum weights each doc by
# n*(n+1)/2, which only matches if the copy indices 1..n all
# exist). Scale: the factor table is an O(domains) broadcast; the
# explode is map-side with bounded fan-out (max factor = maxn/minn);
# no shuffle except the final bounded rollup.
# ---------------------------------------------------------------------------
@register(
    "x68_mixture_upsample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_DOMAIN_SQL} AS domain FROM documents
    ), c AS (
      SELECT domain, count(*) AS n_docs FROM d GROUP BY domain
    ), m AS (
      SELECT max(n_docs) AS maxn FROM c
    ), r AS (
      SELECT domain, n_docs, 1000 * maxn // n_docs AS f_milli
      FROM c, m
    ), copies AS (
      SELECT d.doc_id, d.domain, r.n_docs, r.f_milli,
             f_milli // 1000
             + CASE WHEN {_bucket_sql(
                 "'ups:' || d.domain || ':' || CAST(d.doc_id AS VARCHAR)",
                 1000)}
                    < f_milli % 1000 THEN 1 ELSE 0 END AS n_copies
      FROM d JOIN r ON d.domain = r.domain
    )
    SELECT domain,
           CAST(max(n_docs) AS BIGINT) AS n_docs,
           CAST(max(f_milli) AS BIGINT) AS f_milli,
           CAST(sum(n_copies) AS BIGINT) AS n_replicas,
           CAST(sum((doc_id % 9973) * (n_copies * (n_copies + 1) // 2))
                AS BIGINT) AS checksum
    FROM copies GROUP BY domain
    """,
)
def x68_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DOMAIN_SPARK).alias("domain")
    )
    counts = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    maxn = counts.agg(F.max("n_docs").alias("maxn"))
    factors = counts.crossJoin(F.broadcast(maxn)).select(
        "domain",
        "n_docs",
        F.expr("1000 * maxn div n_docs").alias("f_milli"),
    )
    key = F.concat(
        F.lit("ups:"), "domain", F.lit(":"), F.col("doc_id").cast("string")
    )
    with_copies = docs.join(F.broadcast(factors), "domain").select(
        "doc_id",
        "domain",
        "n_docs",
        "f_milli",
        (
            F.expr("f_milli div 1000")
            + F.when(_bucket(key, 1000) < F.col("f_milli") % 1000, 1).otherwise(0)
        ).alias("n_copies"),
    )
    replicas = with_copies.select(
        "doc_id",
        "domain",
        "n_docs",
        "f_milli",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    )
    return replicas.groupBy("domain").agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        F.max("f_milli").cast("long").alias("f_milli"),
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.sum((F.col("doc_id") % 9973) * F.col("copy_idx"))
        .cast("long")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# X69 — range-sharded curation output: assign every document to one
# of 16 GLOBALLY SORTED shards by (n_chars, doc_id) and report
# per-shard row counts and value ranges — the "write the curated
# corpus as N sorted files" finishing step (sorted-by-length shards
# give training loaders near-constant batch padding). ntile is the
# oracle-checkable assignment (total order -> deterministic in both
# engines); the per-shard report proves ranges are disjoint and
# sizes balanced within one row.
#
# Scale: ntile over an unpartitioned window is the PARITY
# formulation only — at 100 TB the same assignment is
# repartitionByRange(16, n_chars, doc_id) (sampled boundaries,
# no global sort on one machine), and the report's min/max columns
# are exactly the check that sampled boundaries produced disjoint
# ranges. The output rollup is bounded (16 rows).
# ---------------------------------------------------------------------------
@register(
    "x69_range_shards",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             ntile(16) OVER (ORDER BY n_chars, doc_id) AS shard
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM ranked GROUP BY shard
    """,
)
def x69_range_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ranked = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.ntile(16)
        .over(W.orderBy("n_chars", "doc_id"))
        .alias("shard"),
    )
    return ranked.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# X71 — importance-weighted data selection (integer DSIR shape, Xie
# et al. 2023's "select raw data that looks like the target domain"
# — here with exact integer affinity ratios instead of float
# log-likelihoods, so the score is engine-exact): score every
# non-wiki document by how much its vocabulary matches the wiki
# (target) unigram distribution. Per token w:
# affinity(w) = 10000 * n_wiki(w) div n_raw(w); doc score = mean
# affinity over its token OCCURRENCES (integer div). The report
# buckets scores per domain — the acceptance-curve view a curation
# run uses to pick its cut.
#
# Scale: two bounded vocab aggregates (global-stats-then-map), the
# affinity table joins token occurrences on the token hash (shuffle
# keyed on vocab, linear in corpus tokens), one doc rollup, one
# bounded bucket rollup. Never all-pairs; the target table is the
# only extra state.
# ---------------------------------------------------------------------------
@register(
    "x71_importance_weights",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_DOMAIN_SQL} AS domain,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ), tok AS (
      SELECT doc_id, domain, unnest(w) AS tk FROM d
    ), wiki AS (
      SELECT tk, count(*) AS n_wiki FROM tok WHERE domain = 'wiki'
      GROUP BY tk
    ), raw AS (
      SELECT tk, count(*) AS n_raw FROM tok GROUP BY tk
    ), aff AS (
      SELECT r.tk, 10000 * coalesce(w.n_wiki, 0) // r.n_raw AS a
      FROM raw r LEFT JOIN wiki w ON r.tk = w.tk
    ), scored AS (
      SELECT t.doc_id, t.domain,
             CAST(sum(a) // count(*) AS BIGINT) AS score_bp
      FROM tok t JOIN aff ON t.tk = aff.tk
      WHERE t.domain <> 'wiki'
      GROUP BY t.doc_id, t.domain
    )
    SELECT domain, CAST(score_bp // 500 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(score_bp) AS BIGINT) AS min_bp,
           CAST(max(score_bp) AS BIGINT) AS max_bp
    FROM scored GROUP BY domain, score_bp // 500
    """,
)
def x71_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_DOMAIN_SPARK).alias("domain"),
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("w"),
    )
    tok = d.select("doc_id", "domain", F.explode("w").alias("tk"))
    wiki = (
        tok.filter(F.col("domain") == "wiki")
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("n_wiki"))
    )
    raw = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n_raw"))
    aff = raw.join(wiki, "tk", "left").select(
        "tk",
        F.expr("10000 * coalesce(n_wiki, 0) div n_raw").alias("a"),
    )
    scored = (
        tok.filter(F.col("domain") != "wiki")
        .join(aff, "tk")
        .groupBy("doc_id", "domain")
        .agg(F.expr("sum(a) div count(*)").alias("score_bp"))
    )
    return scored.groupBy(
        "domain", F.expr("score_bp div 500").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("score_bp").cast("long").alias("min_bp"),
        F.max("score_bp").cast("long").alias("max_bp"),
    )


# ---------------------------------------------------------------------------
# X72 — sequence-length bucket packing audit: assign every document
# to a padded-length bucket (next multiple of 64 tokens — the
# fixed-shape batches a training loader pads to) and report, per
# bucket, the document count, real token mass, padding waste, and
# waste in basis points. This is the standard padding-efficiency
# audit run before choosing bucket boundaries for batch packing
# (x21_context_packing is the packer; this is the planner that
# sizes its bins). Token count is the x10 whitespace/regex
# tokenizer, so the bucket boundary is engine-identical integer
# arithmetic.
#
# Scale: one map-side projection (tokenize + bucket id, codegen'd,
# no Python) and ONE groupBy on a bounded key (buckets are
# ceil(max_tokens/64) distinct values) with map-side combine — the
# same shape as a4_groupby_count, linear at any corpus size.
# ---------------------------------------------------------------------------
@register(
    "x72_length_bucket_pack",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
                                                        '[^a-z0-9]+'),
                                  w -> w <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             ((n_tokens + 63) // 64) * 64 AS bucket_len
      FROM tok WHERE n_tokens > 0
    )
    SELECT bucket_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(bucket_len * count(*) - sum(n_tokens) AS BIGINT) AS pad_tokens,
           CAST(10000 * (bucket_len * count(*) - sum(n_tokens)) //
                (bucket_len * count(*)) AS BIGINT) AS waste_bp
    FROM b GROUP BY bucket_len
    """,
)
def x72_length_bucket_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != "")
        )
        .cast("long")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    b = tok.select(
        "n_tokens",
        F.expr("(n_tokens + 63) div 64 * 64").alias("bucket_len"),
    )
    return b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        (F.col("bucket_len") * F.count(F.lit(1)) - F.sum("n_tokens"))
        .cast("long")
        .alias("pad_tokens"),
        F.expr(
            "10000 * (bucket_len * count(1) - sum(n_tokens))"
            " div (bucket_len * count(1))"
        ).alias("waste_bp"),
    )


# ---------------------------------------------------------------------------
# X77 — differentially-private noisy release: per-nation customer
# counts released through the Laplace mechanism (sensitivity 1,
# eps = 0.5 -> scale b = 2). Voter-file statistics are exactly the
# release surface DP was built for; this key demonstrates the
# mechanism with SEEDED determinism — the uniform draw is the
# md5-hex of (group key, release tag) mapped to (0,1), so the same
# release is reproducible on every engine and run (a production
# release rotates the tag per publication). The inverse-CDF Laplace
# transform is the identical expression text on both sides (IEEE
# /,*,abs,ln), quantized to an integer perturbation; released
# counts clamp at zero.
#
# Scale: one map-side-combined groupBy + per-row expression math on
# the bounded release rows. The noise is drawn PER RELEASED CELL,
# never per input row.
# ---------------------------------------------------------------------------
@register(
    "x77_dp_noisy_release",
    oracle=f"""
    WITH agg AS (
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_true
      FROM customer GROUP BY c_nationkey
    ), u AS (
      SELECT c_nationkey, n_true,
             (CAST({_bucket_sql("concat('dp-v1-', CAST(c_nationkey AS VARCHAR))", 4294967296)} AS DOUBLE)
              + 0.5) / 4294967296.0 AS uni
      FROM agg
    )
    SELECT c_nationkey, n_true,
           CAST(greatest(0, n_true + CAST(floor(
             -2.0 * (CASE WHEN uni >= 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(1.0 - 2.0 * abs(uni - 0.5)) + 0.5) AS BIGINT))
             AS BIGINT) AS noisy_n
    FROM u
    """,
)
def x77_dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    agg = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u32 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp-v1-"), F.col("c_nationkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(4294967296)
    )
    uni = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    with_u = agg.select("c_nationkey", "n_true", uni.alias("uni"))
    return with_u.select(
        "c_nationkey",
        "n_true",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.col("n_true")
            + F.floor(
                F.lit(-2.0)
                * F.when(F.col("uni") >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
                * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(F.col("uni") - F.lit(0.5)))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .cast("long")
        .alias("noisy_n"),
    )


# ---------------------------------------------------------------------------
# X84 — reshard stability: when a corpus grows from 8 to 10 shards,
# what fraction of documents MOVE under (a) mod-N hashing vs (b)
# range partitioning of the hash space? The scale-ops lesson as a
# measured table: mod resharding scrambles almost everything (every
# residue class re-maps), range resharding moves only the documents
# whose hash falls in a shifted boundary span (~1 − 8/10 of the
# space) — why x69's range shards and consistent-hash rings exist.
# Both strategies derive from the SAME 32-bit md5 key, so the
# comparison is exact integer arithmetic per row.
#
# Scale: pure map-side classification + a 2-row rollup; no joins.
# ---------------------------------------------------------------------------
@register(
    "x84_reshard_stability",
    oracle=f"""
    WITH h AS (
      SELECT CAST({_bucket_sql("CAST(doc_id AS VARCHAR)", 4294967296)}
                  AS BIGINT) AS u
      FROM documents
    )
    SELECT 'mod' AS strategy,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN u % 8 <> u % 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST(10000 * sum(CASE WHEN u % 8 <> u % 10 THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS moved_bp
    FROM h
    UNION ALL
    SELECT 'range',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN u * 8 // 4294967296 <> u * 10 // 4294967296
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(10000 * sum(CASE WHEN u * 8 // 4294967296
                                      <> u * 10 // 4294967296
                            THEN 1 ELSE 0 END) // count(*) AS BIGINT)
    FROM h
    """,
)
def x84_reshard_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(4294967296)
    )
    h = docs.select(u.alias("u"))

    def strat(name, moved_sql):
        return h.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                f"cast(sum(case when {moved_sql} then 1 else 0 end)"
                " as bigint)"
            ).alias("n_moved"),
            F.expr(
                f"10000 * sum(case when {moved_sql} then 1 else 0 end)"
                " div count(1)"
            ).alias("moved_bp"),
        ).select(F.lit(name).alias("strategy"), "n_docs", "n_moved", "moved_bp")

    return strat("mod", "u % 8 != u % 10").unionByName(
        strat("range", "u * 8 div 4294967296 != u * 10 div 4294967296")
    )


# ---------------------------------------------------------------------------
# X85 — sampling bias audit: does the deterministic 10% hash sample
# (x13's bucket) preserve the corpus's language mix? Per language:
# full-corpus share vs in-sample share (bp) and the absolute gap;
# plus the half-L1 total-variation distance folded per row so the
# whole audit stays one bounded rollup. The QA step every sampled
# eval set should pass before anyone trusts metrics computed on it.
#
# Scale: two map-side-combined lang rollups (full + sample) joined
# on the bounded lang key, totals broadcast; no second pass over
# text.
# ---------------------------------------------------------------------------
@register(
    "x85_sample_bias_audit",
    oracle=f"""
    WITH base AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_full,
             CAST(sum(CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)")} < 10
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_samp
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_full) AS BIGINT) AS tf,
             CAST(sum(n_samp) AS BIGINT) AS ts
      FROM base
    )
    SELECT b.lang, b.n_full, b.n_samp,
           CAST(10000 * b.n_full // t.tf AS BIGINT) AS full_share_bp,
           CAST(10000 * b.n_samp // t.ts AS BIGINT) AS samp_share_bp,
           CAST(abs(10000 * b.n_full // t.tf - 10000 * b.n_samp // t.ts)
                AS BIGINT) AS gap_bp
    FROM base b CROSS JOIN tot t
    """,
)
def x85_sample_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    in_samp = _bucket(F.col("doc_id").cast("string")) < 10
    # base feeds two consumers (the report rows and the totals) and
    # Spark plans the md5-sampling aggregate subtree once per
    # consumer with no exchange reuse — TWO full corpus scans+hash
    # passes. The eager localCheckpoint pins the O(langs) rollup
    # after one pass (the a49 pattern; checkpointing 5 rows is ~ms).
    base = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_full"),
        F.sum(F.when(in_samp, 1).otherwise(0)).cast("long").alias("n_samp"),
    ).transform(materialize)
    tot = base.agg(
        F.sum("n_full").cast("long").alias("tf"),
        F.sum("n_samp").cast("long").alias("ts"),
    )
    return base.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_full",
        "n_samp",
        F.expr("10000 * n_full div tf").alias("full_share_bp"),
        F.expr("10000 * n_samp div ts").alias("samp_share_bp"),
        F.expr(
            "abs(10000 * n_full div tf - 10000 * n_samp div ts)"
        ).alias("gap_bp"),
    )


# ---------------------------------------------------------------------------
# X86 — k-anonymity audit: for the quasi-identifier projection
# (nation, market segment), is every equivalence class at least
# k = 5 strong? Reports the minimum class size, classes and rows
# below k, and the suppression rate a release would need — the
# re-identification audit that precedes publishing any
# person-derived rollup (x77's DP release is the remedy when this
# audit fails). Exact integers end to end.
#
# Scale: ONE groupBy on the bounded quasi-identifier key with
# map-side combine, then a 1-row rollup of the class table.
# ---------------------------------------------------------------------------
@register(
    "x86_k_anonymity_audit",
    oracle="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(n) AS BIGINT) AS k_min,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_k,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(10000 * sum(CASE WHEN n < 5 THEN n ELSE 0 END) // sum(n)
                AS BIGINT) AS suppression_bp
    FROM cls
    """,
)
def x86_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    below = F.when(F.col("n") < 5, F.col("n")).otherwise(0)
    return cls.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("n").cast("long").alias("k_min"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_k"),
        F.sum(below).cast("long").alias("n_rows_at_risk"),
        F.expr(
            "10000 * sum(case when n < 5 then n else 0 end) div sum(n)"
        ).alias("suppression_bp"),
    )


# ---------------------------------------------------------------------------
# X101 — rendezvous (HRW) hashing: the third resharding strategy
# x84's mod-vs-range comparison leaves out, and the one with the
# minimal-movement GUARANTEE — owner(doc) = argmax over shards of
# h(doc, shard), so removing a shard moves exactly the docs that
# shard owned and nothing else. The key computes owners under 8 and
# 7 shards and PROVES the guarantee in its own output
# (minimal_disruption = 1 iff moved == owned-by-removed).
#
# Scale: a bounded 8x explode per doc, one doc-partitioned argmax
# window; no ring state, no coordination — the property every
# shard-mapping job wants when the fleet changes size.
# ---------------------------------------------------------------------------
def _x101_score_sql(s: str) -> str:
    return _bucket_sql(
        f"concat('hrw:', CAST(doc_id AS VARCHAR), ':', CAST({s} AS VARCHAR))",
        4294967296,
    )


@register(
    "x101_rendezvous_hashing",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, CAST(i AS BIGINT) AS s,
             {_x101_score_sql("i")} AS score
      FROM documents, unnest(range(0, 8)) AS g(i)
    ), own8 AS (
      SELECT doc_id, s AS owner8 FROM (
        SELECT doc_id, s, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, s) AS r
        FROM sh
      ) WHERE r = 1
    ), own7 AS (
      SELECT doc_id, s AS owner7 FROM (
        SELECT doc_id, s, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, s) AS r
        FROM sh WHERE s <> 7
      ) WHERE r = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN owner8 = 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_owned_removed,
           CAST(sum(CASE WHEN owner8 <> owner7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST(10000 * sum(CASE WHEN owner8 <> owner7 THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS moved_bp,
           CAST(CASE WHEN sum(CASE WHEN owner8 = 7 THEN 1 ELSE 0 END)
                     = sum(CASE WHEN owner8 <> owner7 THEN 1 ELSE 0 END)
                THEN 1 ELSE 0 END AS BIGINT) AS minimal_disruption
    FROM own8 JOIN own7 USING (doc_id)
    """,
)
def x101_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").select("doc_id")
    sh = docs.select(
        "doc_id", F.explode(F.expr("sequence(0, 7)")).alias("s")
    ).select(
        "doc_id",
        F.col("s").cast("long").alias("s"),
        F.expr(
            "cast(conv(substr(md5(cast(concat('hrw:', cast(doc_id as string),"
            " ':', cast(s as string)) as binary)), 1, 8), 16, 10) as bigint)"
            " % 4294967296"
        ).alias("score"),
    )

    def owner(df, name):
        w = W.partitionBy("doc_id").orderBy(F.desc("score"), "s")
        return (
            df.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("doc_id", F.col("s").alias(name))
        )

    own8 = owner(sh, "owner8")
    own7 = owner(sh.filter(F.col("s") != 7), "owner7")
    j = own8.join(own7, "doc_id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("owner8") == 7, 1).otherwise(0))
        .cast("long")
        .alias("n_owned_removed"),
        F.sum(F.when(F.col("owner8") != F.col("owner7"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
        F.expr(
            "cast(10000 * sum(case when owner8 <> owner7 then 1 else 0 end)"
            " div count(1) as bigint)"
        ).alias("moved_bp"),
        F.expr(
            "cast(case when sum(case when owner8 = 7 then 1 else 0 end)"
            " = sum(case when owner8 <> owner7 then 1 else 0 end)"
            " then 1 else 0 end as bigint)"
        ).alias("minimal_disruption"),
    )
