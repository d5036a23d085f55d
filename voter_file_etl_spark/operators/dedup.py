"""Deduplication operators (SURVEY.md §2.4 + north-star suite).

D1/D2 port the reference's PK dedup (createMany skipDuplicates,
load.ts:356-360) and the fuzzy entity-dedup its name/address indexes
imply. X1-X4 are the LLM-pipeline dedup family: exact content hash,
MinHash+LSH, SimHash, and n-gram Jaccard.

Design for 100 TB:
- Exact dedup is a hash groupBy on the content hash — one shuffle on
  an already-uniform key.
- MinHash+LSH never compares all pairs: signatures are per-row map
  work, the band self-join only collides candidates (the shuffle key
  is (band, signature)), and Jaccard verification touches candidate
  pairs only. This is the standard near-dup pipeline shape that scales
  linearly in corpus size for fixed collision rate.
- SimHash blocks by a cheap partition key before pairwise hamming.
- All hashing is md5 (identical in Spark and DuckDB), so the oracle
  checks the *same* signatures, not a reimplementation.

The MinHash corpus plants deterministic near-duplicates (a suffixed
copy of every 20th doc) so the pipeline's recall is actually
exercised — the synthetic corpus has no natural near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t

# ---------------------------------------------------------------------------
# D1 — PK dedup (drop exact duplicate keys introduced by re-loads).
# ---------------------------------------------------------------------------
@register(
    "d1_drop_duplicates",
    oracle="""
    SELECT DISTINCT l_orderkey, l_linenumber
    FROM (SELECT l_orderkey, l_linenumber FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 10 = 0)
    """,
)
def d1_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    redelivered = li.filter(F.col("l_orderkey") % 10 == 0)
    return li.unionByName(redelivered).dropDuplicates(["l_orderkey", "l_linenumber"])


# ---------------------------------------------------------------------------
# D2 — fuzzy entity dedup: block on a cheap key, levenshtein within
# the block (soundex/levenshtein name+address blocking of SURVEY §2.4;
# DuckDB lacks soundex, so the oracle-checked distance is levenshtein —
# soundex blocking is exercised in unit tests instead).
# ---------------------------------------------------------------------------
def fastss_lev1_id_pairs(
    rows: DataFrame, id_col: str, name_col: str, block_col: str
) -> DataFrame:
    """All (id1 < id2) same-block row pairs whose names are within
    levenshtein 1, via FastSS deletion-neighborhood blocking (the
    exact lev<=1 reduction proven by j19 / plans/joins.py
    fastss_lev1_pairs, here keyed by row id instead of distinct
    word): every name emits itself plus each single-deletion variant,
    and any pair within levenshtein 1 must share a (block, variant)
    key — equal names share the self-key, insert/delete pairs share
    the shorter string, substitutions share the same-position
    deletion. A block quadratic becomes an equi-join whose candidates
    get the levenshtein verify only; O(rows * name_len) emitted keys,
    no quadratic block at any skew. Output: (id1, id2, name_dist).
    Property-tested against the brute-force definition on random
    vocabularies (tests/test_properties.py)."""
    keyed = rows.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        F.col(block_col).alias("_blk"),
        F.explode(
            F.expr(
                f"transform(sequence(0, length({name_col})), i -> "
                f"case when i = 0 then {name_col} "
                f"else concat(substr({name_col}, 1, i - 1), substr({name_col}, i + 1)) end)"
            )
        ).alias("_k"),
    ).distinct()
    a = keyed.select(
        F.col("_id").alias("id1"), F.col("_name").alias("name1"), "_blk", "_k"
    )
    b = keyed.select(
        F.col("_id").alias("id2"), F.col("_name").alias("name2"), "_blk", "_k"
    )
    cand = (
        a.join(b, ["_blk", "_k"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "name1", "name2")
        .distinct()
    )
    dist = F.levenshtein("name1", "name2")
    return cand.filter(dist <= 1).select(
        "id1", "id2", dist.cast("int").alias("name_dist")
    )


@register(
    "d2_fuzzy_dedup",
    # Deliberately brute-force (block-quadratic) — the oracle's value
    # is algorithmic independence from the FastSS implementation.
    # Measured cost: ~9.5 min at sf1.0 (~450M in-block levenshteins;
    # a let-bound subquery form measures identical, so the join pair
    # volume — not expression double-evaluation — is the cost). The
    # slowest oracle in the registry; budget for it in full sf1.0
    # replays. It carries no non-equi operator, so the
    # oracle_plan_audit census correctly classifies it bounded.
    oracle="""
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS name_dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def d2_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FastSS deletion-key blocking INSIDE the nation block replaces
    # the nation-block quadratic (~600^2 levenshteins per nation at
    # sf0.1, ~4.5M pairs) — same result set as the oracle's
    # brute-force definition, measured 13.7 s -> ~1 s at sf0.1, and
    # linear-scaling at 100 TB. See fastss_lev1_id_pairs.
    c = t(spark, sf_dir, "customer")
    return fastss_lev1_id_pairs(c, "c_custkey", "c_name", "c_nationkey")


# ---------------------------------------------------------------------------
# X1 — exact content dedup by hash-groupBy.
# ---------------------------------------------------------------------------
@register(
    "x1_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM (SELECT doc_id, text FROM documents
          UNION ALL
          -- planted duplicates take ids from the negative range, which
          -- no genuine doc_id (>= 0) can occupy at ANY scale factor;
          -- an additive offset would silently collide past 1M rows.
          -- min() therefore elects the planted fixture row where one
          -- exists — still a deterministic survivor.
          SELECT -doc_id - 1 AS doc_id, text FROM documents
          WHERE doc_id % 10 = 0)
    GROUP BY md5(text)
    """,
)
def x1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(copies)
    return corpus.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ---------------------------------------------------------------------------
# X2 — MinHash + LSH near-dup detection.
#   shingle (word 3-grams) -> 8 md5-minhashes -> 4 bands of 2 ->
#   band-collision candidates -> exact Jaccard verify.
# ---------------------------------------------------------------------------
_N_SEEDS = 8
_BAND_SIZE = 2
_N_BANDS = _N_SEEDS // _BAND_SIZE
_MINHASH_JACCARD_MIN = 0.5

# One md5 per shingle; seed s reads hex slice [4s, 4s+4). Slicing one
# digest into 8 independent 16-bit hashes costs 8x fewer md5 calls
# than hashing per seed — the dominant map cost in this pipeline —
# and 16-bit mins stay effectively collision-free at ~100 shingles
# per doc. The Jaccard verify step keeps precision exact regardless.


def _minhash_oracle() -> str:
    mh_cols = ",\n        ".join(
        f"list_min(list_transform(shingles, x -> substr(md5(x), {4 * s + 1}, 4))) AS m{s}"
        for s in range(_N_SEEDS)
    )
    band_selects = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, m{2 * b} || m{2 * b + 1} AS sig FROM mh"
        for b in range(_N_BANDS)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- planted near-dups in the negative id range (collision-free at
      -- any scale factor; see x48)
      SELECT -doc_id - 1 AS doc_id, concat(text, ' zz end marker') AS text
      FROM documents WHERE doc_id % 20 = 0
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
      FROM (SELECT doc_id, str_split(text, ' ') AS arr FROM corpus)
    ), mh AS (
      SELECT doc_id, shingles,
        {mh_cols}
      FROM sh
    ), bands AS (
      {band_selects}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT c.id1, c.id2,
      CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
        / (len(s1.shingles) + len(s2.shingles)
           - len(list_intersect(s1.shingles, s2.shingles))) AS jaccard
    FROM cand c
    JOIN sh s1 ON c.id1 = s1.doc_id
    JOIN sh s2 ON c.id2 = s2.doc_id
    WHERE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
        / (len(s1.shingles) + len(s2.shingles)
           - len(list_intersect(s1.shingles, s2.shingles))) >= {_MINHASH_JACCARD_MIN}
    """


def shingle3(corpus: DataFrame) -> DataFrame:
    """(doc_id, shingles): distinct word 3-shingles per doc. Callers
    persist the result — the shingle arrays typically feed several
    consumers (signatures + both sides of the Jaccard verify), and
    recomputing the md5/shingle work per branch multiplies the map
    cost. MEMORY_AND_DISK at the call site so a 100 TB corpus spills
    instead of OOMing; size is O(corpus tokens), not O(pairs)."""
    return corpus.withColumn("arr", F.split("text", " ")).select(
        "doc_id",
        F.expr(
            "CASE WHEN size(arr) >= 3 THEN "
            "array_distinct(transform(sequence(0, size(arr) - 3), "
            "i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("shingles"),
    )


def shingle3_exploded(
    corpus: DataFrame, distinct_per_doc: bool = True
) -> DataFrame:
    """(doc_id, g): one row per word 3-shingle per doc, optionally
    deduplicated within the doc (list_distinct semantics).

    Equivalent to ``shingle3(...)`` followed by an explode, but built
    zip-slice-then-concat: Spark evaluates ``explode(transform(...))``
    by re-running the interpreted higher-order lambda once PER OUTPUT
    ROW inside the generate (measured 4.9 s vs 0.16 s for the whole
    explode at sf0.1 — SCALE.md round-4 perf pass), so the concat
    must happen AFTER the explode, where it is a plain codegen row
    expression. Callers that need the ARRAY form (minhash banding)
    keep using shingle3 + persist — persisting materializes the
    array once and sidesteps the same re-evaluation.
    """
    from voter_file_etl_spark.functions.ngrams import ngram_rows

    out = ngram_rows(corpus, ["doc_id"], "split(text, ' ')", 3)
    return out.distinct() if distinct_per_doc else out


def minhash_bands(shingled: DataFrame) -> DataFrame:
    """(doc_id, band, sig): LSH band signatures — one md5 per shingle
    sliced into _N_SEEDS 16-bit hashes (see the seed-slicing note
    above _minhash_oracle), banded _BAND_SIZE seeds per signature."""
    mh = shingled.select(
        "doc_id",
        F.expr("transform(shingles, x -> md5(x))").alias("hx"),
    ).select(
        "doc_id",
        *[
            F.expr(f"array_min(transform(hx, h -> substring(h, {4 * s + 1}, 4)))").alias(
                f"m{s}"
            )
            for s in range(_N_SEEDS)
        ],
    )
    return mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}"))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "sig"),
    )


@register("x2_dedup_minhash", oracle=_minhash_oracle())
def x2_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz end marker")).alias("text"),
    )
    corpus = docs.unionByName(copies)
    shingled = shingle3(corpus).persist()
    # Persist the band table: both sides of the self-join read it, and
    # without the persist each side re-runs the md5/min signature scan.
    bands = minhash_bands(shingled).persist()
    a = bands.select(
        F.col("doc_id").alias("id1"), F.col("band").alias("band"), F.col("sig").alias("sig")
    )
    b = bands.select(
        F.col("doc_id").alias("id2"), F.col("band").alias("band"), F.col("sig").alias("sig")
    )
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    s1 = shingled.select(F.col("doc_id").alias("id1"), F.col("shingles").alias("sh1"))
    s2 = shingled.select(F.col("doc_id").alias("id2"), F.col("shingles").alias("sh2"))
    # Let-bind the intersection size through inline(transform(...)):
    # written inline, projection collapse re-evaluates the
    # array_intersect once per reference (numerator + denominator)
    # and again under the threshold filter — up to 4 shingle-set
    # intersections per candidate pair (the x4 finding, r7).
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .selectExpr(
            "id1",
            "id2",
            "inline(transform("
            "array(cast(size(array_intersect(sh1, sh2)) as double)),"
            " it -> named_struct("
            "'jaccard', it / (size(sh1) + size(sh2) - it))))",
        )
        .filter(F.col("jaccard") >= _MINHASH_JACCARD_MIN)
    )


# ---------------------------------------------------------------------------
# X3 — SimHash fingerprint + blocked hamming pairs. The 32 hash bits
# are the high bit of each md5 hex nibble — identical in both engines
# without any hex->int conversion.
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 32
_HAMMING_MAX = 8
_HI = ("8", "9", "a", "b", "c", "d", "e", "f")


def _simhash_oracle() -> str:
    # md5 hex is lowercase [0-9a-f], so "high bit of the nibble" is the
    # single comparison char >= '8' — cheaper than an 8-way IN list.
    s_cols = ",\n        ".join(
        f"sum(CASE WHEN substr(hx, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, source, w
      FROM (SELECT doc_id, source, unnest(str_split(text, ' ')) AS w FROM documents)
    ), h AS (
      SELECT doc_id, source, md5(w) AS hx FROM toks
    ), s AS (
      SELECT doc_id, source,
        {s_cols}
      FROM h GROUP BY doc_id, source
    ), f AS (
      SELECT doc_id, source, CAST({combine} AS BIGINT) AS simhash FROM s
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM f a JOIN f b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    """


@register("x3_dedup_simhash", oracle=_simhash_oracle())
def x3_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # Pack the 32 hex nibbles into four 32-bit ints once per token;
    # the 32 per-bit terms in the aggregate are then shift/mask ops on
    # a long instead of substring allocations — same bits as the
    # oracle's substr(hx, j+1, 1) >= '8' (char c of group k is nibble
    # significance 7-c, high bit at offset (7-c)*4+3).
    toks = (
        docs.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .withColumn("hx", F.md5("w"))
        .select(
            "doc_id",
            "source",
            *[
                F.conv(F.substring("hx", 1 + 8 * k, 8), 16, 10)
                .cast("bigint")
                .alias(f"v{k}")
                for k in range(_SIMHASH_BITS // 8)
            ],
        )
    )
    s = toks.groupBy("doc_id", "source").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"v{j // 8}"), (7 - j % 8) * 4 + 3).bitwiseAND(1)
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    simhash = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    # Persist: one fingerprint row per doc, read by both join sides.
    fp = s.select("doc_id", "source", simhash.cast("bigint").alias("simhash")).persist()

    a = fp.select(
        F.col("doc_id").alias("id1"), "source", F.col("simhash").alias("h1")
    )
    b = fp.select(
        F.col("doc_id").alias("id2"), "source", F.col("simhash").alias("h2")
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        a.join(b, "source")
        .filter(F.col("id1") < F.col("id2"))
        .filter(hamming <= _HAMMING_MAX)
        .select("id1", "id2", hamming.cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# X4 — character-3-gram Jaccard over blocked pairs (same lang + size
# bucket). The block keeps the pair count linear-ish; the distinct-
# gram arrays make intersect/union exact set sizes.
# ---------------------------------------------------------------------------
_NGRAM_JACCARD_MIN = 0.5


@register(
    "x4_ngram_jaccard",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, lang,
             CAST(n_chars // 100 AS BIGINT) AS size_bucket,
             list_distinct(list_transform(range(1, length(text) - 1),
                 i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
               AS jaccard3
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.size_bucket = b.size_bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
          >= {_NGRAM_JACCARD_MIN}
    """,
)
def x4_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    # The trigram-set build (a length(text)-wide transform +
    # array_distinct per doc) feeds BOTH sides of the block self-join;
    # left lazy it executes twice, once per side. localCheckpoint
    # materializes it once (r13; A/B at sf0.1 on the x88 sweep:
    # 2.89 -> 2.70 s min-of-3 under equal load) — at scale this
    # halves the dominant map cost of the candidate-pair stage.
    g = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100).cast("long").alias("size_bucket"),
        F.expr(
            "array_distinct(transform(sequence(1, length(text) - 2),"
            " i -> substring(text, i, 3)))"
        ).alias("grams"),
    ).transform(materialize)
    a = g.select(
        F.col("doc_id").alias("id1"), "lang", "size_bucket", F.col("grams").alias("g1")
    )
    b = g.select(
        F.col("doc_id").alias("id2"), "lang", "size_bucket", F.col("grams").alias("g2")
    )
    # Let-bind the intersection size: written inline, the
    # array_intersect re-evaluates once per reference (numerator +
    # denominator) and again when the threshold filter re-inlines the
    # projected formula — up to 4 intersections of ~300-gram arrays
    # PER PAIR. inline(transform(array(...))) evaluates it once; the
    # filter acts on the generated column, which projection collapse
    # cannot reach through (r7: 3.4 -> 2.4 s at sf0.1).
    return (
        a.join(b, ["lang", "size_bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .selectExpr(
            "id1",
            "id2",
            "inline(transform("
            "array(cast(size(array_intersect(g1, g2)) as double)),"
            " it -> named_struct("
            "'jaccard3', it / (size(g1) + size(g2) - it))))",
        )
        .filter(F.col("jaccard3") >= _NGRAM_JACCARD_MIN)
    )


# ---------------------------------------------------------------------------
# X17 — dedup clustering: each group of mutual near-duplicates gets
# ONE canonical id (the minimum doc_id in the component of the
# near-dup graph) — the step that turns pairwise dedup findings into
# actual keep/drop decisions.
#
# Spark side (r8 rewrite): x17's edge relation is "same 40-char-prefix
# blocking hash", and a doc has exactly ONE blk — so the graph is a
# disjoint union of per-blk cliques and its components ARE the blk
# groups. Materializing the clique edges (a blk self-join) and
# iterating min-label propagation computes the same answer with
# O(sum block_size^2) intermediate rows — the m14 defect class: the r8
# dup-skew probe measured a 10%-duplicate corpus (5k-doc shared-text
# clique) at 15.58 s in the join form vs 0.58 s here (and 1.73 s vs
# 0.57 s even on the duplicate-free corpus). The
# direct form: ONE shuffle on blk, min(doc_id) and count over a blk
# window, keep docs whose block has >= 2 members (== "nodes with at
# least one edge"). General near-dup graphs whose edges are NOT an
# equivalence relation (LSH-band pairs with a verify filter) still
# need real connected components — that operator lives in
# operators/graph.py and is exercised by g4/x46.
#
# Corpus plants two copies of every 20th doc (suffix and prefix
# edits), giving 3-node star components. The DuckDB oracle keeps the
# recursive-CTE component computation over the materialized edges —
# terminating because UNION dedups (node, label) states — so the
# Spark shortcut is verified against the full graph definition.
# ---------------------------------------------------------------------------
@register(
    "x17_dedup_clusters",
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- two planted edits per 20th doc, ids in disjoint negative
      -- ranges (odd vs even negatives) — collision-free with genuine
      -- ids (>= 0) and each other at any scale factor (see x48)
      SELECT -2 * doc_id - 1 AS doc_id, concat(text, ' zz suffix edit') AS text
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT -2 * doc_id - 2 AS doc_id, concat(text, ' yy other edit') AS text
      FROM documents WHERE doc_id % 20 = 0
    ), keyed AS (
      SELECT doc_id, md5(substr(text, 1, 40)) AS blk FROM corpus
    ), edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM keyed a JOIN keyed b ON a.blk = b.blk AND a.doc_id <> b.doc_id
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), reach(node, label) AS (
      SELECT node, node AS label FROM nodes
      UNION
      SELECT e.dst AS node, r.label
      FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT node, min(label) AS component FROM reach GROUP BY node
    """,
)
def x17_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    c1 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") * 2 - 1).alias("doc_id"),
        F.concat("text", F.lit(" zz suffix edit")).alias("text"),
    )
    c2 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") * 2 - 2).alias("doc_id"),
        F.concat("text", F.lit(" yy other edit")).alias("text"),
    )
    keyed = (
        docs.unionByName(c1)
        .unionByName(c2)
        .select("doc_id", F.md5(F.substring("text", 1, 40)).alias("blk"))
    )
    # Components of the same-blk clique graph = blk groups (see the
    # header note): one shuffle, no edge materialization, no
    # iteration. _n >= 2 == "node has at least one edge".
    from pyspark.sql import Window as W

    w = W.partitionBy("blk")
    return (
        keyed.select(
            "doc_id",
            F.min("doc_id").over(w).alias("component"),
            F.count(F.lit(1)).over(w).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .select(F.col("doc_id").alias("node"), "component")
    )


# ---------------------------------------------------------------------------
# X22 — benchmark decontamination: drop training docs sharing any
# word 8-gram with a held-out benchmark set (the C4/Dolma-style
# contamination scrub). Benchmark n-grams are DISTINCT and small
# relative to the corpus, so the plan is: corpus n-grams (map-side
# explode) ⋈ broadcast benchmark n-gram set -> distinct contaminated
# doc ids -> left-anti join back. Two shuffles total (distinct +
# anti), never a doc×doc comparison.
# ---------------------------------------------------------------------------
_DECON_N = 8


def _decon_grams_sql(src: str) -> str:
    return f"""
      SELECT doc_id, g FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, len(arr) - {_DECON_N - 2}),
                 i -> list_aggregate(list_slice(arr, i, i + {_DECON_N - 1}), 'string_agg', ' ')
               )) AS grams
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS arr FROM {src})
      ), unnest(grams) AS t(g)
    """


_DECON_CORPUS_SQL = """
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      -- planted leaks in the negative id range — collision-free with
      -- genuine ids (>= 0) at any scale factor (see x48)
      SELECT -doc_id - 1 AS doc_id,
             concat('leaked eval sample ', text) AS text, lang
      FROM documents WHERE doc_id % 97 = 0
"""


@register(
    "x22_decontaminate",
    oracle=f"""
    WITH corpus AS (
      {_DECON_CORPUS_SQL}
    ), bench AS (
      SELECT DISTINCT g FROM ({_decon_grams_sql("(SELECT * FROM documents WHERE doc_id % 97 = 0)")})
    ), corpus_grams AS (
      {_decon_grams_sql("corpus")}
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM corpus_grams JOIN bench USING (g)
    )
    SELECT d.doc_id, d.lang
    FROM corpus d
    LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL
    """,
)
def x22_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 97 == 0

    def grams(df: DataFrame) -> DataFrame:
        # zip-slice explode + per-doc distinct == the old per-doc
        # array_distinct(transform(...)) explode, without the
        # per-output-row lambda re-evaluation (functions/ngrams.py).
        from voter_file_etl_spark.functions.ngrams import ngram_rows

        return ngram_rows(
            df, ["doc_id"], "split(lower(text), ' ')", _DECON_N
        ).distinct()

    bench = grams(docs.filter(is_bench)).select("g").distinct()
    # Corpus = non-benchmark docs plus planted leaks (benchmark text
    # embedded in new docs) so the detection path is provably
    # exercised — the planted docs MUST be removed.
    planted = docs.filter(is_bench).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.lit("leaked eval sample "), F.col("text")).alias("text"),
        "lang",
    )
    corpus = docs.filter(~is_bench).select("doc_id", "text", "lang").unionByName(planted)
    contaminated = (
        grams(corpus).join(F.broadcast(bench), "g").select("doc_id").distinct()
    )
    return corpus.join(contaminated, "doc_id", "left_anti").select("doc_id", "lang")


# ---------------------------------------------------------------------------
# X29 — fuzzy decontamination: cross-corpus MinHash (x2's machinery
# between TWO corpora instead of within one). Exact n-gram scrubbing
# (x22) misses lightly-edited benchmark leaks; here the held-out set
# and the training corpus are both shingled+banded, candidates come
# from the band equi-join bench ⋈ corpus, and the Jaccard verify
# keeps precision exact. Planted near-duplicates (benchmark text +
# trailing edit) prove the detection path. Output = every
# (corpus doc, bench doc) pair above threshold — the kill list a
# curation pipeline anti-joins against.
#
# Scale: identical to x2 — shuffle keyed on (band, sig), the bench
# side is typically small enough to broadcast, verify is candidates-
# only. Never corpus x bench.
# ---------------------------------------------------------------------------
def _fuzzy_decon_oracle() -> str:
    mh_cols = ",\n        ".join(
        f"list_min(list_transform(shingles, x -> substr(md5(x), {4 * s + 1}, 4))) AS m{s}"
        for s in range(_N_SEEDS)
    )

    def bands(src: str) -> str:
        return "\n      UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, m{2 * b} || m{2 * b + 1} AS sig FROM {src}"
            for b in range(_N_BANDS)
        )

    return f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      -- planted near-leaks in the negative id range (see x48)
      SELECT -doc_id - 1 AS doc_id, concat(text, ' xq tail edit') AS text
      FROM documents WHERE doc_id % 97 = 0
    ), shb AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
      FROM (SELECT doc_id, str_split(text, ' ') AS arr FROM bench)
    ), shc AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
      FROM (SELECT doc_id, str_split(text, ' ') AS arr FROM corpus)
    ), mhb AS (
      SELECT doc_id, shingles, {mh_cols} FROM shb
    ), mhc AS (
      SELECT doc_id, shingles, {mh_cols} FROM shc
    ), bb AS (
      {bands("mhb")}
    ), bc AS (
      {bands("mhc")}
    ), cand AS (
      SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS bench_id
      FROM bc c JOIN bb b ON c.band = b.band AND c.sig = b.sig
    )
    SELECT cand.corpus_id, cand.bench_id,
      CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
        / (len(s1.shingles) + len(s2.shingles)
           - len(list_intersect(s1.shingles, s2.shingles))) AS jaccard
    FROM cand
    JOIN shc s1 ON cand.corpus_id = s1.doc_id
    JOIN shb s2 ON cand.bench_id = s2.doc_id
    WHERE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
        / (len(s1.shingles) + len(s2.shingles)
           - len(list_intersect(s1.shingles, s2.shingles))) >= {_MINHASH_JACCARD_MIN}
    """


@register("x29_fuzzy_decontaminate", oracle=_fuzzy_decon_oracle())
def x29_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    is_bench = F.col("doc_id") % 97 == 0
    bench = docs.filter(is_bench)
    planted = bench.select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" xq tail edit")).alias("text"),
    )
    corpus = docs.filter(~is_bench).unionByName(planted)

    shb = shingle3(bench).persist()
    shc = shingle3(corpus).persist()
    cand = (
        minhash_bands(shc)
        .select(F.col("doc_id").alias("corpus_id"), "band", "sig")
        .join(
            F.broadcast(
                minhash_bands(shb).select(
                    F.col("doc_id").alias("bench_id"), "band", "sig"
                )
            ),
            ["band", "sig"],
        )
        .select("corpus_id", "bench_id")
        .distinct()
    )
    s1 = shc.select(F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh1"))
    s2 = shb.select(F.col("doc_id").alias("bench_id"), F.col("shingles").alias("sh2"))
    # Let-bound intersection (see x2/x4): one array_intersect per
    # candidate pair instead of up to four.
    return (
        cand.join(s1, "corpus_id")
        .join(F.broadcast(s2), "bench_id")
        .selectExpr(
            "corpus_id",
            "bench_id",
            "inline(transform("
            "array(cast(size(array_intersect(sh1, sh2)) as double)),"
            " it -> named_struct("
            "'jaccard', it / (size(sh1) + size(sh2) - it))))",
        )
        .filter(F.col("jaccard") >= _MINHASH_JACCARD_MIN)
    )


# ---------------------------------------------------------------------------
# X35 — sub-document containment detection: asymmetric Jaccard
# C(A,B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|, the measure
# that catches a document EMBEDDED in another (quote farms, scraped
# excerpts, licence-header reuse) where symmetric Jaccard stays low
# because the host document is much larger. Every 30th doc plants a
# fragment (its first 60% of characters plus a two-word suffix), and
# candidate pairs come from equi-joining on the first-3-word prefix
# key — fragments start where their parents start, so blocking is
# exact for this planting while staying a plain shuffle-partitionable
# equi-join (never all-pairs) at scale.
#
# Determinism: shingle sets are distinct word trigrams; containment
# is an exact int/int division rounded to 6dp on both engines.
# ---------------------------------------------------------------------------
_CONTAIN_MIN = 0.2


@register(
    "x35_containment_dedup",
    oracle=f"""
    WITH allx AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- planted fragments take negative-range ids (see x48): an
      -- additive base would collide with genuine ids at scale
      SELECT -doc_id - 1 AS doc_id,
             substr(text, 1, length(text) * 3 // 5) || ' fragment copy' AS text
      FROM documents WHERE doc_id % 30 = 0
    ), words AS (
      SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS w
      FROM allx
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams,
             w[1] || ' ' || w[2] || ' ' || w[3] AS pfx
      FROM words WHERE len(w) >= 3
    )
    SELECT frag_id, parent_id,
           {half_up_sql("ratio_raw", 6)} AS containment,
           {half_up_sql("ratio_raw", 6)} >= 0.5 AS is_contained
    FROM (
      -- bind the intersection ratio ONCE (ADVICE r10 #4, the oracle
      -- twin of the r10 Spark-side x35 let-binding): each half_up_sql
      -- guard interpolates its operand four times, so the three
      -- consumers above/below must reference a cheap bound column,
      -- not re-evaluate list_intersect per copy.
      SELECT f.doc_id AS frag_id, p.doc_id AS parent_id,
             CAST(len(list_intersect(f.grams, p.grams)) AS DOUBLE)
               / len(f.grams) AS ratio_raw
      FROM sh f JOIN sh p
        ON f.pfx = p.pfx AND f.doc_id < 0 AND p.doc_id >= 0
    )
    WHERE {half_up_sql("ratio_raw", 6)} >= {_CONTAIN_MIN}
    """,
)
def x35_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    frags = docs.filter(F.col("doc_id") % 30 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, CAST(length(text) * 3 div 5 AS INT))"),
            F.lit(" fragment copy"),
        ).alias("text"),
    )
    allx = docs.select("doc_id", "text").unionByName(frags)
    words = allx.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("w")
    )
    sh = words.filter(F.size("w") >= 3).select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(1, size(w) - 2), "
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', "
            "element_at(w, i + 2))))"
        ).alias("grams"),
        F.expr(
            "concat(element_at(w, 1), ' ', element_at(w, 2), ' ', element_at(w, 3))"
        ).alias("pfx"),
    )
    f_side = sh.filter(F.col("doc_id") < 0).select(
        F.col("doc_id").alias("frag_id"), F.col("grams").alias("fg"), "pfx"
    )
    p_side = sh.filter(F.col("doc_id") >= 0).select(
        F.col("doc_id").alias("parent_id"), F.col("grams").alias("pg"), "pfx"
    )
    # Let-bound containment ratio (see x2/x4): one array_intersect
    # per candidate pair instead of three (two output references +
    # the filter's re-inline). The RAW ratio is bound first and
    # half_up applied to the lambda variable, so the guard's repeated
    # operand references (NaN/Inf passthrough CASE) repeat a cheap
    # bound scalar, not the array_intersect.
    hu = half_up_sql("r", 6)
    return (
        f_side.join(p_side, "pfx")
        .selectExpr(
            "frag_id",
            "parent_id",
            # half_up_sql, not round(): the idiom is dialect-neutral
            # (floor/mul/add), so the same text serves Spark SQL here
            # and DuckDB in the oracle (x34's tie class).
            "inline(transform(array("
            "cast(size(array_intersect(fg, pg)) as double) / size(fg)"
            f"), r -> named_struct("
            f"'containment', {hu}, 'is_contained', {hu} >= 0.5d)))",
        )
        .filter(F.col("containment") >= _CONTAIN_MIN)
    )


# ---------------------------------------------------------------------------
# X38 — sketch accuracy evaluation: MinHash-ESTIMATED Jaccard
# (fraction of matching signature slots) against EXACT Jaccard for
# the planted near-dup pairs — the calibration step that tells you
# whether a given signature budget (here 8 slots) is adequate before
# you trust LSH at 100 TB, where the exact verify is affordable only
# on candidates. Reuses x2's seed-sliced md5 signatures so the
# estimate under test is literally the production sketch.
#
# Scale: per-doc signatures are map-side; the pair table is the
# bounded planted set joined twice — no candidate explosion.
# ---------------------------------------------------------------------------
def _x38_oracle() -> str:
    mh_cols = ",\n        ".join(
        f"list_min(list_transform(shingles, x -> substr(md5(x), {4 * s + 1}, 4))) AS m{s}"
        for s in range(_N_SEEDS)
    )
    matches = " + ".join(
        f"(CASE WHEN a.m{s} = b.m{s} THEN 1 ELSE 0 END)" for s in range(_N_SEEDS)
    )
    exact = (
        "CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)"
        " / (len(a.shingles) + len(b.shingles)"
        " - len(list_intersect(a.shingles, b.shingles)))"
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- planted near-dups in the negative id range (collision-free at
      -- any scale factor; see x48). -doc_id - 1 is an involution, so
      -- the original of planted row p is -p - 1.
      SELECT -doc_id - 1 AS doc_id, concat(text, ' zz end marker') AS text
      FROM documents WHERE doc_id % 20 = 0
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
      FROM (SELECT doc_id, str_split(text, ' ') AS arr FROM corpus)
    ), mh AS (
      SELECT doc_id, shingles,
        {mh_cols}
      FROM sh
    )
    SELECT id1, id2,
           {half_up_sql("exact_raw", 6)} AS jaccard_exact,
           {half_up_sql("est_raw", 6)} AS jaccard_est,
           {half_up_sql(
               f"abs({half_up_sql('exact_raw', 6)}"
               f" - {half_up_sql('est_raw', 6)})",
               6)}
             AS abs_err
    FROM (
      -- bind the expensive intersection/signature expressions ONCE
      -- (ADVICE r10 #4): half_up_sql's NaN/Inf guard interpolates its
      -- operand four times, so the guards above must reference cheap
      -- bound columns, not the list_intersect/signature-sum trees.
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             {exact} AS exact_raw,
             CAST({matches} AS DOUBLE) / {_N_SEEDS} AS est_raw
      FROM mh a JOIN mh b ON -a.doc_id - 1 = b.doc_id
      WHERE a.doc_id >= 0
    )
    """


@register("x38_minhash_accuracy", oracle=_x38_oracle())
def x38_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz end marker")).alias("text"),
    )
    sh = shingle3(docs.unionByName(copies)).persist()
    mh = sh.select(
        "doc_id",
        "shingles",
        F.expr("transform(shingles, x -> md5(x))").alias("hx"),
    ).select(
        "doc_id",
        "shingles",
        *[
            F.expr(
                f"array_min(transform(hx, h -> substring(h, {4 * s + 1}, 4)))"
            ).alias(f"m{s}")
            for s in range(_N_SEEDS)
        ],
    )
    # a = genuine side only: -id - 1 is an involution, so without the
    # >= 0 guard each planted pair would also match mirrored
    # (a=planted, b=original) and double the output.
    a = mh.filter(F.col("doc_id") >= 0).select(
        F.col("doc_id").alias("id1"),
        F.col("shingles").alias("sh1"),
        *[F.col(f"m{s}").alias(f"a{s}") for s in range(_N_SEEDS)],
    )
    b = mh.select(
        (-F.col("doc_id") - 1).alias("id1"),
        F.col("doc_id").alias("id2"),
        F.col("shingles").alias("sh2"),
        *[F.col(f"m{s}").alias(f"b{s}") for s in range(_N_SEEDS)],
    )
    # Let-bound exact and estimated Jaccard (see x2/x4): written as
    # plain aliases, exact's two output references re-inline the
    # array_intersect 4x per pair.
    nmatch = " + ".join(
        f"(case when a{s} = b{s} then 1 else 0 end)" for s in range(_N_SEEDS)
    )
    # half_up_sql, not round(): dialect-neutral tie-safe rounding for
    # the int/int Jaccard ratios (x34's class) — same text as the
    # oracle's emissions.
    return a.join(b, "id1").selectExpr(
        "id1",
        "id2",
        "inline(transform("
        "array(cast(size(array_intersect(sh1, sh2)) as double)),"
        " it -> transform(array(named_struct("
        f"'ex', {half_up_sql('it / (size(sh1) + size(sh2) - it)', 6)},"
        f"'es', {half_up_sql(f'cast({nmatch} as double) / {_N_SEEDS}', 6)}"
        ")), s -> named_struct("
        "'jaccard_exact', s.ex,"
        "'jaccard_est', s.es,"
        f"'abs_err', {half_up_sql('abs(s.ex - s.es)', 6)}))[0]))",
    )


# ---------------------------------------------------------------------------
# X44 — line-level dedup with document reassembly (the RefinedWeb /
# CCNet recipe): cut every document into fixed 10-word lines, drop
# every line whose exact text already occurred earlier in the corpus
# (first occurrence by (doc_id, line_id) wins — boilerplate headers,
# navigation chrome and licence blocks collapse to one copy), then
# stitch each document back together from its surviving lines. Three
# shuffles at any scale: explode->line groupBy (key = the line text,
# uniform), the winner filter (window over the same key, fused into
# the same exchange), and the per-doc reassembly groupBy. Fingerprint
# output (kept counts + md5 of the rebuilt text) keeps the driver row
# narrow while pinning the exact reconstruction.
# ---------------------------------------------------------------------------
_X44_LINE = 10


@register(
    "x44_line_dedup",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id,
             CAST((s - 1) // {_X44_LINE} AS BIGINT) AS line_id,
             array_to_string(
               list_slice(str_split(text, ' '), s, s + {_X44_LINE} - 1),
               ' ') AS line
      FROM documents,
           unnest(generate_series(
             1, len(str_split(text, ' ')), {_X44_LINE})) AS u(s)
    ), kept AS (
      SELECT doc_id, line_id, line,
             row_number() OVER (
               PARTITION BY line ORDER BY doc_id, line_id) AS rn
      FROM lines
    ), rebuilt AS (
      SELECT doc_id,
             count(*) AS n_kept,
             string_agg(line, ' ' ORDER BY line_id) AS new_text
      FROM kept WHERE rn = 1 GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_lines,
           coalesce(r.n_kept, 0) AS n_kept,
           md5(coalesce(r.new_text, '')) AS new_md5
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def x44_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from voter_file_etl_spark.tables import t as _t

    lines = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("arr"))
        .select(
            "doc_id",
            "arr",
            F.explode(F.expr(f"sequence(1, size(arr), {_X44_LINE})")).alias(
                "s"
            ),
        )
        # slice/concat run once per line row, post-explode
        # (functions/ngrams.py rationale)
        .select(
            "doc_id",
            F.expr(f"CAST((s - 1) div {_X44_LINE} AS BIGINT)").alias(
                "line_id"
            ),
            F.expr(f"concat_ws(' ', slice(arr, s, {_X44_LINE}))").alias(
                "line"
            ),
        )
    )
    kept = (
        lines.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("line").orderBy("doc_id", "line_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_id", "line"))
                ),
                lambda x: x["line"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.md5(
                F.coalesce("new_text", F.lit("")).cast("binary")
            ).alias("new_md5"),
        )
    )


# ---------------------------------------------------------------------------
# X45 — cross-source overlap matrix: for every pair of corpus
# sources, how many distinct 8-word shingles they share — the
# dataset-audit companion to x22/x29 decontamination (which ask "is
# the benchmark in my corpus"; this asks "how much do my ingest
# feeds overlap each other", the first question before assigning
# mixture weights to crawls that partially duplicate one another).
# Shape: shingle -> distinct (source, md5) -> self-join on the hash.
# The shuffle key is the shingle hash (uniform by construction); the
# per-hash fan-out is bounded by the NUMBER OF SOURCES (a shingle
# contributes at most C(n_sources, 2) pairs however often it
# repeats, because sources are deduped first). Containment is the
# one float, computed as a single IEEE division and rounded on both
# engines.
# ---------------------------------------------------------------------------
_X45_SHINGLE = 8


@register(
    "x45_source_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT source,
             md5(array_to_string(
               list_slice(str_split(text, ' '), s, s + {_X45_SHINGLE} - 1),
               ' ')) AS h
      FROM documents,
           unnest(generate_series(
             1, len(str_split(text, ' ')) - {_X45_SHINGLE} + 1, 1)) AS u(s)
    ), per AS (
      SELECT source, count(*) AS n FROM sh GROUP BY source
    ), ov AS (
      SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s1, s2, n_shared, p1.n AS n_s1, p2.n AS n_s2,
           {half_up_sql("n_shared / least(p1.n, p2.n)", 6)} AS containment
    FROM ov JOIN per p1 ON ov.s1 = p1.source
            JOIN per p2 ON ov.s2 = p2.source
    """,
)
def x45_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.tables import t as _t

    docs = _t(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("arr")
    )
    # guard: Spark sequence(1, n) runs BACKWARD for n < 1 (a doc
    # shorter than the shingle would fabricate short shingles; DuckDB
    # generate_series is empty there — both engines must drop it)
    docs = docs.filter(F.size("arr") >= _X45_SHINGLE)
    from voter_file_etl_spark.functions.ngrams import ngram_rows

    raw = (
        ngram_rows(docs, ["source"], "arr", _X45_SHINGLE)
        .select("source", F.md5(F.col("g").cast("binary")).alias("h"))
        .filter(F.col("h").isNotNull())
    )
    # ONE aggregate keyed on the shingle hash replaces distinct +
    # per-source agg + hash self-join (guide §2.3/§2.4, the
    # _copurchase_edges shape): collect_set dedups (source, h) exactly
    # as the old .distinct() did, and the C(sources,2) pairs per hash
    # come from a map-side explode of the sorted set — the same
    # bounded fan-out the join emitted, minus the distinct Exchange
    # and the join. The grouped frame feeds BOTH rollups (per-source
    # totals and the overlap matrix), so it is materialized once
    # (localCheckpoint — the a49/x4 discipline).
    grouped = (
        raw.groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .transform(materialize)
    )
    per = (
        grouped.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ov = (
        grouped.filter(F.size("ss") >= 2)
        .withColumn(
            "prs",
            F.expr(
                "flatten(transform(ss, (x, i) ->"
                " transform(slice(ss, i + 2, size(ss) - i - 1),"
                " y -> struct(x AS s1, y AS s2))))"
            ),
        )
        .select(F.explode("prs").alias("p"))
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        ov.join(per.select(F.col("source").alias("s1"), F.col("n").alias("n_s1")), "s1")
        .join(per.select(F.col("source").alias("s2"), F.col("n").alias("n_s2")), "s2")
        .select(
            "s1", "s2", "n_shared", "n_s1", "n_s2",
            # half_up, not F.round: int/int ratios CAN tie at the 6th
            # decimal (x34's half-up-vs-half-even class).
            half_up(
                F.col("n_shared") / F.least("n_s1", "n_s2"), 6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# X46 — incremental ingestion dedup: the production shape where a new
# crawl batch is deduplicated against the ALREADY-INGESTED corpus
# plus itself, without ever re-deduplicating the corpus. Incoming =
# doc_id % 5 == 0 (a deterministic 20% "new batch"); the dedup key is
# the 8-word leading-content fingerprint (normalized prefix — the
# near-exact key crawl pipelines block on). Each incoming doc is
# classified: `dup_of_corpus` (key already ingested — drop),
# `dup_in_batch` (an earlier incoming doc_id claimed the key — drop),
# `new` (survives).
#
# Scale: the corpus side reduces to DISTINCT keys before the join —
# the incoming batch (small) joins corpus keys (large but
# one-column); within-batch arbitration is a window over the
# incoming batch only, never the corpus. Corpus keys would be a
# bucketed/Bloom-backed table in production; the semantics here are
# the exact version.
# ---------------------------------------------------------------------------
_X46_PREFIX_WORDS = 8


@register(
    "x46_incremental_dedup",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             array_to_string(
               list_slice(str_split(text, ' '), 1, {_X46_PREFIX_WORDS}),
               ' ') AS key
      FROM documents
    ), inc AS (
      SELECT doc_id, key FROM k WHERE doc_id % 5 = 0
    ), corpus AS (
      SELECT DISTINCT key FROM k WHERE doc_id % 5 <> 0
    )
    SELECT i.doc_id,
           CASE WHEN c.key IS NOT NULL THEN 'dup_of_corpus'
                WHEN EXISTS (SELECT 1 FROM inc i2
                             WHERE i2.key = i.key AND i2.doc_id < i.doc_id)
                  THEN 'dup_in_batch'
                ELSE 'new' END AS verdict
    FROM inc i LEFT JOIN corpus c ON i.key = c.key
    """,
)
def x46_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    keyed = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ", F.slice(F.split("text", " "), 1, _X46_PREFIX_WORDS)
        ).alias("key"),
    )
    inc = keyed.filter(F.col("doc_id") % 5 == 0)
    corpus = keyed.filter(F.col("doc_id") % 5 != 0).select("key").distinct()
    w = Window.partitionBy("key")
    return (
        inc.join(
            corpus.select(F.col("key").alias("ckey")),
            inc.key == F.col("ckey"),
            "left",
        )
        .withColumn("first_in_batch", F.min("doc_id").over(w))
        .select(
            "doc_id",
            F.when(F.col("ckey").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("doc_id") > F.col("first_in_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# X48 — survivorship election after dedup: clustering (x17) says
# which docs are duplicates; a curation pipeline must then pick ONE
# canonical representative per cluster and discard the rest. The
# rule here is the standard fitness tuple — longest text first, then
# smallest doc_id as the deterministic tiebreak — implemented as one
# row_number per cluster (prefix-block key, same blocking as x17)
# on the planted-duplicate corpus. Emits per cluster: the winner,
# member count, and discarded count; clusters of one are the
# already-unique majority and are filtered to keep the result the
# interesting rows. One shuffle keyed on the cluster block.
# ---------------------------------------------------------------------------
@register(
    "x48_dedup_survivorship",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- planted duplicates take ids from the negative range, which no
      -- genuine doc_id (>= 0) can occupy at ANY scale factor; an
      -- additive offset like +1000000 would silently collide past 1M
      -- rows
      SELECT -doc_id - 1, concat(text, ' zz')
      FROM documents WHERE doc_id % 20 = 0
    ), keyed AS (
      SELECT doc_id, length(text) AS n_chars,
             md5(substr(text, 1, 40)) AS blk
      FROM corpus
    ), ranked AS (
      SELECT doc_id, n_chars, blk,
             row_number() OVER (PARTITION BY blk
               ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY blk) AS n_members
      FROM keyed
    )
    SELECT blk AS cluster_key, doc_id AS canonical_doc,
           CAST(n_chars AS BIGINT) AS canonical_chars,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_members - 1 AS BIGINT) AS n_discarded
    FROM ranked WHERE rn = 1 AND n_members >= 2
    """,
)
def x48_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    # Synthetic ids from the negative range (-doc_id - 1): out-of-band
    # for every scale factor, unlike an additive offset.
    dups = docs.filter(F.col("doc_id") % 20 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    keyed = docs.unionByName(dups).select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.substring("text", 1, 40)).alias("blk"),
    )
    w = W.partitionBy("blk")
    ranked = keyed.select(
        "doc_id",
        "n_chars",
        "blk",
        F.row_number()
        .over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_members") >= 2)).select(
        F.col("blk").alias("cluster_key"),
        F.col("doc_id").alias("canonical_doc"),
        F.col("n_chars").alias("canonical_chars"),
        F.col("n_members").cast("long").alias("n_members"),
        (F.col("n_members") - 1).cast("long").alias("n_discarded"),
    )


# ---------------------------------------------------------------------------
# X56 — n-gram novelty: the MEASUREMENT side of decontamination.
# x22/x29 remove train docs that leak into eval; this scores, per
# held-out document, how much of it the training split has already
# seen — the shingle-overlap novelty metric run before accepting an
# eval set (or after a crawl refresh, to see what's actually new).
# Split is deterministic (doc_id % 10: 0-7 train, 8-9 val); score is
# the fraction of the val doc's DISTINCT word 3-shingles absent from
# the train shingle vocabulary, as an integer percentage.
#
# Scale: train vocabulary = one distinct on exploded shingles
# (linear, map-side pre-aggregated); the novelty check is a LEFT
# ANTI equi-join on the shingle string — shuffle-partitionable by
# shingle, never all-pairs, O(corpus tokens) end to end.
# ---------------------------------------------------------------------------
@register(
    "x56_ngram_novelty",
    oracle="""
    WITH tr AS (
      SELECT DISTINCT g
      FROM (
        SELECT unnest(list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))) AS g
        FROM (SELECT str_split(text, ' ') AS arr
              FROM documents WHERE doc_id % 10 < 8)
      )
    ), v AS (
      SELECT doc_id, unnest(shingles) AS g
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(arr) - 1),
                 i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
        FROM (SELECT doc_id, str_split(text, ' ') AS arr
              FROM documents WHERE doc_id % 10 >= 8)
      )
    )
    SELECT v.doc_id,
           count(*) AS n_shingles,
           CAST(count(*) FILTER (tr.g IS NULL) AS BIGINT) AS n_novel,
           CAST(100 * count(*) FILTER (tr.g IS NULL) // count(*) AS BIGINT)
             AS novelty_pct
    FROM v LEFT JOIN tr ON v.g = tr.g
    GROUP BY v.doc_id
    """,
)
def x56_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perf shape (7.2 s -> see SCALE.md): the val side is exploded
    # ONCE and marked with a single LEFT join (seen/not-seen), then
    # one groupBy(doc_id) computes both counts — the first cut ran a
    # left_anti plus a second explode-and-count and re-joined them.
    # Join/distinct keys are xxhash64 of the shingle (8-byte shuffle
    # rows instead of ~25-byte strings). A 64-bit collision would
    # undercount novelty by one; P(any collision) over the ~2.5M
    # distinct shingles at sf0.1 is ~2e-7, and the fixed-seed
    # testdata is verified collision-clean by the driver_sim hash
    # match at sf0.01/sf0.1 (string-keyed oracle). Swap back to the
    # string key if a corpus ever trips it.
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8)
    val = docs.filter(F.col("doc_id") % 10 >= 8)
    tr_vocab = (
        shingle3_exploded(train, distinct_per_doc=False)
        .select(F.xxhash64("g").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    v = shingle3_exploded(val).select(
        "doc_id", F.xxhash64("g").alias("h")
    )
    return (
        v.join(tr_vocab, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("cast(100 * n_novel div n_shingles as bigint)").alias(
                "novelty_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# D4 — probabilistic record linkage (Fellegi-Sunter-style weighted
# field agreement): the voter-file core task — match an incoming
# registration feed against the master list when no shared key
# exists, using per-field agreement weights instead of exact
# equality. The incoming feed is a deterministic perturbation of the
# master (name typo on every 3rd record, account-balance drift, a
# segment flip on every 5th), so ground truth is known and the score
# distribution is reproducible at any sf.
#
# Scale: candidate generation is a BLOCKED equi-join on
# (nationkey, name-digit-block) — the standard linkage blocking that
# bounds pair volume to sum of block sizes squared, never |A|x|B|.
# The block key is digits 1-6 of the 9-digit id (name positions
# 10-15): it changes every 1000 consecutive ids, so block sizes stay
# CONSTANT (~1000/nations rows) as the corpus grows — a prefix that
# includes only the constant 'Customer#000' stem would silently
# degenerate to nationkey-only blocking and go quadratic (measured:
# 54 s at sf0.1 before this key was chosen). The perturbation only
# ever touches the LAST name character, so the blocking digits are
# invariant and candidate recall on the planted truth is exactly 1.
# Scoring (levenshtein + integer
# field comparisons) runs map-side on candidate pairs only.
# Reference: the ETL upsert keyed on voter id (load.ts) — this is
# what replaces it when the id is absent.
# ---------------------------------------------------------------------------
@register(
    "d4_record_linkage",
    oracle="""
    WITH feed AS (
      SELECT c_custkey AS f_id,
             CASE WHEN c_custkey % 3 = 0
                  THEN substr(c_name, 1, len(c_name) - 1) || 'X'
                  ELSE c_name END AS f_name,
             c_nationkey AS f_nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'FLIPPED'
                  ELSE c_mktsegment END AS f_segment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               + (c_custkey % 7) * 100 AS f_bal_cents
      FROM customer
    ), cand AS (
      SELECT c.c_custkey, f.f_id,
             levenshtein(c.c_name, f.f_name) AS name_dist,
             CASE WHEN c.c_mktsegment = f.f_segment THEN 1 ELSE 0 END AS seg_eq,
             abs(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                 - f.f_bal_cents) AS bal_diff
      FROM customer c JOIN feed f
        ON c.c_nationkey = f.f_nationkey
       AND substr(c.c_name, 10, 6) = substr(f.f_name, 10, 6)
    )
    SELECT c_custkey, f_id,
           CAST(CASE WHEN name_dist = 0 THEN 50
                     WHEN name_dist <= 1 THEN 35 ELSE 0 END
                + 30 * seg_eq
                + CASE WHEN bal_diff <= 700 THEN 20 ELSE 0 END
             AS BIGINT) AS score,
           CAST(name_dist AS BIGINT) AS name_dist
    FROM cand
    WHERE CASE WHEN name_dist = 0 THEN 50
               WHEN name_dist <= 1 THEN 35 ELSE 0 END
          + 30 * seg_eq
          + CASE WHEN bal_diff <= 700 THEN 20 ELSE 0 END >= 70
    """,
)
def d4_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    feed = cust.select(
        F.col("c_custkey").alias("f_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("f_name"),
        F.col("c_nationkey").alias("f_nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("FLIPPED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("f_segment"),
        (
            F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
            + (F.col("c_custkey") % 7) * 100
        ).alias("f_bal_cents"),
    )
    # Repartition the master on the block key with an EXPLICIT
    # partition count: candidate scoring parallelism then equals the
    # core count, not the number of input files (locally the 15k-row
    # master is ONE parquet split — without this, every block's
    # levenshtein work lands on a single task; measured 6.3 s at
    # sf0.1). The explicit count matters: scoring is CPU-bound on
    # small bytes, exactly the shape AQE's size-based coalescing
    # mis-sizes, and a user-specified numPartitions is the documented
    # way to opt out. On a cluster both sides of a linkage join
    # co-partition on the block key anyway.
    cand = (
        cust.repartition(
            cust.sparkSession.sparkContext.defaultParallelism,
            F.col("c_nationkey"),
            F.expr("substr(c_name, 10, 6)"),
        )
        .join(
            feed,
            (cust.c_nationkey == feed.f_nationkey)
            & (
                F.expr("substr(c_name, 10, 6)")
                == F.expr("substr(f_name, 10, 6)")
            ),
        )
        # Any match needs the name: non-name fields score at most
        # 30 + 20 = 50 < 70, so name_dist <= 1 is a NECESSARY
        # condition — filter on it first so the remaining field
        # comparisons run only on survivors. The distance is
        # LET-BOUND through an inline generator (not a plain alias):
        # projection collapse otherwise re-inlines the levenshtein
        # into the filter AND every downstream reference (the score
        # CASE uses it twice, the output once — 4 evaluations per
        # pair in the collapsed plan, r7 sweep). The Generate is a
        # collapse barrier, so this is exactly ONE levenshtein per
        # candidate pair.
        .selectExpr(
            "c_custkey",
            "f_id",
            "c_mktsegment",
            "f_segment",
            "c_acctbal",
            "f_bal_cents",
            "inline(transform(array(levenshtein(c_name, f_name)),"
            " d -> named_struct('name_dist', d)))",
        )
        .filter(F.col("name_dist") <= 1)
        .select(
            "c_custkey",
            "f_id",
            "name_dist",
            F.when(F.col("c_mktsegment") == F.col("f_segment"), 1)
            .otherwise(0)
            .alias("seg_eq"),
            F.abs(
                F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
                - F.col("f_bal_cents")
            ).alias("bal_diff"),
        )
    )
    score = (
        F.when(F.col("name_dist") == 0, 50)
        .when(F.col("name_dist") <= 1, 35)
        .otherwise(0)
        + 30 * F.col("seg_eq")
        + F.when(F.col("bal_diff") <= 700, 20).otherwise(0)
    )
    return (
        cand.withColumn("score", score.cast("long"))
        .filter(F.col("score") >= 70)
        .select(
            "c_custkey",
            "f_id",
            "score",
            F.col("name_dist").cast("long").alias("name_dist"),
        )
    )


# ---------------------------------------------------------------------------
# X63 — Bloom-filter decontamination prefilter: before the exact
# fingerprint anti-join (x22) runs across a 100 TB corpus, a compact
# bit-set of the train-side fingerprints is broadcast and probes are
# screened map-side — only bloom-positive rows pay the shuffle. This
# key builds the bloom (m = 16384 bits, k = 2 hashes sliced from the
# md5 fingerprint), probes it with the eval split PLUS planted true
# members (every 40th train doc), and measures what the exact join
# then confirms: true members, bloom positives, and the false-
# positive rate in basis points — the calibration number that decides
# m and k before a production run.
#
# Engine bridge: hex-slice -> integer is Spark conv(s,16,10) and
# DuckDB CAST('0x'||s AS BIGINT) — both exact on 4 hex chars.
# Scale: the bit-set is <= m rows (bounded, broadcast); probing is
# two broadcast joins (map-side); ONLY the measurement harness's
# exact-truth join shuffles on the fingerprint, and that join is the
# very cost the bloom exists to avoid in production.
# ---------------------------------------------------------------------------
@register(
    "x63_bloom_prefilter",
    oracle="""
    WITH train AS (
      SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 < 8
    ), probes AS (
      SELECT md5(text) AS fp FROM documents WHERE doc_id % 10 >= 8
      UNION ALL
      SELECT md5(text) AS fp FROM documents
      WHERE doc_id % 10 < 8 AND doc_id % 40 = 0
    ), bits AS (
      SELECT DISTINCT b FROM (
        SELECT CAST('0x' || substr(fp, 1, 4) AS BIGINT) % 16384 AS b FROM train
        UNION ALL
        SELECT CAST('0x' || substr(fp, 5, 4) AS BIGINT) % 16384 AS b FROM train
      )
    ), marked AS (
      SELECT p.fp,
             CASE WHEN b1.b IS NOT NULL AND b2.b IS NOT NULL
                  THEN 1 ELSE 0 END AS bloom_pos,
             CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END AS is_member
      FROM probes p
      LEFT JOIN bits b1
        ON b1.b = CAST('0x' || substr(p.fp, 1, 4) AS BIGINT) % 16384
      LEFT JOIN bits b2
        ON b2.b = CAST('0x' || substr(p.fp, 5, 4) AS BIGINT) % 16384
      LEFT JOIN (SELECT DISTINCT fp FROM train) t ON t.fp = p.fp
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(is_member) AS BIGINT) AS n_members,
           CAST(sum(bloom_pos) AS BIGINT) AS n_bloom_pos,
           CAST(sum(CASE WHEN bloom_pos = 1 AND is_member = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN bloom_pos = 1 AND is_member = 0 THEN 1 ELSE 0
                    END) * 10000 // (count(*) - sum(is_member)) AS BIGINT)
             AS fp_rate_bp
    FROM marked
    """,
)
def x63_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 < 8).select(
        F.md5("text").alias("fp")
    )
    probes = (
        docs.filter(F.col("doc_id") % 10 >= 8)
        .select(F.md5("text").alias("fp"))
        .unionByName(
            docs.filter(
                (F.col("doc_id") % 10 < 8) & (F.col("doc_id") % 40 == 0)
            ).select(F.md5("text").alias("fp"))
        )
    )

    def slot(col: str, pos: int):
        return (
            F.conv(F.substring(col, pos, 4), 16, 10).cast("long") % 16384
        )

    bits = (
        train.select(slot("fp", 1).alias("b"))
        .unionByName(train.select(slot("fp", 5).alias("b")))
        .distinct()
    )
    marked = (
        probes.withColumn("b1", slot("fp", 1))
        .withColumn("b2", slot("fp", 5))
        .join(
            F.broadcast(bits.withColumnRenamed("b", "b1")).withColumn(
                "hit1", F.lit(1)
            ),
            "b1",
            "left",
        )
        .join(
            F.broadcast(bits.withColumnRenamed("b", "b2")).withColumn(
                "hit2", F.lit(1)
            ),
            "b2",
            "left",
        )
        .join(
            train.distinct().withColumn("is_m", F.lit(1)), "fp", "left"
        )
        .select(
            F.when(
                F.col("hit1").isNotNull() & F.col("hit2").isNotNull(), 1
            )
            .otherwise(0)
            .alias("bloom_pos"),
            F.coalesce("is_m", F.lit(0)).alias("is_member"),
        )
    )
    return marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("bloom_pos").cast("long").alias("n_bloom_pos"),
        F.sum(
            F.when((F.col("bloom_pos") == 1) & (F.col("is_member") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.expr(
            "cast(sum(case when bloom_pos = 1 and is_member = 0 then 1"
            " else 0 end) * 10000 div (count(*) - sum(is_member)) as bigint)"
        ).alias("fp_rate_bp"),
    )


# ---------------------------------------------------------------------------
# D5 — golden-record construction (field-wise survivorship): x48
# elects one whole ROW per cluster; real master-data merge is
# per-FIELD — each attribute takes its value from the highest-
# priority feed that has one. Two vendor feeds are derived
# deterministically from customer (feed 'a': authoritative but
# gappy — name missing on every 3rd key, segment on every 4th,
# balance on every 5th; feed 'b': complete but lower quality —
# lowercased names, UNKNOWN segments on even keys), and the golden
# record coalesces a-then-b per field. Spelled as ONE conditional
# aggregation per field over the unioned feeds — a single shuffle on
# the entity key, the scale shape (never K self-joins for K fields).
# ---------------------------------------------------------------------------
@register(
    "d5_golden_record",
    oracle="""
    WITH feeds AS (
      SELECT 'a' AS src, c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS name,
             CASE WHEN c_custkey % 4 = 0 THEN NULL
                  ELSE c_mktsegment END AS seg,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             END AS cents
      FROM customer
      UNION ALL
      SELECT 'b' AS src, c_custkey, lower(c_name) AS name,
             CASE WHEN c_custkey % 2 = 0 THEN 'UNKNOWN'
                  ELSE c_mktsegment END AS seg,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ), golden AS (
      SELECT c_custkey,
             coalesce(max(CASE WHEN src = 'a' THEN name END),
                      max(CASE WHEN src = 'b' THEN name END)) AS g_name,
             coalesce(max(CASE WHEN src = 'a' THEN seg END),
                      max(CASE WHEN src = 'b' THEN seg END)) AS g_seg,
             coalesce(max(CASE WHEN src = 'a' THEN cents END),
                      max(CASE WHEN src = 'b' THEN cents END)) AS g_cents,
             CASE WHEN max(CASE WHEN src = 'a' THEN name END) IS NULL
                  THEN 1 ELSE 0 END
             + CASE WHEN max(CASE WHEN src = 'a' THEN seg END) IS NULL
                    THEN 1 ELSE 0 END
             + CASE WHEN max(CASE WHEN src = 'a' THEN cents END) IS NULL
                    THEN 1 ELSE 0 END AS n_from_b
      FROM feeds GROUP BY c_custkey
    )
    SELECT g_seg,
           CAST(count(*) AS BIGINT) AS n_entities,
           CAST(sum(n_from_b) AS BIGINT) AS n_fields_from_b,
           CAST(sum(g_cents) AS BIGINT) AS sum_cents,
           CAST(sum(CASE WHEN g_name = lower(g_name) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lowercase_names
    FROM golden GROUP BY g_seg
    """,
)
def d5_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    cents = F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
    feed_a = cust.select(
        F.lit("a").alias("src"),
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, None)
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.when(F.col("c_custkey") % 5 == 0, None).otherwise(cents).alias(
            "cents"
        ),
    )
    feed_b = cust.select(
        F.lit("b").alias("src"),
        "c_custkey",
        F.lower("c_name").alias("name"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        cents.alias("cents"),
    )

    def pick(field: str):
        return F.coalesce(
            F.max(F.when(F.col("src") == "a", F.col(field))),
            F.max(F.when(F.col("src") == "b", F.col(field))),
        )

    def miss_a(field: str):
        return F.when(
            F.max(F.when(F.col("src") == "a", F.col(field))).isNull(), 1
        ).otherwise(0)

    golden = (
        feed_a.unionByName(feed_b)
        .groupBy("c_custkey")
        .agg(
            pick("name").alias("g_name"),
            pick("seg").alias("g_seg"),
            pick("cents").alias("g_cents"),
            (miss_a("name") + miss_a("seg") + miss_a("cents")).alias(
                "n_from_b"
            ),
        )
    )
    return golden.groupBy("g_seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("n_from_b").cast("long").alias("n_fields_from_b"),
        F.sum("g_cents").cast("long").alias("sum_cents"),
        F.sum(
            F.when(F.col("g_name") == F.lower("g_name"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_lowercase_names"),
    )


# ---------------------------------------------------------------------------
# X67 — dedup cluster-size profile: the distribution that tells you
# WHAT KIND of duplication a corpus has (a long tail of pairs = crawl
# mirrors; a few giant clusters = boilerplate template farms) and
# therefore which dedup strategy pays. Pure composition: x17's
# connected-components clusters rolled up twice (component -> size,
# size -> count), and the oracle wraps x17's recursive-CTE oracle the
# same way — the composition itself is the parity check.
#
# Scale: inherits x17's blocked-edge/bounded-iteration posture; the
# two rollups are on bounded keys (components, then sizes).
# ---------------------------------------------------------------------------
from voter_file_etl_spark.registry import ORACLE as _ORACLE_REG


@register(
    "x67_cluster_size_profile",
    oracle=f"""
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      FROM ({_ORACLE_REG["x17_dedup_clusters"]}) base
      GROUP BY component
    ) sizes
    GROUP BY cluster_size
    """,
)
def x67_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    sizes = (
        x17_dedup_clusters(spark, sf_dir)
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


# ---------------------------------------------------------------------------
# X70 — boilerplate line scrub: remove every line that recurs across
# >= 3 DISTINCT documents from ALL documents, then rebuild the text
# — the CCNet/RefinedWeb boilerplate pass (headers, footers, cookie
# banners repeat across a site's pages; x44 keeps the FIRST copy,
# this treats cross-doc recurrence as template noise and keeps
# NONE). Line model is x44's word-window line; the verdict per doc
# is (n_lines, n_dropped, md5 of the rebuilt text), so the oracle
# checks the reconstruction byte-for-byte, not just counts.
#
# Scale: global-stats-then-map — line frequencies are one partial/
# final distinct-count keyed on the line, the scrub is an equi-join
# of lines against the (small) boilerplate set, and the rebuild is
# one groupBy(doc_id). Never all-pairs; the frequency table is the
# only extra state and it shrinks with the >= 3 threshold.
# ---------------------------------------------------------------------------
@register(
    "x70_boilerplate_scrub",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id,
             CAST((s - 1) // {_X44_LINE} AS BIGINT) AS line_id,
             array_to_string(
               list_slice(str_split(text, ' '), s, s + {_X44_LINE} - 1),
               ' ') AS line
      FROM documents,
           unnest(generate_series(
             1, len(str_split(text, ' ')), {_X44_LINE})) AS u(s)
    ), boiler AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS n_docs
        FROM lines GROUP BY line
      ) WHERE n_docs >= 3
    ), kept AS (
      SELECT l.doc_id, l.line_id, l.line
      FROM lines l LEFT JOIN boiler b ON l.line = b.line
      WHERE b.line IS NULL
    ), rebuilt AS (
      SELECT doc_id,
             count(*) AS n_kept,
             string_agg(line, ' ' ORDER BY line_id) AS new_text
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_lines,
           CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
           md5(coalesce(r.new_text, '')) AS new_md5
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def x70_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.tables import t as _t

    lines = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("arr"))
        .select(
            "doc_id",
            "arr",
            F.explode(F.expr(f"sequence(1, size(arr), {_X44_LINE})")).alias(
                "s"
            ),
        )
        .select(
            "doc_id",
            F.expr(f"CAST((s - 1) div {_X44_LINE} AS BIGINT)").alias(
                "line_id"
            ),
            F.expr(f"concat_ws(' ', slice(arr, s, {_X44_LINE}))").alias(
                "line"
            ),
        )
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                lambda x: x["line"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.md5(F.coalesce("new_text", F.lit("")).cast("binary")).alias(
            "new_md5"
        ),
    )


# ---------------------------------------------------------------------------
# D6 — blocking-strategy evaluation (pair completeness + candidate
# volume): the record-linkage design audit d4 presupposes. For each
# candidate-generation strategy, two numbers decide everything:
# what fraction of TRUE matches survive the blocking (recall /
# pair completeness — lose them here and no scorer gets them back),
# and how many candidate pairs it generates (the cost). Evaluated
# against d4's planted truth (feed row f_id == master c_custkey)
# for d4's production blocking (nationkey + name digits 10-15,
# invariant under the planted last-char typo) and the naive
# segment blocking (provably loses every 5th record to the planted
# segment flip).
#
# Scale: recall is ONE linear equi-join of truth pairs to their
# block keys; candidate volume is the closed form sum(n_master *
# n_feed) over per-block counts — the quadratic pair set is NEVER
# materialized (counting it costs two bounded rollups + one
# equi-join on block keys).
# ---------------------------------------------------------------------------
@register(
    "d6_blocking_recall",
    oracle="""
    WITH feed AS (
      SELECT c_custkey AS f_id,
             CASE WHEN c_custkey % 3 = 0
                  THEN substr(c_name, 1, len(c_name) - 1) || 'X'
                  ELSE c_name END AS f_name,
             c_nationkey AS f_nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'FLIPPED'
                  ELSE c_mktsegment END AS f_segment
      FROM customer
    ), truth AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_nationkey = f.f_nationkey
                   AND substr(c.c_name, 10, 6) = substr(f.f_name, 10, 6)
                  THEN 1 ELSE 0 END AS kept1,
             CASE WHEN c.c_mktsegment = f.f_segment
                  THEN 1 ELSE 0 END AS kept2
      FROM customer c JOIN feed f ON f.f_id = c.c_custkey
    ), m1 AS (
      SELECT c_nationkey AS k1, substr(c_name, 10, 6) AS k2,
             count(*) AS n FROM customer GROUP BY 1, 2
    ), f1 AS (
      SELECT f_nationkey AS k1, substr(f_name, 10, 6) AS k2,
             count(*) AS n FROM feed GROUP BY 1, 2
    ), m2 AS (
      SELECT c_mktsegment AS k, count(*) AS n FROM customer GROUP BY 1
    ), f2 AS (
      SELECT f_segment AS k, count(*) AS n FROM feed GROUP BY 1
    )
    SELECT 'nation_name' AS strategy,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT sum(kept1) FROM truth) AS BIGINT) AS n_truth_kept,
           CAST((SELECT 10000 * sum(kept1) // count(*) FROM truth)
                AS BIGINT) AS recall_bp,
           CAST((SELECT sum(m1.n * f1.n) FROM m1
                 JOIN f1 ON m1.k1 = f1.k1 AND m1.k2 = f1.k2)
                AS BIGINT) AS n_candidates
    UNION ALL
    SELECT 'segment',
           CAST((SELECT count(*) FROM truth) AS BIGINT),
           CAST((SELECT sum(kept2) FROM truth) AS BIGINT),
           CAST((SELECT 10000 * sum(kept2) // count(*) FROM truth)
                AS BIGINT),
           CAST((SELECT sum(m2.n * f2.n) FROM m2
                 JOIN f2 ON m2.k = f2.k) AS BIGINT)
    """,
)
def d6_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    feed = cust.select(
        F.col("c_custkey").alias("f_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("f_name"),
        F.col("c_nationkey").alias("f_nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("FLIPPED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("f_segment"),
    )
    truth = cust.join(feed, feed.f_id == cust.c_custkey).select(
        F.when(
            (F.col("c_nationkey") == F.col("f_nationkey"))
            & (
                F.expr("substr(c_name, 10, 6)")
                == F.expr("substr(f_name, 10, 6)")
            ),
            1,
        )
        .otherwise(0)
        .alias("kept1"),
        F.when(F.col("c_mktsegment") == F.col("f_segment"), 1)
        .otherwise(0)
        .alias("kept2"),
    ).agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum("kept1").alias("k1"),
        F.sum("kept2").alias("k2"),
    ).transform(materialize)  # 1-row frame, referenced by BOTH strategy rows (r13)
    m1 = cust.groupBy(
        F.col("c_nationkey").alias("k1"),
        F.expr("substr(c_name, 10, 6)").alias("k2"),
    ).agg(F.count(F.lit(1)).alias("n"))
    f1 = feed.groupBy(
        F.col("f_nationkey").alias("k1"),
        F.expr("substr(f_name, 10, 6)").alias("k2"),
    ).agg(F.count(F.lit(1)).alias("n"))
    cand1 = m1.join(f1, ["k1", "k2"]).agg(
        F.sum(m1["n"] * f1["n"]).alias("n_candidates")
    )
    m2 = cust.groupBy(F.col("c_mktsegment").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    f2 = feed.groupBy(F.col("f_segment").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cand2 = m2.join(f2, "k").agg(
        F.sum(m2["n"] * f2["n"]).alias("n_candidates")
    )
    row1 = (
        truth.crossJoin(F.broadcast(cand1))
        .select(
            F.lit("nation_name").alias("strategy"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("k1").cast("long").alias("n_truth_kept"),
            F.expr("10000 * k1 div n_truth").alias("recall_bp"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )
    row2 = (
        truth.crossJoin(F.broadcast(cand2))
        .select(
            F.lit("segment").alias("strategy"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("k2").cast("long").alias("n_truth_kept"),
            F.expr("10000 * k2 div n_truth").alias("recall_bp"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )
    return row1.unionByName(row2)


# ---------------------------------------------------------------------------
# E4 — entity-resolution pipeline end-to-end (the reference's actual
# job, composed): perturbed registration feed -> blocked candidate
# generation (d4's constant-size blocks) -> Fellegi-Sunter scoring
# -> three-band triage (auto-match >= 70, clerical review 50-69,
# reject) -> survivorship merge for auto-matches. One funnel report
# with the count at every stage — the number an operations team
# watches nightly; any stage drifting (blocking recall loss, score
# distribution shift, review queue blowup) moves exactly one row.
#
# Unlike d4 (which needs only the >= 70 band and therefore
# pre-filters on the necessary name condition), the funnel scores
# EVERY candidate pair — the review band includes name-failed pairs
# that pass on segment + balance alone.
#
# Scale: identical posture to d4 — pair volume bounded by the
# constant-size blocks; scoring map-side on candidates; the funnel
# itself is a bounded union of 1-row aggregates.
# ---------------------------------------------------------------------------
@register(
    "e4_entity_resolution",
    oracle="""
    WITH feed AS (
      SELECT c_custkey AS f_id,
             CASE WHEN c_custkey % 3 = 0
                  THEN substr(c_name, 1, len(c_name) - 1) || 'X'
                  ELSE c_name END AS f_name,
             c_nationkey AS f_nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'FLIPPED'
                  ELSE c_mktsegment END AS f_segment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               + (c_custkey % 7) * 100 AS f_bal_cents
      FROM customer
    ), cand AS (
      SELECT c.c_custkey, f.f_id,
             CAST(CASE WHEN levenshtein(c.c_name, f.f_name) = 0 THEN 50
                       WHEN levenshtein(c.c_name, f.f_name) <= 1 THEN 35
                       ELSE 0 END
                  + 30 * (CASE WHEN c.c_mktsegment = f.f_segment
                               THEN 1 ELSE 0 END)
                  + CASE WHEN abs(CAST(floor(c.c_acctbal * 100 + 0.5)
                                       AS BIGINT) - f.f_bal_cents) <= 700
                         THEN 20 ELSE 0 END AS BIGINT) AS score
      FROM customer c JOIN feed f
        ON c.c_nationkey = f.f_nationkey
       AND substr(c.c_name, 10, 6) = substr(f.f_name, 10, 6)
    )
    SELECT 'master' AS stage,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n
    UNION ALL
    SELECT 'feed', (SELECT CAST(count(*) AS BIGINT) FROM feed)
    UNION ALL
    SELECT 'candidate_pairs', (SELECT CAST(count(*) AS BIGINT) FROM cand)
    UNION ALL
    SELECT 'auto_match_pairs',
           (SELECT CAST(count(*) AS BIGINT) FROM cand WHERE score >= 70)
    UNION ALL
    SELECT 'review_pairs',
           (SELECT CAST(count(*) AS BIGINT) FROM cand
            WHERE score >= 50 AND score < 70)
    UNION ALL
    SELECT 'feed_matched',
           (SELECT CAST(count(DISTINCT f_id) AS BIGINT) FROM cand
            WHERE score >= 70)
    """,
)
def e4_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    feed = cust.select(
        F.col("c_custkey").alias("f_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("f_name"),
        F.col("c_nationkey").alias("f_nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("FLIPPED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("f_segment"),
        (
            F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
            + (F.col("c_custkey") % 7) * 100
        ).alias("f_bal_cents"),
    )
    score = (
        F.when(F.col("name_dist") == 0, 50)
        .when(F.col("name_dist") <= 1, 35)
        .otherwise(0)
        + 30 * F.col("seg_eq")
        + F.when(F.col("bal_diff") <= 700, 20).otherwise(0)
    )
    cand = (
        cust.repartition(
            cust.sparkSession.sparkContext.defaultParallelism,
            F.col("c_nationkey"),
            F.expr("substr(c_name, 10, 6)"),
        )
        .join(
            feed,
            (cust.c_nationkey == feed.f_nationkey)
            & (
                F.expr("substr(c_name, 10, 6)")
                == F.expr("substr(f_name, 10, 6)")
            ),
        )
        .select(
            "f_id",
            F.levenshtein("c_name", "f_name").alias("name_dist"),
            F.when(F.col("c_mktsegment") == F.col("f_segment"), 1)
            .otherwise(0)
            .alias("seg_eq"),
            F.abs(
                F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")
                - F.col("f_bal_cents")
            ).alias("bal_diff"),
        )
        .withColumn("score", score.cast("long"))
        # Four funnel aggregates fan out of the scored candidates; one
        # eager materialization = one blocking join, not four (the a49
        # lineage-truncation pattern).
        .transform(materialize)
    )

    def row(stage, df):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(stage).alias("stage"), "n"
        )

    auto = cand.filter(F.col("score") >= 70)
    out = row("master", cust)
    for stage, df in [
        ("feed", feed),
        ("candidate_pairs", cand),
        ("auto_match_pairs", auto),
        ("review_pairs", cand.filter((F.col("score") >= 50) & (F.col("score") < 70))),
        ("feed_matched", auto.select("f_id").distinct()),
    ]:
        out = out.unionByName(row(stage, df))
    return out


# ---------------------------------------------------------------------------
# X88 — near-dup threshold sweep: how many candidate pairs would a
# dedup pass drop at each Jaccard threshold (50/60/70/80/90%)? The
# curve that picks the production threshold — too low over-merges,
# too high leaks duplicates — computed from x4's blocked candidate
# pairs with the jaccard quantized to integer bp BEFORE bucketing
# (floor(j·10000 + 0.5), engine-identical), then a cumulative count
# per threshold over the bounded 5-row rollup.
#
# Scale: identical pair-volume posture to x4 (same (lang,
# size-bucket) blocking, never all-pairs); the sweep itself is
# arithmetic over the bounded threshold table.
# ---------------------------------------------------------------------------
@register(
    "x88_threshold_sweep",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang,
             CAST(n_chars // 100 AS BIGINT) AS size_bucket,
             list_distinct(list_transform(range(1, length(text) - 1),
                 i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id % 5 = 0
    ), pairs AS (
      SELECT CAST(floor(
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / (len(a.grams) + len(b.grams)
                  - len(list_intersect(a.grams, b.grams)))
               * 10000 + 0.5) AS BIGINT) AS j_bp
      FROM g a JOIN g b
        ON a.lang = b.lang AND a.size_bucket = b.size_bucket
       AND a.doc_id < b.doc_id
    ), thresholds(thr_bp) AS (
      VALUES (5000), (6000), (7000), (8000), (9000)
    )
    SELECT CAST(t.thr_bp AS BIGINT) AS thr_bp,
           CAST(sum(CASE WHEN p.j_bp >= t.thr_bp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs_at_or_above
    FROM thresholds t CROSS JOIN pairs p
    GROUP BY t.thr_bp
    """,
)
def x88_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    # The trigram-set build (a length(text)-wide transform +
    # array_distinct per doc) feeds BOTH sides of the block self-join;
    # left lazy it executes twice, once per side. localCheckpoint
    # materializes it once (r13; A/B at sf0.1 on the x88 sweep:
    # 2.89 -> 2.70 s min-of-3 under equal load) — at scale this
    # halves the dominant map cost of the candidate-pair stage.
    g = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100).cast("long").alias("size_bucket"),
        F.expr(
            "array_distinct(transform(sequence(1, length(text) - 2),"
            " i -> substring(text, i, 3)))"
        ).alias("grams"),
    ).transform(materialize)
    a = g.select(
        F.col("doc_id").alias("id1"), "lang", "size_bucket",
        F.col("grams").alias("g1"),
    )
    b = g.select(
        F.col("doc_id").alias("id2"), "lang", "size_bucket",
        F.col("grams").alias("g2"),
    )
    # Let-bind the intersection size (same re-inlining pathology as
    # x4: two references = two array_intersect evaluations per pair).
    pairs = (
        a.join(b, ["lang", "size_bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .selectExpr(
            "inline(transform("
            "array(cast(size(array_intersect(g1, g2)) as double)),"
            " it -> named_struct('j_bp', cast(floor("
            "it / (size(g1) + size(g2) - it) * 10000 + 0.5d) as bigint))))"
        )
    )
    thresholds = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(5000,), (6000,), (7000,), (8000,), (9000,)], "thr_bp long"
        )
    )
    return (
        pairs.crossJoin(thresholds)
        .groupBy("thr_bp")
        .agg(
            F.sum(F.when(F.col("j_bp") >= F.col("thr_bp"), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs_at_or_above")
        )
    )


# ---------------------------------------------------------------------------
# X89 — dedup savings estimate: bytes reclaimed by exact dedup per
# source — every duplicate group keeps one copy, so savings =
# Σ (n−1)·bytes over groups — the storage/compute business case a
# dedup pass ships with (x79 counts duplicates; this prices them).
# Exact integers; group stats never materialize pair joins.
#
# Scale: one (source, hash) rollup with map-side combine, one
# bounded source rollup.
# ---------------------------------------------------------------------------
@register(
    "x89_dedup_savings",
    oracle="""
    WITH g AS (
      SELECT source, md5(text) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(max(octet_length(encode(text))) AS BIGINT) AS bytes
      FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(n * bytes) AS BIGINT) AS bytes_total,
           CAST(sum((n - 1) * bytes) AS BIGINT) AS bytes_saved,
           CAST(10000 * sum((n - 1) * bytes) // sum(n * bytes) AS BIGINT)
             AS savings_bp
    FROM g GROUP BY source
    """,
)
def x89_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    g = docs.groupBy(
        "source", F.md5("text").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.expr("octet_length(encode(text, 'UTF-8'))"))
        .cast("long")
        .alias("bytes"),
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.col("n") * F.col("bytes")).cast("long").alias("bytes_total"),
        F.sum((F.col("n") - 1) * F.col("bytes"))
        .cast("long")
        .alias("bytes_saved"),
        F.expr(
            "10000 * sum((n - 1) * bytes) div sum(n * bytes)"
        ).alias("savings_bp"),
    )


# ---------------------------------------------------------------------------
# D7 — duplicate-payment detection: two orders by the SAME customer
# for the SAME amount within 7 days are suspicious resubmissions —
# the payments-ops dedup every AP system runs. Pairs are canonical
# (earlier key first), self-pairs excluded, and the time band is
# checked AFTER an exact (custkey, cents) equi-join.
#
# Scale: blocking is exact equality on (custkey, cents) — the
# candidate set is the sum of squared group sizes of genuinely
# identical amounts per customer (tiny), never a value-band join
# across customers. The date predicate is a residual filter on that
# bounded candidate set.
# ---------------------------------------------------------------------------
@register(
    "d7_duplicate_payments",
    oracle="""
    WITH p AS (
      SELECT o_orderkey AS k, o_custkey AS c,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    )
    SELECT a.c AS custkey, a.cents,
           a.k AS first_key, b.k AS second_key,
           CAST(b.d - a.d AS BIGINT) AS gap_days
    FROM p a JOIN p b
      ON a.c = b.c AND a.cents = b.cents AND a.k < b.k
    WHERE abs(b.d - a.d) <= 7
    """,
)
def d7_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    p = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = p.select(
        F.col("k").alias("first_key"),
        F.col("c").alias("custkey"),
        "cents",
        F.col("d").alias("da"),
    )
    b = p.select(
        F.col("k").alias("second_key"),
        F.col("c").alias("custkey"),
        "cents",
        F.col("d").alias("db"),
    )
    return (
        a.join(b, ["custkey", "cents"])
        .filter(
            (F.col("first_key") < F.col("second_key"))
            & (F.abs(F.datediff("db", "da")) <= 7)
        )
        .select(
            "custkey",
            "cents",
            "first_key",
            "second_key",
            F.datediff("db", "da").cast("long").alias("gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# X97 — duplicate-aware training weights: instead of DROPPING
# duplicates (x1), keep every copy but weight it 1/n so the
# effective distribution matches the deduplicated corpus — the
# soft-dedup practice used when provenance or recency of individual
# copies matters. Weights are integer basis points with the REMAINDER
# assigned to the cluster's canonical (min doc_id) copy, so each
# cluster's weights sum to exactly 10000 — the same exactness
# discipline as a72's allocation.
#
# Scale: one hash rollup for cluster sizes, one co-partitioned join
# back; effective token mass is a map-side expression after it.
# ---------------------------------------------------------------------------
@register(
    "x97_soft_dedup_weights",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars, md5(text) AS sig FROM documents
    ), cl AS (
      SELECT sig, CAST(count(*) AS BIGINT) AS n,
             CAST(min(doc_id) AS BIGINT) AS canon
      FROM h GROUP BY sig
    )
    SELECT h.doc_id, cl.n AS n_copies,
           CAST(10000 // cl.n
                + CASE WHEN h.doc_id = cl.canon
                       THEN 10000 % cl.n ELSE 0 END AS BIGINT) AS weight_bp,
           CAST(h.n_chars * (10000 // cl.n
                + CASE WHEN h.doc_id = cl.canon
                       THEN 10000 % cl.n ELSE 0 END) // 10000 AS BIGINT)
             AS eff_chars
    FROM h JOIN cl ON h.sig = cl.sig
    """,
)
def x97_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "n_chars", F.md5(F.col("text").cast("binary")).alias("sig")
    )
    cl = h.groupBy("sig").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min("doc_id").cast("long").alias("canon"),
    )
    return h.join(cl, "sig").select(
        "doc_id",
        "n_copies",
        F.expr(
            "cast(10000 div n_copies + case when doc_id = canon"
            " then 10000 % n_copies else 0 end as bigint)"
        ).alias("weight_bp"),
        F.expr(
            "cast(n_chars * (10000 div n_copies + case when doc_id = canon"
            " then 10000 % n_copies else 0 end) div 10000 as bigint)"
        ).alias("eff_chars"),
    )


# ---------------------------------------------------------------------------
# D8 — the sampling trap in dedup estimation: duplicate RATE is a
# pairwise (quadratic) statistic, so a uniform 25% document sample
# sees only ~1/16 of duplicate pairs and systematically
# UNDERESTIMATES the rate a full pass finds (unlike x85's linear
# quality means, which sample fine). The key measures both rates per
# source and emits the bias — the number that tells a pipeline
# planner a cheap sample CANNOT size dedup savings (x89 needs the
# full pass).
#
# Scale: two hash rollups (full and sample-filtered); the sample
# gate is the deterministic md5 bucket (no nondeterministic
# sample()); nothing pairwise materializes.
# ---------------------------------------------------------------------------
@register(
    "d8_sample_dedup_bias",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT -doc_id - 1, source, text FROM documents WHERE doc_id % 4 = 0
    ), h AS (
      SELECT source, md5(text) AS sig,
             CAST({bucket} AS BIGINT) AS b
      FROM corpus
    ), full_r AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) - count(DISTINCT sig) AS BIGINT) AS n_dup
      FROM h GROUP BY source
    ), samp AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS s_docs,
             CAST(count(*) - count(DISTINCT sig) AS BIGINT) AS s_dup
      FROM h WHERE b < 25 GROUP BY source
    )
    SELECT f.source, f.n_docs,
           CAST(10000 * f.n_dup // f.n_docs AS BIGINT) AS full_dup_bp,
           CAST(CASE WHEN s.s_docs > 0
                THEN 10000 * s.s_dup // s.s_docs ELSE 0 END AS BIGINT)
             AS sample_dup_bp,
           CAST(10000 * f.n_dup // f.n_docs
                - CASE WHEN s.s_docs > 0
                       THEN 10000 * s.s_dup // s.s_docs ELSE 0 END
                AS BIGINT) AS bias_bp
    FROM full_r f LEFT JOIN samp s ON f.source = s.source
    """.format(
        bucket="(CAST(CASE WHEN ascii(substr(md5('s:' || CAST(doc_id AS"
        " VARCHAR)), 1, 1)) >= 97 THEN ascii(substr(md5('s:' ||"
        " CAST(doc_id AS VARCHAR)), 1, 1)) - 87 ELSE"
        " ascii(substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 48"
        " END AS BIGINT) * 16 + CAST(CASE WHEN ascii(substr(md5('s:' ||"
        " CAST(doc_id AS VARCHAR)), 2, 1)) >= 97 THEN"
        " ascii(substr(md5('s:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 87"
        " ELSE ascii(substr(md5('s:' || CAST(doc_id AS VARCHAR)), 2, 1))"
        " - 48 END AS BIGINT)) % 100"
    ),
)
def d8_sample_dedup_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # Planted redeliveries: every 4th doc arrives twice (negative-
    # range ids, the x48 out-of-band discipline), so the full pass
    # sees a ~20% duplicate rate for the sample to underestimate.
    corpus = docs.select("doc_id", "source", "text").unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (-F.col("doc_id") - 1).alias("doc_id"), "source", "text"
        )
    )
    h = corpus.select(
        "source",
        F.md5(F.col("text").cast("binary")).alias("sig"),
        F.expr(
            "cast(conv(substr(md5(cast(concat('s:', cast(doc_id as string))"
            " as binary)), 1, 2), 16, 10) as bigint) % 100"
        ).alias("b"),
    )
    full_r = h.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("sig"))
        .cast("long")
        .alias("n_dup"),
    )
    samp = (
        h.filter(F.col("b") < 25)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("s_docs"),
            (F.count(F.lit(1)) - F.countDistinct("sig"))
            .cast("long")
            .alias("s_dup"),
        )
    )
    return (
        full_r.join(samp, "source", "left")
        .select(
            "source",
            "n_docs",
            F.expr("cast(10000 * n_dup div n_docs as bigint)").alias(
                "full_dup_bp"
            ),
            F.expr(
                "cast(case when s_docs > 0 then 10000 * s_dup div s_docs"
                " else 0 end as bigint)"
            ).alias("sample_dup_bp"),
            F.expr(
                "cast(10000 * n_dup div n_docs - case when s_docs > 0"
                " then 10000 * s_dup div s_docs else 0 end as bigint)"
            ).alias("bias_bp"),
        )
    )
