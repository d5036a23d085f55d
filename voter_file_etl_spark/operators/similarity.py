"""Similarity search over embeddings (north-star suite).

X5 — embedding-cosine near-dup within a blocking key;
X6 — brute-force cosine top-k (the correctness baseline);
X7 — random-hyperplane LSH bucketing (the scale path: candidates
     come from an equi-join on the bucket id, never all-pairs).

All cosine math uses the quantized-integer scheme from
functions/vectors.py, so Spark and DuckDB agree bit-for-bit and
shuffle order cannot perturb results.

Scale notes: brute-force is O(Q·N) — fine for small query sets, the
baseline for recall measurement. The LSH path is O(N) map work plus
a bucket-collision join; the hyperplanes are ±1 vectors derived from
md5 at *plan build time* (Python constants embedded as literals), so
both engines and every executor see identical planes with no
broadcast needed. X5/X7 plant exact-duplicate copies of every 20th
vector so the detection path is provably exercised.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions import vectors as V
from voter_file_etl_spark.functions.intmath import floor_div_sql, half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.session import materialize
from voter_file_etl_spark.tables import t

_DIM = 64
_N_PLANES = 12
_NEAR_DUP_COS = 0.95
_TOP_K = 10
_N_QUERIES = 8


def _planes() -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — computed at plan-build
    time, embedded as literals in both engines' plans."""
    planes = []
    for p in range(_N_PLANES):
        coefs = []
        for d in range(_DIM):
            h = hashlib.md5(f"plane{p}_{d}".encode()).hexdigest()
            coefs.append(1 if h[0] in "89abcdef" else -1)
        planes.append(coefs)
    return planes


_PLANES = _planes()


def _corpus_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    # Planted exact copies take ids from the negative range (-id - 1,
    # an involution), which no genuine vec_id (>= 0) can occupy at ANY
    # scale factor — an additive offset would collide past 1M rows.
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (-F.col("vec_id") - 1).alias("vec_id"), "embedding", "label"
    )
    return (
        emb.select("vec_id", "embedding", "label")
        .unionByName(copies)
        .withColumn("qv", V.quantize("embedding"))
        .withColumn("nq", V.sq_norm("qv"))
    )


_CORPUS_SQL = f"""
    WITH base AS (
      SELECT vec_id, embedding, label FROM embeddings
      UNION ALL
      SELECT -vec_id - 1 AS vec_id, embedding, label FROM embeddings
      WHERE vec_id % 20 = 0
    ), corpus AS (
      SELECT vec_id, label,
             {V.quantize_sql_duckdb('embedding')} AS qv
      FROM base
    ), normed AS (
      SELECT vec_id, label, qv, {V.sq_norm_sql_duckdb('qv')} AS nq FROM corpus
    )
"""


# ---------------------------------------------------------------------------
# X5 — embedding near-dup: pairs within the same label block with
# quantized cosine >= threshold.
# ---------------------------------------------------------------------------
_BLOCK_CAP = 4096  # max rows per pandas group in the pair search


def bounded_block_pairs(
    corpus: DataFrame,
    block_col: str = "label",
    threshold: float = _NEAR_DUP_COS,
    cap: int = _BLOCK_CAP,
) -> DataFrame:
    """Exhaustive same-block near-dup pairs with a HARD per-task bound.

    The naive shape — one pandas group per block — is O(B²) inside a
    SINGLE task when a block is skewed, which is the real 100 TB
    failure mode (one straggling, OOMing executor). Here each block
    splits into ceil(2n/cap) round-robin sub-blocks (per-block
    row_number % nsub — a worst-case size bound, not an expected-case
    hash bound) and every sub-block PAIR (i <= j) becomes its own
    group: a row with sub s replicates once per counterpart
    sub-block, group (i, j) scores side-i x side-j with one int64
    Gram matmul, and no group ever holds more than ~cap rows
    regardless of skew or id distribution. Every same-block pair
    lands in exactly one group (the sorted sub pair), so results are
    identical
    to the unbounded form and the oracle is unchanged. Shuffle cost
    is O(N * nsub * dim) — the distributed price of all-pairs, paid
    in bounded tasks instead of one unbounded one.

    The integer dot / sqrt / divide sequence is bit-identical to the
    SQL expression, so DuckDB agrees to the last ulp.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    counts = corpus.groupBy(block_col).agg(F.count(F.lit(1)).alias("_bn"))
    # 2x oversplit: nsub = ceil(2n/cap) puts <= cap/2 (+1) rows in
    # every sub-block, so a pair group (two sub-blocks) never exceeds
    # ~cap rows; blocks <= cap/2 keep a single group.
    nsub = F.ceil(F.col("_bn") * 2 / F.lit(cap)).cast("int")
    sized = corpus.join(
        F.broadcast(counts.select(block_col, nsub.alias("_nsub"))), block_col
    )
    # Round-robin by per-block row_number, NOT by hash: hash sub-block
    # sizes are only an expected-case bound (an unlucky id set can
    # concentrate a sub-block), while row_number % nsub is a TRUE
    # worst-case cap — sizes differ by at most 1 regardless of the id
    # distribution. Costs one extra sort-shuffle on block_col; the
    # numbering pass is Spark's external sort (spill-safe), so no task
    # ever materializes a skewed block in memory.
    rn = F.row_number().over(W.partitionBy(block_col).orderBy("vec_id"))
    sub = F.pmod(rn - F.lit(1), F.col("_nsub")).cast("int")
    keyed = (
        sized.withColumn("_sub", sub)
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)))
        .select(
            block_col,
            F.least("_sub", "_k").alias("_si"),
            F.greatest("_sub", "_k").alias("_sj"),
            "_sub",
            "vec_id",
            "qv",
            "nq",
        )
    )

    def pair_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        A = np.stack(pdf["qv"].to_numpy()).astype("int64", copy=False)
        n = np.sqrt(pdf["nq"].to_numpy().astype("float64"))
        si, sj = int(pdf["_si"].iloc[0]), int(pdf["_sj"].iloc[0])
        if si == sj:
            # Exact int64 dot products (< 2^53, so the float64 cast
            # is exact); cosine = dot / (sqrt(na) * sqrt(nb)) in the
            # same op order as the SQL expression.
            cos = (A @ A.T).astype("float64") / np.outer(n, n)
            i1, i2 = np.triu_indices(len(ids), k=1)
        else:
            left = (pdf["_sub"].to_numpy() == si).nonzero()[0]
            right = (pdf["_sub"].to_numpy() == sj).nonzero()[0]
            cos = (A[left] @ A[right].T).astype("float64") / np.outer(
                n[left], n[right]
            )
            li, ri = np.meshgrid(
                np.arange(len(left)), np.arange(len(right)), indexing="ij"
            )
            g1, g2 = left[li.ravel()], right[ri.ravel()]
            flat = cos[li.ravel(), ri.ravel()]
            flip = ids[g1] > ids[g2]
            i1 = np.where(flip, g2, g1)
            i2 = np.where(flip, g1, g2)
            keep = flat >= threshold
            return pd.DataFrame(
                {"id1": ids[i1[keep]], "id2": ids[i2[keep]], "cos_sim": flat[keep]}
            )
        keep = cos[i1, i2] >= threshold
        return pd.DataFrame(
            {"id1": ids[i1[keep]], "id2": ids[i2[keep]], "cos_sim": cos[i1[keep], i2[keep]]}
        )

    return keyed.groupBy(block_col, "_si", "_sj").applyInPandas(
        pair_block, "id1 long, id2 long, cos_sim double"
    )


@register(
    "x5_embedding_dedup",
    oracle=_CORPUS_SQL
    + f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           {V.cosine_sql(V.dot_sql_duckdb('a.qv', 'b.qv'), 'a.nq', 'b.nq')} AS cos_sim
    FROM normed a JOIN normed b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {V.cosine_sql(V.dot_sql_duckdb('a.qv', 'b.qv'), 'a.nq', 'b.nq')}
          >= {_NEAR_DUP_COS}
    """,
)
def x5_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-local Gram matmul per (label x sub-block pair) group —
    see bounded_block_pairs for the skew-bounded shape. Shuffle is
    O(N * dim), compute is BLAS, and no task exceeds 2 * _BLOCK_CAP
    rows even if one label holds the whole corpus."""
    corpus = _corpus_spark(spark, sf_dir).select("vec_id", "label", "qv", "nq")
    return bounded_block_pairs(corpus)


# ---------------------------------------------------------------------------
# X6 — brute-force cosine top-k for a fixed query set (the exact
# baseline an ANN index is measured against).
# ---------------------------------------------------------------------------
@register(
    "x6_ann_topk",
    oracle=_CORPUS_SQL
    + f"""
    , scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {V.cosine_sql(V.dot_sql_duckdb('q.qv', 'c.qv'), 'q.nq', 'c.nq')} AS cos_sim
      FROM normed q JOIN normed c
        ON q.vec_id >= 0 AND q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM (SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= {_TOP_K}
    """,
)
def x6_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _x6_topk(_corpus_spark(spark, sf_dir))


def _x6_topk(corpus: DataFrame) -> DataFrame:
    """Brute-force top-k over an injected (vec_id, qv, nq, ...) corpus.

    Factored out (r14, VERDICT r13 #4) so composite graders (x39
    recall, x99 nDCG) can materialize the corpus ONCE and feed both
    the exact and the approximate pipeline — the registered x6 body
    is this function over a fresh corpus build, byte-identical."""
    from pyspark.sql import Window as W

    q = corpus.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < _N_QUERIES)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa"), F.col("nq").alias("na")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"), F.col("nq").alias("nb")
    )
    cos = V.cosine(V.dot_arrow("qa", "qb"), F.col("na"), F.col("nb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
    )


# ---------------------------------------------------------------------------
# X7 — random-hyperplane LSH: 12-bit sign bucket, candidates from the
# bucket equi-join, quantized-cosine verification.
# ---------------------------------------------------------------------------
def _lsh_oracle() -> str:
    plane_rows = "\n      UNION ALL ".join(
        f"SELECT {p} AS p, {_PLANES[p]} AS coef" for p in range(_N_PLANES)
    )
    dot_pc = (
        "CAST(list_sum(list_transform(range(1, len(n.qv) + 1), "
        "i -> n.qv[i] * pl.coef[i])) AS BIGINT)"
    )
    return (
        _CORPUS_SQL
        + f"""
    , planes AS (
      {plane_rows}
    ), bits AS (
      SELECT n.vec_id,
             CASE WHEN {dot_pc} >= 0 THEN CAST(1 AS BIGINT) << pl.p
                  ELSE 0 END AS bitval
      FROM normed n CROSS JOIN planes pl
    ), buckets AS (
      SELECT vec_id, CAST(sum(bitval) AS BIGINT) AS bucket FROM bits GROUP BY vec_id
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, b.bucket
      FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2, a.bucket,
           {V.cosine_sql(V.dot_sql_duckdb('a.qv', 'b.qv'), 'a.nq', 'b.nq')} AS cos_sim
    FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {V.cosine_sql(V.dot_sql_duckdb('a.qv', 'b.qv'), 'a.nq', 'b.nq')}
          >= {_NEAR_DUP_COS}
    """
    )


# ---------------------------------------------------------------------------
# X12 — IVF (inverted-file) ANN: coarse-quantize every vector to its
# nearest centroid cell, then search only within the query's cell
# (nprobe=1). Centroids here are the first _N_CELLS corpus vectors —
# a deterministic stand-in for the k-means codebook a production
# build step would produce; the cell-assignment and cell-local
# search plans are identical either way.
#
# Scale: assignment is a broadcast join against _N_CELLS centroids
# (map-side, O(N·C) dot products); the search join keys on cell_id,
# so candidate generation is an equi-join shuffle on cell — never
# the O(Q·N) cross join of x6. Recall is tuned by nprobe (probing
# the p nearest cells) — the plan shape does not change.
# ---------------------------------------------------------------------------
_N_CELLS = 16


def _ivf_oracle() -> str:
    return (
        _CORPUS_SQL
        + f"""
    , cents AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT n.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {V.cosine_sql(V.dot_sql_duckdb('n.qv', 'c.cqv'), 'n.nq', 'c.cnq')} DESC,
                          c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c
      ) WHERE rn = 1
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, a.cell
      FROM normed n JOIN assign a ON n.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, cell, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell,
             {V.cosine_sql(V.dot_sql_duckdb('q.qv', 'c.qv'), 'q.nq', 'c.nq')} AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {V.cosine_sql(V.dot_sql_duckdb('q.qv', 'c.qv'), 'q.nq', 'c.nq')} DESC,
                        c.vec_id) AS rank
      FROM wb q JOIN wb c ON q.cell = c.cell AND c.vec_id <> q.vec_id
      WHERE q.vec_id >= 0 AND q.vec_id < {_N_QUERIES}
    ) WHERE rank <= {_TOP_K}
    """
    )


def ivf_assign_cells(corpus: DataFrame) -> DataFrame:
    """Assign every (vec_id, qv, nq) row to its nearest-centroid cell.

    The _N_CELLS-row codebook is collected once (that IS the IVF
    pattern — the codebook is a broadcast constant, built offline by
    k-means at scale); assignment is one int64 matmul per Arrow batch
    map-side with zero shuffles. Shared by x12 (IVF ANN search) and
    x26 (SemDeDup cluster-level dedup)."""
    import numpy as np

    cent_rows = sorted(
        corpus.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < _N_CELLS)).collect(), key=lambda r: r.vec_id
    )
    cmat = np.stack([np.asarray(r.qv, dtype="int64") for r in cent_rows])
    cnorm = np.sqrt(np.array([r.nq for r in cent_rows], dtype="float64"))
    cids = np.array([r.vec_id for r in cent_rows], dtype="int64")

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["qv"].to_numpy()).astype("int64", copy=False)
            n = np.sqrt(pdf["nq"].to_numpy().astype("float64"))
            cos = (A @ cmat.T).astype("float64") / np.outer(n, cnorm)
            # argmax returns the first of tied maxima; centroids are
            # sorted by cent_id, matching ORDER BY cos DESC, cent_id.
            pdf = pdf.assign(cell=cids[np.argmax(cos, axis=1)])
            yield pdf[["vec_id", "cell", "qv", "nq"]]

    return corpus.mapInPandas(
        assign, "vec_id long, cell long, qv array<long>, nq long"
    )


@register("x12_ann_ivf", oracle=_ivf_oracle())
def x12_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF, BLAS-shaped: broadcast-codebook cell assignment
    (ivf_assign_cells), then cell-local search as one Gram matmul per
    cell via applyInPandas — the same shuffle-O(N·dim),
    compute-in-BLAS shape as x5. Every float op (int dot -> float64,
    sqrt, divide) matches the SQL expression tree, so results stay
    bit-identical to the oracle."""
    return _x12_ivf(_corpus_spark(spark, sf_dir).select("vec_id", "qv", "nq"))


def _x12_ivf(corpus: DataFrame) -> DataFrame:
    """IVF search over an injected (vec_id, qv, nq) corpus — the x6
    factoring, same motivation (one corpus build for x39/x99)."""
    import numpy as np
    import pandas as pd

    wb = ivf_assign_cells(corpus)

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        qmask = (ids >= 0) & (ids < _N_QUERIES)
        if not qmask.any():
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cell": [], "cos_sim": [], "rank": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "cell": "int64",
                      "cos_sim": "float64", "rank": "int32"})
        A = np.stack(pdf["qv"].to_numpy()).astype("int64", copy=False)
        n = np.sqrt(pdf["nq"].to_numpy().astype("float64"))
        cell = int(pdf["cell"].iloc[0])
        qi = np.nonzero(qmask)[0]
        cos = (A[qi] @ A.T).astype("float64") / np.outer(n[qi], n)
        out = {"query_id": [], "neighbor_id": [], "cell": [], "cos_sim": [], "rank": []}
        for row, q_idx in enumerate(qi):
            keep = np.arange(len(ids)) != q_idx
            order = np.lexsort((ids[keep], -cos[row, keep]))[:_TOP_K]
            nb, cs = ids[keep][order], cos[row, keep][order]
            out["query_id"].extend([ids[q_idx]] * len(nb))
            out["neighbor_id"].extend(nb)
            out["cell"].extend([cell] * len(nb))
            out["cos_sim"].extend(cs)
            out["rank"].extend(range(1, len(nb) + 1))
        return pd.DataFrame(out)

    return wb.groupBy("cell").applyInPandas(
        cell_topk, "query_id long, neighbor_id long, cell long, cos_sim double, rank int"
    )


def lsh_bucketed(corpus: DataFrame) -> DataFrame:
    """(vec_id, qv, nq, bucket): the 12-bit hyperplane sign signature,
    computed ROW-LOCALLY (r13, guide §2.4) — an indexed transform over
    the literal plane matrix folds the 12 sign bits into the bucket
    long in one map-side expression. The old shape posexploded 12 rows
    per vector (carrying qv through the Generate), re-aggregated them
    (a full corpus shuffle keyed on vec_id), and JOINED the buckets
    back to the corpus — one Generate + one Exchange + one join for a
    value computable in the scan stage. The result is localCheckpoint-
    ed: every caller self-joins it (both sides re-run the 12 x dim
    interpreted dot products otherwise). A/B min-of-3 at sf0.1 under
    equal load: 5.17 s (old x7) -> 1.80 s (row-local + checkpoint);
    row-local without the checkpoint was 3.17 s."""
    planes_lit = F.array(
        *[F.array(*[F.lit(c) for c in _PLANES[p]]) for p in range(_N_PLANES)]
    )
    bucket_sql = (
        "aggregate(transform(_planes, (coef, p) -> "
        "if(aggregate(zip_with(qv, coef, (x, c) -> x * CAST(c AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x) >= 0,"
        " shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        corpus.withColumn("_planes", planes_lit)
        .withColumn("bucket", F.expr(bucket_sql))
        .select("vec_id", "qv", "nq", "bucket")
        .transform(materialize)
    )


@register("x7_ann_lsh", oracle=_lsh_oracle())
def x7_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    wb = lsh_bucketed(_corpus_spark(spark, sf_dir))
    a = wb.select(
        F.col("vec_id").alias("id1"), "bucket", F.col("qv").alias("qa"), F.col("nq").alias("na")
    )
    b = wb.select(
        F.col("vec_id").alias("id2"), "bucket", F.col("qv").alias("qb"), F.col("nq").alias("nb")
    )
    cos = V.cosine(V.dot_arrow("qa", "qb"), F.col("na"), F.col("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "bucket", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _NEAR_DUP_COS)
    )


# ---------------------------------------------------------------------------
# X26 — SemDeDup-style cluster-level semantic dedup (Abbas et al.
# 2023): coarse-cluster the embedding space, find near-duplicate
# pairs ONLY within each cluster cell, take connected components of
# the pair graph, and keep one canonical representative (the minimum
# vec_id) per component. This is the step that turns pairwise
# embedding similarity into actual keep/drop curation decisions at
# corpus scale.
#
# Scale: cell assignment is the broadcast-codebook matmul
# (ivf_assign_cells, zero shuffles); the pair search is
# bounded_block_pairs keyed on cell — O(N·dim) shuffle, BLAS
# compute, hard per-task row cap even for a skewed cell; components
# are min-label propagation (shuffles keyed on node id, rounds =
# component diameter). No stage ever materializes the corpus on one
# machine.
# ---------------------------------------------------------------------------
def _semdedup_oracle() -> str:
    return (
        _CORPUS_SQL.replace("WITH base", "WITH RECURSIVE base", 1)
        + f"""
    , cents AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT n.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {V.cosine_sql(V.dot_sql_duckdb('n.qv', 'c.cqv'), 'n.nq', 'c.cnq')} DESC,
                          c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c
      ) WHERE rn = 1
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, a.cell
      FROM normed n JOIN assign a ON n.vec_id = a.vec_id
    ), pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM wb a JOIN wb b ON a.cell = b.cell AND a.vec_id <> b.vec_id
      WHERE {V.cosine_sql(V.dot_sql_duckdb('a.qv', 'b.qv'), 'a.nq', 'b.nq')}
            >= {_NEAR_DUP_COS}
    ), reach(node, label) AS (
      SELECT DISTINCT src AS node, src AS label FROM pairs
      UNION
      SELECT p.dst AS node, r.label
      FROM reach r JOIN pairs p ON r.node = p.src
    ), comp AS (
      SELECT node, min(label) AS component FROM reach GROUP BY node
    )
    SELECT w.vec_id, w.cell,
           coalesce(c.component, w.vec_id) AS cluster,
           coalesce(c.component, w.vec_id) = w.vec_id AS is_kept
    FROM wb w LEFT JOIN comp c ON w.vec_id = c.node
    """
    )


@register("x26_semdedup", oracle=_semdedup_oracle())
def x26_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from voter_file_etl_spark.operators.graph import connected_components

    corpus = _corpus_spark(spark, sf_dir).select("vec_id", "qv", "nq")
    wb = ivf_assign_cells(corpus).persist()
    pairs = bounded_block_pairs(wb, block_col="cell").select("id1", "id2")
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).unionByName(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    comp = connected_components(edges)
    return (
        wb.join(comp, wb.vec_id == comp.node, "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce("component", "vec_id").alias("cluster"),
            (F.coalesce("component", "vec_id") == F.col("vec_id")).alias("is_kept"),
        )
    )


# ---------------------------------------------------------------------------
# X30 — k-means codebook training (Lloyd's algorithm, 2 iterations):
# the OFFLINE step that produces the IVF codebook x12/x26 consume.
# Initialization is deterministic (the first _N_CELLS corpus
# vectors); each iteration is (a) assign: broadcast-centroid argmax
# cosine, (b) update: element-wise integer mean of the assigned
# quantized vectors. Integer means (exact BIGINT sums, truncating
# div — both engines truncate toward zero) keep every centroid
# coordinate bit-identical across engines and shuffle orders, the
# same determinism-by-quantization policy as the rest of the vector
# suite. Output: per final cell, the member count and the quantized
# inertia (micro-units of 1-cos, summed as exact integers).
#
# Scale: per iteration, assignment is a broadcast join (centroids
# are O(cells)) + one argmax window keyed on vec_id; the update is
# one partial+final agg keyed on (cell, dim). Iterations are a
# driver-side loop over DataFrame plans — nothing is collected but
# the tiny codebook.
# ---------------------------------------------------------------------------
def _kmeans_assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax-cosine cell assignment: (vec_id, qv, nq, cell, cos).

    r13: the argmax is a max-struct AGGREGATE, not a row_number
    window — max(struct(cos, -cent_id, ...)) picks the same winner
    (highest cos, lowest cent_id on ties) but gets a map-side
    partial max: with the centroids broadcast, every scored row of a
    vector sits in one task, so exactly ONE row per vector reaches
    the shuffle instead of corpus x n_cells rows (guide §2.3)."""
    scored = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "cos", V.cosine(V.dot("qv", "cqv"), F.col("nq"), F.col("cnq"))
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos"),
                    (-F.col("cent_id")).alias("_neg_cent"),
                    F.col("cent_id"),
                    F.col("qv"),
                    F.col("nq"),
                )
            ).alias("_w")
        )
        .select(
            "vec_id",
            F.col("_w.qv").alias("qv"),
            F.col("_w.nq").alias("nq"),
            F.col("_w.cent_id").alias("cell"),
            F.col("_w.cos").alias("cos"),
        )
    )


def _kmeans_update(assigned: DataFrame) -> DataFrame:
    """Element-wise integer-mean centroids: (cent_id, cqv, cnq)."""
    sums = (
        assigned.select("cell", F.posexplode("qv").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"))
    )
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    cent = (
        sums.join(counts, "cell")
        .withColumn("m", F.expr("s div n"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
            ).alias("cqv")
        )
        .select(F.col("cell").alias("cent_id"), "cqv", V.sq_norm("cqv").alias("cnq"))
    )
    return cent


def _kmeans_oracle() -> str:
    cos0 = V.cosine_sql(V.dot_sql_duckdb("n.qv", "c.cqv"), "n.nq", "c.cnq")
    return (
        _CORPUS_SQL
        + f"""
    , cents0 AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), a1 AS (
      SELECT vec_id, qv, cell FROM (
        SELECT n.vec_id, n.qv, c.cent_id AS cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {cos0} DESC, c.cent_id) AS rn
        FROM normed n CROSS JOIN cents0 c
      ) WHERE rn = 1
    ), sums AS (
      SELECT cell, i, CAST(sum(qv[i]) AS BIGINT) AS s
      FROM a1, unnest(range(1, len(qv) + 1)) AS t(i)
      GROUP BY cell, i
    ), counts AS (
      SELECT cell, count(*) AS n FROM a1 GROUP BY cell
    ), cent1 AS (
      SELECT cell AS cent_id,
             list(CAST(s // n AS BIGINT) ORDER BY i) AS cqv
      FROM sums JOIN counts USING (cell)
      GROUP BY cell
    ), cent1n AS (
      SELECT cent_id, cqv, {V.sq_norm_sql_duckdb('cqv')} AS cnq FROM cent1
    ), a2 AS (
      SELECT vec_id, cell, cos FROM (
        SELECT n.vec_id, c.cent_id AS cell, {cos0} AS cos,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {cos0} DESC, c.cent_id) AS rn
        FROM normed n CROSS JOIN cent1n c
      ) WHERE rn = 1
    )
    SELECT cell, count(*) AS n_assigned,
           CAST(sum(CAST({half_up_sql("(1 - cos) * 1000000", 0)} AS BIGINT))
                AS BIGINT) AS inertia_micro
    FROM a2 GROUP BY cell
    """
    )


@register("x30_kmeans_codebook", oracle=_kmeans_oracle())
def x30_kmeans_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_spark(spark, sf_dir).select("vec_id", "qv", "nq")
    cents = corpus.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < _N_CELLS)).select(
        F.col("vec_id").alias("cent_id"),
        F.col("qv").alias("cqv"),
        F.col("nq").alias("cnq"),
    )
    a1 = _kmeans_assign(corpus, cents)
    cent1 = _kmeans_update(a1)
    a2 = _kmeans_assign(corpus, cent1)
    # half_up, not F.round: cosine micro-quantization can land on a
    # .5 tie (x34's half-up-vs-half-even class).
    micro = half_up((F.lit(1) - F.col("cos")) * 1000000, 0).cast("bigint")
    return a2.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.sum(micro).cast("bigint").alias("inertia_micro"),
    )


# ---------------------------------------------------------------------------
# X39 — ANN recall evaluation: recall@k of the IVF index (x12)
# against the exact brute-force top-k (x6), per query — the
# measurement that justifies (or rejects) an index configuration
# before trusting it at 100 TB, where exact search exists only as a
# sampled audit. Recall loss here comes solely from nprobe=1 cell
# truncation, so the number is a real index property, not noise:
# both pipelines are bit-deterministic, making the recall itself
# oracle-checkable — an eval harness whose own correctness is
# verified.
#
# Scale: reuses the two production pipelines as-is, then one
# left join on (query, neighbor) + a per-query count — costs no more
# than running the index plus a k-row-per-query audit join.
# ---------------------------------------------------------------------------
def _x39_oracle() -> str:
    cos_qc = V.cosine_sql(V.dot_sql_duckdb("q.qv", "c.qv"), "q.nq", "c.nq")
    cos_nc = V.cosine_sql(V.dot_sql_duckdb("n.qv", "c.cqv"), "n.nq", "c.cnq")
    return (
        _CORPUS_SQL
        + f"""
    , exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_qc} DESC, c.vec_id) AS rank
        FROM normed q JOIN normed c
          ON q.vec_id >= 0 AND q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
      ) WHERE rank <= {_TOP_K}
    ), cents AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT n.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {cos_nc} DESC, c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c
      ) WHERE rn = 1
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, a.cell
      FROM normed n JOIN assign a ON n.vec_id = a.vec_id
    ), approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_qc} DESC, c.vec_id) AS rank
        FROM wb q JOIN wb c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        WHERE q.vec_id >= 0 AND q.vec_id < {_N_QUERIES}
      ) WHERE rank <= {_TOP_K}
    )
    SELECT e.query_id,
           count(*) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_matched,
           {half_up_sql("CAST(count(a.neighbor_id) AS DOUBLE) / count(*)", 6)}
             AS recall_at_k
    FROM exact e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    """
    )


@register("x39_ann_recall", oracle=_x39_oracle())
def x39_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The quantized corpus is built ONCE and materialized (r14,
    # VERDICT r13 #4): the exact brute-force list and the IVF list
    # both consume the same corpus leaf, so the embeddings scan +
    # planted-copy union + quantization run once instead of once per
    # sub-pipeline (and per self-join side inside each).
    corpus = (
        _corpus_spark(spark, sf_dir)
        .select("vec_id", "qv", "nq")
        .transform(materialize)
    )
    exact = _x6_topk(corpus).select("query_id", "neighbor_id")
    approx = _x12_ivf(corpus).select(
        "query_id", "neighbor_id", F.lit(True).alias("_hit")
    )
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    n_matched = F.sum(F.when(F.col("_hit"), 1).otherwise(0)).cast("bigint")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        n_matched.alias("n_matched"),
        # half_up, not F.round: int/int recall ratios (e.g. k=8
        # denominators) land exactly on .5 ties (x34's class).
        half_up(n_matched.cast("double") / F.count(F.lit(1)), 6).alias(
            "recall_at_k"
        ),
    )


# ---------------------------------------------------------------------------
# X47 — per-vector int8 symmetric quantization, the storage/serving
# compression step of every large embedding store (4x smaller than
# float32; FAISS/ScaNN's SQ8): scale = max|x| / 127 per vector,
# q_i = round-half-up(x_i / scale) in [-127, 127]. Entirely
# JVM-side array lambdas (transform/aggregate) over the embedding
# column — no UDF, no shuffle; the output is one row per vector.
# Cross-engine determinism: float32 -> float64 widening is exact,
# x/scale is one IEEE op with identical operand order both sides,
# round-half-up is floor(x + 0.5) (DuckDB round() is half-even —
# never use it cross-engine), and the reconstruction error is
# quantized per ELEMENT to integer 1e-12 units before the integer
# sum, so no float reduction order exists anywhere.
# ---------------------------------------------------------------------------
_X47_Q = "cast(floor(cast(x as double) / _scale + 0.5d) as bigint)"
_X47_RES = f"(cast(x as double) - {_X47_Q} * _scale)"
_X47_Q_DUCK = "CAST(floor(x::DOUBLE / _scale + 0.5) AS BIGINT)"
_X47_RES_DUCK = f"(x::DOUBLE - {_X47_Q_DUCK} * _scale)"


@register(
    "x47_embedding_quantize",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(list_sum(list_transform(embedding,
                x -> {_X47_Q_DUCK})) AS BIGINT) AS sum_q,
           CAST(list_sum(list_transform(embedding,
                x -> abs({_X47_Q_DUCK}))) AS BIGINT) AS l1_q,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor({_X47_RES_DUCK} * {_X47_RES_DUCK} * 1e12)
                          AS BIGINT))) AS BIGINT) AS err_q
    FROM (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
                 x -> abs(x::DOUBLE))), 1e-30) / 127.0 AS _scale
      FROM embeddings
    )
    """,
)
def x47_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").withColumn(
        "_scale",
        F.expr(
            "greatest(array_max(transform(embedding,"
            " x -> abs(cast(x as double)))), 1e-30d) / 127.0d"
        ),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.expr(
            f"aggregate(transform(embedding, x -> {_X47_Q}),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("sum_q"),
        F.expr(
            f"aggregate(transform(embedding, x -> abs({_X47_Q})),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("l1_q"),
        F.expr(
            f"aggregate(transform(embedding,"
            f" x -> cast(floor({_X47_RES} * {_X47_RES} * 1e12) as bigint)),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("err_q"),
    )


# ---------------------------------------------------------------------------
# X52 — grouped embedding mean-pool: one centroid vector per label
# (class prototypes / cluster summaries / the build step of a
# doc-level retrieval index). The scalable shape is DIMENSION-
# PARALLEL: posexplode each vector to (label, dim, q) rows —
# quantized to exact integers first — aggregate per (label, dim),
# and reassemble with array_agg ordered by dim. The shuffle key is
# (label, dim): at 100 TB this spreads one label's reduction over
# |dims| reducers instead of funneling whole vectors to one task,
# and the partial aggregation is map-side combinable. Mean is
# reported as exact integer-quantized sum + count (the caller
# divides); nothing float crosses the engine boundary.
# ---------------------------------------------------------------------------
@register(
    "x52_embedding_mean_pool",
    oracle="""
    WITH e AS (
      SELECT label, i AS dim,
             CAST(floor(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS q
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS u(i)
    ), agg AS (
      SELECT label, dim, sum(q) AS sq, count(*) AS n
      FROM e GROUP BY label, dim
    )
    SELECT label,
           CAST(max(n) AS BIGINT) AS n_vectors,
           CAST(sum(sq) AS BIGINT) AS sum_all_dims,
           CAST(max(CASE WHEN dim = 1 THEN sq END) AS BIGINT) AS dim0_sum,
           CAST(max(CASE WHEN dim = 2 THEN sq END) AS BIGINT) AS dim1_sum
    FROM agg GROUP BY label
    """,
)
def x52_embedding_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        t(spark, sf_dir, "embeddings")
        .select(
            "label",
            F.posexplode(
                F.expr(
                    "transform(embedding,"
                    " x -> cast(floor(cast(x as double) * 1000000) as bigint))"
                )
            ).alias("dim0", "q"),
        )
        .select("label", (F.col("dim0") + 1).alias("dim"), "q")
    )
    agg = e.groupBy("label", "dim").agg(
        F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    return agg.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.sum("sq").cast("long").alias("sum_all_dims"),
        F.max(F.when(F.col("dim") == 1, F.col("sq"))).alias("dim0_sum"),
        F.max(F.when(F.col("dim") == 2, F.col("sq"))).alias("dim1_sum"),
    )


# ---------------------------------------------------------------------------
# X53 — hard-negative mining: for each query vector, the top-k most
# similar vectors with a DIFFERENT label — the contrastive-training
# data prep step (hard negatives teach the margin; random negatives
# are too easy). Same broadcast-query brute-force shape as x6 (the
# exact-recall baseline; the IVF/LSH variants are the 100 TB scale
# path) with the label-mismatch predicate pushed into the join, so
# same-label pairs never reach the ranking window. Scoring is the
# engine-exact quantized cosine (functions/vectors.py).
# ---------------------------------------------------------------------------
@register(
    "x53_hard_negative_mining",
    oracle=_CORPUS_SQL
    + f"""
    , scored AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             {V.cosine_sql(V.dot_sql_duckdb('q.qv', 'c.qv'), 'q.nq', 'c.nq')}
               AS cos_sim
      FROM normed q JOIN normed c
        ON q.vec_id >= 0 AND q.vec_id < {_N_QUERIES} AND c.label <> q.label
    )
    SELECT query_id, query_label, negative_id, negative_label,
           cos_sim, rank
    FROM (SELECT *,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, negative_id)
                   AS rank
          FROM scored)
    WHERE rank <= {_TOP_K}
    """,
)
def x53_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    corpus = _corpus_spark(spark, sf_dir)
    q = corpus.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < _N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("qv").alias("qa"),
        F.col("nq").alias("na"),
    )
    c = corpus.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("qv").alias("qb"),
        F.col("nq").alias("nb"),
    )
    cos = V.cosine(V.dot_arrow("qa", "qb"), F.col("na"), F.col("nb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("negative_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "negative_id",
            "negative_label",
            cos.alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _TOP_K
    )


# ---------------------------------------------------------------------------
# X55 — embedding outlier filter: per label, flag the 3 vectors
# farthest from the label centroid — mislabeled / garbage-embedding
# screening before contrastive training (the vector-side sibling of
# x9's text quality score). Exact-integer discipline end to end:
# with per-label count n and per-dimension quantized sums S, the
# centroid-distance ranking uses the n²-scaled squared distance
#   score = n²·‖q‖² − 2n·(q·S) + ‖S‖²  ( = ‖n·q − S‖², all int64 )
# so no float division or mean ever crosses engines and shuffle
# order cannot move a rank.
#
# Scale: per-dimension sums via posexplode + (label, pos) partial
# aggregation — one shuffle of |V|·dim skinny rows with map-side
# combine; the O(labels) centroid table broadcasts back and scoring
# is map-side; final top-3 is a per-label window over pre-filtered
# rows. No all-pairs anything.
# ---------------------------------------------------------------------------
_X55_TOP = 3


@register(
    "x55_embedding_outlier",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, label,
             {V.quantize_sql_duckdb('embedding')} AS qv
      FROM embeddings
    ), nn AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM normed GROUP BY label
    ), dims AS (
      SELECT label, i, CAST(sum(qv[i]) AS BIGINT) AS s
      FROM normed, range(1, {_DIM} + 1) rng(i)
      GROUP BY label, i
    ), cent AS (
      SELECT label, list(s ORDER BY i) AS sv FROM dims GROUP BY label
    ), scored AS (
      -- HUGEINT throughout (r8, caught at sf1.0): centroid-sum
      -- components reach n*1e6, so n^2*|q|^2 and |sv|^2 (~2.6e20 at
      -- n=2000) overflow BIGINT inside the fold. The score is
      -- emitted // 1e6 (milli-unit^2) so the OUTPUT column also
      -- stays in int64 headroom to n ~ 2e5 per label.
      SELECT v.vec_id, v.label, nn.n,
             CAST((CAST(nn.n AS HUGEINT) * nn.n * {V.sq_norm_sql_duckdb_wide('qv')}
               - 2 * CAST(nn.n AS HUGEINT) * {V.dot_sql_duckdb_wide('qv', 'sv')}
               + {V.sq_norm_sql_duckdb_wide('sv')}) // 1000000 AS BIGINT) AS score
      FROM normed v JOIN cent USING (label) JOIN nn USING (label)
    )
    SELECT label, vec_id, score, n
    FROM (
      SELECT *, row_number() OVER (PARTITION BY label
                ORDER BY score DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {_X55_TOP}
    """,
)
def x55_embedding_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    normed = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", V.quantize("embedding").alias("qv"))
    )
    dims = (
        normed.select("label", F.posexplode("qv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").alias("s"))
    )
    cent = (
        dims.groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s))), x -> x.s)"
            ).alias("sv")
        )
    )
    nn = normed.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    # decimal(38,0) folds + milli-unit^2 output — see the oracle note
    # (sf1.0 overflow find, r8).
    nd = F.col("n").cast("decimal(18,0)")
    wide = (
        nd * nd * V.sq_norm_wide("qv")
        - F.lit(2).cast("decimal(18,0)") * nd * V.dot_wide("qv", "sv")
        + V.sq_norm_wide("sv")
    )
    scored = (
        normed.join(F.broadcast(cent), "label")
        .join(F.broadcast(nn), "label")
        .select(
            "label",
            "vec_id",
            "n",
            wide.alias("_w"),
        )
        .select(
            "label",
            "vec_id",
            "n",
            F.expr("CAST(_w DIV 1000000 AS BIGINT)").alias("score"),
        )
    )
    w = W.partitionBy("label").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _X55_TOP)
        .select("label", "vec_id", "score", "n")
    )


# ---------------------------------------------------------------------------
# X58 — cluster-balanced diversity sample: assign every vector to its
# nearest codebook centroid (x30's map-side broadcast argmax), then
# take m per cluster by content-stable hash rank — "cluster then
# sample evenly" diversity selection (the embedding-space analog of
# x14's stratified sample, with strata LEARNED from the data instead
# of taken from a column). Guards a training mix against one dense
# region of embedding space swamping the corpus share.
#
# Scale: assignment is zero-shuffle (O(cells) centroid broadcast +
# per-vec argmax window keyed on vec_id); the per-cluster top-m is
# one window over cluster-partitioned rows; the hash rank keeps the
# draw deterministic and stable under corpus growth (same property
# as x54's reservoir).
# ---------------------------------------------------------------------------
_X58_PER_CELL = 5


def _x58_oracle() -> str:
    cos0 = V.cosine_sql(V.dot_sql_duckdb("n.qv", "c.cqv"), "n.nq", "c.cnq")
    return (
        _CORPUS_SQL
        + f"""
    , cents0 AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), a1 AS (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, c.cent_id AS cell,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {cos0} DESC, c.cent_id) AS rn
        FROM normed n CROSS JOIN cents0 c
      ) WHERE rn = 1
    ), ranked AS (
      SELECT cell, vec_id,
             CAST(row_number() OVER (PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS cell_size
      FROM a1
    )
    SELECT cell, vec_id, rn, cell_size
    FROM ranked WHERE rn <= {_X58_PER_CELL}
    """
    )


@register("x58_diversity_sample", oracle=_x58_oracle())
def x58_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    corpus = _corpus_spark(spark, sf_dir).select("vec_id", "qv", "nq")
    cents = corpus.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < _N_CELLS)).select(
        F.col("vec_id").alias("cent_id"),
        F.col("qv").alias("cqv"),
        F.col("nq").alias("cnq"),
    )
    a1 = _kmeans_assign(corpus, cents).select("vec_id", "cell")
    w = W.partitionBy("cell")
    ranked = a1.select(
        "cell",
        "vec_id",
        F.row_number()
        .over(w.orderBy(F.md5(F.col("vec_id").cast("string")), F.asc("vec_id")))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1)).over(w).cast("long").alias("cell_size"),
    )
    return ranked.filter(F.col("rn") <= _X58_PER_CELL)


# ---------------------------------------------------------------------------
# X81 — embedding norm audit: per-label distribution of vector L2
# norms — the health screen that catches broken embedding batches
# (all-zero rows from a failed encoder, exploding norms from a
# missing normalization) before they poison similarity search.
# Elements quantize to milli-units FIRST (floor(e*1000 + 0.5),
# engine-identical), so the squared-norm sums are exact int64
# lambda arithmetic; per label we report count, zero-vector count,
# and min/mean/max of the quantized squared norm.
#
# Scale: pure codegen transform/aggregate lambda per row (no
# explode, no Python) + one bounded label rollup — x10's shape over
# embeddings.
# ---------------------------------------------------------------------------
@register(
    "x81_embedding_norm_audit",
    oracle="""
    WITH q AS (
      SELECT label,
             list_sum(list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                    * CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS BIGINT)))
               AS normsq
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN normsq = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(min(normsq) AS BIGINT) AS min_normsq,
           CAST(sum(normsq) // count(*) AS BIGINT) AS mean_normsq,
           CAST(max(normsq) AS BIGINT) AS max_normsq
    FROM q GROUP BY label
    """,
)
def x81_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        F.expr(
            "aggregate(transform(embedding,"
            " e -> cast(floor(cast(e as double) * 1000 + 0.5d) as bigint)"
            " * cast(floor(cast(e as double) * 1000 + 0.5d) as bigint)),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("normsq"),
    )
    return q.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("normsq") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.min("normsq").cast("long").alias("min_normsq"),
        F.expr("sum(normsq) div count(1)").alias("mean_normsq"),
        F.max("normsq").cast("long").alias("max_normsq"),
    )


# ---------------------------------------------------------------------------
# X94 — dominant principal component by power iteration: centi-
# quantize the embeddings, form the 64x64 Gram matrix G = Q^T Q, run
# three fixed synchronous iterations v <- normalize(G v) from the
# all-ones vector, and emit the component (milli-normalized) plus the
# Rayleigh-quotient eigenvalue estimate. The whole computation is
# EXACT BIGINT arithmetic (products bounded so no term exceeds 2^53),
# so both engines produce bit-identical vectors — the house rule that
# makes iterative linear algebra driver-checkable.
#
# Scale: the Gram matrix needs NO self-join — each vector emits its
# own 64x64 outer product map-side (two chained posexplodes over the
# quantized array) and one 4096-key map-side-combined groupBy
# aggregates the corpus. Iterations then run on O(d) / O(d^2) tables
# with the small side broadcast; per-iteration normalization uses a
# portable floor division (Spark div truncates, DuckDB // floors —
# the expression keeps all division operands nonnegative so both
# agree).
# ---------------------------------------------------------------------------
def _x94_iter_sql(k: int, prev: str) -> str:
    return f"""
    w{k} AS (
      SELECT g.i, CAST(sum(g.g * p.v) AS BIGINT) AS w
      FROM gram g JOIN {prev} p ON g.j = p.i GROUP BY g.i
    ), s{k} AS (SELECT max(abs(w)) AS s FROM w{k}),
    v{k} AS (
      SELECT i, CAST((case when (w * 1000) >= 0 then (w * 1000) // (s) else -(((-(w * 1000)) + (s) - 1) // (s)) end) AS BIGINT) AS v
      FROM w{k} CROSS JOIN s{k}
    )"""


@register(
    "x94_power_iteration_pc",
    oracle=f"""
    WITH lng AS (
      SELECT vec_id, CAST(i AS BIGINT) AS i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 100 + 0.5)
                  AS BIGINT) AS q
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ), gram AS (
      SELECT a.i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
      FROM lng a JOIN lng b ON a.vec_id = b.vec_id GROUP BY a.i, b.i
    ), v0 AS (
      SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM lng
    ),{_x94_iter_sql(1, "v0")},{_x94_iter_sql(2, "v1")},{_x94_iter_sql(3, "v2")},
    w4 AS (
      SELECT g.i, CAST(sum(g.g * p.v) AS BIGINT) AS w
      FROM gram g JOIN v3 p ON g.j = p.i GROUP BY g.i
    ), ray AS (
      SELECT CAST(sum(v3.v * w4.w) // sum(v3.v * v3.v) AS BIGINT) AS ray_q
      FROM v3 JOIN w4 ON v3.i = w4.i
    )
    SELECT v3.i AS dim, CAST(v3.v AS BIGINT) AS pc_milli, ray.ray_q
    FROM v3 CROSS JOIN ray
    """,
)
def x94_power_iteration_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The gram matrix is a TINY d x d frame but an EXPENSIVE subtree
    # (full embeddings scan + d^2 explode + aggregate). Materialize it
    # ONCE (iter_checkpoint, the graph-loop discipline): without the
    # truncation every mul() reference re-expands the build, and the
    # doubly-self-referencing iteration nests it EXPONENTIALLY — the
    # r12 final plan was 1021 physical nodes with 16 separate
    # embeddings scans; with gram + per-round w truncated it is ~60
    # nodes with ONE scan (plans/r13/x94_*). Same values, same oracle.
    from voter_file_etl_spark.session import iter_checkpoint

    gram = iter_checkpoint(_x94_gram_build(spark, sf_dir))
    v = gram.select("i").distinct().select(
        "i", F.lit(1000).cast("long").alias("v")
    )

    def mul(vec: DataFrame) -> DataFrame:
        return (
            gram.join(
                F.broadcast(vec.select(F.col("i").alias("j"), "v")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).cast("long").alias("w"))
        )

    for _ in range(3):
        # w is referenced twice per round (the max-|w| scale AND the
        # rescaled v) and v feeds the next round — truncate each
        # round's w so the plan stays linear in the round count.
        w = iter_checkpoint(mul(v))
        s = w.agg(F.max(F.abs(F.col("w"))).alias("s"))
        v = w.crossJoin(F.broadcast(s)).select(
            "i",
            F.expr(
                "cast(" + floor_div_sql("w * 1000", "s", "div")
                + " as bigint)"
            ).alias("v"),
        )
    w4 = mul(v)
    ray = (
        v.join(F.broadcast(w4), "i")
        .agg(
            F.expr(
                "cast(sum(v * w) div sum(v * v) as bigint)"
            ).alias("ray_q")
        )
    )
    return v.crossJoin(F.broadcast(ray)).select(
        F.col("i").alias("dim"),
        F.col("v").cast("long").alias("pc_milli"),
        "ray_q",
    )


def _x94_gram_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UN-materialized Gram subtree: per-row outer products (two
    chained Generates) into one (i, j) aggregate — never a long-table
    self-join. Factored out so tests can gate the BUILD plan shape
    directly (the registered key truncates it behind iter_checkpoint,
    so the final plan intentionally no longer shows the Generates —
    the _lpa_round gating pattern)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(cast(x as double) * 100.0d + 0.5d) as bigint))"
        ).alias("qarr"),
    )
    outer = emb.select(
        "qarr", F.posexplode("qarr").alias("p1", "q1")
    ).select(
        F.expr("cast(p1 + 1 as bigint)").alias("i"),
        "q1",
        F.posexplode("qarr").alias("p2", "q2"),
    )
    return (
        outer.select(
            "i", F.expr("cast(p2 + 1 as bigint)").alias("j"),
            (F.col("q1") * F.col("q2")).alias("qq"),
        )
        .groupBy("i", "j")
        .agg(F.sum("qq").cast("long").alias("g"))
    )


# ---------------------------------------------------------------------------
# X99 — NDCG@10 of the IVF path: x39 measures set recall; this
# grades the RANKING — graded gains (the true quantized cosine,
# clamped at 0) discounted by 1/log2(rank+1), normalized by the
# exact list's ideal DCG. The discounts are PRECOMPUTED integer
# micro-constants (log2 never executes in either engine), gains are
# floor-half-up micro-quantized cosines, so NDCG is exact integer
# arithmetic end to end — the x94 discipline applied to an IR
# metric.
#
# Scale: both inputs are the existing bounded per-query top-k
# tables; the metric is one groupBy(query_id) each plus a broadcast-
# size join.
# ---------------------------------------------------------------------------
_X99_DISC = [1000000, 630930, 500000, 430677, 386853,
             356207, 333333, 315465, 301030, 289065]


def _x99_disc_sql(rank: str) -> str:
    whens = " ".join(
        f"WHEN {r + 1} THEN {d}" for r, d in enumerate(_X99_DISC)
    )
    return f"(CASE {rank} {whens} ELSE 0 END)"


def _x99_gain_sql(cos: str) -> str:
    return f"greatest(CAST(floor(({cos}) * 1000000 + 0.5) AS BIGINT), 0)"


def _x99_oracle() -> str:
    cos_qc = V.cosine_sql(V.dot_sql_duckdb("q.qv", "c.qv"), "q.nq", "c.nq")
    cos_nc = V.cosine_sql(V.dot_sql_duckdb("n.qv", "c.cqv"), "n.nq", "c.cnq")
    return (
        _CORPUS_SQL
        + f"""
    , exact AS (
      SELECT query_id, rank, cos FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos_qc} AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_qc} DESC, c.vec_id) AS rank
        FROM normed q JOIN normed c
          ON q.vec_id >= 0 AND q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
      ) WHERE rank <= {_TOP_K}
    ), cents AS (
      SELECT vec_id AS cent_id, qv AS cqv, nq AS cnq FROM normed
      WHERE vec_id >= 0 AND vec_id < {_N_CELLS}
    ), assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT n.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {cos_nc} DESC, c.cent_id) AS rn
        FROM normed n CROSS JOIN cents c
      ) WHERE rn = 1
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, a.cell
      FROM normed n JOIN assign a ON n.vec_id = a.vec_id
    ), approx AS (
      SELECT query_id, rank, cos FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos_qc} AS cos,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_qc} DESC, c.vec_id) AS rank
        FROM wb q JOIN wb c ON q.cell = c.cell AND c.vec_id <> q.vec_id
        WHERE q.vec_id >= 0 AND q.vec_id < {_N_QUERIES}
      ) WHERE rank <= {_TOP_K}
    ), ideal AS (
      SELECT query_id,
             CAST(sum({_x99_disc_sql('rank')} * {_x99_gain_sql('cos')})
                  AS BIGINT) AS idcg
      FROM exact GROUP BY query_id
    ), got AS (
      SELECT query_id,
             CAST(sum({_x99_disc_sql('rank')} * {_x99_gain_sql('cos')})
                  AS BIGINT) AS dcg
      FROM approx GROUP BY query_id
    )
    SELECT i.query_id, i.idcg,
           CAST(coalesce(g.dcg, 0) AS BIGINT) AS dcg,
           CAST(10000 * coalesce(g.dcg, 0) // i.idcg AS BIGINT) AS ndcg_bp
    FROM ideal i LEFT JOIN got g ON i.query_id = g.query_id
    """
    )


@register("x99_ndcg_at_10", oracle=_x99_oracle())
def x99_ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc = F.element_at(
        F.array(*[F.lit(d).cast("long") for d in _X99_DISC]), F.col("rank")
    )
    gain = F.greatest(
        F.expr("cast(floor(cos_sim * 1000000 + 0.5d) as bigint)"), F.lit(0)
    )
    # One materialized corpus for both ranked lists (the x39 fold).
    corpus = (
        _corpus_spark(spark, sf_dir)
        .select("vec_id", "qv", "nq")
        .transform(materialize)
    )
    ideal = (
        _x6_topk(corpus)
        .select("query_id", (disc * gain).alias("t"))
        .groupBy("query_id")
        .agg(F.sum("t").cast("long").alias("idcg"))
    )
    got = (
        _x12_ivf(corpus)
        .select("query_id", "rank", "cos_sim")
        .filter((F.col("query_id") >= 0) & (F.col("query_id") < _N_QUERIES))
        .select("query_id", (disc * gain).alias("t"))
        .groupBy("query_id")
        .agg(F.sum("t").cast("long").alias("dcg"))
    )
    return (
        ideal.join(F.broadcast(got), "query_id", "left")
        .select(
            "query_id",
            "idcg",
            F.coalesce("dcg", F.lit(0)).cast("long").alias("dcg"),
            F.expr(
                "cast(10000 * coalesce(dcg, 0L) div idcg as bigint)"
            ).alias("ndcg_bp"),
        )
    )


# ---------------------------------------------------------------------------
# X100 — planted-duplicate MRR through the LSH path: every 20th
# vector has an exact planted copy (id -vec_id - 1, the x5/x7
# fixture); rank ALL of each original's same-bucket candidates by
# true cosine and report the copy's rank and reciprocal rank
# (micro). An identical vector always lands in the same bucket, so a
# missing or low-ranked copy can only mean a ranking bug — making
# this the sharpest ground-truth probe of the bucket path (x39/x99
# grade against the brute-force list; this grades against a KNOWN
# answer).
#
# Scale: candidates come from the bucket equi-join (never
# all-pairs); ranking windows partition per query; output is one row
# per planted query.
# ---------------------------------------------------------------------------
def _x100_oracle() -> str:
    plane_rows = "\n      UNION ALL ".join(
        f"SELECT {p} AS p, {_PLANES[p]} AS coef" for p in range(_N_PLANES)
    )
    dot_pc = (
        "CAST(list_sum(list_transform(range(1, len(n.qv) + 1), "
        "i -> n.qv[i] * pl.coef[i])) AS BIGINT)"
    )
    cos_ab = V.cosine_sql(V.dot_sql_duckdb("a.qv", "b.qv"), "a.nq", "b.nq")
    return (
        _CORPUS_SQL
        + f"""
    , planes AS (
      {plane_rows}
    ), bits AS (
      SELECT n.vec_id,
             CASE WHEN {dot_pc} >= 0 THEN CAST(1 AS BIGINT) << pl.p
                  ELSE 0 END AS bitval
      FROM normed n CROSS JOIN planes pl
    ), buckets AS (
      SELECT vec_id, CAST(sum(bitval) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ), wb AS (
      SELECT n.vec_id, n.qv, n.nq, b.bucket
      FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    ), cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {cos_ab} DESC, b.vec_id) AS rnk
      FROM wb a JOIN wb b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
      WHERE a.vec_id % 20 = 0 AND a.vec_id >= 0
    )
    SELECT query_id,
           CAST(rnk AS BIGINT) AS copy_rank,
           CAST(1000000 // rnk AS BIGINT) AS rr_micro
    FROM cand WHERE cand_id = -query_id - 1
    """
    )


@register("x100_planted_dup_mrr", oracle=_x100_oracle())
def x100_planted_dup_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # Row-local bucket signature + single materialization — see
    # lsh_bucketed (r13): the old explode/re-aggregate/join-back shape
    # here additionally re-ran per self-join side.
    wb = lsh_bucketed(_corpus_spark(spark, sf_dir))
    a = wb.filter(
        (F.col("vec_id") % 20 == 0) & (F.col("vec_id") >= 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        "bucket",
        F.col("qv").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = wb.select(
        F.col("vec_id").alias("cand_id"),
        "bucket",
        F.col("qv").alias("qb"),
        F.col("nq").alias("nb"),
    )
    cos = V.cosine(V.dot_arrow("qa", "qb"), F.col("na"), F.col("nb"))
    cand = (
        a.join(b, "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("c"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("c"), "cand_id")
            ),
        )
    )
    return cand.filter(
        F.col("cand_id") == -F.col("query_id") - 1
    ).select(
        "query_id",
        F.col("rnk").cast("long").alias("copy_rank"),
        F.expr("cast(1000000 div rnk as bigint)").alias("rr_micro"),
    )


# ---------------------------------------------------------------------------
# X102 — prefix-filtered set-similarity join (PPJoin's core idea):
# find user pairs whose event-cell SETS have Jaccard >= 0.5 WITHOUT
# comparing all pairs. Order every cell by global rarity; a pair at
# threshold t must share at least one cell inside each side's first
# (|A| - ceil(t*|A|) + 1) rarest cells, so candidates come from an
# equi-join on PREFIX cells only, then exact overlap verification on
# the bounded candidate set. The ORACLE is the brute-force
# definition (all pairs sharing any cell, exact Jaccard), so the
# driver check proves the prefix reduction exact, not just
# plausible — the j19/x38 discipline.
#
# Scale: prefix emission cuts each set's join fanout roughly in half
# at t=0.5 and concentrates it on RARE cells (small join groups).
# The cell space (4096) must comfortably exceed typical set sizes:
# with a saturated universe every set shares every cell and ALL
# pairs become candidates — prefix filtering prunes by rarity, and a
# universe with no rare cells has nothing to prune with — see the
# sparsity gate below;
# verification expands candidates by <= |A| via two equi-joins. The
# all-pairs shape never appears in the engine plan.
# ---------------------------------------------------------------------------
@register(
    "x102_prefix_filter_join",
    oracle="""
    WITH traj AS (
      SELECT DISTINCT user_id AS u, event_id % 4096 AS cell FROM events
      WHERE event_id % 29 = 0
    ), sz AS (
      SELECT u, CAST(count(*) AS BIGINT) AS n FROM traj GROUP BY u
    ), inter AS (
      SELECT a.u AS u1, b.u AS u2, CAST(count(*) AS BIGINT) AS ov
      FROM traj a JOIN traj b ON a.cell = b.cell AND a.u < b.u
      GROUP BY a.u, b.u
    )
    SELECT i.u1, i.u2, i.ov,
           CAST(10000 * i.ov // (s1.n + s2.n - i.ov) AS BIGINT) AS jac_bp
    FROM inter i
    JOIN sz s1 ON i.u1 = s1.u
    JOIN sz s2 ON i.u2 = s2.u
    WHERE 10000 * i.ov // (s1.n + s2.n - i.ov) >= 5000
    """,
)
def x102_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    # Sampled check-ins (~3% of events) keep each user's cell set
    # SPARSE relative to the 4096-cell universe — the regime where
    # set-similarity joins apply; dense sets (hundreds of cells per
    # user) make near-every pair a candidate no filter can prune
    # (measured: 11 s dense-64-cell, 5.2 s dense-4096, 1.5 s sparse at sf0.1).
    traj = (
        ev.filter(F.expr("event_id % 29 = 0"))
        .select(
            F.col("user_id").alias("u"),
            F.expr("event_id % 4096").alias("cell"),
        )
        .distinct()
    )
    sz = traj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n"))
    freq = traj.groupBy("cell").agg(F.count(F.lit(1)).alias("df"))
    ordered = freq.withColumn(
        "ord", F.row_number().over(W.orderBy("df", "cell"))
    ).select("cell", "ord")
    tr = (
        traj.join(F.broadcast(ordered), "cell")
        .join(sz, "u")
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("u").orderBy("ord"))
        )
        # prefix length for t=0.5: n - ceil(n/2) + 1
        .withColumn("plen", F.expr("n - ((n + 1) div 2) + 1"))
    )
    prefix = tr.filter(F.col("rn") <= F.col("plen")).select("u", "cell")
    a = prefix.select(F.col("u").alias("u1"), "cell")
    b = prefix.select(F.col("u").alias("u2"), "cell")
    cand = (
        a.join(b, "cell")
        .filter(F.col("u1") < F.col("u2"))
        .select("u1", "u2")
        .distinct()
    )
    # Exact overlap verification on candidates only: expand by u1's
    # cells, then equi-join against (u2, cell) membership.
    t2 = traj.select(F.col("u").alias("u2"), "cell")
    ov = (
        cand.join(traj.select(F.col("u").alias("u1"), "cell"), "u1")
        .join(t2, ["u2", "cell"])
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    s1 = sz.select(F.col("u").alias("u1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("u").alias("u2"), F.col("n").alias("n2"))
    return (
        ov.join(s1, "u1")
        .join(s2, "u2")
        .withColumn(
            "jac_bp", F.expr("cast(10000 * ov div (n1 + n2 - ov) as bigint)")
        )
        .filter(F.col("jac_bp") >= 5000)
        .select("u1", "u2", "ov", "jac_bp")
    )
