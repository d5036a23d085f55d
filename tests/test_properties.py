"""Property-based and randomized-reference tests.

Pure-Python components (codecs) get hypothesis property tests;
Spark-dependent components get seeded randomized comparisons against
independent pure-Python reference implementations (union-find,
bisection geohash, brute-force pair search) — one Spark job per
test, all examples batched into a single DataFrame.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from voter_file_etl_spark.functions.codecs import (
    decode_png,
    decode_wav_bytes,
    encode_png_gray8,
    parse_video_bytes,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    data=st.data(),
)
def test_png_roundtrip_any_size(w, h, data):
    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)))
    img = decode_png(encode_png_gray8(px, w, h))
    assert (img.width, img.height, img.channels) == (w, h, 1)
    assert img.pixels.reshape(-1).tobytes() == px


@settings(max_examples=50, deadline=None)
@given(data=st.data(), w=st.integers(1, 8), h=st.integers(1, 8))
def test_png_random_filters_roundtrip(w, h, data):
    # Encode each row with a RANDOM filter type; the decoder must
    # invert every combination.
    from voter_file_etl_spark.functions.codecs import _paeth, _png_chunk, _PNG_SIG

    target = np.array(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)),
        dtype=np.uint8,
    ).reshape(h, w)
    ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    rows, prev = [], np.zeros(w, dtype=int)
    for y in range(h):
        cur = target[y].astype(int)
        enc = bytearray()
        for x in range(w):
            left = cur[x - 1] if x > 0 else 0
            up = prev[x]
            ul = prev[x - 1] if x > 0 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: _paeth(left, up, ul)}[ftypes[y]]
            enc.append((cur[x] - pred) & 0xFF)
        rows.append(bytes([ftypes[y]]) + bytes(enc))
        prev = cur
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(payload).pixels.reshape(h, w).tolist() == target.tolist()


@settings(max_examples=50, deadline=None)
@given(n=st.integers(0, 8), data=st.data())
def test_vid0_roundtrip_any_count(n, data):
    frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=48, max_size=48)))
        for _ in range(n)
    ]
    payload = b"VID0" + bytes([n]) + b"".join(frames)
    out = parse_video_bytes(payload, 48)
    assert [f.tobytes() for f in out] == frames


@settings(max_examples=30, deadline=None)
@given(rate=st.sampled_from([8000, 16000, 48000]), data=st.data())
def test_wav_8bit_decode_matches_samples(rate, data):
    samples = data.draw(st.lists(st.integers(0, 255), min_size=1, max_size=64))
    body = bytes(samples)
    header = (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + rate.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + len(body).to_bytes(4, "little")
    )
    audio = decode_wav_bytes(header + body)
    assert audio.sample_rate == rate and audio.bits == 8
    # 8-bit PCM is unsigned; the decoder centers by -128.
    assert audio.samples.reshape(-1).tolist() == [s - 128 for s in samples]


# ---------------------------------------------------------------------------
# Seeded randomized reference comparisons (one Spark job per test).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_matches_union_find(spark, seed):
    from voter_file_etl_spark.operators.graph import connected_components

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 30, 25
    und = [tuple(map(int, rng.integers(0, n_nodes, 2))) for _ in range(n_edges)]

    parent = list(range(n_nodes))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in und:
        parent[find(a)] = find(b)
    touched = {v for e in und for v in e}
    root_min = {}
    for v in touched:
        root_min.setdefault(find(v), v)
        root_min[find(v)] = min(root_min[find(v)], v)
    expected = {(v, root_min[find(v)]) for v in touched}

    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    assert got == expected


def test_connected_components_long_path_converges(spark):
    # A 200-node path is the worst case for plain neighbor-min
    # propagation (eccentricity 199 from the min node); the
    # pointer-jump step must converge it within the default
    # max_iter=20 (O(log diameter)). Regression gate for the
    # round-4 rewrite of the iteration.
    from voter_file_etl_spark.operators.graph import connected_components

    n = 200
    und = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    assert got == {(i, 0) for i in range(n)}


def test_connected_components_directed_only_input(spark):
    # ADVICE r8 #3: the sum-equality convergence proof needs the node
    # set fixed from round 0, so labels seed from src UNION dst. A
    # directed-only edge list (no symmetrization) whose dst nodes
    # never appear as src is the adversarial case: before the fix,
    # round 1 grew the node set via nbr and the label sums compared
    # across DIFFERENT node sets. The chain 0->1->2->3 plus the
    # sink-only star 10->11,10->12 must label every node — including
    # pure sinks — and terminate at the true fixpoint.
    from voter_file_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12)], ["src", "dst"]
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    # Directed min-label propagation pushes labels src->dst only; with
    # the full node set seeded, every node holds the min label that
    # can REACH it (0 reaches 0..3; 10 reaches 11,12; 10 keeps itself).
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (10, 10), (11, 10), (12, 10)}


@pytest.mark.parametrize("seed", [0, 1])
def test_geohash_matches_bisection_reference(spark, seed):
    from pyspark.sql import functions as F

    from voter_file_etl_spark.functions.geohash import BASE32, geohash_col

    def ref_geohash(lat, lon, precision=8):
        lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
        bits, out, even = 0, [], True
        ch = 0
        while len(out) < precision:
            if even:
                mid = (lon_r[0] + lon_r[1]) / 2
                if lon >= mid:
                    ch = (ch << 1) | 1; lon_r[0] = mid
                else:
                    ch = ch << 1; lon_r[1] = mid
            else:
                mid = (lat_r[0] + lat_r[1]) / 2
                if lat >= mid:
                    ch = (ch << 1) | 1; lat_r[0] = mid
                else:
                    ch = ch << 1; lat_r[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(BASE32[ch]); bits = 0; ch = 0
        return "".join(out)

    rng = np.random.default_rng(seed)
    coords = [
        (float(lat), float(lon))
        for lat, lon in zip(rng.uniform(-89.9, 89.9, 100), rng.uniform(-179.9, 179.9, 100))
    ]
    df = spark.createDataFrame(coords, ["lat", "lon"])
    got = [
        r["gh"]
        for r in df.select(geohash_col(F.col("lat"), F.col("lon"), 8).alias("gh"))
        .collect()
    ]
    assert got == [ref_geohash(lat, lon) for lat, lon in coords]


@pytest.mark.parametrize("seed,cap", [(0, 8), (1, 6)])
def test_bounded_block_pairs_complete_vs_bruteforce(spark, seed, cap):
    # Every same-block pair meeting the threshold must appear exactly
    # once, no matter how the cap slices blocks into sub-groups.
    from itertools import combinations

    from voter_file_etl_spark.operators.similarity import bounded_block_pairs

    rng = np.random.default_rng(seed)
    n, dim = 40, 8
    rows = [
        (int(i), int(rng.integers(0, 3)),
         [int(x) for x in rng.integers(-5, 6, dim)])
        for i in range(n)
    ]
    thr = 0.8

    def cos(a, b):
        d = float(np.dot(a, b))
        return d / (np.sqrt(float(np.dot(a, a))) * np.sqrt(float(np.dot(b, b))))

    expected = set()
    for (i1, b1, v1), (i2, b2, v2) in combinations(rows, 2):
        if b1 == b2 and cos(np.array(v1), np.array(v2)) >= thr:
            expected.add((min(i1, i2), max(i1, i2)))

    df = spark.createDataFrame(
        [(i, b, v, int(np.dot(v, v))) for i, b, v in rows],
        "vec_id long, label int, qv array<long>, nq long",
    )
    got = {
        (r["id1"], r["id2"])
        for r in bounded_block_pairs(df, block_col="label", threshold=thr, cap=cap)
        .collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [0, 7])
def test_fastss_lev1_pairs_match_bruteforce(spark, seed):
    # The deletion-key equi-join must find EXACTLY the pairs a
    # brute-force O(V^2) levenshtein scan finds — on adversarial
    # vocab (tiny alphabet -> dense near-neighborhoods, repeated
    # letters -> same-key distance-2 collisions like 'aab'/'aba').
    from voter_file_etl_spark.plans.joins import fastss_lev1_pairs

    rng = np.random.default_rng(seed)
    vocab = sorted(
        {
            "".join(rng.choice(list("ab"), size=rng.integers(1, 5)))
            for _ in range(60)
        }
        | {
            "".join(rng.choice(list("abcde"), size=rng.integers(3, 7)))
            for _ in range(60)
        }
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if lev(a, b) <= 1
    }
    corpus = spark.createDataFrame([(w,) for w in vocab], ["w"])
    got = {
        (r["w1"], r["w2"]) for r in fastss_lev1_pairs(corpus).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [3, 17])
def test_fastss_lev1_id_pairs_match_bruteforce(spark, seed):
    # The id-keyed, blocked variant (d2's path) must find EXACTLY the
    # same-block id pairs a brute-force scan finds — including equal
    # names on different ids (the self-key case), duplicate names
    # within and across blocks, and empty-ish names. Same adversarial
    # vocabulary as the word-level test, plus random block labels.
    from voter_file_etl_spark.operators.dedup import fastss_lev1_id_pairs

    rng = np.random.default_rng(seed)
    words = ["".join(rng.choice(list("ab"), size=rng.integers(1, 5))) for _ in range(50)]
    words += ["".join(rng.choice(list("abcde"), size=rng.integers(3, 7))) for _ in range(50)]
    rows = [
        (i, words[rng.integers(0, len(words))], int(rng.integers(0, 3)))
        for i in range(120)
    ]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expected = {
        (r1[0], r2[0], lev(r1[1], r2[1]))
        for i, r1 in enumerate(rows)
        for r2 in rows[i + 1 :]
        if r1[2] == r2[2] and lev(r1[1], r2[1]) <= 1
    }
    df = spark.createDataFrame(rows, ["rid", "name", "blk"])
    got = {
        (r["id1"], r["id2"], r["name_dist"])
        for r in fastss_lev1_id_pairs(df, "rid", "name", "blk").collect()
    }
    assert got == expected


def test_k_core_reaches_fixpoint_within_bound(spark, sf_dir):
    # g7 runs a FIXED 4 peel rounds; the bounded unroll equals the
    # true 2-core only if the peel has converged — assert no
    # surviving node has degree < 2 (a 5th round would be a no-op).
    from voter_file_etl_spark import registry

    registry.load_all()
    out = registry.QUERIES["g7_k_core"](spark, sf_dir)
    assert out.filter(out.core_degree < 2).count() == 0


# ---------------------------------------------------------------------------
# Session-2 operator properties: brute-force references on random
# inputs for the interval-union sweep, the Luhn checksum lambda, and
# the streaming-top-k merge algebra.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interval_union_matches_bruteforce(spark, seed):
    # w19's window-sweep merge must equal the obvious O(n^2)
    # interval-union on arbitrary overlapping intervals.
    import random

    rng = random.Random(seed)
    rows = []
    for uid in range(5):
        for i in range(rng.randint(1, 12)):
            s = rng.randint(0, 1000)
            rows.append((uid, len(rows), s, s + rng.randint(1, 200)))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, s_us long, e_us long"
    )

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    order = [F.col("s_us"), F.col("e_us"), F.col("event_id")]
    w_prev = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.select(
        "user_id", "s_us", "e_us", "event_id",
        F.when(F.max("e_us").over(w_prev) >= F.col("s_us"), 0)
        .otherwise(1)
        .alias("new_island"),
    )
    w_run = (
        W.partitionBy("user_id").orderBy("s_us", "e_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    got = {
        (r["user_id"],): (r["covered"], r["n_islands"])
        for r in flagged.select(
            "user_id", "s_us", "e_us",
            F.sum("new_island").over(w_run).alias("g"),
        )
        .groupBy("user_id", "g")
        .agg(F.min("s_us").alias("s"), F.max("e_us").alias("e"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("e") - F.col("s")).alias("covered"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .collect()
    }

    # brute force: paint a number line
    byu: dict = {}
    for uid, _, s, e in rows:
        byu.setdefault(uid, []).append((s, e))
    for uid, ivs in byu.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged)
        assert got[(uid,)] == (covered, len(merged)), (uid, got[(uid,)])


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_luhn_formula_matches_reference(n):
    # The f13 column expression implements this exact arithmetic; the
    # reference is the textbook digit-walk.
    digits = str(n)
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    # mirror of the engine lambda
    total2 = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        v = 2 * d if i % 2 == 1 else d
        if i % 2 == 1 and v > 9:
            v -= 9
        total2 += v
    assert total == total2
    assert (total % 10 == 0) == (total2 % 10 == 0)


@pytest.mark.parametrize("seed", [0, 7])
def test_stream_topk_merge_algebra(seed):
    # st18's correctness rests on topk(A ∪ B) = topk(topk(A) ∪
    # topk(B)) under a total order — check on random splits.
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 10**6)) for i in range(500)]
    key = lambda r: (-r[1], r[0])  # noqa: E731
    k = 20
    full = sorted(rows, key=key)[:k]
    for _ in range(10):
        cut = rng.randint(0, len(rows))
        a, b = rows[:cut], rows[cut:]
        merged = sorted(
            sorted(a, key=key)[:k] + sorted(b, key=key)[:k], key=key
        )[:k]
        assert merged == full


# ---------------------------------------------------------------------------
# Session-3 wave: randomized references for the new algorithmic ops.
# ---------------------------------------------------------------------------

from voter_file_etl_spark import registry

registry.load_all()

_X95_WEIGHTS = [31**7, 31**6, 31**5, 31**4, 31**3, 31**2, 31, 1]


def _cdc_boundaries_ref(text: str) -> list[int]:
    """Slow per-position reference for x95's boundary rule."""
    n = len(text)
    out = []
    for p in range(8, n + 1):
        h = sum(
            ord(text[p - 8 + k]) * w for k, w in enumerate(_X95_WEIGHTS)
        )
        if h % 32 == 0:
            out.append(p)
    if not out or out[-1] != n:
        out.append(n)
    return out


@settings(max_examples=60, deadline=None)
@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=200))
def test_cdc_boundaries_match_slow_reference(s):
    # The numpy sliding-dot boundary detection in x95 must equal the
    # per-position polynomial evaluation, and chunks must concatenate
    # back to the document.
    codes = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.int64)
    w = np.array(_X95_WEIGHTS, dtype=np.int64)
    if len(codes) >= 8:
        h = np.convolve(codes, w[::-1], "valid")
        bpos = (np.nonzero(h % 32 == 0)[0] + 8).tolist()
    else:
        bpos = []
    if not bpos or bpos[-1] != len(s):
        bpos.append(len(s))
    assert bpos == _cdc_boundaries_ref(s)
    prev, chunks = 0, []
    for p in bpos:
        chunks.append(s[prev:p])
        prev = p
    assert "".join(chunks) == s and all(chunks)


def _portable_floor_div(num: int, den: int) -> int:
    """The SQL CASE expression from w30/x94, with TRUNCATING division
    (Spark `div` semantics) — must equal mathematical floor."""

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    if num >= 0:
        return trunc_div(num, den)
    return -trunc_div(-num + den - 1, den)


@settings(max_examples=200, deadline=None)
@given(num=st.integers(-10**15, 10**15), den=st.integers(1, 10**9))
def test_portable_floor_div_is_floor(num, den):
    import math

    assert _portable_floor_div(num, den) == math.floor(num / den) if abs(
        num
    ) < 2**52 else True
    # exact check independent of float precision:
    q = _portable_floor_div(num, den)
    assert q * den <= num < (q + 1) * den


def test_skyline_matches_bruteforce_reference(spark, sf_dir):
    # o7's two-level sweep vs an O(n^2) domination check computed
    # independently in pandas from the same parquet.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    days = (
        pdf["o_orderdate"].to_numpy().astype("datetime64[D]")
        - np.datetime64("1970-01-01", "D")
    ).astype(np.int64)
    pts = sorted(set(zip(cents.tolist(), days.tolist())))
    sky = set()
    for c, d in pts:
        dominated = any(
            (c2 <= c and d2 >= d and (c2 < c or d2 > d)) for c2, d2 in pts
        )
        if not dominated:
            sky.add((c, d))
    got = {
        (r["price_c"], (np.datetime64(r["order_date"], "D")
                        - np.datetime64("1970-01-01", "D")).astype(int))
        for r in registry.QUERIES["o7_skyline"](spark, sf_dir).collect()
    }
    assert got == sky


def test_power_iteration_matches_numpy_reference(spark, sf_dir):
    # x94 vs the identical algorithm run in numpy (independent
    # substrate): exact integer equality of the final vector.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.stack(
        [
            np.floor(np.asarray(e, dtype=np.float64) * 100 + 0.5).astype(
                np.int64
            )
            for e in pdf["embedding"]
        ]
    )
    g = q.T @ q  # exact: values well inside int64
    v = np.full(g.shape[0], 1000, dtype=object)
    for _ in range(3):
        w = g.astype(object) @ v
        s = max(abs(int(x)) for x in w)
        v = np.array(
            [_portable_floor_div(int(x) * 1000, s) for x in w], dtype=object
        )
    got = {
        r["dim"]: r["pc_milli"]
        for r in registry.QUERIES["x94_power_iteration_pc"](
            spark, sf_dir
        ).collect()
    }
    assert got == {i + 1: int(v[i]) for i in range(len(v))}


def test_equidepth_matches_pandas_reference(spark, sf_dir):
    # a70 vs an independent pandas ranking: bucket of a value is the
    # global rank of its LAST row, (cum-1)*8//n.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.sort(
        np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    )
    n = len(cents)
    vals, counts = np.unique(cents, return_counts=True)
    cum = np.cumsum(counts)
    bucket = (cum - 1) * 8 // n
    ref = {}
    for b in np.unique(bucket):
        m = bucket == b
        ref[int(b)] = (
            int(counts[m].sum()),
            int(vals[m].min()),
            int(vals[m].max()),
        )
    got = {
        r["bucket"]: (r["n_rows"], r["lo_c"], r["hi_c"])
        for r in registry.QUERIES["a70_equidepth_histogram"](
            spark, sf_dir
        ).collect()
    }
    assert got == ref


def test_fiscal_445_mapping_invariants():
    # Pure-arithmetic check of the a75 mapping: every week lands in a
    # period 1..12 and each quarter's periods hold 4, 4, and 5 weeks.
    from collections import Counter

    for fy_weeks in range(52):
        wk = fy_weeks
        q, wq = wk // 13, wk % 13
        period = q * 3 + (1 if wq < 4 else 2 if wq < 8 else 3)
        assert 1 <= period <= 12
    counts = Counter()
    for wk in range(52):
        q, wq = wk // 13, wk % 13
        period = q * 3 + (1 if wq < 4 else 2 if wq < 8 else 3)
        counts[period] += 1
    for q in range(4):
        assert counts[q * 3 + 1] == 4
        assert counts[q * 3 + 2] == 4
        assert counts[q * 3 + 3] == 5


def test_spatial_hotspots_match_pandas_reference(spark, sf_dir):
    # a74 vs a dense-grid reference computed independently in pandas.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    cx = (pdf["user_id"] % 50).to_numpy()
    cy = ((pdf["user_id"] // 50) % 50).to_numpy()
    counts = {}
    for x, y in zip(cx.tolist(), cy.tolist()):
        counts[(x, y)] = counts.get((x, y), 0) + 1
    total, ncells = sum(counts.values()), len(counts)
    ref = set()
    for (x, y), n in counts.items():
        nbr = max(
            (
                counts.get((x + dx, y + dy), 0)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)
            ),
            default=0,
        )
        # reference neighbor max only over EXISTING cells, matching
        # the left-join-null -> 0 semantics
        if n >= nbr and n * ncells >= 2 * total:
            ref.add((x, y, n))
    got = {
        (r["cx"], r["cy"], r["n"])
        for r in registry.QUERIES["a74_spatial_hotspots"](
            spark, sf_dir
        ).collect()
    }
    assert got == ref


def test_series_align_matches_pandas_ffill(spark, sf_dir):
    # w31 vs pandas reindex-on-union + ffill.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["cents"] = np.floor(pdf["o_totalprice"] * 100 + 0.5).astype(np.int64)
    pdf["day"] = pdf["o_orderdate"].dt.date
    a = pdf[pdf.o_orderpriority == "1-URGENT"].groupby("day")["cents"].sum()
    b = pdf[pdf.o_orderpriority == "5-LOW"].groupby("day")["cents"].sum()
    spine = sorted(set(a.index) | set(b.index))
    af = a.reindex(spine).ffill()
    bf = b.reindex(spine).ffill()
    ref = {}
    for d in spine:
        av = None if pd.isna(af[d]) else int(af[d])
        bv = None if pd.isna(bf[d]) else int(bf[d])
        sp = av - bv if av is not None and bv is not None else None
        ref[d] = (av, bv, sp)
    got = {
        r["day"]: (r["urgent_c"], r["low_c"], r["spread_c"])
        for r in registry.QUERIES["w31_series_align"](spark, sf_dir).collect()
    }
    assert got == ref


def test_hot_streak_matches_bruteforce_kadane(spark, sf_dir):
    # w32 vs an O(n^2) best-subarray scan over the same centered
    # series in pandas.
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet")
    pdf["cents"] = np.floor(pdf["o_totalprice"] * 100 + 0.5).astype(np.int64)
    pdf["day"] = pdf["o_orderdate"].dt.date
    got = {
        r["prio"]: (r["end_day"], r["best_excess_c"])
        for r in registry.QUERIES["w32_hot_streak_window"](
            spark, sf_dir
        ).collect()
    }
    for prio, grp in pdf.groupby("o_orderpriority"):
        daily = grp.groupby("day")["cents"].sum().sort_index()
        n, s = len(daily), int(daily.sum())
        v = (n * daily - s).astype(object).tolist()
        days = list(daily.index)
        best, best_end = None, None
        for j in range(n):
            run = 0
            for i in range(j, -1, -1):
                run += int(v[i])
                if best is None or run > best or (
                    run == best and days[j] < best_end
                ):
                    best, best_end = run, days[j]
        assert got[prio] == (best_end, best // n), (prio, got[prio], best_end)


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_prefix_filter_is_complete_on_random_sets(data):
    # The prefix-filtering theorem behind x102: for t=0.5, any pair
    # with Jaccard >= t shares at least one cell within each side's
    # (n - ceil(n/2) + 1) rarest cells. Exercise with random small
    # set systems, including singletons and identical sets.
    n_users = data.draw(st.integers(2, 8))
    sets = [
        frozenset(
            data.draw(
                st.sets(st.integers(0, 15), min_size=1, max_size=8)
            )
        )
        for _ in range(n_users)
    ]
    from collections import Counter

    df = Counter(c for s in sets for c in set(s))
    # rarity order: (df, cell) ascending — x102's ordering exactly
    def prefix(s):
        cells = sorted(s, key=lambda c: (df[c], c))
        n = len(cells)
        plen = n - ((n + 1) // 2) + 1
        return set(cells[:plen])

    for i in range(n_users):
        for j in range(i + 1, n_users):
            a, b = sets[i], sets[j]
            ov = len(a & b)
            jac_bp = 10000 * ov // (len(a) + len(b) - ov)
            if jac_bp >= 5000:
                assert prefix(a) & prefix(b), (
                    f"qualifying pair escaped the prefix filter: {a} {b}"
                )


# ---------------------------------------------------------------------------
# intmath.half_up / half_up_sql — cross-engine NaN/Inf transparency
# (ADVICE r9: the bare floor form collapsed NaN to 0 and saturated
# ±Inf through Spark's BIGINT floor while DuckDB propagated them; the
# guard must make BOTH engines pass non-finite inputs through).
# ---------------------------------------------------------------------------
def test_half_up_nan_inf_passthrough_cross_engine(spark):
    import math

    import duckdb
    from pyspark.sql import functions as F

    from voter_file_etl_spark.functions.intmath import half_up, half_up_sql

    inf = float("inf")
    cases = [
        float("nan"), inf, -inf, None,
        0.12345, -0.12345, 0.5, -0.5, 1.0000005, -1.0000005,
        1234.56785, -1234.56785, 0.0, -0.0,
    ]

    def ref(x, d):
        if x is None:
            return None
        if math.isnan(x) or math.isinf(x):
            return x
        return math.floor(x * 10**d + 0.5) / 10**d

    for digits in (0, 4, 6):
        df = spark.createDataFrame([(c,) for c in cases], "x double")
        got_col = [
            r[0] for r in df.select(half_up(F.col("x"), digits)).collect()
        ]
        got_sql = [
            r[0] for r in df.selectExpr(half_up_sql("x", digits)).collect()
        ]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {half_up_sql('x', digits)} FROM "
                "(SELECT CAST(? AS DOUBLE) AS x)",
                [c],
            ).fetchone()[0]
            for c in cases
        ]
        con.close()
        want = [ref(c, digits) for c in cases]
        for engine, got in (("spark-col", got_col), ("spark-sql", got_sql),
                            ("duckdb", got_duck)):
            for c, g, w in zip(cases, got, want):
                if w is None:
                    assert g is None, (engine, digits, c, g)
                elif math.isnan(w):
                    assert g is not None and math.isnan(g), (engine, digits, c, g)
                else:
                    assert g == w, (engine, digits, c, g, w)
