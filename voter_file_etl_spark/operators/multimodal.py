"""Multimodal columns: binary media + typed metadata + Arrow-batched
feature extraction (north-star suite).

Pattern: media is an opaque `binary` column with a typed metadata
struct beside it; decode / feature-extract / resize / frame-sample
run as `mapInPandas` over Arrow batches — one Python round-trip per
*batch*, never per row. The actual image/audio codecs are NOT in
this container, so the decode step is STUBBED (clearly marked below):
`decode_image`/`decode_audio` raise NotImplementedError unless
PIL/soundfile are importable, while `extract_features` uses a
deterministic hash-based featurizer so the full Spark plumbing —
schema, batching, partitioning — is real and oracle-checked.

Scale: mapInPandas preserves partitioning (no shuffle); batch size is
controlled by spark.sql.execution.arrow.maxRecordsPerBatch. Feature
extraction is embarrassingly parallel map work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t

try:  # pragma: no cover - codec not in the image
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

_FEAT_BITS = 16
_HI = set("89abcdef")


def attach_media(docs: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal corpus: the text
    payload becomes an opaque binary `media` column with typed
    metadata — the schema a real image/audio corpus would use."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("media_meta"),
    )


def decode_image(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB — image decode requires PIL, which is not in this
    container. The mapInPandas signature and output schema are the
    real contract; swap the body for PIL decode in production."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "decode_image: PIL not available in this environment; "
            "the mapInPandas plumbing is exercised via extract_features"
        )
    raise NotImplementedError("wire PIL decode here")


def _feature_from_bytes(payload: bytes) -> int:
    """Deterministic 16-bit feature: high bit of each md5 nibble —
    reproducible in ANSI SQL, so the Arrow path is oracle-checkable."""
    hx = hashlib.md5(payload).hexdigest()
    feat = 0
    for j in range(_FEAT_BITS):
        if hx[j] in _HI:
            feat |= 1 << j
    return feat


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column —
    the real multimodal hot path (decode would sit in this loop)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "feature": pdf["media"].map(_feature_from_bytes).astype("int64"),
                }
            )

    return media_df.mapInPandas(run, "doc_id long, n_bytes long, feature long")


def frame_sample(media_df: DataFrame, stride: int = 64, frame: int = 16) -> DataFrame:
    """Frame sampling for chunked media: strided byte windows as
    "frames" (a video decoder would yield real frames here). Pure
    Column expressions — the chunk bookkeeping needs no Python."""
    return media_df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(octet_length(media) - {frame - 1}, 1),"
                f" {stride}), i -> substring(media, i, {frame}))"
            )
        ).alias("frame_no", "frame_bytes"),
    )


# ---------------------------------------------------------------------------
# M1 — metadata plumbing (no Python in the path).
# ---------------------------------------------------------------------------
@register(
    "m1_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS media_bytes,
           md5(text) AS media_md5,
           'text/plain' AS media_type
    FROM documents
    """,
)
def m1_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    media = attach_media(docs)
    return media.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("media_bytes"),
        F.md5("text").alias("media_md5"),
        "media_type",
    )


# ---------------------------------------------------------------------------
# M2 — Arrow-batched feature extraction, oracle-checked: the pandas
# featurizer and the SQL expression compute the same md5-nibble bits.
# ---------------------------------------------------------------------------
def _m2_oracle() -> str:
    hi = ", ".join(f"'{c}'" for c in sorted(_HI))
    combine = " + ".join(
        f"(CASE WHEN substr(md5(text), {j + 1}, 1) IN ({hi}) THEN {1 << j} ELSE 0 END)"
        for j in range(_FEAT_BITS)
    )
    return f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST({combine} AS BIGINT) AS feature
    FROM documents
    """


@register("m2_multimodal_features", oracle=_m2_oracle())
def m2_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(attach_media(t(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# M3 — frame sampling, oracle-checked on the frame BOOKKEEPING
# (positions and truncated tail lengths are pure arithmetic in both
# engines; the byte payloads themselves are exercised in unit tests).
# ---------------------------------------------------------------------------
_FRAME, _STRIDE = 16, 64


@register(
    "m3_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    )
    SELECT doc_id,
           CAST((i - 1) // {_STRIDE} AS INTEGER) AS frame_no,
           CAST(least({_FRAME}, n_bytes - i + 1) AS INTEGER) AS frame_len
    FROM m, unnest(range(1, greatest(n_bytes - {_FRAME - 1}, 1) + 1, {_STRIDE}))
           AS t(i)
    """,
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(t(spark, sf_dir, "documents"))
    frames = frame_sample(media, stride=_STRIDE, frame=_FRAME)
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.octet_length("frame_bytes").cast("int").alias("frame_len"),
    )


# ---------------------------------------------------------------------------
# M4 — resize / re-batch: normalize every media payload to a fixed
# byte budget (truncate long, keep short) — the shape-normalization
# step before batched model inference. A real image resize would run
# in this same mapInPandas loop (PIL is not in this container; the
# deterministic byte-level normalization keeps the plumbing
# oracle-checkable). Pure map work, no shuffle, Arrow-batched.
# ---------------------------------------------------------------------------
_RESIZE_BYTES = 64


def resize_media(media_df: DataFrame, target: int = _RESIZE_BYTES) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["media"].map(lambda b: bytes(b)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": payload,
                    "out_bytes": payload.map(len).astype("int64"),
                    "was_truncated": pdf["media"].map(lambda b: len(b) > target),
                }
            )

    return media_df.mapInPandas(
        run, "doc_id long, resized binary, out_bytes long, was_truncated boolean"
    )


@register(
    "m4_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(least(octet_length(encode(text)), {_RESIZE_BYTES}) AS BIGINT)
             AS out_bytes,
           octet_length(encode(text)) > {_RESIZE_BYTES} AS was_truncated,
           md5(substr(text, 1, {_RESIZE_BYTES})) AS resized_md5
    FROM documents
    """,
)
def m4_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ASCII corpus: byte truncation == char truncation, so the oracle
    # can express the resized payload as substr(text, 1, target).
    resized = resize_media(attach_media(t(spark, sf_dir, "documents")))
    return resized.select(
        "doc_id", "out_bytes", "was_truncated", F.md5("resized").alias("resized_md5")
    )


def decode_audio(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB — audio decode requires soundfile/librosa, not in this
    container. Contract mirrors decode_image: mapInPandas over the
    binary column yielding (doc_id, sample_rate, samples array)."""
    raise NotImplementedError(
        "decode_audio: audio codecs not available in this environment; "
        "the mapInPandas plumbing is exercised via extract_features/resize_media"
    )
