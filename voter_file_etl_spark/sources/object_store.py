"""Object-store file listing + ordered load (the S3 source).

Reference: load-s3.ts:76-104 (getAllFiles) lists the bucket with
listObjectsV2 capped at MaxKeys, sorts the listing by LastModified
DESC, then keeps keys starting with AWS_FILE_PATTERN; main()
(load-s3.ts:106-135) walks that ordered list with an inclusive
[start_file, end_file] index window and derives the state from
``key.split("--")[1]``.

Spark-first: the listing goes through the Hadoop FileSystem API, so
the SAME code serves ``file://`` in tests and ``s3a://`` on a
cluster (the s3a connector implements listStatus over ListObjectsV2
— no AWS SDK dependency here, and credentials/region flow through
the standard ``spark.hadoop.fs.s3a.*`` configs instead of
environment-specific code). The listing is driver-side and O(files)
— the same role the reference's Node loop plays — while the actual
data reads stay distributed parquet/CSV scans.

Semantics faithfully kept from the reference (they matter for
parity): the MaxKeys CAP applies to the lexicographic listing BEFORE
the LastModified sort and the prefix filter, so a bucket with more
than max_keys objects can drop newer-but-lexicographically-late
files exactly as the reference would.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from voter_file_etl_spark.sources.tsv import read_tsv


@dataclass(frozen=True)
class ObjectInfo:
    key: str  # object key = file name relative to the base URI
    size: int
    mtime_ms: int  # LastModified, epoch millis


def list_objects(
    spark: SparkSession, base_uri: str, max_keys: int = 200
) -> list[ObjectInfo]:
    """Raw listing of ``base_uri``, lexicographic by key (S3 listing
    order), capped at ``max_keys`` — listObjectsV2 semantics over any
    Hadoop filesystem."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(base_uri)
    fs = path.getFileSystem(hconf)
    out = []
    for st in fs.listStatus(path):
        if not st.isFile():
            continue
        out.append(
            ObjectInfo(
                key=st.getPath().getName(),
                size=int(st.getLen()),
                mtime_ms=int(st.getModificationTime()),
            )
        )
    out.sort(key=lambda o: o.key)
    return out[:max_keys]


def newest_matching(
    spark: SparkSession, base_uri: str, prefix: str, max_keys: int = 200
) -> list[str]:
    """getAllFiles (load-s3.ts:76-104): cap the listing, sort
    LastModified DESC (key DESC tiebreak for determinism — the
    reference's sort is unstable on equal timestamps), then keep keys
    with the given prefix."""
    listed = list_objects(spark, base_uri, max_keys)
    listed.sort(key=lambda o: (-o.mtime_ms, o.key))
    return [o.key for o in listed if o.key.startswith(prefix)]


def load_ordered(
    spark: SparkSession,
    base_uri: str,
    prefix: str,
    start_file: int = 0,
    end_file: int | None = None,
    max_keys: int = 200,
) -> DataFrame:
    """main() (load-s3.ts:106-135): walk the newest-first key list
    with an inclusive [start_file, end_file] window, read each TSV
    with the full voter schema, and tag rows with the state parsed
    from ``key.split("--")[1]``. Returns one unioned DataFrame — each
    file is still a distributed CSV scan; only the tiny listing is
    driver-side."""
    from pyspark.sql import functions as F

    keys = newest_matching(spark, base_uri, prefix, max_keys)
    parts = []
    for i, key in enumerate(keys):
        if i < start_file:
            continue
        if end_file is not None and i > end_file:
            break
        state = key.split("--")[1]
        df = read_tsv(spark, f"{base_uri.rstrip('/')}/{key}").withColumn(
            "state", F.lit(state)
        )
        parts.append(df)
    if not parts:
        raise ValueError(f"no objects under {base_uri} match prefix {prefix!r}")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
