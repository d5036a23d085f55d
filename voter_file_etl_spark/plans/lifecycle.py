"""Table lifecycle (SURVEY.md §2.13).

The reference publishes atomically by renaming Voter{ST}Temp over the
live table inside a transaction (load.ts:256-308). Spark-first
equivalent: mode("overwrite") through the file-commit protocol — the
new data becomes visible only at commit, readers of the old snapshot
are unaffected, and a failed job leaves the previous table intact.
The operators/etl.py module exposes the full publish routine; this
query verifies the read-back contract.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t


@register(
    "l2_overwrite_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def l2_overwrite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.gettempdir(), "voter_file_etl_spark", "l2_publish")
    os.makedirs(out, exist_ok=True)
    customer = t(spark, sf_dir, "customer")
    # "blue" publish: a stale slice that must be fully replaced...
    customer.filter(F.col("c_custkey") % 2 == 0).write.mode("overwrite").parquet(out)
    # ...then the "green" publish atomically overwrites with the truth.
    customer.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
    )
