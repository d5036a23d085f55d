"""Bucketed-table co-located join: the zero-shuffle recipe for a
repeated large-large join (SCALE.md §2).

Writing both sides bucketed by the join key lets Spark join them
with NO exchange on either side — the bucket layout IS the shuffle,
paid once at write time and amortized over every subsequent join.
This is the 100 TB answer for the fact-fact joins the engine runs
repeatedly (state table ⋈ state table on voter key); the test
asserts both the plan property (no ShuffleExchange above the scans)
and result parity with the plain join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from voter_file_etl_spark.tables import t

N_BUCKETS = 8


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )

    lb = spark.table("li_bucketed")
    ob = spark.table("orders_bucketed")
    # Disable broadcast so the planner must choose a co-located join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"

        expected = (
            t(spark, sf_dir, "lineitem")
            .join(
                t(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
