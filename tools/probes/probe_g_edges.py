"""A/B probe: old co-purchase edge build (distinct -> self-join ->
count>=2) vs new (collect_set per order -> map-side pair explode ->
count>=2). Alternating runs, noop sink, same session."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from voter_file_etl_spark.tables import t

SF = os.environ.get("SF", "/root/testdata/sf0.1")
spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS','32')}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

def old_edges():
    pp = t(spark, SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    return (
        pp.alias("a")
        .join(
            pp.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )

def new_edges():
    return (
        t(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts) - i - 1),"
                    " y -> struct(x AS s, y AS d))))"
                )
            ).alias("p")
        )
        .select("p.s", "p.d")
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )

# correctness: exact set equality
a, b = old_edges(), new_edges()
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print("edge diff rows:", diff)
assert diff == 0

def timed(df):
    spark.catalog.clearCache()
    s = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - s

# warm-up both
timed(old_edges()); timed(new_edges())
olds, news = [], []
for _ in range(3):
    olds.append(timed(old_edges()))
    news.append(timed(new_edges()))
print("old:", [round(x, 2) for x in olds], "min", round(min(olds), 3))
print("new:", [round(x, 2) for x in news], "min", round(min(news), 3))
print("== old plan ==")
old_edges().explain(mode="formatted")
print("== new plan ==")
new_edges().explain(mode="formatted")
