"""Joins (SURVEY.md §2.6).

The reference has no join executor — its only correlation is two
point queries against the manifest (load.ts:98-108). The engine
supplies the full join surface the loaded tables imply: broadcast
inner for dims, left outer for optional enrichment, semi/anti for
existence checks, sort-merge for fact-fact, and a geohash-prefix
equi-join for proximity (the F1 derived column's consumer).

Scale notes:
- Dims (nation/region/customer-sized) get an explicit broadcast()
  hint; fact-fact joins shuffle on the join key and rely on AQE for
  skew splitting.
- The prefix join turns a range/theta proximity predicate into an
  equi-join on a truncated geohash — the standard spatial-bucketing
  trick that keeps the join shuffle-partitionable at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.geohash import geohash_sql
from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.plans.scalars import _HAV_KM
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# J1 — equi inner join, broadcast dim side.
# ---------------------------------------------------------------------------
@register(
    "j1_inner_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — left outer join (optional enrichment; the skipped DEMOGRAPHIC
# second entity of load.ts:94-96).
# ---------------------------------------------------------------------------
@register(
    "j2_left_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# J3 — left-semi (EXISTS). The manifest loaded-check (load.ts:98-108)
# in its positive form.
# ---------------------------------------------------------------------------
@register(
    "j3_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    big_orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.join(big_orders, "c_custkey", "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# J4 — large-large equi join (sort-merge / shuffled hash; AQE decides).
# lineitem ⋈ orders is the cross-state re-registration join shape
# (Voters_MovedFrom_State, prisma/Voter.prisma:75).
# ---------------------------------------------------------------------------
@register(
    "j4_large_join",
    oracle="""
    SELECT o.o_orderpriority, l.l_returnflag,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_returnflag
    """,
)
def j4_large_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — geohash-prefix proximity join. Customers and suppliers get
# deterministic pseudo-coordinates (integer-derived, so both engines
# compute identical doubles), a precision-8 geohash (F1), and join on
# the 4-char prefix — proximity as a plain equi-join.
# ---------------------------------------------------------------------------
_CUST_LAT = "(-90.0 + (c_custkey % 180) + 0.25)"
_CUST_LON = "(-180.0 + ((c_custkey * 7) % 360) + 0.25)"
_SUPP_LAT = "(-90.0 + ((s_suppkey * 3) % 180) + 0.25)"
_SUPP_LON = "(-180.0 + ((s_suppkey * 11) % 360) + 0.25)"


@register(
    "j5_prefix_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             substr({geohash_sql(_CUST_LAT, _CUST_LON, 8, "duckdb")}, 1, 4) AS gh4
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             substr({geohash_sql(_SUPP_LAT, _SUPP_LON, 8, "duckdb")}, 1, 4) AS gh4
      FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey, c.gh4
    FROM c JOIN s ON c.gh4 = s.gh4
    """,
)
def j5_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The precision-8 geohash is a machine-built expression hundreds
    # of ops deep. Let-bind it on each side (inline generator): as a
    # plain alias, the optimizer's isnotnull join-key filter AND the
    # projection each inline the full expression — the whole geohash
    # computed TWICE per row per side (r7 sweep).
    def gh4_side(table: str, key: str, lat: str, lon: str) -> DataFrame:
        gh = geohash_sql(lat, lon, 8, "spark")
        return t(spark, sf_dir, table).selectExpr(
            key,
            f"inline(transform(array(substring({gh}, 1, 4)),"
            " g -> named_struct('gh4', g)))",
        )

    customer = gh4_side("customer", "c_custkey", _CUST_LAT, _CUST_LON)
    supplier = gh4_side("supplier", "s_suppkey", _SUPP_LAT, _SUPP_LON)
    return customer.join(F.broadcast(supplier), "gh4").select(
        "c_custkey", "s_suppkey", "gh4"
    )


# ---------------------------------------------------------------------------
# J8 — salted join for skewed keys. The build side replicates each
# row SALT ways; the probe side salts by a deterministic hash of a
# high-cardinality sibling column, so one hot key (CA-sized state vs
# WY-sized, SURVEY.md §7.6) spreads over SALT reducers instead of
# one straggler. Results are identical to the plain join — the
# oracle is the UNSALTED join, which is the whole point.
# AQE's skewJoin handles moderate skew automatically; explicit
# salting is the recipe for the pathological single-hot-key case.
# ---------------------------------------------------------------------------
_SALT = 8


@register(
    "j8_salted_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def j8_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % _SALT).cast("int")
    )
    orders = t(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(_SALT)]))
    )
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# J9 — bucketed co-located join: both sides written bucketBy the join
# key, so the join plans with NO exchange on either side — the bucket
# layout IS the shuffle, paid once at write time and amortized over
# every later join (SCALE.md §2; plan property asserted in
# tests/test_bucketing.py). This is the 100 TB recipe for repeated
# fact-fact joins (state table ⋈ state table on the voter key in the
# reference's implied workload). The oracle is the plain join — the
# bucketed physical layout must not change a single result row.
# ---------------------------------------------------------------------------
def _reset_bucketed_table(spark: SparkSession, name: str) -> None:
    """Drop ``name`` from the catalog AND clear its warehouse
    location: a fresh session's in-memory catalog forgets the table
    while the directory a previous session wrote survives, and
    saveAsTable refuses to CREATE over an existing location."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("file", ""):
        shutil.rmtree(os.path.join(wh.path, name.lower()), ignore_errors=True)


def _warehouse_path(spark: SparkSession) -> str | None:
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    return wh.path if wh.scheme in ("file", "") else None


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> None:
    """Build (once) the j9 bucketed tables for ``sf_dir``.

    Bucketing is a WRITE-TIME investment — the whole point of the
    operator is that the probe join is exchange-free because the
    shuffle was paid when the table was laid out. So the layout is a
    cached fixture keyed by sf_dir (VERDICT r2 #3), not part of the
    measured query:

    - same session, same sf_dir       -> no-op (session cache)
    - fresh session, marker matches   -> re-register the surviving
      warehouse files as external bucketed tables (DDL only, no IO)
    - marker missing/stale            -> reset + rebuild + marker
    """
    import os

    key = (spark.sparkContext.applicationId, sf_dir, n_buckets)
    if key in _BUCKETED_READY:
        return
    wh = _warehouse_path(spark)
    marker = os.path.join(wh, "_j9_bucketed_for") if wh else None
    specs = [
        ("j9_li_bucketed", "lineitem", ["l_orderkey", "l_quantity"], "l_orderkey"),
        ("j9_orders_bucketed", "orders", ["o_orderkey", "o_orderpriority"], "o_orderkey"),
    ]
    stamp = f"{sf_dir}\n{n_buckets}\n"
    reusable = False
    if marker and os.path.exists(marker):
        with open(marker) as fh:
            reusable = fh.read() == stamp
        reusable = reusable and all(
            os.path.isdir(os.path.join(wh, name)) for name, *_ in specs
        )
    for name, table, cols, bkey in specs:
        df = t(spark, sf_dir, table).select(*cols)
        if reusable:
            if not spark.catalog.tableExists(name):
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
                )
                loc = os.path.join(wh, name)
                spark.sql(
                    f"CREATE TABLE {name} ({ddl}) USING parquet "
                    f"CLUSTERED BY ({bkey}) SORTED BY ({bkey}) "
                    f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
                )
        else:
            _reset_bucketed_table(spark, name)
            (
                df.write.bucketBy(n_buckets, bkey)
                .sortBy(bkey)
                .mode("overwrite")
                .saveAsTable(name)
            )
    if not reusable and marker:
        with open(marker, "w") as fh:
            fh.write(stamp)
    _BUCKETED_READY.add(key)


_BUCKETED_READY: set = set()


@register(
    "j9_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def j9_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_bucketed_tables(spark, sf_dir)
    lib = spark.table("j9_li_bucketed")
    ob = spark.table("j9_orders_bucketed")
    # MERGE hint: at tiny SF Catalyst would broadcast the small side
    # (also shuffle-free, but it bypasses the bucketed layout this
    # operator demonstrates); at production scale both sides exceed
    # the broadcast threshold and SMJ over buckets is the plan anyway.
    return (
        lib.hint("merge").join(ob, lib.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# J10 — spatial blocked join (the distributed "find points within d"
# shape the reference's geo columns imply: voters near an address,
# households within a radius). All-pairs haversine is O(N²); the
# scale shape is grid blocking: every point gets an integer cell, one
# side expands to its 3x3 cell neighborhood (explode — at most 9x one
# side, constant), candidates come from the cell equi-join, and the
# exact haversine filters candidates. Cell size (0.01 deg) exceeds
# the 0.55 km threshold at this latitude, so no qualifying pair can
# span beyond adjacent cells — the join is exact, never quadratic.
#
# Determinism: cells derive from INTEGER grid indices only (float
# floor() near cell edges is where engines disagree); coordinates are
# double with identical op order on both engines; the haversine is
# rounded to 6 decimals before the threshold compare (t9 policy).
# ---------------------------------------------------------------------------
_GRID_LAT0, _GRID_LON0 = "40.0", "-88.0"
_SPAT_KM = 0.55


def _spatial_coords_sql(dialect: str) -> str:
    """(id, li, lj, lat, lon, cx, cy) from customer keys — synthetic
    but deterministic points on a 0.001-degree grid, cells = 7x7 grid
    indices (pure integer math; 7 steps = 0.78/0.60 km >= the 0.55 km
    radius, so adjacent cells always cover it)."""
    idiv = "//" if dialect == "duckdb" else "div"
    dbl = "" if dialect == "duckdb" else "D"
    return f"""
      SELECT c_custkey AS id,
             c_custkey % 400 AS li,
             (c_custkey {idiv} 400) % 400 AS lj,
             {_GRID_LAT0}{dbl} + CAST(c_custkey % 400 AS DOUBLE) * 0.001{dbl} AS lat,
             {_GRID_LON0}{dbl} + CAST((c_custkey {idiv} 400) % 400 AS DOUBLE) * 0.001{dbl} AS lon,
             (c_custkey % 400) {idiv} 7 AS cx,
             ((c_custkey {idiv} 400) % 400) {idiv} 7 AS cy
      FROM customer
    """


@register(
    "j10_spatial_blocked_join",
    oracle=f"""
    WITH coords AS (
      {_spatial_coords_sql("duckdb")}
    ), expanded AS (
      SELECT c.id, c.lat, c.lon, c.cx + dx.d AS jx, c.cy + dy.d AS jy
      FROM coords c,
           (VALUES (-1), (0), (1)) AS dx(d),
           (VALUES (-1), (0), (1)) AS dy(d)
    )
    SELECT a.id AS id1, b.id AS id2,
           {half_up_sql(_HAV_KM.format(lat1="a.lat", lon1="a.lon",
                                       lat2="b.lat", lon2="b.lon"), 6)} AS dist_km
    FROM expanded a JOIN coords b ON a.jx = b.cx AND a.jy = b.cy AND a.id < b.id
    WHERE {half_up_sql(_HAV_KM.format(lat1="a.lat", lon1="a.lon",
                                      lat2="b.lat", lon2="b.lon"), 6)}
          <= {_SPAT_KM}
    """,
)
def j10_spatial_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    li = F.col("c_custkey") % 400
    lj = F.expr("(c_custkey div 400) % 400")
    coords = customer.select(
        F.col("c_custkey").alias("id"),
        (F.expr(f"{_GRID_LAT0}D") + li.cast("double") * F.expr("0.001D")).alias("lat"),
        (F.expr(f"{_GRID_LON0}D") + lj.cast("double") * F.expr("0.001D")).alias("lon"),
        F.expr("(c_custkey % 400) div 7").alias("cx"),
        F.expr("((c_custkey div 400) % 400) div 7").alias("cy"),
    )
    offsets = F.expr("explode(sequence(-1, 1))")
    expanded = (
        coords.select("id", "lat", "lon", "cx", "cy", offsets.alias("dx"))
        .select("id", "lat", "lon", "cx", "cy", "dx", offsets.alias("dy"))
        .select(
            "id",
            "lat",
            "lon",
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    a = expanded.select(
        F.col("id").alias("id1"), F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"), "jx", "jy",
    )
    b = coords.select(
        F.col("id").alias("id2"), F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"), F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    # half_up, not F.round: the rounded distance is both emitted AND
    # the radius filter, so a tie flip would change row membership.
    km = half_up(
        F.expr(_HAV_KM.format(lat1="lat1", lon1="lon1", lat2="lat2", lon2="lon2")), 6
    )
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", km.alias("dist_km"))
        .filter(F.col("dist_km") <= _SPAT_KM)
    )


# ---------------------------------------------------------------------------
# J12 — FULL OUTER join: the reconciliation shape (which customers
# have no qualifying orders, which qualifying orders reference
# customers outside the slice — the two-sided version of the
# reference's sync diff between a fresh load and the serving table,
# load.ts:256-308). Both inputs are filtered so each side has
# exclusives, making all three match classes non-empty.
#
# Scale: full-outer cannot broadcast (both sides must keep unmatched
# rows), so Catalyst plans a sort-merge join with both sides
# hash-partitioned on the key — one shuffle each, streaming merge, no
# row buffered beyond a key group. The aggregate below the join is
# partial+final on the already-key-partitioned side.
# ---------------------------------------------------------------------------
@register(
    "j12_full_outer_join",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0
    ), ords AS (
      SELECT o_custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_mktsegment AS mktsegment,
           coalesce(o.n_orders, 0) AS n_orders,
           o.total_spend AS total_spend,
           CASE WHEN c.c_custkey IS NULL THEN 'right_only'
                WHEN o.o_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS side
    FROM cust c FULL OUTER JOIN ords o ON c.c_custkey = o.o_custkey
    """,
)
def j12_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    ords = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )
    joined = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.col("total_spend"),
        F.when(F.col("c_custkey").isNull(), "right_only")
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("both")
        .alias("side"),
    )


# ---------------------------------------------------------------------------
# J13 — large-large numeric band self-join, bucket-blocked: every
# pair of parts whose retail prices sit within +-1.0 of each other
# (j7 classifies against a broadcast literal; THIS is the two-big-
# sides case where a naive non-equi join is a cartesian product).
# Blocking: bucket = floor(price / 2.0); band 1.0 < bucket width 2.0
# guarantees any qualifying pair differs by at most one bucket, so
# the probe side explodes to its 3 neighbor buckets and the join is
# a plain EQUI-join on bucket (shuffle-hash/SMJ, Catalyst's choice)
# followed by the exact |a-b| <= 1.0 filter — a bounded 3x row
# expansion instead of |part|^2 comparisons, the same
# block-then-verify shape as the spatial join (j10).
# abs(a - b) <= 1.0 is evaluated with IDENTICAL float64 operand
# order on both engines, so band-edge rounding cannot diverge.
# ---------------------------------------------------------------------------
_J13_BAND = 1.0
_J13_BUCKET_W = 2.0


@register(
    "j13_band_join",
    # The ON clause is a LOOSE col-op-col inequality pair (band + 0.5
    # slack), not abs(a-b) <= band: abs() — and any form where one
    # comparison side mixes both tables — defeats DuckDB's IEJoin
    # rewrite and the plan degrades to a NESTED_LOOP_JOIN: part x part
    # ~ 4e10 pairs at sf1.0, >300 s (caught by
    # tools/oracle_plan_audit.py, r9; the a45 class). With the
    # col <= col + const form DuckDB sorts both sides and visits only
    # near-band pairs. The EXACT band test stays in WHERE with the
    # identical abs(a - b) operand order the Spark side uses, so
    # band-edge float behavior is unchanged; the slack makes the ON a
    # strict superset regardless of FP rounding in `b + const`.
    oracle=f"""
    SELECT a.p_partkey, a.p_retailprice,
           count(*) AS n_bandmates,
           min(abs(a.p_retailprice - b.p_retailprice)) AS min_gap
    FROM part a JOIN part b
      ON a.p_retailprice <= b.p_retailprice + {_J13_BAND + 0.5}
     AND b.p_retailprice <= a.p_retailprice + {_J13_BAND + 0.5}
    WHERE b.p_partkey <> a.p_partkey
      AND abs(a.p_retailprice - b.p_retailprice) <= {_J13_BAND}
    GROUP BY a.p_partkey, a.p_retailprice
    """,
)
def j13_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    build = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_retailprice").alias("b_price"),
        F.floor(F.col("p_retailprice") / _J13_BUCKET_W).alias("bucket"),
    )
    probe = p.select(
        "p_partkey",
        "p_retailprice",
        F.explode(
            F.array(
                F.floor(F.col("p_retailprice") / _J13_BUCKET_W) - 1,
                F.floor(F.col("p_retailprice") / _J13_BUCKET_W),
                F.floor(F.col("p_retailprice") / _J13_BUCKET_W) + 1,
            )
        ).alias("bucket"),
    )
    # Each true pair matches exactly once: the build row's single
    # bucket meets exactly one of the probe row's 3 exploded values.
    return (
        probe.join(build, "bucket")
        .filter(
            (F.col("b_key") != F.col("p_partkey"))
            & (
                F.abs(F.col("p_retailprice") - F.col("b_price"))
                <= F.lit(_J13_BAND)
            )
        )
        .groupBy("p_partkey", "p_retailprice")
        .agg(
            F.count(F.lit(1)).alias("n_bandmates"),
            F.min(
                F.abs(F.col("p_retailprice") - F.col("b_price"))
            ).alias("min_gap"),
        )
    )


# ---------------------------------------------------------------------------
# J14 — null-safe equi-join (<=> / IS NOT DISTINCT FROM): the SQL
# surface piece ordinary equi-joins miss — NULL keys match each
# other. Customers and suppliers are keyed by a DERIVED nullable key
# (nation bucket, NULLed for one bucket) and joined null-safely, so
# the NULL-bucket rows pair up instead of vanishing; counts per key
# prove both the NULL x NULL matches and the plain matches survive.
# Catalyst plans <=> as a hash join on a coalesced key (it stays an
# EQUI join — no nested loop), which is exactly how it scales.
# ---------------------------------------------------------------------------
@register(
    "j14_null_safe_join",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN c_nationkey % 5 = 2 THEN NULL
                  ELSE c_nationkey % 5 END AS k, count(*) AS n_cust
      FROM customer GROUP BY 1
    ), s AS (
      SELECT CASE WHEN s_nationkey % 5 = 2 THEN NULL
                  ELSE s_nationkey % 5 END AS k, count(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT c.k, c.n_cust, s.n_supp,
           c.k IS NULL AS matched_via_null
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    """,
)
def j14_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = lambda col: F.when(  # noqa: E731
        F.col(col) % 5 == 2, F.lit(None).cast("long")
    ).otherwise(F.col(col) % 5)
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(key("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(key("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c["k"].eqNullSafe(s["k"]))
        .select(
            c["k"],
            "n_cust",
            "n_supp",
            c["k"].isNull().alias("matched_via_null"),
        )
    )


# ---------------------------------------------------------------------------
# J15 — SCD2 point-in-time join: "what was this customer's status ON
# date D" answered by joining facts to validity intervals (l10's
# SCD2 build) — the temporal lookup every history-keeping warehouse
# serves. The join is EQUI on custkey with the interval condition
# (valid_from <= d < valid_to, NULL = open) as a residual filter, so
# it shuffles once on the key — never a cartesian; interval counts
# per key are small (status changes), so the residual is cheap.
# Self-consistency makes the oracle sharp: each order's PIT-resolved
# status must equal the status the order itself carried, except
# orders sharing a change date with a later same-day change — both
# engines derive the identical intervals, so the consistency counts
# match exactly.
# ---------------------------------------------------------------------------
@register(
    "j15_scd2_pit_join",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_status
      FROM orders
    ), iv AS (
      SELECT o_custkey AS custkey, o_orderstatus AS status,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    )
    SELECT o.o_orderstatus AS status,
           count(*) AS n_orders,
           count(CASE WHEN iv.status = o.o_orderstatus THEN 1 END)
             AS n_pit_consistent
    FROM orders o JOIN iv
      ON o.o_custkey = iv.custkey
     AND o.o_orderdate >= iv.valid_from
     AND (iv.valid_to IS NULL OR o.o_orderdate < iv.valid_to)
    GROUP BY o.o_orderstatus
    """,
)
def j15_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = (
        orders.withColumn("prev_status", F.lag("o_orderstatus").over(win))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("pit_status"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(win).alias("valid_to"),
        )
    )
    fact = orders.select("o_custkey", "o_orderstatus", "o_orderdate")
    joined = fact.join(
        iv,
        (fact.o_custkey == iv.custkey)
        & (fact.o_orderdate >= iv.valid_from)
        & (iv.valid_to.isNull() | (fact.o_orderdate < iv.valid_to)),
    )
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(
            F.when(F.col("pit_status") == F.col("o_orderstatus"), 1)
        ).alias("n_pit_consistent"),
    )


# ---------------------------------------------------------------------------
# J16 — interval-overlap join, month-grid blocked: two big interval
# sets (derived deterministically from orders: priority-1 vs
# priority-2 orders, each open for 1 + orderkey % 7 days) joined on
# INTERSECTION — the concurrency/eligibility-window shape (who was
# registered while the canvass ran). j13 blocks a scalar band; here
# each interval explodes to the calendar months it touches (<= 2 for
# these durations), the join is EQUI on month, the exact overlap
# predicate (a.start <= b.end AND b.start <= a.end) filters, and a
# DISTINCT collapses pairs that met in two shared months. Bounded
# fan-out, no cartesian; per-side rows per month grid cell track
# interval density, the right 100 TB knob (finer grid for denser
# calendars).
# ---------------------------------------------------------------------------
@register(
    "j16_interval_overlap_join",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS a_key, o_orderdate AS a_start,
             o_orderdate + INTERVAL ((1 + o_orderkey % 7)) DAY AS a_end
      FROM orders WHERE o_orderpriority LIKE '1%' AND o_orderkey % 3 = 0
    ), b AS (
      SELECT o_orderkey AS b_key, o_orderdate AS b_start,
             o_orderdate + INTERVAL ((1 + o_orderkey % 7)) DAY AS b_end
      FROM orders WHERE o_orderpriority LIKE '2%'
    )
    SELECT a_key, count(*) AS n_overlaps, min(b_key) AS first_b
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
    GROUP BY a_key
    """,
)
def j16_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def side(prefix: str, k: str) -> DataFrame:
        cond = F.col("o_orderpriority").startswith(prefix)
        if k == "a":  # probe side thinned so pair volume stays bounded
            cond = cond & (F.col("o_orderkey") % 3 == 0)
        return orders.filter(cond).select(
            F.col("o_orderkey").alias(f"{k}_key"),
            F.col("o_orderdate").cast("date").alias(f"{k}_start"),
            F.expr(
                "date_add(cast(o_orderdate as date),"
                " cast(1 + o_orderkey % 7 as int))"
            ).alias(f"{k}_end"),
        )

    def with_months(df: DataFrame, k: str) -> DataFrame:
        midx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
        return df.select(
            "*",
            F.explode(
                F.sequence(midx(f"{k}_start"), midx(f"{k}_end"))
            ).alias("month_idx"),
        )

    a = with_months(side("1", "a"), "a")
    b = with_months(side("2", "b"), "b")
    pairs = (
        a.join(b, "month_idx")
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select("a_key", "b_key")
        .distinct()
    )
    return pairs.groupBy("a_key").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("b_key").alias("first_b"),
    )


# ---------------------------------------------------------------------------
# J17 — k-nearest-neighbor spatial join within a radius: for every
# probe point (each 5th customer on the j10 synthetic city grid),
# the k=3 nearest neighbors among ALL points no farther than
# _SPAT_KM, ranked by exact haversine. The "match each voter to the
# 3 closest polling places / canvass targets" shape.
#
# Exactness argument (same as j10, enforced there by
# test_spatial_expansion_is_bounded_9x): grid cells are 7 x 0.001deg
# ~ 0.778 km lat x 0.596 km lon at 40N, both > _SPAT_KM = 0.55, so
# every true neighbor within the radius lies in the probe's 3x3 cell
# neighborhood — blocked candidate generation is lossless, and the
# per-probe top-3 window over candidates equals the global kNN
# truncated at the radius.
#
# Scale: candidates = bounded 9x cell fan-out equi-join (no
# cartesian); ranking = one window per probe key over a handful of
# candidates. Ties (symmetric grid points at equal distance) break
# on neighbor id, so results are total-ordered in both engines.
# ---------------------------------------------------------------------------
_KNN_K = 3


@register(
    "j17_knn_join",
    oracle=f"""
    WITH coords AS (
      {_spatial_coords_sql("duckdb")}
    ), probes AS (
      SELECT * FROM coords WHERE id % 5 = 0
    ), expanded AS (
      SELECT p.id, p.lat, p.lon, p.cx + dx.d AS jx, p.cy + dy.d AS jy
      FROM probes p,
           (VALUES (-1), (0), (1)) AS dx(d),
           (VALUES (-1), (0), (1)) AS dy(d)
    ), cand AS (
      SELECT a.id AS probe_id, b.id AS neighbor_id,
             {half_up_sql(_HAV_KM.format(lat1="a.lat", lon1="a.lon",
                                         lat2="b.lat", lon2="b.lon"), 6)} AS dist_km
      FROM expanded a JOIN coords b ON a.jx = b.cx AND a.jy = b.cy
      WHERE a.id <> b.id
    ), ranked AS (
      SELECT probe_id, neighbor_id, dist_km,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY dist_km, neighbor_id) AS rn
      FROM cand WHERE dist_km <= {_SPAT_KM}
    )
    SELECT probe_id, neighbor_id, dist_km, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_KNN_K}
    """,
)
def j17_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    customer = t(spark, sf_dir, "customer")
    li = F.col("c_custkey") % 400
    lj = F.expr("(c_custkey div 400) % 400")
    coords = customer.select(
        F.col("c_custkey").alias("id"),
        (F.expr(f"{_GRID_LAT0}D") + li.cast("double") * F.expr("0.001D")).alias("lat"),
        (F.expr(f"{_GRID_LON0}D") + lj.cast("double") * F.expr("0.001D")).alias("lon"),
        F.expr("(c_custkey % 400) div 7").alias("cx"),
        F.expr("((c_custkey div 400) % 400) div 7").alias("cy"),
    )
    offsets = F.expr("explode(sequence(-1, 1))")
    probes = (
        coords.filter(F.col("id") % 5 == 0)
        .select("id", "lat", "lon", "cx", "cy", offsets.alias("dx"))
        .select("id", "lat", "lon", "cx", "cy", "dx", offsets.alias("dy"))
        .select(
            F.col("id").alias("probe_id"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    pool = coords.select(
        F.col("id").alias("neighbor_id"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    # half_up, not F.round — emitted + radius-filter + rank key (j10 note).
    km = half_up(
        F.expr(_HAV_KM.format(lat1="lat1", lon1="lon1", lat2="lat2", lon2="lon2")), 6
    )
    cand = (
        probes.join(pool, ["jx", "jy"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", km.alias("dist_km"))
        .filter(F.col("dist_km") <= _SPAT_KM)
    )
    w = W.partitionBy("probe_id").orderBy("dist_km", "neighbor_id")
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _KNN_K)
    )


# ---------------------------------------------------------------------------
# J18 — PROFILED (targeted) salted join: j8 salts every key, which
# pays the xSALT dim inflation on the whole table; the measured
# verdict (tools/skew_bench.py, SCALE.md §11) is that blanket salting
# REGRESSES under mild skew while targeted salting always wins. This
# operator is the production form: a first pass profiles the fact's
# key histogram (a27's job), keys at/above _J18_HOT_MIN events
# become the hot set (a bounded broadcast), and ONLY those keys get
# fact-side salts + dim-side explosion — cold keys join untouched
# with salt 0. Results are exactly the plain join's (the oracle), by
# construction.
#
# Scale: profile = one partial+final count per key (map-side
# combine); hot set is O(heavy keys) — broadcast; dim inflation is
# O(hot x SALT) rows instead of O(|dim| x SALT). The salt spreads
# each hot key over SALT reducers.
# ---------------------------------------------------------------------------
_J18_HOT_MIN = 80  # events-per-user at/above this => salted (max ~99)
_J18_SALT = 8


@register(
    "j18_skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j18_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5d) as bigint)").alias("cents"),
    )
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _J18_HOT_MIN)
        .select(F.col("user_id").alias("hot_id"))
    )
    fact = ev.join(
        F.broadcast(hot), ev.user_id == F.col("hot_id"), "left"
    ).select(
        "user_id",
        "cents",
        F.when(
            F.col("hot_id").isNotNull(), F.pmod("event_id", F.lit(_J18_SALT))
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = (
        cust.join(F.broadcast(hot), cust.c_custkey == F.col("hot_id"), "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.explode(
                F.when(
                    F.col("hot_id").isNotNull(),
                    F.sequence(F.lit(0), F.lit(_J18_SALT - 1)),
                ).otherwise(F.array(F.lit(0)))
            ).alias("salt"),
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        fact.join(
            dim,
            (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
def fastss_lev1_pairs(corpus: DataFrame) -> DataFrame:
    """All (w1 < w2) pairs of ``corpus.w`` within levenshtein 1, via
    the deletion-key equi-join (exact; see j19's header). Exposed as
    a library function so the property suite can drive it against a
    brute-force reference on arbitrary vocabularies."""
    # Deletion neighborhood: the word itself (pos 0) plus each
    # single-deletion variant, tagged so self-pairs can be dropped.
    keyed = corpus.select(
        "w",
        F.explode(
            F.expr(
                "transform(sequence(0, length(w)), i -> "
                "case when i = 0 then w "
                "else concat(substr(w, 1, i - 1), substr(w, i + 1)) end)"
            )
        ).alias("k"),
    ).distinct()
    return (
        keyed.alias("a")
        .join(keyed.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(F.col("a.w") < F.col("b.w"))
        .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .distinct()
        .filter(F.levenshtein("w1", "w2") <= 1)
    )




# ---------------------------------------------------------------------------
# J19 — edit-distance (Levenshtein <= 1) similarity join over the
# corpus vocabulary: the spell-variant/typo clustering primitive
# (OCR'd voter rolls, scraped web text) that naive engines run as an
# O(V^2) nested loop with a levenshtein filter.
#
# Spark side is the EXACT FastSS/SymSpell reduction to an equi-join:
# every word emits itself plus each single-character-deletion
# variant as join keys; two words are within edit distance 1 iff
# they share a key (equal words, insertion/deletion -> one's
# deletion equals the other, substitution -> same-position deletions
# coincide), with a final levenshtein verify to reject the
# same-key-but-distance-2 collisions (deletions at DIFFERENT
# positions can coincide, e.g. 'aab'/'aba' -> 'ab'... lev 2). Cost is
# O(V * avg_len) emitted keys and one hash join — linear scale-out,
# no quadratic block. The oracle is the brute-force O(V^2) definition,
# proving the reduction exact. The vocabulary is augmented with
# deterministic last-char-truncations so true lev-1 pairs exist at
# every sf.
# ---------------------------------------------------------------------------
@register(
    "j19_edit_distance_join",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT lower(w) AS w FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
      ) WHERE regexp_matches(lower(w), '^[a-z]{3,}$')
    ), corpus AS (
      SELECT w FROM tok
      UNION
      SELECT substr(w, 1, len(w) - 1) FROM tok WHERE len(w) >= 4
    )
    SELECT a.w AS w1, b.w AS w2,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM corpus a JOIN corpus b ON a.w < b.w
    WHERE levenshtein(a.w, b.w) <= 1
    """,
)
def j19_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select(F.lower("w").alias("w"))
        .filter(F.col("w").rlike("^[a-z]{3,}$"))
        .distinct()
    )
    corpus = tok.unionByName(
        tok.filter(F.length("w") >= 4).select(
            F.expr("substr(w, 1, length(w) - 1)").alias("w")
        )
    ).distinct()
    return fastss_lev1_pairs(corpus).select(
        "w1", "w2", F.levenshtein("w1", "w2").cast("long").alias("dist")
    )


# ---------------------------------------------------------------------------
# J20 — star-schema denormalization: materialize the wide flat table
# (order grain + customer + nation + region attributes + a lineitem
# rollup) that feature stores and training pipelines consume — the
# "join once, scan forever" trade every 100 TB shop makes. The plan
# is the canonical star shape: the fact table shuffles ONCE for the
# lineitem rollup join; every dimension (customer, nation, region)
# chains broadcast hash joins onto the map side — three dims cost
# zero additional shuffles. Output is filtered to one region to show
# the dim predicate pushing through the join chain.
# ---------------------------------------------------------------------------
@register(
    "j20_star_denorm",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             count(*) AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           c.c_mktsegment, n.n_name, r.r_name,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           li.n_items, li.qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN li ON o.o_orderkey = li.l_orderkey
    WHERE r.r_name = 'ASIA'
    """,
)
def j20_star_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("qty"),
        )
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "c_mktsegment",
            "n_name",
            "r_name",
            F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
                "cents"
            ),
            "n_items",
            "qty",
        )
    )


# ---------------------------------------------------------------------------
# J22 — bracket lookup (broadcast range join against a literal tier
# table): customers fall into balance tiers defined by [lo, hi)
# bounds — the tax-bracket / score-band lookup every enrichment
# pipeline runs. The tier table is a 4-row inline relation, so the
# non-equi join is a BroadcastNestedLoopJoin over a broadcast of
# FOUR rows — the one place a nested-loop join is exactly right
# (j7/j13 handle the fact-fact range case with binning; a bounded
# literal dimension needs none of that). Cents are exact integers;
# bounds are half-open so ties are unambiguous.
#
# Scale: map-side probe of a 4-row broadcast per row + bounded
# rollup — linear, no shuffle before the 4-group aggregate.
# ---------------------------------------------------------------------------
_J22_TIERS = [
    ("subzero", -100000000, 0),
    ("low", 0, 300000),
    ("mid", 300000, 700000),
    ("high", 700000, 100000000),
]


@register(
    "j22_bracket_lookup",
    oracle="""
    WITH tiers(tier, lo, hi) AS (VALUES
      ('subzero', -100000000, 0),
      ('low', 0, 300000),
      ('mid', 300000, 700000),
      ('high', 700000, 100000000)
    ), c AS (
      SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    )
    SELECT t.tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(c.cents) AS BIGINT) AS sum_cents
    FROM c JOIN tiers t ON c.cents >= t.lo AND c.cents < t.hi
    GROUP BY t.tier
    """,
)
def j22_bracket_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)").alias("cents")
    )
    tiers = F.broadcast(
        cust.sparkSession.createDataFrame(
            _J22_TIERS, "tier string, lo long, hi long"
        )
    )
    return (
        cust.join(
            tiers,
            (F.col("cents") >= F.col("lo")) & (F.col("cents") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# J23 — null-key skew split: a left join where a large fraction of
# fact rows carry NULL join keys (unattributed events, anonymous
# sessions — here every 11th order's custkey arrives null). Null
# keys can never match, yet a naive plan still SHUFFLES them all
# into one pathological bucket's worth of no-op work. The engine
# form splits null-key rows out BEFORE the join, joins only the
# keyed remainder, and unions the null rows back with null dims —
# the standard null-skew mitigation, equal to the naive join by
# definition (which is what the oracle states as a plain LEFT JOIN).
#
# Scale: the null branch is a map-side filter + union — zero
# shuffle for the skewed population; only real keys pay the join.
# ---------------------------------------------------------------------------
@register(
    "j23_null_skew_split",
    oracle="""
    WITH f AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_custkey END AS custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT coalesce(c.c_mktsegment, 'UNATTRIBUTED') AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(f.cents) AS BIGINT) AS sum_cents
    FROM f LEFT JOIN customer c ON c.c_custkey = f.custkey
    GROUP BY 1
    """,
)
def j23_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 11 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias(
            "cents"
        ),
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    keyed = orders.filter(F.col("custkey").isNotNull()).join(
        cust, "custkey", "left"
    )
    nulls = orders.filter(F.col("custkey").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    both = keyed.select("cents", "c_mktsegment").unionByName(
        nulls.select("cents", "c_mktsegment")
    )
    return both.groupBy(
        F.coalesce("c_mktsegment", F.lit("UNATTRIBUTED")).alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# J24 — join-explosion preflight audit: BEFORE running a self-join of
# events on user_id, compute exactly what it would produce — total
# output pairs (sum over keys of n^2), distinct keys, the worst key's
# contribution, and its share (bp) — from per-key counts alone. The
# 100 TB discipline: a join whose output explodes is detected from an
# O(keys) aggregate, never by running the explosion.
#
# Scale: one map-side-combined count per key, one O(keys) rollup; no
# join is ever executed. The worst key rides out via max_by.
# ---------------------------------------------------------------------------
@register(
    "j24_join_explosion_audit",
    oracle="""
    WITH k AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(n * n) AS BIGINT) AS total_pairs,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n * n) AS BIGINT) AS worst_key_pairs,
           CAST(arg_max(user_id, n * n * 1000000 + user_id) AS BIGINT)
             AS worst_key,
           CAST(10000 * max(n * n) // sum(n * n) AS BIGINT)
             AS worst_share_bp
    FROM k
    """,
)
def j24_join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # worst-key tie-break folded into one bigint so max_by is total-
    # ordered (largest product, then largest user_id) in both engines.
    return k.agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("total_pairs"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max(F.col("n") * F.col("n")).cast("long").alias("worst_key_pairs"),
        F.max_by(
            "user_id", F.expr("n * n * 1000000 + user_id")
        ).cast("long").alias("worst_key"),
        F.expr(
            "cast(10000 * max(n * n) div sum(n * n) as bigint)"
        ).alias("worst_share_bp"),
    )


# ---------------------------------------------------------------------------
# J25 — interval-intersection measure: per customer, how many days
# their URGENT-order windows overlap their HIGH-order windows (each
# order opens a [date, date + 1 + key%5 days) window). w19 measures
# one set's union; this measures the INTERSECTION of two sets — the
# "were both campaigns live" / "policy and claim both active"
# question — with the same boundary-sweep discipline: +1/-1 events,
# per-key running counts, and segment lengths summed where BOTH
# counts are positive. Never an interval-pair join (that is O(nA*nB)
# per key); the sweep is O(n log n) in boundaries.
#
# Scale: boundaries aggregate per (cust, day) first so event times
# are unique; one customer-partitioned window pass computes both
# running counts and the segment length together.
# ---------------------------------------------------------------------------
@register(
    "j25_interval_intersect_measure",
    oracle="""
    WITH iv AS (
      SELECT o_custkey AS cust,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END
               AS s,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS lo,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               + 1 + o_orderkey % 5 AS hi
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), ev AS (
      SELECT cust, t,
             CAST(sum(da) AS BIGINT) AS da, CAST(sum(db) AS BIGINT) AS db
      FROM (
        SELECT cust, lo AS t,
               CASE WHEN s = 'a' THEN 1 ELSE 0 END AS da,
               CASE WHEN s = 'b' THEN 1 ELSE 0 END AS db
        FROM iv
        UNION ALL
        SELECT cust, hi,
               CASE WHEN s = 'a' THEN -1 ELSE 0 END,
               CASE WHEN s = 'b' THEN -1 ELSE 0 END
        FROM iv
      ) GROUP BY cust, t
    ), sweep AS (
      SELECT cust, t,
             sum(da) OVER (PARTITION BY cust ORDER BY t) AS ca,
             sum(db) OVER (PARTITION BY cust ORDER BY t) AS cb,
             lead(t) OVER (PARTITION BY cust ORDER BY t) AS nt
      FROM ev
    )
    SELECT cust AS custkey,
           CAST(sum(nt - t) AS BIGINT) AS overlap_days
    FROM sweep
    WHERE ca > 0 AND cb > 0 AND nt IS NOT NULL
    GROUP BY cust
    HAVING sum(nt - t) > 0
    """,
)
def j25_interval_intersect_measure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    iv = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.col("o_custkey").alias("cust"),
        F.expr(
            "case when o_orderpriority = '1-URGENT' then 'a' else 'b' end"
        ).alias("s"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("lo"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            + 1
            + F.col("o_orderkey") % 5
        ).alias("hi"),
    )
    opens = iv.select(
        "cust",
        F.col("lo").alias("t"),
        F.expr("case when s = 'a' then 1 else 0 end").alias("da"),
        F.expr("case when s = 'b' then 1 else 0 end").alias("db"),
    )
    closes = iv.select(
        "cust",
        F.col("hi").alias("t"),
        F.expr("case when s = 'a' then -1 else 0 end").alias("da"),
        F.expr("case when s = 'b' then -1 else 0 end").alias("db"),
    )
    ev = (
        opens.unionByName(closes)
        .groupBy("cust", "t")
        .agg(
            F.sum("da").cast("long").alias("da"),
            F.sum("db").cast("long").alias("db"),
        )
    )
    w = W.partitionBy("cust").orderBy("t")
    cum = w.rowsBetween(W.unboundedPreceding, 0)
    sweep = ev.select(
        "cust",
        "t",
        F.sum("da").over(cum).alias("ca"),
        F.sum("db").over(cum).alias("cb"),
        F.lead("t").over(w).alias("nt"),
    )
    return (
        sweep.filter(
            (F.col("ca") > 0) & (F.col("cb") > 0) & F.col("nt").isNotNull()
        )
        .groupBy(F.col("cust").alias("custkey"))
        .agg(F.sum(F.col("nt") - F.col("t")).cast("long").alias("overlap_days"))
        .filter(F.col("overlap_days") > 0)
    )


# ---------------------------------------------------------------------------
# J26 — role-playing conformed date dimension: ONE date dimension
# (derived once: year, month, ISO weekday) joined into the fact twice
# under different roles — the order date and the ship date — the
# Kimball pattern that keeps calendar attributes consistent across
# every role instead of re-deriving them per column. The rollup
# reads both roles at once (ordered-in month x shipped-on weekday),
# which only works when the two role joins are alias-disambiguated
# views of the same dim.
#
# Scale: the dim is O(distinct dates) and broadcasts for BOTH roles;
# the fact is scanned once; weekday bridging uses weekday()+1 ==
# DuckDB isodow (the a46/a66 discipline).
# ---------------------------------------------------------------------------
@register(
    "j26_role_playing_dates",
    oracle="""
    WITH fact AS (
      SELECT o.o_orderdate AS od, l.l_shipdate AS sd,
             CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), dim AS (
      SELECT d, CAST(date_part('year', d) AS BIGINT) AS yr,
             CAST(date_part('month', d) AS BIGINT) AS mo,
             CAST(isodow(d) AS BIGINT) AS dow
      FROM (SELECT DISTINCT od AS d FROM fact
            UNION SELECT DISTINCT sd FROM fact)
    )
    SELECT ord.yr AS order_year, ord.mo AS order_month,
           shp.dow AS ship_isodow,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(f.qty) AS BIGINT) AS total_qty
    FROM fact f
    JOIN dim ord ON f.od = ord.d
    JOIN dim shp ON f.sd = shp.d
    GROUP BY 1, 2, 3
    """,
)
def j26_role_playing_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == orders.o_orderkey,
    ).select(
        F.col("o_orderdate").alias("od"),
        F.col("l_shipdate").alias("sd"),
        F.expr("cast(floor(l_quantity + 0.5d) as bigint)").alias("qty"),
    )
    # The dim is a CALENDAR SPINE over the observed range, not a
    # distinct-scan of the fact: deriving it from the joined fact
    # would re-scan both fact tables once per role branch (Catalyst
    # does not CSE the subtree). Bounds come from two 1-column
    # pruned scans; the spine is O(days); unmatched spine dates drop
    # in the inner role joins, so the result is identical to the
    # oracle's distinct-dates dim.
    b1 = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    b2 = li.agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    )
    bounds = b1.unionByName(b2).agg(
        F.min("lo").cast("date").alias("lo"),
        F.max("hi").cast("date").alias("hi"),
    )
    dim = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi)")).alias("dd")
        )
        .select(
            F.col("dd").cast("timestamp_ntz").alias("d"),
            F.year("dd").cast("long").alias("yr"),
            F.month("dd").cast("long").alias("mo"),
            (F.weekday("dd") + 1).cast("long").alias("dow"),
        )
    )
    ordd = F.broadcast(
        dim.select(
            F.col("d").alias("od"),
            F.col("yr").alias("order_year"),
            F.col("mo").alias("order_month"),
        )
    )
    shpd = F.broadcast(
        dim.select(F.col("d").alias("sd"), F.col("dow").alias("ship_isodow"))
    )
    return (
        fact.join(ordd, "od")
        .join(shpd, "sd")
        .groupBy("order_year", "order_month", "ship_isodow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("qty").cast("long").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# J27 — anti range join: "error events with NO click by any user
# within +-90 s". The reference's manifest anti-check (load.ts:98-108)
# is an equi NOT-EXISTS; this is its inequality-predicate sibling —
# the shape a naive planner turns into a nested-loop/cartesian anti
# join (no equi key connects the two sides at all).
#
# Scale: the inequality |e - c| <= 90 s is bucketized — both sides
# key on floor(t_us / 90 s); a click can only absolve errors in its
# own bucket or the two adjacent ones, so clicks explode to exactly
# 3 coverage rows and the anti join becomes an EQUI left_anti on the
# bucket with the exact predicate as the residual condition. Shuffle
# is hash(bucket) — time-uniform by construction — expansion is a
# fixed 3x of the SMALLER side, and the plan stays a partitionable
# hash/SMJ anti join at any corpus size (gated: no CartesianProduct,
# no BroadcastNestedLoop).
# ---------------------------------------------------------------------------
@register(
    "j27_anti_range_join",
    # Oracle = a DIFFERENT algorithm (sort-based nearest-neighbor):
    # an error has no click within 90 s iff both its nearest click
    # before (running max over the merged time-sorted stream) and
    # after (running min) are farther than the window. RANGE frames
    # make same-timestamp clicks peers of the error in both frames,
    # so the |Δ| = 0 case counts in both directions. O(n log n), no
    # join — the r8 a45 audit (tools/oracle_plan_audit.py) caught the
    # previous NOT-EXISTS-on-pure-inequality form compiling to a
    # BLOCKWISE_NL_JOIN (errors x clicks ~ 4e10 pairs at sf1.0).
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type, epoch_us(ts) AS t
      FROM events WHERE event_type IN ('error', 'click')
    ), nbr AS (
      SELECT event_id, event_type, t,
             max(CASE WHEN event_type = 'click' THEN t END)
               OVER (ORDER BY t
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_click,
             min(CASE WHEN event_type = 'click' THEN t END)
               OVER (ORDER BY t
                     RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_click
      FROM ev
    )
    SELECT event_id, CAST(t AS BIGINT) AS t_us
    FROM nbr
    WHERE event_type = 'error'
      AND (prev_click IS NULL OR t - prev_click > 90000000)
      AND (next_click IS NULL OR next_click - t > 90000000)
    """,
)
def j27_anti_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_us = 90_000_000  # 90 s in microseconds == the bucket width
    ev = t(spark, sf_dir, "events")
    # Integer `div`, not float floor(): epoch micros are ~1.7e15 and
    # a double-rounded boundary could (one-in-a-billion) break the
    # |bucket(e)-bucket(c)| <= 1 coverage proof; div is exact and the
    # timestamps are positive, so div == floor division here.
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.expr(f"unix_micros(ts) div {w_us}").alias("bkt"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.unix_micros("ts").alias("c_us"),
            F.expr(f"unix_micros(ts) div {w_us}").alias("cb"),
        )
        .select(
            "c_us",
            F.explode(
                F.array(F.col("cb") - 1, F.col("cb"), F.col("cb") + 1)
            ).alias("bkt"),
        )
    )
    return errors.join(
        clicks,
        (errors.bkt == clicks.bkt)
        & (F.abs(errors.t_us - clicks.c_us) <= w_us),
        "left_anti",
    ).select("event_id", "t_us")
