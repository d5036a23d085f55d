"""Derived-column / scalar functions (SURVEY.md §2.3, §2.10).

Ports the reference's scalar surface — geohash (load-s3.ts:186-193),
city-suffix cleanup (load-s3.ts:194-196), filename parsing
(load.ts:93, utils.ts:18-23) — plus the string/date/math/conditional
function families its implied queries need. Everything is a built-in
Column expression (whole-stage codegen; no Python in the row path).

Cross-engine float policy: raw IEEE ops (+,-,*,/, sqrt, abs, floor,
ceil, mod) are bit-identical across engines; libm-backed ln is
rounded to 6 decimals; round() itself is avoided at .5-sensitive
scales because Spark (decimal-string HALF_UP) and DuckDB (binary)
disagree on doubles that print as x.x5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voter_file_etl_spark.functions.geohash import geohash_col, geohash_sql
from voter_file_etl_spark.functions.intmath import half_up, half_up_sql
from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import t

# ---------------------------------------------------------------------------
# F1 — geohash derived column (precision 8, like load-s3.ts:186-193).
# Pseudo-coordinates are integer-derived so both engines compute
# identical doubles; the encoding itself is the closed-form
# bit-interleave from functions/geohash.py on both sides.
# ---------------------------------------------------------------------------
_LAT = "(-90.0 + (c_custkey % 180) + 0.25)"
_LON = "(-180.0 + ((c_custkey * 7) % 360) + 0.25)"


@register(
    "f1_geohash",
    oracle=f"""
    SELECT c_custkey,
           {_LAT} AS lat,
           {_LON} AS lon,
           {geohash_sql(_LAT, _LON, 8, "duckdb")} AS geohash
    FROM customer
    """,
)
def f1_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    lat = F.expr(_LAT)
    lon = F.expr(_LON)
    return customer.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        geohash_col(lat, lon, 8).alias("geohash"),
    )


# ---------------------------------------------------------------------------
# F2/F5 — string cleanup: strip the literal " (EST.)" suffix
# (load-s3.ts:194-196) and extension rewrite (download.ts:73-74).
# ---------------------------------------------------------------------------
@register(
    "f2_str_replace",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(concat(upper(source), ' (EST.)'), ' \(EST\.\)$', '')
               AS city_clean,
           replace(source, 'src', 'file_') AS renamed,
           regexp_replace(concat(source, '.zip'), '\.zip$', '.tab') AS tab_name
    FROM documents
    """,
)
def f2_str_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.concat(F.upper("source"), F.lit(" (EST.)")), r" \(EST\.\)$", ""
        ).alias("city_clean"),
        F.replace(F.col("source"), F.lit("src"), F.lit("file_")).alias("renamed"),
        F.regexp_replace(
            F.concat(F.col("source"), F.lit(".zip")), r"\.zip$", ".tab"
        ).alias("tab_name"),
    )


# ---------------------------------------------------------------------------
# F3 — filename parsing: `{seq}--{STATE}--{date}.tab` split
# (load.ts:93; utils.ts:18-23; download.ts:79).
# ---------------------------------------------------------------------------
@register(
    "f3_split_extract",
    oracle="""
    SELECT o_orderkey,
           split_part(concat(CAST(o_orderkey AS VARCHAR), '--', o_orderstatus,
                             '--20250101.tab'), '--', 2) AS state,
           CAST(split_part(concat(CAST(o_orderkey AS VARCHAR), '--', o_orderstatus,
                                  '--20250101.tab'), '--', 1) AS INTEGER) AS seq
    FROM orders
    """,
)
def f3_split_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    fname = F.concat(
        F.col("o_orderkey").cast("string"),
        F.lit("--"),
        F.col("o_orderstatus"),
        F.lit("--20250101.tab"),
    )
    return orders.select(
        "o_orderkey",
        F.split_part(fname, F.lit("--"), F.lit(2)).alias("state"),
        F.split_part(fname, F.lit("--"), F.lit(1)).cast("int").alias("seq"),
    )


# ---------------------------------------------------------------------------
# T1 — string function family.
# ---------------------------------------------------------------------------
@register(
    "t1_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           substr(c_name, 1, 8) AS prefix8,
           length(c_name) AS name_len,
           concat(c_name, '/', c_mktsegment) AS joined,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
           reverse(c_mktsegment) AS rev
    FROM customer
    """,
)
def t1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
    )


# ---------------------------------------------------------------------------
# T2 — date function family (age = current year - year of birth,
# Voter.prisma:58 comment; MM/dd/yyyy parsing lives in p3_cast).
# ---------------------------------------------------------------------------
@register(
    "t2_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INTEGER) AS days_since,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(2026 - year(o_orderdate) AS INTEGER) AS age_years
    FROM orders
    """,
)
def t2_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.date_add(d, 30).alias("plus30"),
        (F.lit(2026) - F.year("o_orderdate")).alias("age_years"),
    )


# ---------------------------------------------------------------------------
# T3 — math function family (lat/long arithmetic of the enrichment
# path). Only IEEE-deterministic ops cross the engine boundary raw;
# ln is rounded to 6 decimals.
# ---------------------------------------------------------------------------
@register(
    "t3_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           {half_up_sql("ln(l_extendedprice)", 6)} AS price_ln
    FROM lineitem
    """,
)
def t3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        # half_up, not F.round: x34's half-up-vs-half-even tie class.
        half_up(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


# ---------------------------------------------------------------------------
# T4 — conditional family: the null-normalization pattern
# (load.ts:31-34) generalized to when/otherwise, coalesce, nullif.
# ---------------------------------------------------------------------------
@register(
    "t4_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') AS urgent,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
               AS finished_price
    FROM orders
    """,
)
def t4_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_filled"
        ),
        (
            F.col("o_orderpriority").startswith("1")
            | F.col("o_orderpriority").startswith("2")
        ).alias("urgent"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("finished_price"),
    )


# ---------------------------------------------------------------------------
# T7 — array construction + predicates: collect_set -> sorted array
# per group, membership and size checks. Spark's array functions are
# JVM expressions; collect_set is a partial+final aggregate like any
# other (set union is the combine), so the shuffle carries one
# partial set per (group, partition).
#
# Final-output rule (driver contract): no array/map/struct columns in
# a registered query's output — the driver's value-hash cannot digest
# them. The array is exercised end-to-end (collect_set -> array_sort
# -> size/contains) and then scalarized via array_join for the
# comparison boundary.
# ---------------------------------------------------------------------------
@register(
    "t7_array_funcs",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS priorities,
           len(list(DISTINCT o_orderpriority)) AS n_prios,
           list_contains(list(DISTINCT o_orderpriority), '1-URGENT') AS has_urgent
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def t7_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    prios = F.array_sort(F.collect_set("o_orderpriority"))
    return joined.groupBy("c_mktsegment").agg(
        F.array_join(prios, ",").alias("priorities"),
        F.size(prios).alias("n_prios"),
        F.array_contains(prios, "1-URGENT").alias("has_urgent"),
    )


# ---------------------------------------------------------------------------
# T8 — regular-expression functions: extract, partial match, replace.
# All JVM expressions (java.util.regex); both engines use
# leftmost-first partial matching for the predicates here.
# ---------------------------------------------------------------------------
@register(
    "t8_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_matches(p_type, '^PROMO') AS is_promo,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    WHERE regexp_matches(p_type, 'BRUSHED|ANODIZED')
    """,
)
def t8_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.filter(F.col("p_type").rlike("BRUSHED|ANODIZED")).select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
        F.col("p_type").rlike("^PROMO").alias("is_promo"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


# ---------------------------------------------------------------------------
# T9 — haversine distance over the deterministic pseudo-coordinates
# of J5: the proximity measure behind the geohash-prefix join (two
# points sharing a 4-char prefix are "close"; this computes how
# close). Trig runs in each engine's libm, so the result is rounded
# to 6 decimals (sub-millimeter) at the oracle boundary.
# ---------------------------------------------------------------------------
_HAV_KM = (
    "2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
)


@register(
    "t9_haversine",
    oracle=f"""
    SELECT c_custkey, s_suppkey,
           {half_up_sql(_HAV_KM.format(
               lat1="-90.0 + (c_custkey % 180) + 0.25",
               lon1="-180.0 + ((c_custkey * 7) % 360) + 0.25",
               lat2="-90.0 + ((s_suppkey * 3) % 180) + 0.25",
               lon2="-180.0 + ((s_suppkey * 11) % 360) + 0.25",
           ), 6)} AS dist_km
    FROM (SELECT c_custkey FROM customer WHERE c_custkey < 100)
    CROSS JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 50)
    """,
)
def t9_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100).select("c_custkey")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 50).select("s_suppkey")
    km = _HAV_KM.format(
        lat1="-90.0D + (c_custkey % 180) + 0.25D",
        lon1="-180.0D + ((c_custkey * 7) % 360) + 0.25D",
        lat2="-90.0D + ((s_suppkey * 3) % 180) + 0.25D",
        lon2="-180.0D + ((s_suppkey * 11) % 360) + 0.25D",
    )
    # half_up, not F.round: x34's half-up-vs-half-even tie class.
    return c.crossJoin(F.broadcast(s)).select(
        "c_custkey", "s_suppkey", half_up(F.expr(km), 6).alias("dist_km")
    )


# ---------------------------------------------------------------------------
# F4 — contact normalization (the VoterTelephones_* columns' implied
# cleanup): strip formatting to bare digits, validate digit count,
# split the area prefix. The raw phone is synthesized from the key in
# mixed formats — "(312) 555-0148", "312-555-0148", "312.555.0148" —
# so the normalizer provably handles format variance. Pure
# regexp/substring Column expressions: whole-stage codegen, no
# Python.
# ---------------------------------------------------------------------------
_PH_AREA = "lpad(CAST(200 + (c_custkey % 700) AS VARCHAR), 3, '0')"
_PH_LINE = "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"


@register(
    "f4_normalize_phone",
    oracle=f"""
    WITH raw AS (
      SELECT c_custkey,
             CASE c_custkey % 3
               WHEN 0 THEN concat('(', {_PH_AREA}, ') 555-', {_PH_LINE})
               WHEN 1 THEN concat({_PH_AREA}, '-555-', {_PH_LINE})
               ELSE concat({_PH_AREA}, '.555.', {_PH_LINE})
             END AS phone
      FROM customer
    )
    SELECT c_custkey, phone,
           regexp_replace(phone, '[^0-9]', '', 'g') AS digits,
           length(regexp_replace(phone, '[^0-9]', '', 'g')) AS n_digits,
           substr(regexp_replace(phone, '[^0-9]', '', 'g'), 1, 3) AS area_code,
           length(regexp_replace(phone, '[^0-9]', '', 'g')) = 10 AS valid
    FROM raw
    """,
)
def f4_normalize_phone(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    area = "lpad(cast(200 + c_custkey % 700 as string), 3, '0')"
    line = "lpad(cast(c_custkey % 10000 as string), 4, '0')"
    phone = (
        f"CASE c_custkey % 3"
        f" WHEN 0 THEN concat('(', {area}, ') 555-', {line})"
        f" WHEN 1 THEN concat({area}, '-555-', {line})"
        f" ELSE concat({area}, '.555.', {line}) END"
    )
    # Let-bind phone and its digit-stripped form: written as plain
    # aliases, projection collapse re-inlines the regexp_replace into
    # all four consumers (4 regexp evaluations per row, r7 sweep).
    return customer.selectExpr(
        "c_custkey",
        f"inline(transform(array({phone}), ph -> "
        "transform(array(regexp_replace(ph, '[^0-9]', '')), d -> "
        "named_struct("
        "'phone', ph,"
        "'digits', d,"
        "'n_digits', length(d),"
        "'area_code', substring(d, 1, 3),"
        "'valid', length(d) = 10))[0]))",
    )


# ---------------------------------------------------------------------------
# F5 — postal address standardization (the Residence_Addresses_*
# columns' implied cleanup, the USPS-suffix normalization every voter
# matcher does before comparing addresses): uppercase, strip
# punctuation, abbreviate street suffixes (STREET->ST, AVENUE->AVE,
# ROAD->RD, BOULEVARD->BLVD, DRIVE->DR), collapse whitespace. Raw
# addresses are synthesized from the key in mixed styles so the
# normalizer provably handles the variance. Chained regexp_replace
# Column expressions — word-boundary patterns valid in both Java
# regex and RE2 — whole-stage codegen, no Python.
# ---------------------------------------------------------------------------
_ADDR_STREET_NAMES = ("Oak", "Maple", "Cedar", "Elm", "Pine", "Lake", "Hill")
_ADDR_SUFFIXES = ("Street", "Avenue", "Road", "Boulevard", "Drive")
_ADDR_ABBREV = {"STREET": "ST", "AVENUE": "AVE", "ROAD": "RD",
                "BOULEVARD": "BLVD", "DRIVE": "DR"}


def _f5_raw_sql(dialect: str) -> str:
    name_case = " ".join(
        f"WHEN {i} THEN '{n}'" for i, n in enumerate(_ADDR_STREET_NAMES)
    )
    suf_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_ADDR_SUFFIXES)
    )
    strtype = "VARCHAR" if dialect == "duckdb" else "STRING"
    return (
        f"concat(CAST(1 + c_custkey % 9999 AS {strtype}), ' ', "
        f"CASE c_custkey % {len(_ADDR_STREET_NAMES)} {name_case} END, ' ', "
        f"CASE c_custkey % {len(_ADDR_SUFFIXES)} {suf_case} END, "
        f"CASE WHEN c_custkey % 4 = 0 THEN '  Apt. 5' ELSE '' END)"
    )


def _f5_std_sql(col: str, dialect: str) -> str:
    # Spark SQL string literals treat backslash as an escape (so the
    # regex word boundary must be written '\\b'); DuckDB literals keep
    # the backslash as-is.
    g = ", 'g'" if dialect == "duckdb" else ""
    b = "\\" if dialect == "duckdb" else "\\\\"
    out = f"upper({col})"
    out = f"regexp_replace({out}, '[.]', ''{g})"
    for full, abbr in _ADDR_ABBREV.items():
        out = f"regexp_replace({out}, '{b}b{full}{b}b', '{abbr}'{g})"
    return f"trim(regexp_replace({out}, ' +', ' '{g}))"


@register(
    "f5_address_standardize",
    oracle=f"""
    WITH raw AS (
      SELECT c_custkey, {_f5_raw_sql("duckdb")} AS raw_address FROM customer
    )
    SELECT c_custkey, raw_address,
           {_f5_std_sql("raw_address", "duckdb")} AS std_address
    FROM raw
    """,
)
def f5_address_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    raw = customer.select(
        "c_custkey", F.expr(_f5_raw_sql("spark")).alias("raw_address")
    )
    return raw.select(
        "c_custkey",
        "raw_address",
        F.expr(_f5_std_sql("raw_address", "spark")).alias("std_address"),
    )


# ---------------------------------------------------------------------------
# T12 — hash & binary-encoding functions: md5 / sha256 content
# hashes (the file-fingerprint role the reference's manifest plays —
# load.ts records each landed file; a content hash is how a 100 TB
# lake detects re-delivered files), base64/hex transport encodings,
# and an unbase64 round-trip proving the codec is lossless. All
# byte-deterministic, so the cross-engine check is exact; hex case
# is normalized (Spark upper, DuckDB upper for blobs — lower()ed on
# both sides). Everything is a JVM intrinsic inside one codegen
# stage: no UDF, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "t12_hash_encode",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS md5_hex,
           sha256(c_name) AS sha256_hex,
           to_base64(encode(c_name)) AS b64,
           lower(hex(encode(c_name))) AS hex_lc,
           decode(from_base64(to_base64(encode(c_name)))) AS roundtrip
    FROM customer
    """,
)
def t12_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    name_bin = F.col("c_name").cast("binary")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.md5(name_bin).alias("md5_hex"),
        F.sha2(F.col("c_name"), 256).alias("sha256_hex"),
        F.base64(name_bin).alias("b64"),
        F.lower(F.hex(name_bin)).alias("hex_lc"),
        F.unbase64(F.base64(name_bin)).cast("string").alias("roundtrip"),
    )


# ---------------------------------------------------------------------------
# T13 — date/interval arithmetic: month addition with end-of-month
# clamping (Spark add_months == DuckDB + INTERVAL n MONTH — both
# clamp 2020-01-31 + 1 month to 2020-02-29), day offsets, day
# difference, month truncation, last-day-of-month, and calendar
# field extraction. All calendar-exact integer/date results — no
# timezone or float hazard (dates only, session tz pinned UTC).
# ---------------------------------------------------------------------------
@register(
    "t13_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus_3_months,
           CAST(CAST(o_orderdate AS DATE) + 45 AS DATE) AS plus_45_days,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
             AS days_to_eoy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def t13_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            d.alias("d"),
            F.add_months(d, 3).alias("plus_3_months"),
            F.date_add(d, 45).alias("plus_45_days"),
            F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_eoy"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.last_day(d).alias("month_end"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            (F.dayofweek(d) - F.lit(1)).alias("dow"),
        )
    )


# ---------------------------------------------------------------------------
# F6 — multi-format date recovery: ingest feeds mix date formats
# (ISO, US slash, compact) and a correct loader must try each format
# and surface which one matched — the reference's filename/field
# date parsing generalized. A dirty string column is derived
# deterministically (format chosen by orderkey % 3), then recovered
# with a try_to_timestamp/try_strptime coalesce chain; unparseable
# is impossible here by construction, so the match-format histogram
# is exact. All map-side expressions — no shuffle but the final
# bounded groupBy.
# ---------------------------------------------------------------------------
@register(
    "f6_multi_format_dates",
    oracle="""
    WITH dirty AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
               ELSE strftime(o_orderdate, '%Y%m%d')
             END AS raw,
             o_orderdate AS truth
      FROM orders
    ), parsed AS (
      SELECT o_orderkey, truth,
             CASE
               WHEN TRY_CAST(TRY_STRPTIME(raw, '%m/%d/%Y') AS DATE)
                    IS NOT NULL AND raw LIKE '%/%'
                 THEN 'us_slash'
               WHEN raw NOT LIKE '%-%' AND raw NOT LIKE '%/%'
                 THEN 'compact'
               ELSE 'iso'
             END AS matched_format,
             COALESCE(
               CASE WHEN raw LIKE '%/%'
                    THEN TRY_CAST(TRY_STRPTIME(raw, '%m/%d/%Y') AS DATE) END,
               CASE WHEN raw NOT LIKE '%-%' AND raw NOT LIKE '%/%'
                    THEN TRY_CAST(TRY_STRPTIME(raw, '%Y%m%d') AS DATE) END,
               TRY_CAST(TRY_STRPTIME(raw, '%Y-%m-%d') AS DATE)
             ) AS recovered
      FROM dirty
    )
    SELECT matched_format,
           count(*) AS n_rows,
           count(CASE WHEN recovered = truth THEN 1 END) AS n_roundtrip
    FROM parsed GROUP BY matched_format
    """,
)
def f6_multi_format_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").alias("truth"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.date_format("o_orderdate", "MM/dd/yyyy"),
        )
        .otherwise(F.date_format("o_orderdate", "yyyyMMdd"))
        .alias("raw"),
    )
    parsed = d.select(
        "truth",
        F.when(
            F.col("raw").contains("/"), F.lit("us_slash")
        )
        .when(
            ~F.col("raw").contains("-") & ~F.col("raw").contains("/"),
            F.lit("compact"),
        )
        .otherwise(F.lit("iso"))
        .alias("matched_format"),
        F.coalesce(
            F.when(
                F.col("raw").contains("/"),
                F.expr("try_to_timestamp(raw, 'MM/dd/yyyy')").cast("date"),
            ),
            F.when(
                ~F.col("raw").contains("-") & ~F.col("raw").contains("/"),
                F.expr("try_to_timestamp(raw, 'yyyyMMdd')").cast("date"),
            ),
            F.expr("try_to_timestamp(raw, 'yyyy-MM-dd')").cast("date"),
        ).alias("recovered"),
    )
    return parsed.groupBy("matched_format").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("recovered") == F.col("truth"), 1)).alias(
            "n_roundtrip"
        ),
    )


# ---------------------------------------------------------------------------
# F7 — IPv4 parse/format roundtrip + /16 subnet rollup: server-log
# enrichment needs ip-string <-> integer conversion and subnet
# bucketing (the reference's per-file provenance generalized to
# network provenance). An IPv4 is synthesized deterministically per
# user (Knuth multiplicative hash of user_id, so the address space is
# well spread), formatted to dotted-quad with pure integer div/mod,
# re-parsed via split + recompose (proving the inverse), and rolled
# up to /16 subnets. Everything is map-side integer arithmetic in
# whole-stage codegen; the only shuffle is the bounded /16 groupBy
# (<= 65536 groups at ANY corpus size — the rollup key domain is
# fixed, so this aggregates map-side-partial first and cannot skew
# with data volume).
# ---------------------------------------------------------------------------
@register(
    "f7_ipv4_funcs",
    oracle="""
    WITH ip AS (
      SELECT user_id,
             (user_id * 2654435761) % 4294967296 AS ip_int
      FROM (SELECT DISTINCT user_id FROM events)
    ), fmt AS (
      SELECT user_id, ip_int,
             CAST(ip_int // 16777216 AS VARCHAR) || '.' ||
             CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
             CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
             CAST(ip_int % 256 AS VARCHAR) AS ip_str
      FROM ip
    ), parsed AS (
      SELECT user_id, ip_int, ip_str,
             CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216 +
             CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536 +
             CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256 +
             CAST(string_split(ip_str, '.')[4] AS BIGINT) AS reparsed
      FROM fmt
    )
    SELECT ip_int // 65536 AS subnet16,
           CAST(min(ip_str) AS VARCHAR) AS sample_ip,
           count(*) AS n_users,
           count(CASE WHEN reparsed = ip_int THEN 1 END) AS n_roundtrip
    FROM parsed
    GROUP BY subnet16
    HAVING count(*) >= 2
    """,
)
def f7_ipv4_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ip = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            ((F.col("user_id") * 2654435761) % 4294967296).alias("ip_int"),
        )
    )
    fmt = ip.select(
        "user_id",
        "ip_int",
        F.concat_ws(
            ".",
            (F.col("ip_int") / 16777216).cast("long"),
            ((F.col("ip_int") / 65536) % 256).cast("long"),
            ((F.col("ip_int") / 256) % 256).cast("long"),
            (F.col("ip_int") % 256).cast("long"),
        ).alias("ip_str"),
    )
    oct_ = lambda i: F.split("ip_str", r"\.").getItem(i).cast("long")  # noqa: E731
    parsed = fmt.select(
        "user_id",
        "ip_int",
        "ip_str",
        (
            oct_(0) * 16777216 + oct_(1) * 65536 + oct_(2) * 256 + oct_(3)
        ).alias("reparsed"),
    )
    return (
        parsed.groupBy(
            (F.col("ip_int") / 65536).cast("long").alias("subnet16")
        )
        .agg(
            F.min("ip_str").alias("sample_ip"),
            F.count(F.lit(1)).alias("n_users"),
            F.count(
                F.when(F.col("reparsed") == F.col("ip_int"), 1)
            ).alias("n_roundtrip"),
        )
        .filter(F.col("n_users") >= 2)
    )


# ---------------------------------------------------------------------------
# T14 — bitwise expression + aggregate surface: flag-packed columns
# (permission masks, feature flags, bloom words) need &, |, ^,
# shifts, popcount scalar-side and bit_and/bit_or/bit_xor
# aggregate-side. Scalars run per-row in codegen; the aggregates are
# algebraic (word-wise associative/commutative), so they combine
# map-side-partial like any sum — shuffle volume is one 3-word state
# per (group x partition) regardless of row count.
# ---------------------------------------------------------------------------
@register(
    "t14_bitwise_funcs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           bit_and(user_id & 1023) AS flags_all,
           bit_or(user_id & 1023) AS flags_any,
           bit_xor(user_id & 1023) AS flags_parity,
           CAST(sum(bit_count(CAST(user_id & 1023 AS BIGINT))) AS BIGINT)
             AS popcount_sum,
           CAST(sum(CASE WHEN (user_id & 7) = 0
                         THEN (user_id << 2) % 1000003
                         ELSE xor(user_id, 255) % 1000003 END) AS BIGINT)
             AS mixed_expr
    FROM events
    GROUP BY event_type
    """,
)
def t14_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id").bitwiseAND(1023)).alias("flags"),
        F.expr(
            "case when (user_id & 7) = 0 then shiftleft(user_id, 2) % 1000003 "
            "else (user_id ^ 255) % 1000003 end"
        ).alias("mixed"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_and(flags)").alias("flags_all"),
        F.expr("bit_or(flags)").alias("flags_any"),
        F.expr("bit_xor(flags)").alias("flags_parity"),
        F.sum(F.bit_count(F.col("flags").cast("long"))).alias("popcount_sum"),
        F.sum("mixed").cast("long").alias("mixed_expr"),
    )


# ---------------------------------------------------------------------------
# F8 — cryptographic digest surface (md5 / sha-256): content
# addressing is the backbone of exact dedup (x1 hashes text; this
# key proves the raw digest primitives agree cross-engine,
# lowercase-hex and all). Emits per-document digests for a
# deterministic 1-in-97 keyspace slice (bounded output at any sf)
# plus each digest's first nibble so the uniformity of the hash is
# visible. Pure map-side expressions in codegen; the only plan nodes
# are scan -> filter (pushed) -> project.
# ---------------------------------------------------------------------------
@register(
    "f8_hash_digest_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           substr(md5(text), 1, 1) AS md5_nibble,
           CAST(len(md5(text)) AS INTEGER) AS md5_len,
           CAST(len(sha256(text)) AS INTEGER) AS sha256_len
    FROM documents WHERE doc_id % 97 = 0
    """,
)
def f8_hash_digest_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Each digest is let-bound and computed ONCE per row (plain
    # aliases re-inline md5 3x and sha2 2x per row, r7 sweep).
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .selectExpr(
            "doc_id",
            "inline(transform(array(md5(text)), m -> "
            "transform(array(sha2(text, 256)), s -> named_struct("
            "'md5_hex', m,"
            "'sha256_hex', s,"
            "'md5_nibble', substring(m, 1, 1),"
            "'md5_len', length(m),"
            "'sha256_len', length(s)))[0]))",
        )
    )


# ---------------------------------------------------------------------------
# F9 — URL parsing surface: host / path / per-key query-parameter
# extraction, the click-log normalization step of every web-scale
# pipeline (and the crawl-side sibling of x31's URL canonicalizer).
# URLs are synthesized deterministically from document columns, then
# the Spark side must INVERT the construction with the native
# parse_url expression (JVM codegen, the fast path a regex UDF would
# ruin); the oracle inverts it with RE2 regexps — two independent
# decoders agreeing on every row is the check.
#
# Scale: pure map-side expression work, no shuffle except the final
# per-host rollup on a bounded key domain (20 sources).
# ---------------------------------------------------------------------------
@register(
    "f9_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/', lang, '/item/',
                    doc_id, '?ref=', upper(source), '&page=',
                    CAST(doc_id % 13 AS VARCHAR)) AS url
      FROM documents
    )
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT regexp_extract(url, 'https://[^/]+(/[^?]*)', 1))
                AS BIGINT) AS n_paths,
           CAST(sum(CAST(regexp_extract(url, '[?&]page=([0-9]+)', 1)
                         AS BIGINT)) AS BIGINT) AS sum_page,
           min(regexp_extract(url, '[?&]ref=([^&]+)', 1)) AS min_ref
    FROM u GROUP BY 1
    """,
)
def f9_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/item/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="),
            F.upper("source"),
            F.lit("&page="),
            (F.col("doc_id") % 13).cast("string"),
        ).alias("url"),
    )
    return (
        u.select(
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("page"))
            .cast("long")
            .alias("page"),
            F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("path").cast("long").alias("n_paths"),
            F.sum("page").cast("long").alias("sum_page"),
            F.min("ref").alias("min_ref"),
        )
    )


# ---------------------------------------------------------------------------
# F10 — phonetic keying (consonant skeleton): the blocking/matching
# aid d4's record linkage would use on real name fields — words that
# differ only in vowels collapse to one key (a lightweight,
# RE2-portable stand-in for Soundex, which needs back-references or
# a 26-branch CASE to spell cross-engine). Key = first char + the
# remainder with vowels removed; the report groups the DISTINCT
# corpus vocabulary by key and surfaces collision groups (>= 2
# surface forms) — exactly the words a phonetic matcher would
# conflate.
#
# Scale: vocabulary is the distinct-token table (bounded); keying is
# map-side regexp; the rollup keys on the skeleton. No corpus-sized
# shuffle after the distinct.
# ---------------------------------------------------------------------------
@register(
    "f10_phonetic_key",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT word FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
          AS word FROM documents)
      WHERE word <> ''
    ), keyed AS (
      SELECT word,
             substr(word, 1, 1) ||
             regexp_replace(substr(word, 2), '[aeiou]', '', 'g') AS pkey
      FROM vocab
    )
    SELECT pkey,
           CAST(count(*) AS BIGINT) AS n_words,
           min(word) AS first_word,
           max(word) AS last_word
    FROM keyed GROUP BY pkey HAVING count(*) >= 2
    """,
)
def f10_phonetic_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = (
        t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    keyed = vocab.select(
        "word",
        F.concat(
            F.substring("word", 1, 1),
            F.regexp_replace(F.expr("substring(word, 2)"), "[aeiou]", ""),
        ).alias("pkey"),
    )
    return (
        keyed.groupBy("pkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.min("word").alias("first_word"),
            F.max("word").alias("last_word"),
        )
        .filter(F.col("n_words") >= 2)
    )


# ---------------------------------------------------------------------------
# F11 — email normalization: the identity-resolution scalar every
# contact-file ETL needs (the reference's voter rows key on email-like
# contact fields; load.ts upserts would double-count 'A.B+tag@GMAIL'
# vs 'ab@gmail.com' without it). Raw addresses are synthesized
# deterministically from customer so adjacent custkey pairs share a
# canonical address but differ in case, a '+tag' suffix, and (on
# gmail-style domains) dots in the local part; normalization must
# collapse each pair to ONE address: lowercase, strip '+tag...',
# drop local-part dots on dot-insensitive domains only.
#
# Scale: pure map-side string expressions (codegen; no UDF), one
# rollup on a 3-value domain key. The distinct-count is the dedup
# proof: exactly half the raw addresses survive.
# ---------------------------------------------------------------------------
@register(
    "f11_email_normalize",
    oracle="""
    WITH raw AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0
                  THEN upper('cust.' || CAST(c_custkey // 2 AS VARCHAR))
                  ELSE 'cust.' || CAST(c_custkey // 2 AS VARCHAR)
                       || '+promo' || CAST(c_custkey % 7 AS VARCHAR)
             END || '@' ||
             CASE (c_custkey // 2) % 3
               WHEN 0 THEN 'gmail.com'
               WHEN 1 THEN 'EXAMPLE.org'
               ELSE 'Corp.example.com' END AS email
      FROM customer
    ), norm AS (
      SELECT split_part(lower(email), '@', 2) AS domain,
             regexp_replace(split_part(lower(email), '@', 1),
                            '\\+.*$', '') AS local0
      FROM raw
    ), canon AS (
      SELECT domain,
             CASE WHEN domain = 'gmail.com'
                  THEN replace(local0, '.', '') ELSE local0 END
             || '@' || domain AS norm_email
      FROM norm
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT norm_email) AS BIGINT) AS n_canonical,
           min(norm_email) AS min_email,
           max(norm_email) AS max_email
    FROM canon GROUP BY domain
    """,
)
def f11_email_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (F.col("c_custkey") - F.col("c_custkey") % 2) / 2
    local_raw = F.concat(F.lit("cust."), base.cast("long").cast("string"))
    raw = t(spark, sf_dir, "customer").select(
        F.concat(
            F.when(F.col("c_custkey") % 2 == 0, F.upper(local_raw)).otherwise(
                F.concat(
                    local_raw,
                    F.lit("+promo"),
                    (F.col("c_custkey") % 7).cast("string"),
                )
            ),
            F.lit("@"),
            F.element_at(
                F.array(
                    F.lit("gmail.com"),
                    F.lit("EXAMPLE.org"),
                    F.lit("Corp.example.com"),
                ),
                (base.cast("long") % 3 + 1).cast("int"),
            ),
        ).alias("email")
    )
    norm = raw.select(
        F.split(F.lower("email"), "@").getItem(1).alias("domain"),
        F.regexp_replace(
            F.split(F.lower("email"), "@").getItem(0), r"\+.*$", ""
        ).alias("local0"),
    )
    canon = norm.select(
        "domain",
        F.concat(
            F.when(
                F.col("domain") == "gmail.com",
                F.replace(F.col("local0"), F.lit("."), F.lit("")),
            ).otherwise(F.col("local0")),
            F.lit("@"),
            F.col("domain"),
        ).alias("norm_email"),
    )
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.countDistinct("norm_email").cast("long").alias("n_canonical"),
        F.min("norm_email").alias("min_email"),
        F.max("norm_email").alias("max_email"),
    )


# ---------------------------------------------------------------------------
# T17 — higher-order array lambdas: transform / filter / exists /
# aggregate / zip_with over a per-row sequence — the Catalyst lambda
# surface (SQL:2016 array functions) that t7's collect/sort/contains
# does not touch, and the building block the engine's n-gram and
# packing operators lean on. The oracle is the CLOSED FORM of each
# lambda over arr = [1..n] (sum of squares, even count, triangular
# dot product), so parity proves the lambda evaluation exact rather
# than mirroring it with a second lambda engine.
#
# Scale: pure map-side codegen expressions; bounded fan-out (arrays
# of <= 8 elements built per row, never materialized off-core).
# ---------------------------------------------------------------------------
@register(
    "t17_higher_order_funcs",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_custkey % 7 + 1 AS n FROM customer
    )
    SELECT c_custkey,
           CAST(n AS BIGINT) AS n,
           CAST(n * (n + 1) * (2 * n + 1) // 6 AS BIGINT) AS sum_sq,
           CAST(n // 2 AS BIGINT) AS n_even,
           n >= 3 AS has_div3,
           CAST(n * (n + 1) * (n + 1) // 2
                - n * (n + 1) * (2 * n + 1) // 6 AS BIGINT) AS dot_rev
    FROM base
    """,
)
def t17_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 7 + 1).cast("long").alias("n"),
        F.sequence(F.lit(1).cast("long"), F.col("c_custkey") % 7 + 1).alias(
            "arr"
        ),
    )
    return base.select(
        "c_custkey",
        "n",
        F.aggregate(
            F.transform("arr", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_sq"),
        F.size(F.filter("arr", lambda x: x % 2 == 0))
        .cast("long")
        .alias("n_even"),
        F.exists("arr", lambda x: x % 3 == 0).alias("has_div3"),
        F.aggregate(
            F.zip_with("arr", F.reverse("arr"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dot_rev"),
    )


# ---------------------------------------------------------------------------
# F12 — money parsing: invert display-formatted currency strings
# ("$1,234.56", "(89.10)" accounting negatives) back to exact
# integer cents — the vendor-feed cleanup sibling of f4 (phones) and
# f6 (dates); every finance export arrives this way. The formatted
# string is CONSTRUCTED from o_totalprice with printf-style
# grouping on both engines, then each engine must strip symbols,
# grouping commas, and accounting parentheses independently —
# construct-then-invert, two independent normalizers agreeing row
# by row. Every 7th amount renders as an accounting negative.
#
# Scale: pure map-side regexp/string codegen; one bounded rollup
# (order-priority domain) proves the parse with exact sums.
# ---------------------------------------------------------------------------
@register(
    "f12_money_parse",
    oracle="""
    WITH cents AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    ), disp AS (
      SELECT o_orderkey, o_orderpriority, c,
             CASE WHEN o_orderkey % 7 = 0
                  THEN '($' || format('{:,}', c // 100) || '.'
                       || lpad(CAST(c % 100 AS VARCHAR), 2, '0') || ')'
                  ELSE '$' || format('{:,}', c // 100) || '.'
                       || lpad(CAST(c % 100 AS VARCHAR), 2, '0')
             END AS s
      FROM cents
    ), parsed AS (
      SELECT o_orderpriority,
             CASE WHEN s LIKE '(%' THEN -1 ELSE 1 END
             * CAST(replace(regexp_replace(s, '[^0-9.]', '', 'g'), '.', '')
                    AS BIGINT) AS parsed_cents
      FROM disp
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(parsed_cents) AS BIGINT) AS sum_cents,
           CAST(min(parsed_cents) AS BIGINT) AS min_cents
    FROM parsed GROUP BY o_orderpriority
    """,
)
def f12_money_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").alias("c"),
    )
    whole = F.format_number(F.expr("c div 100"), 0)
    frac = F.lpad((F.col("c") % 100).cast("string"), 2, "0")
    disp = cents.select(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(F.lit("($"), whole, F.lit("."), frac, F.lit(")")),
        )
        .otherwise(F.concat(F.lit("$"), whole, F.lit("."), frac))
        .alias("s"),
    )
    parsed = disp.select(
        "o_orderpriority",
        (
            F.when(F.col("s").startswith("("), F.lit(-1)).otherwise(F.lit(1))
            * F.replace(
                F.regexp_replace("s", "[^0-9.]", ""), F.lit("."), F.lit("")
            ).cast("bigint")
        ).alias("parsed_cents"),
    )
    return parsed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("parsed_cents").cast("long").alias("sum_cents"),
        F.min("parsed_cents").cast("long").alias("min_cents"),
    )


# ---------------------------------------------------------------------------
# F13 — Luhn checksum validation over phone digit strings: the
# mod-10 check digit scheme (card numbers, IMEIs, many national ID
# formats) as a pure higher-order Column expression — reverse the
# digit string, double every second digit from the right (mapping
# >9 to its digit sum), and test the running total mod 10. The
# reference's utils.ts normalizes identifiers but never validates
# them; a production voter-file load runs exactly this class of
# checksum gate on imported IDs. Rolled up per nation.
#
# Scale: the whole checksum is codegen'd transform/aggregate lambda
# arithmetic — no explode, no Python, no shuffle until the bounded
# 25-row rollup (map-side combined). The oracle unnests positions
# per row because DuckDB's list lambdas lack an index parameter —
# the Spark side must NOT copy that shape.
# ---------------------------------------------------------------------------
@register(
    "f13_luhn_checksum",
    oracle="""
    WITH d AS (
      SELECT c_custkey, c_nationkey,
             concat(lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0'),
                    '555',
                    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS ds
      FROM customer
    ), e AS (
      SELECT c_custkey, c_nationkey,
             sum(CASE WHEN (i - 1) % 2 = 1
                      THEN CASE WHEN 2 * dig > 9 THEN 2 * dig - 9
                           ELSE 2 * dig END
                      ELSE dig END) AS luhn_sum
      FROM (
        SELECT c_custkey, c_nationkey,
               CAST(substr(reverse(ds), i, 1) AS BIGINT) AS dig, i
        FROM d, unnest(generate_series(1, length(ds))) AS u(i)
      ) GROUP BY c_custkey, c_nationkey
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valid,
           CAST(10000 * sum(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
                // count(*) AS BIGINT) AS valid_bp
    FROM e GROUP BY c_nationkey
    """,
)
def f13_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    luhn_sum = F.expr(
        """
        aggregate(
          transform(
            filter(split(reverse(concat(
                     lpad(cast(200 + c_custkey % 700 as string), 3, '0'),
                     '555',
                     lpad(cast(c_custkey % 10000 as string), 4, '0'))), ''),
                   d -> d != ''),
            (d, i) -> case
              when i % 2 = 1 then
                if(2 * cast(d as int) > 9,
                   2 * cast(d as int) - 9,
                   2 * cast(d as int))
              else cast(d as int) end
          ),
          0, (acc, x) -> acc + x
        )
        """
    )
    scored = cust.select(
        "c_nationkey", (luhn_sum % 10 == 0).alias("ok")
    )
    return scored.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_valid"),
        F.expr(
            "10000 * sum(case when ok then 1 else 0 end) div count(1)"
        ).alias("valid_bp"),
    )


# ---------------------------------------------------------------------------
# F14 — timezone localization: convert the UTC event stream to
# America/New_York wall-clock and histogram by local hour — the
# "when do voters actually answer" rollup every outreach scheduler
# runs (the reference stores naive UTC; wall-clock analytics need
# the IANA conversion, DST shifts included). The 2024 event range
# crosses both DST transitions (Mar 10 spring-forward, Nov 3
# fall-back), so a conversion that applied a fixed offset — or an
# engine pinned to a different tzdata — mismatches row counts at
# the transition hours. Both engines resolve the same IANA zone db.
#
# Scale: pure map-side timestamp arithmetic (codegen'd
# from_utc_timestamp) + one bounded 24-row rollup.
# ---------------------------------------------------------------------------
@register(
    "f14_timezone_localize",
    oracle="""
    SELECT CAST(hour(ts::TIMESTAMP AT TIME ZONE 'UTC'
                     AT TIME ZONE 'America/New_York') AS BIGINT) AS local_hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def f14_timezone_localize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.hour(F.from_utc_timestamp("ts", "America/New_York"))
            .cast("long")
            .alias("local_hour"),
            "user_id",
        )
        .groupBy("local_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# F15 — deterministic surrogate-key minting: a UUIDv5-style id from a
# namespaced natural key (md5 of 'cust:' || custkey, formatted
# 8-4-4-4-12 with the version nibble forced to '5' and the variant
# nibble to '8'). Re-running the pipeline mints the SAME id — the
# property that makes surrogate keys safe to regenerate instead of
# persisting a sequence, and the reason this is a pure map-side
# column expression rather than monotonically_increasing_id (which is
# partition-layout-dependent and unreproducible).
#
# Scale: whole-stage-codegen string ops; the shard column (first hex
# byte % 16) gives a uniform partitioning handle derived from the id
# itself.
# ---------------------------------------------------------------------------
@register(
    "f15_surrogate_key",
    oracle="""
    WITH h AS (
      SELECT c_custkey, md5('cust:' || CAST(c_custkey AS VARCHAR)) AS x
      FROM customer
    )
    SELECT c_custkey,
           substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-5' ||
           substr(x, 14, 3) || '-8' || substr(x, 18, 3) || '-' ||
           substr(x, 21, 12) AS surrogate_id,
           CAST(CAST('0x' || substr(x, 1, 2) AS INTEGER) % 16 AS BIGINT)
             AS shard
    FROM h
    """,
)
def f15_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    h = cust.select(
        "c_custkey",
        F.md5(
            F.expr("cast(concat('cust:', cast(c_custkey as string)) as binary)")
        ).alias("x"),
    )
    return h.select(
        "c_custkey",
        F.expr(
            "concat(substr(x, 1, 8), '-', substr(x, 9, 4), '-5',"
            " substr(x, 14, 3), '-8', substr(x, 18, 3), '-',"
            " substr(x, 21, 12))"
        ).alias("surrogate_id"),
        F.expr("cast(conv(substr(x, 1, 2), 16, 10) % 16 as bigint)").alias(
            "shard"
        ),
    )


# ---------------------------------------------------------------------------
# T19 — string-distance function surface: levenshtein between each
# customer name and two deterministic perturbations (one char
# substituted; a digit block reversed), plus the banded variant
# (levenshtein with a threshold short-circuit) that a fuzzy-match
# pipeline actually calls. j19 builds an edit-distance JOIN from
# deletion keys; this key certifies the scalar function itself
# agrees across engines on known-distance pairs.
# ---------------------------------------------------------------------------
@register(
    "t19_string_distance_funcs",
    oracle="""
    WITH v AS (
      SELECT c_custkey, c_name,
             concat(substr(c_name, 1, length(c_name) - 1), 'X') AS sub1,
             concat('Customer#', reverse(substr(c_name, 10, 9))) AS rev9
      FROM customer
    )
    SELECT c_custkey,
           CAST(levenshtein(c_name, sub1) AS BIGINT) AS d_sub1,
           CAST(levenshtein(c_name, rev9) AS BIGINT) AS d_rev9,
           CAST(levenshtein(c_name, c_name) AS BIGINT) AS d_self,
           CAST(CASE WHEN levenshtein(c_name, rev9) <= 2 THEN 1 ELSE 0 END
                AS BIGINT) AS within_band
    FROM v
    """,
)
def t19_string_distance_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    v = cust.select(
        "c_custkey",
        "c_name",
        F.expr(
            "concat(substr(c_name, 1, length(c_name) - 1), 'X')"
        ).alias("sub1"),
        F.expr("concat('Customer#', reverse(substr(c_name, 10, 9)))").alias(
            "rev9"
        ),
    )
    return v.select(
        "c_custkey",
        F.levenshtein("c_name", "sub1").cast("long").alias("d_sub1"),
        F.levenshtein("c_name", "rev9").cast("long").alias("d_rev9"),
        F.levenshtein("c_name", "c_name").cast("long").alias("d_self"),
        F.expr(
            "cast(case when levenshtein(c_name, rev9) <= 2 then 1 else 0 end"
            " as bigint)"
        ).alias("within_band"),
    )


# ---------------------------------------------------------------------------
# T20 — array set algebra: union / intersect / except between two
# collected arrays (each customer's 1996 vs 1997 priority sets) —
# the collection-level counterpart of u1-u3's relational set ops.
# Results are sorted before joining to strings: Spark's array_union
# preserves first-occurrence order (nondeterministic under shuffle),
# so the sort is what makes the surface oracle-checkable.
# ---------------------------------------------------------------------------
@register(
    "t20_array_set_algebra",
    oracle="""
    WITH y AS (
      SELECT o_custkey AS cust,
             coalesce(list_sort(list(DISTINCT o_orderpriority)
               FILTER (WHERE date_part('year', o_orderdate) = 1996)),
               []) AS a,
             coalesce(list_sort(list(DISTINCT o_orderpriority)
               FILTER (WHERE date_part('year', o_orderdate) = 1997)),
               []) AS b
      FROM orders
      WHERE date_part('year', o_orderdate) IN (1996, 1997)
      GROUP BY o_custkey
    )
    SELECT cust,
           coalesce(array_to_string(
             list_sort(list_distinct(list_concat(a, b))), ','), '')
             AS u_str,
           coalesce(array_to_string(list_sort(list_filter(a,
             x -> list_contains(b, x))), ','), '') AS i_str,
           coalesce(array_to_string(list_sort(list_filter(a,
             x -> NOT list_contains(b, x))), ','), '') AS d_str,
           CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS n_union
    FROM y
    """,
)
def t20_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    y = (
        orders.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.year("o_orderdate") == 1996, F.col("o_orderpriority")
                    )
                )
            ).alias("a"),
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.year("o_orderdate") == 1997, F.col("o_orderpriority")
                    )
                )
            ).alias("b"),
        )
    )
    return y.select(
        "cust",
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias(
            "u_str"
        ),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias(
            "i_str"
        ),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias(
            "d_str"
        ),
        F.size(F.array_union("a", "b")).cast("long").alias("n_union"),
    )


# ---------------------------------------------------------------------------
# F16 — geohash DECODE (the inverse surface f1's encoder implies):
# unpack each 8-char geohash back to its cell-center lat/lon by pure
# bit arithmetic — 5 bits per base32 char, even global bit positions
# interleave longitude, odd latitude — and verify containment: the
# original coordinate must lie within half a cell of the decoded
# center. Center arithmetic is EXACT in IEEE doubles ((2v+1)*180 is
# an integer below 2^53 and the divisor is a power of two), so both
# engines produce bit-identical centers with no rounding discipline
# needed.
#
# Scale: a bounded 40x explode per row (8 chars x 5 bits), one
# map-side-combined rollup per key — no joins, no windows.
# ---------------------------------------------------------------------------
_F16_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"


@register(
    "f16_geohash_decode",
    oracle=f"""
    WITH src AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon,
             {geohash_sql(_LAT, _LON, 8, "duckdb")} AS gh
      FROM customer
    ), bits AS (
      SELECT c_custkey, lat, lon, gh,
             CAST((i - 1) * 5 + j AS BIGINT) AS p,
             CAST((strpos('{_F16_ALPHA}', substr(gh, CAST(i AS INTEGER), 1))
                   - 1) AS BIGINT) AS v,
             CAST(j AS BIGINT) AS j
      FROM src,
           unnest(range(1, 9)) AS gi(i),
           unnest(range(0, 5)) AS gj(j)
    ), acc AS (
      SELECT c_custkey, lat, lon, gh,
             CAST(sum(CASE WHEN p % 2 = 0
               THEN ((v // (1 << CAST(4 - j AS INTEGER))) % 2)
                    * (1 << CAST(19 - p // 2 AS INTEGER))
               ELSE 0 END) AS BIGINT) AS lon_v,
             CAST(sum(CASE WHEN p % 2 = 1
               THEN ((v // (1 << CAST(4 - j AS INTEGER))) % 2)
                    * (1 << CAST(19 - (p - 1) // 2 AS INTEGER))
               ELSE 0 END) AS BIGINT) AS lat_v
      FROM bits GROUP BY c_custkey, lat, lon, gh
    )
    SELECT c_custkey, gh,
           -180 + (2 * lon_v + 1) * 180.0 / 1048576 AS lon_center,
           -90 + (2 * lat_v + 1) * 90.0 / 1048576 AS lat_center,
           CAST(CASE WHEN abs(lon - (-180 + (2 * lon_v + 1) * 180.0
                                     / 1048576)) <= 180.0 / 1048576
                      AND abs(lat - (-90 + (2 * lat_v + 1) * 90.0
                                     / 1048576)) <= 90.0 / 1048576
                THEN 1 ELSE 0 END AS BIGINT) AS contained
    FROM acc
    """,
)
def f16_geohash_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    src = customer.select(
        "c_custkey",
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
        geohash_col(F.expr(_LAT), F.expr(_LON), 8).alias("gh"),
    )
    bits = (
        src.select(
            "c_custkey", "lat", "lon", "gh",
            F.explode(F.expr("sequence(1, 8)")).alias("i"),
        )
        .select(
            "c_custkey", "lat", "lon", "gh", "i",
            F.explode(F.expr("sequence(0, 4)")).alias("j"),
        )
        .select(
            "c_custkey",
            "lat",
            "lon",
            "gh",
            F.expr("cast((i - 1) * 5 + j as bigint)").alias("p"),
            F.expr(
                f"cast(instr('{_F16_ALPHA}', substring(gh, i, 1)) - 1"
                " as bigint)"
            ).alias("v"),
            F.col("j").cast("long").alias("j"),
        )
    )
    acc = bits.groupBy("c_custkey", "lat", "lon", "gh").agg(
        F.sum(
            F.expr(
                "case when p % 2 = 0 then ((v div shiftleft(1L,"
                " cast(4 - j as int))) % 2) * shiftleft(1L,"
                " cast(19 - p div 2 as int)) else 0 end"
            )
        ).cast("long").alias("lon_v"),
        F.sum(
            F.expr(
                "case when p % 2 = 1 then ((v div shiftleft(1L,"
                " cast(4 - j as int))) % 2) * shiftleft(1L,"
                " cast(19 - (p - 1) div 2 as int)) else 0 end"
            )
        ).cast("long").alias("lat_v"),
    )
    return acc.select(
        "c_custkey",
        "gh",
        F.expr("-180 + (2 * lon_v + 1) * 180.0d / 1048576").alias(
            "lon_center"
        ),
        F.expr("-90 + (2 * lat_v + 1) * 90.0d / 1048576").alias(
            "lat_center"
        ),
        F.expr(
            "cast(case when abs(lon - (-180 + (2 * lon_v + 1) * 180.0d"
            " / 1048576)) <= 180.0d / 1048576 and abs(lat - (-90 +"
            " (2 * lat_v + 1) * 90.0d / 1048576)) <= 90.0d / 1048576"
            " then 1 else 0 end as bigint)"
        ).alias("contained"),
    )




# ---------------------------------------------------------------------------
# F17 — geohash neighbors: the four adjacent cells (N/E/S/W) of each
# 8-char geohash — computed as INTEGER CELL-INDEX arithmetic (+/-1
# on the 20-bit lon/lat indices, longitude wrapping mod 2^20) and
# re-encoded by direct bit interleave into base32, never by running
# the coordinate bisection encoder four more times. The expansion
# step a geohash-bucketed proximity search needs (the j10 3x3 grid,
# in geohash space).
#
# Scale: pure per-row integer shifts; the first cut re-encoded four
# shifted coordinates through the bisection expression and blew
# Spark's 64 KB codegen method limit into interpreted fallback
# (2.7 s at sf0.1) — the interleave form stays in whole-stage
# codegen (1.5 s; the remaining cost is the single anchor encode).
# ---------------------------------------------------------------------------
_F17_INTERLEAVE_DUCK = """concat(substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) // 524288) % 2) * 16 + ((({lat}) // 524288) % 2) * 8 + ((({lon}) // 262144) % 2) * 4 + ((({lat}) // 262144) % 2) * 2 + ((({lon}) // 131072) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) // 131072) % 2) * 16 + ((({lon}) // 65536) % 2) * 8 + ((({lat}) // 65536) % 2) * 4 + ((({lon}) // 32768) % 2) * 2 + ((({lat}) // 32768) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) // 16384) % 2) * 16 + ((({lat}) // 16384) % 2) * 8 + ((({lon}) // 8192) % 2) * 4 + ((({lat}) // 8192) % 2) * 2 + ((({lon}) // 4096) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) // 4096) % 2) * 16 + ((({lon}) // 2048) % 2) * 8 + ((({lat}) // 2048) % 2) * 4 + ((({lon}) // 1024) % 2) * 2 + ((({lat}) // 1024) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) // 512) % 2) * 16 + ((({lat}) // 512) % 2) * 8 + ((({lon}) // 256) % 2) * 4 + ((({lat}) // 256) % 2) * 2 + ((({lon}) // 128) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) // 128) % 2) * 16 + ((({lon}) // 64) % 2) * 8 + ((({lat}) // 64) % 2) * 4 + ((({lon}) // 32) % 2) * 2 + ((({lat}) // 32) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) // 16) % 2) * 16 + ((({lat}) // 16) % 2) * 8 + ((({lon}) // 8) % 2) * 4 + ((({lat}) // 8) % 2) * 2 + ((({lon}) // 4) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) // 4) % 2) * 16 + ((({lon}) // 2) % 2) * 8 + ((({lat}) // 2) % 2) * 4 + ((({lon}) // 1) % 2) * 2 + ((({lat}) // 1) % 2) * 1) + 1 AS INTEGER), 1))"""
_F17_INTERLEAVE_SPARK = """concat(substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) div 524288) % 2) * 16 + ((({lat}) div 524288) % 2) * 8 + ((({lon}) div 262144) % 2) * 4 + ((({lat}) div 262144) % 2) * 2 + ((({lon}) div 131072) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) div 131072) % 2) * 16 + ((({lon}) div 65536) % 2) * 8 + ((({lat}) div 65536) % 2) * 4 + ((({lon}) div 32768) % 2) * 2 + ((({lat}) div 32768) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) div 16384) % 2) * 16 + ((({lat}) div 16384) % 2) * 8 + ((({lon}) div 8192) % 2) * 4 + ((({lat}) div 8192) % 2) * 2 + ((({lon}) div 4096) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) div 4096) % 2) * 16 + ((({lon}) div 2048) % 2) * 8 + ((({lat}) div 2048) % 2) * 4 + ((({lon}) div 1024) % 2) * 2 + ((({lat}) div 1024) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) div 512) % 2) * 16 + ((({lat}) div 512) % 2) * 8 + ((({lon}) div 256) % 2) * 4 + ((({lat}) div 256) % 2) * 2 + ((({lon}) div 128) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) div 128) % 2) * 16 + ((({lon}) div 64) % 2) * 8 + ((({lat}) div 64) % 2) * 4 + ((({lon}) div 32) % 2) * 2 + ((({lat}) div 32) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lon}) div 16) % 2) * 16 + ((({lat}) div 16) % 2) * 8 + ((({lon}) div 8) % 2) * 4 + ((({lat}) div 8) % 2) * 2 + ((({lon}) div 4) % 2) * 1) + 1 AS INTEGER), 1), substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((((({lat}) div 4) % 2) * 16 + ((({lon}) div 2) % 2) * 8 + ((({lat}) div 2) % 2) * 4 + ((({lon}) div 1) % 2) * 2 + ((({lat}) div 1) % 2) * 1) + 1 AS INTEGER), 1))"""


def _f17_enc(dialect: str, lon: str, lat: str) -> str:
    tpl = (
        _F17_INTERLEAVE_DUCK if dialect == "duckdb"
        else _F17_INTERLEAVE_SPARK
    )
    return tpl.format(lon=lon, lat=lat)


@register(
    "f17_geohash_neighbors",
    oracle=f"""
    WITH src AS (
      SELECT c_custkey,
             {geohash_sql(_LAT, _LON, 8, "duckdb")} AS gh,
             CAST(floor((CAST({_LAT} AS DOUBLE) + 90) / 180 * 1048576)
                  AS BIGINT) AS lat_v,
             CAST(floor((CAST({_LON} AS DOUBLE) + 180) / 360 * 1048576)
                  AS BIGINT) AS lon_v
      FROM customer
    ), sh AS (
      SELECT c_custkey, gh,
             lat_v + 1 AS lat_n, lat_v - 1 AS lat_s,
             (lon_v + 1) % 1048576 AS lon_e,
             (lon_v + 1048575) % 1048576 AS lon_w,
             lat_v, lon_v
      FROM src
    )
    SELECT c_custkey, gh,
           {_f17_enc("duckdb", "lon_v", "lat_n")} AS gh_n,
           {_f17_enc("duckdb", "lon_e", "lat_v")} AS gh_e,
           {_f17_enc("duckdb", "lon_v", "lat_s")} AS gh_s,
           {_f17_enc("duckdb", "lon_w", "lat_v")} AS gh_w
    FROM sh
    """,
)
def f17_geohash_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    src = customer.select(
        "c_custkey",
        geohash_col(F.expr(_LAT), F.expr(_LON), 8).alias("gh"),
        F.expr(
            f"cast(floor((cast({_LAT} as double) + 90) / 180 * 1048576)"
            " as bigint)"
        ).alias("lat_v"),
        F.expr(
            f"cast(floor((cast({_LON} as double) + 180) / 360 * 1048576)"
            " as bigint)"
        ).alias("lon_v"),
    )
    sh = src.select(
        "c_custkey",
        "gh",
        "lat_v",
        "lon_v",
        F.expr("lat_v + 1").alias("lat_n"),
        F.expr("lat_v - 1").alias("lat_s"),
        F.expr("(lon_v + 1) % 1048576").alias("lon_e"),
        F.expr("(lon_v + 1048575) % 1048576").alias("lon_w"),
    )
    return sh.select(
        "c_custkey",
        "gh",
        F.expr(_f17_enc("spark", "lon_v", "lat_n")).alias("gh_n"),
        F.expr(_f17_enc("spark", "lon_e", "lat_v")).alias("gh_e"),
        F.expr(_f17_enc("spark", "lon_v", "lat_s")).alias("gh_s"),
        F.expr(_f17_enc("spark", "lon_w", "lat_v")).alias("gh_w"),
    )


# ---------------------------------------------------------------------------
# F18 — binary encoding functions: base64 / hex / UTF-8 encode-decode
# round trips plus byte-length accessors, the blob surface every
# ingest layer needs when payloads arrive wire-encoded (the reference
# stores file bytes opaquely: download.ts buffer handling). Round-trip
# flags prove decode(unhex(hex(x))) == x and
# decode(from_base64(base64(encode(x)))) == x cell-by-cell, so an
# engine disagreeing on padding, case, or charset fails the hash.
#
# Scale: pure Column expressions in whole-stage codegen — no Python,
# no shuffle beyond the source scan.
# ---------------------------------------------------------------------------
@register(
    "f18_binary_encodings",
    oracle="""
    SELECT c_custkey,
           base64(encode(c_name)) AS b64,
           hex(c_name) AS hx,
           CAST(octet_length(encode(c_name)) AS BIGINT) AS n_bytes,
           CAST(bit_length(c_name) AS BIGINT) AS n_bits,
           CAST(decode(from_base64(base64(encode(c_name)))) = c_name
                AS BIGINT) AS b64_roundtrip,
           CAST(decode(unhex(hex(c_name))) = c_name AS BIGINT)
             AS hex_roundtrip
    FROM customer WHERE c_custkey % 9 = 0
    """,
)
def f18_binary_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = F.col("c_name")
    enc = F.encode(name, "UTF-8")
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 9 == 0)
        .select(
            "c_custkey",
            F.base64(enc).alias("b64"),
            F.hex(name).alias("hx"),
            F.octet_length(enc).cast("long").alias("n_bytes"),
            F.bit_length(name).cast("long").alias("n_bits"),
            (F.decode(F.unbase64(F.base64(enc)), "UTF-8") == name)
            .cast("long")
            .alias("b64_roundtrip"),
            (F.decode(F.unhex(F.hex(name)), "UTF-8") == name)
            .cast("long")
            .alias("hex_roundtrip"),
        )
    )
