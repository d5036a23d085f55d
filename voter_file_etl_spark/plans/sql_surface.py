"""Full-SQL frontend queries (spark.sql over temp views).

The reference has no SQL surface at all — its "query language" is
the Prisma client API (SURVEY.md §3.3: findUnique, count,
createMany, $executeRawUnsafe). The engine replaces that with
Spark's complete ANSI-SQL frontend; these keys prove the frontend
end-to-end on multi-join analytic shapes (TPC-H Q3/Q5 style) and on
correlated scalar subqueries — the three planner features (join
reordering, aggregate pushback, subquery decorrelation) a Postgres
user would lean on hardest.

Scale notes: the SQL text compiles to the same Catalyst plans the
DataFrame API produces — broadcast for the dims under the threshold,
sort-merge for fact-fact, partial+final aggregates. The LIMIT query
plans TakeOrderedAndProject (per-partition top-k, then a k-row merge
on the driver — never a full sort of the fact table). The correlated
subqueries decorrelate into one aggregate + one join, not per-row
probes.

All money math follows the registry's decimal policy: exact DECIMAL
through every sum/product, DOUBLE only at the output boundary, and
tie-broken ORDER BY keys so top-k is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from voter_file_etl_spark.registry import register
from voter_file_etl_spark.tables import TABLE_NAMES, t


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# SQL1 — shipping-priority top-k (TPC-H Q3 shape): 3-way join,
# grouped revenue, deterministic top-10.
# ---------------------------------------------------------------------------
_Q3 = """
SELECT l_orderkey,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))
            AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, order_date, l_orderkey
LIMIT 10
"""


@register("sql1_topk_revenue", oracle=_Q3)
def sql1_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3)


# ---------------------------------------------------------------------------
# SQL2 — local-supplier volume (TPC-H Q5 shape): 6-way join through
# two dimension chains that must agree on nationkey.
# ---------------------------------------------------------------------------
_Q5 = """
SELECT n_name,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)))
            AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("sql2_join_chain", oracle=_Q5)
def sql2_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql(_Q5)


# ---------------------------------------------------------------------------
# SQL3 — correlated scalar subqueries (decorrelated by Catalyst into
# an aggregate + join): orders priced above their customer's average,
# expressed as sum/count so the comparison stays in exact DECIMAL.
# ---------------------------------------------------------------------------
_SUBQ = """
SELECT o_orderkey, o_custkey,
       CAST(o_totalprice AS DOUBLE) AS total_price
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2))
      * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
         FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


@register("sql3_correlated_subquery", oracle=_SUBQ)
def sql3_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SUBQ)


# ---------------------------------------------------------------------------
# SQL4 — IN / NOT IN subqueries (planned as left-semi / null-aware
# anti joins): the SQL spelling of the manifest skip-logic (P6/J3).
# ---------------------------------------------------------------------------
_INQ = """
SELECT o_orderpriority,
       count(*) AS n_building,
       CAST(sum(CASE WHEN o_orderkey IN (SELECT l_orderkey FROM lineitem
                                         WHERE l_quantity >= 45)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_bulk_item
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


@register("sql4_in_subquery", oracle=_INQ)
def sql4_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer", "lineitem")
    return spark.sql(_INQ)


# ---------------------------------------------------------------------------
# SQL5 — window function through the SQL frontend: per-nation top-3
# suppliers by account balance (the Q2-shaped "best supplier per
# group" pattern). Same SQL text runs on both engines; ordering is
# made total with the key tiebreak so rank assignment is
# deterministic at any parallelism.
# ---------------------------------------------------------------------------
_QW = """
SELECT n_name, s_name, rnk,
       CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
FROM (
  SELECT n_name, s_name, s_acctbal,
         row_number() OVER (
           PARTITION BY n_nationkey
           ORDER BY CAST(s_acctbal AS DECIMAL(12,2)) DESC, s_suppkey) AS rnk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
WHERE rnk <= 3
"""


@register("sql5_window_rank", oracle=_QW)
def sql5_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(_QW)


# ---------------------------------------------------------------------------
# SQL6 — CTE + correlated EXISTS / NOT EXISTS: the remaining ANSI
# subquery forms (sql3 covers correlated scalar, sql4 covers IN).
# One SQL string runs verbatim on BOTH engines — the frontend-parity
# claim at its strongest. Catalyst decorrelates both predicates into
# joins (EXISTS -> left-semi, NOT EXISTS -> left-anti) against the
# aggregated CTE — no per-row re-execution of the subquery; the CTE
# itself is a partial+final aggregate.
# ---------------------------------------------------------------------------
_SQL6 = """
WITH big_buyers AS (
  SELECT o_custkey, count(*) AS n_big
  FROM orders
  WHERE CAST(o_totalprice AS DECIMAL(18,2)) > CAST(150000 AS DECIMAL(18,2))
  GROUP BY o_custkey
)
SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM big_buyers b
              WHERE b.o_custkey = c.c_custkey AND b.n_big >= 2)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
GROUP BY c.c_mktsegment
"""


@register("sql6_cte_exists", oracle=_SQL6)
def sql6_cte_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL6)


# ---------------------------------------------------------------------------
# SQL7 — WITH RECURSIVE hierarchy walk (Spark 4's recursive CTE,
# matching DuckDB's): customers form a synthetic 10-ary org tree
# (parent = custkey div 10, roots < 10), and the recursion assigns
# every customer its root and depth — the org-chart / BOM-expansion
# query no non-recursive SQL can express for unbounded depth. The
# recursion is a fixpoint of equi-joins on the parent key (each
# iteration shuffles one frontier level, never the whole closure).
# Output is the per-(depth, root-bucket) rollup to keep the row
# narrow while pinning every path assignment exactly.
# ---------------------------------------------------------------------------
_SQL7_SPARK = """
WITH RECURSIVE h(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, h.root, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey div 10 = h.custkey
  WHERE c.c_custkey >= 10
)
SELECT CAST(depth AS BIGINT) AS depth, root,
       count(*) AS n, CAST(sum(custkey) AS BIGINT) AS sum_keys
FROM h GROUP BY depth, root
"""


@register(
    "sql7_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE h(custkey, root, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, h.root, h.depth + 1
      FROM customer c JOIN h ON c.c_custkey // 10 = h.custkey
      WHERE c.c_custkey >= 10
    )
    SELECT CAST(depth AS BIGINT) AS depth, root,
           count(*) AS n, CAST(sum(custkey) AS BIGINT) AS sum_keys
    FROM h GROUP BY depth, root
    """,
)
def sql7_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(_SQL7_SPARK)


# ---------------------------------------------------------------------------
# SQL8 — LATERAL correlated table subquery: per-nation top-2
# customers by account balance, expressed as `nation, LATERAL
# (SELECT ... ORDER BY ... LIMIT 2)`. Catalyst decorrelates the
# lateral into a ranked window over the (broadcast) joined input —
# per-group top-k without a per-row re-scan of customer, which is
# the plan a 100 TB lateral must compile to. Doubles pass through
# unarithmeticked (bit-exact both engines); ties break on c_name.
# ---------------------------------------------------------------------------
_SQL8 = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) l
"""


@register("sql8_lateral_topn", oracle=_SQL8)
def sql8_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_SQL8)


# ---------------------------------------------------------------------------
# SQL9 — GROUPING() / grouping_id() disambiguation: in a ROLLUP,
# a NULL group value is ambiguous — "the subtotal row" vs "the
# group whose key IS NULL". GROUPING() is the SQL-standard
# disambiguator (1 = subtotal, 0 = real group), and grouping_id()
# packs the per-column bits for multi-level cubes. Pure SQL on both
# engines over a two-level rollup — the surface piece a7/a8's
# DataFrame rollup/cube leave untested.
# ---------------------------------------------------------------------------
@register(
    "sql9_grouping_id",
    oracle="""
    SELECT c_mktsegment,
           c_nationkey % 5 AS region_bucket,
           GROUPING(c_mktsegment) AS g_seg,
           GROUPING(c_nationkey % 5) AS g_bucket,
           GROUPING(c_mktsegment, c_nationkey % 5) AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_bal_cents
    FROM customer
    GROUP BY ROLLUP(c_mktsegment, c_nationkey % 5)
    """,
)
def sql9_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "customer").createOrReplaceTempView("sql9_customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               c_nationkey % 5 AS region_bucket,
               grouping(c_mktsegment) AS g_seg,
               grouping(c_nationkey % 5) AS g_bucket,
               grouping_id(c_mktsegment, c_nationkey % 5) AS gid,
               count(*) AS n,
               cast(sum(cast(floor(c_acctbal * 100 + 0.5d) as bigint)) as bigint)
                 AS sum_bal_cents
        FROM sql9_customer
        GROUP BY ROLLUP(c_mktsegment, c_nationkey % 5)
        """
    )


# ---------------------------------------------------------------------------
# SQL10 — QUALIFY-shaped per-group top-n: the window-filter idiom
# ("keep each customer's 2 most expensive orders") that warehouse
# SQL dialects spell QUALIFY. Spark has no QUALIFY keyword, so the
# engine exposes the standard-SQL equivalent — a windowed rank in a
# subquery filtered outside — which compiles to the identical plan a
# native QUALIFY would: one hash-partitioned window on o_custkey
# (rank within each customer's orders, partition-local sort only —
# never a global sort) and a post-window filter. The oracle states
# the same query with DuckDB's native QUALIFY, proving the surface
# translation is semantics-preserving.
# ---------------------------------------------------------------------------
@register(
    "sql10_qualify_topn",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
           ) AS BIGINT) AS rnk
    FROM orders
    QUALIFY rnk <= 2
    """,
)
def sql10_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("sql10_orders")
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               cast(floor(o_totalprice * 100 + 0.5d) as bigint) AS price_cents,
               cast(rnk as bigint) AS rnk
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rnk
          FROM sql10_orders
        )
        WHERE rnk <= 2
        """
    )


# ---------------------------------------------------------------------------
# SQL11 — PIVOT clause surface: the SQL-syntax twin of p8's
# DataFrame pivot. Spark parses the PIVOT clause natively (aliased
# IN-list values become typed output columns); the oracle spells the
# identical contract as portable conditional aggregation, which is
# also exactly the plan Spark lowers PIVOT to — so the check proves
# the syntax sugar changes nothing semantically. Cents stay integer;
# segments x statuses is a bounded grid.
# ---------------------------------------------------------------------------
@register(
    "sql11_pivot_syntax",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN cents END)
                AS BIGINT) AS open_cents,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN cents END)
                AS BIGINT) AS filled_cents,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN cents END)
                AS BIGINT) AS partial_cents
    FROM (
      SELECT c_mktsegment, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    GROUP BY c_mktsegment
    """,
)
def sql11_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("sql11_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("sql11_customer")
    return spark.sql(
        """
        SELECT c_mktsegment, open_cents, filled_cents, partial_cents
        FROM (
          SELECT c_mktsegment, o_orderstatus,
                 CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT) AS cents
          FROM sql11_orders JOIN sql11_customer ON o_custkey = c_custkey
        )
        PIVOT (
          sum(cents)
          FOR o_orderstatus IN ('O' AS open_cents, 'F' AS filled_cents,
                                'P' AS partial_cents)
        )
        """
    )


# ---------------------------------------------------------------------------
# SQL13 — SQL pipe syntax (Spark 4.0's |> operator chain, from
# Google's "SQL Has Problems" pipe-syntax proposal): the same
# join-filter-aggregate-having-topk shape as sql1/sql2 written as a
# linear pipeline instead of inside-out nesting. Proves the modern
# frontend surface compiles to the SAME Catalyst plan the nested
# form produces (broadcast dim join, partial/final aggregate,
# TakeOrderedAndProject — the sql1 gates apply unchanged).
#
# Scale: frontend syntax only; the physical plan is identical to the
# nested formulation, which is the point under test.
# ---------------------------------------------------------------------------
@register(
    "sql13_pipe_syntax",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY c.c_mktsegment
    HAVING count(*) >= 10
    ORDER BY sum_cents DESC, c_mktsegment
    LIMIT 3
    """,
)
def sql13_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        FROM orders o
        |> WHERE o.o_orderstatus = 'O'
        |> JOIN customer c ON o.o_custkey = c.c_custkey
        |> AGGREGATE count(*) AS n_orders,
                     sum(cast(floor(o_totalprice * 100 + 0.5d) as bigint))
                       AS sum_cents
           GROUP BY c.c_mktsegment
        |> WHERE n_orders >= 10
        |> ORDER BY sum_cents DESC, c_mktsegment
        |> LIMIT 3
        """
    ).selectExpr(
        "c_mktsegment", "cast(n_orders as bigint) n_orders", "sum_cents"
    )


# ---------------------------------------------------------------------------
# SQL14 — parameterized SQL (named :param markers, Spark 3.4+): the
# injection-safe way to template the reference's per-state /
# per-segment query routing ($executeRawUnsafe's string splicing is
# the anti-pattern this replaces — parameters bind as LITERALS in
# the parser, they can never re-shape the statement). The segment
# and cutoff arrive as args; the plan must still push both
# predicates to the scan exactly as if they were inline literals.
#
# Scale: binding happens at parse time, so Catalyst sees constant
# predicates — pushdown, pruning, and AQE behave identically to the
# hand-inlined query (the gate asserts the pushed filter).
# ---------------------------------------------------------------------------
@register(
    "sql14_parameterized",
    oracle="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM customer
    WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 0.0
    GROUP BY c_nationkey
    """,
)
def sql14_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               cast(count(*) as bigint) AS n_custs,
               cast(sum(cast(floor(c_acctbal * 100 + 0.5d) as bigint))
                    as bigint) AS sum_cents
        FROM customer
        WHERE c_mktsegment = :segment AND c_acctbal >= :min_bal
        GROUP BY c_nationkey
        """,
        args={"segment": "MACHINERY", "min_bal": 0.0},
    )


# ---------------------------------------------------------------------------
# SQL15 — the UNPIVOT clause (Spark 3.4+ SQL syntax, mirroring
# p9_unpivot's stack()-based form): a wide per-region rollup of
# three measures turned into (region, measure, v) rows entirely in
# the SQL parser. The oracle states the identical relation as ANSI
# UNION ALL so DuckDB needs no dialect-specific clause.
#
# Scale: UNPIVOT is a local map-side expansion (x3 rows per input
# row, no shuffle); the rollup beneath it aggregates first, so the
# expansion runs over 5 rows regardless of input size. Customer and
# supplier counts aggregate PER NATION in their own subqueries
# before touching the dimension join — joining both fact tables to
# nation directly would fan out customers x suppliers per nation
# (count(DISTINCT) would still be correct, but the intermediate is
# quadratic; the pre-aggregate keeps it linear with map-side
# combine). NULL measures would be DROPPED by UNPIVOT's default
# INCLUDE NULLS = false — counts here are never null, and the
# oracle's UNION ALL matches that contract exactly.
# ---------------------------------------------------------------------------
_SQL15_AGG = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(coalesce(cc.n, 0)) AS BIGINT) AS n_custs,
       CAST(sum(coalesce(ss.n, 0)) AS BIGINT) AS n_supps
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN (SELECT c_nationkey, count(*) AS n
           FROM customer GROUP BY c_nationkey) cc
  ON cc.c_nationkey = n.n_nationkey
LEFT JOIN (SELECT s_nationkey, count(*) AS n
           FROM supplier GROUP BY s_nationkey) ss
  ON ss.s_nationkey = n.n_nationkey
GROUP BY r.r_name
"""


@register(
    "sql15_unpivot_syntax",
    oracle=f"""
    WITH agg AS ({_SQL15_AGG})
    SELECT r_name, 'n_nations' AS measure, n_nations AS v FROM agg
    UNION ALL
    SELECT r_name, 'n_custs' AS measure, n_custs AS v FROM agg
    UNION ALL
    SELECT r_name, 'n_supps' AS measure, n_supps AS v FROM agg
    """,
)
def sql15_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "region", "nation", "customer", "supplier")
    return spark.sql(
        f"""
        SELECT r_name, measure, v
        FROM ({_SQL15_AGG})
        UNPIVOT (v FOR measure IN (n_nations, n_custs, n_supps))
        """
    )


# ---------------------------------------------------------------------------
# SQL16 — join-strategy hints: the /*+ BROADCAST */ and
# /*+ SHUFFLE_MERGE */ comment hints that let a SQL user pin a join
# strategy when the optimizer's estimate is wrong (the escape hatch
# for the 100 TB case where a "small" side's stats lie). The
# registered query broadcasts the nation dim by HINT rather than by
# size estimate; the plan gate asserts the hint actually changed
# planning (broadcast under the hint, sort-merge under the opposite
# hint — test_join_hints_change_strategy). Results are identical
# either way, which is exactly what the oracle checks.
# ---------------------------------------------------------------------------
_SQL16 = """
SELECT /*+ {hint}(n) */ n.n_name,
       cast(count(*) as bigint) AS n_custs,
       cast(sum(cast(floor(c.c_acctbal * 100 + 0.5{d}) as bigint))
            as bigint) AS sum_cents
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register(
    "sql16_join_hints",
    oracle="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql16_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(_SQL16.format(hint="BROADCAST", d="d"))


def sql16_with_hint(spark: SparkSession, sf_dir: str, hint: str) -> DataFrame:
    """The same query under an explicit strategy hint (for the gate)."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(_SQL16.format(hint=hint, d="d"))


# ---------------------------------------------------------------------------
# SQL17 — GROUP BY ALL / ORDER BY ALL: the analyst-ergonomics syntax
# (DuckDB popularized it; Spark 3.4+ adopted it) where the grouping
# key list is inferred from the non-aggregate select items. ONE SQL
# string runs VERBATIM on both engines — the strongest form of the
# frontend-parity claim (every other sql* key needs at least alias
# or cast dialect tweaks; this one is byte-identical). Lowered plan
# is the ordinary partial+final aggregate.
# ---------------------------------------------------------------------------
_SQL17 = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("sql17_group_by_all", oracle=_SQL17)
def sql17_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL17)


# ---------------------------------------------------------------------------
# SQL18 — named windows (the WINDOW clause): one window definition
# shared by four window functions, plus a second named window with a
# different frame — the syntax surface that keeps multi-metric
# window queries maintainable. Both engines support the clause with
# identical semantics, and sharing the definition also lets the
# planner compute all four functions in ONE Window node over one
# sort.
# ---------------------------------------------------------------------------
_SQL18 = """
SELECT o_custkey,
       o_orderkey,
       row_number()   OVER w AS rn,
       CAST(rank()    OVER w AS BIGINT) AS rnk,
       CAST(lag(cents) OVER w AS BIGINT) AS prev_c,
       CAST(sum(cents) OVER cum AS BIGINT) AS cum_c
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
       cum AS (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("sql18_named_window", oracle=_SQL18)
def sql18_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL18)


# ---------------------------------------------------------------------------
# SQL19 — the FILTER clause on aggregates: conditional aggregation
# without CASE-WHEN noise and without a second scan — four filtered
# aggregates over one pass of orders. Spark and DuckDB implement the
# clause identically (a per-aggregate predicate on input rows).
# ---------------------------------------------------------------------------
_SQL19 = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderdate >= DATE '1995-01-01'), 0)
            AS BIGINT) AS cents_since_95
FROM orders
GROUP BY o_orderpriority
"""


@register("sql19_filtered_agg", oracle=_SQL19)
def sql19_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL19)


# ---------------------------------------------------------------------------
# SQL20 — set-operation precedence: the SQL standard binds INTERSECT
# tighter than UNION/EXCEPT, so `a UNION b INTERSECT c EXCEPT d`
# means `(a UNION (b INTERSECT c)) EXCEPT d` — a classic silent-
# wrong-answer surface when engines disagree or users assume left-
# to-right. Both engines get the identical un-parenthesized text;
# the rollup collapses the result so the key certifies the PARSE,
# not a row dump.
# ---------------------------------------------------------------------------
_SQL20 = """
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(k) AS BIGINT) AS sum_keys
FROM (
  SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0
  UNION
  SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0
  INTERSECT
  SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0
  EXCEPT
  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
)
"""


@register("sql20_set_op_precedence", oracle=_SQL20)
def sql20_set_op_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL20)


# ---------------------------------------------------------------------------
# SQL21 — table-valued range() in the FROM clause: generate an
# 80-month calendar spine (1995-01 .. 2001-08, the data's range) IN SQL (no DataFrame-side sequence), left
# join the monthly revenue rollup onto it, and zero-fill the gaps —
# the densification idiom written entirely in the SQL frontend.
# Both engines accept `FROM range(a, b) AS t(i)` with a column
# alias list, which is what makes the text portable.
# ---------------------------------------------------------------------------
_SQL21 = """
WITH spine AS (
  SELECT CAST(DATE '1995-01-01' + INTERVAL 1 MONTH * i AS DATE) AS month
  FROM range(0, 80) AS t(i)
), m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT s.month,
       CAST(coalesce(m.cents, 0) AS BIGINT) AS cents,
       CAST(coalesce(m.n, 0) AS BIGINT) AS n_orders,
       CAST(CASE WHEN m.month IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_gap
FROM spine s LEFT JOIN m ON s.month = m.month
"""


@register("sql21_range_tvf", oracle=_SQL21)
def sql21_range_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL21)


# ---------------------------------------------------------------------------
# SQL22 — lateral column aliases: a SELECT item referencing an alias
# defined EARLIER IN THE SAME SELECT — the staged-derivation sugar
# (cents -> margin -> margin_bp) that otherwise forces nested
# subqueries; both engines resolve the chain left-to-right. The
# whole derivation chain stays one projection in the plan.
# ---------------------------------------------------------------------------
_SQL22 = """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       cents - 500000 AS margin_c,
       CAST(CASE WHEN cents > 0
            THEN floor(10000.0 * margin_c / cents)
            ELSE 0 END AS BIGINT) AS margin_bp,
       CASE WHEN margin_bp >= 5000 THEN 'high'
            WHEN margin_bp >= 0 THEN 'mid'
            ELSE 'loss' END AS band
FROM orders
WHERE o_orderkey % 100 = 0
"""


@register("sql22_lateral_column_alias", oracle=_SQL22)
def sql22_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL22)


# ---------------------------------------------------------------------------
# SQL23 — INTERVAL range frames: a trailing-7-day window expressed
# as RANGE BETWEEN INTERVAL 7 DAY PRECEDING over the raw TIMESTAMP
# ordering — the time-based frame w8 builds on epoch integers,
# written in the calendar units users actually think in, identical
# text in both engines. One priority-partitioned Window node serves
# both the count and the cents sum.
# ---------------------------------------------------------------------------
_SQL23 = """
SELECT o_orderkey,
       o_orderpriority,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_7d,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS cents_trailing_7d
FROM orders
WHERE o_orderkey % 20 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
"""


@register("sql23_interval_range_frame", oracle=_SQL23)
def sql23_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL23)


# ---------------------------------------------------------------------------
# SQL24 — boolean subqueries in the SELECT list: EXISTS and scalar
# IN as projected FLAGS (not WHERE filters) — the "annotate, don't
# filter" idiom feature stores use. Both engines decorrelate the
# projected EXISTS into a left-semi-style join, so three flags cost
# three equi-joins, never per-row subquery execution.
# ---------------------------------------------------------------------------
_SQL24 = """
SELECT c.c_custkey,
       EXISTS(SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT') AS has_urgent,
       EXISTS(SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000) AS has_big,
       c.c_custkey IN (SELECT o_custkey FROM orders
                       WHERE o_orderstatus = 'F') AS has_finished
FROM customer c
"""


@register("sql24_projected_exists", oracle=_SQL24)
def sql24_projected_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SQL24)


# ---------------------------------------------------------------------------
# SQL25 — star projection with column exclusion: Spark's
# `SELECT * EXCEPT (cols)` vs DuckDB's `* EXCLUDE (cols)` — the one
# wide-table idiom ("everything but the comment blobs") whose keyword
# differs by dialect, so the two texts are maintained side by side.
# The exclusion must behave as a real projection: Catalyst prunes the
# excluded columns AT THE SCAN (gated — the lineitem ReadSchema
# carries no l_tax/l_discount), which is the whole point at 100 TB
# where the dropped columns dominate bytes.
# ---------------------------------------------------------------------------
_SQL25_SPARK = """
SELECT * EXCEPT (l_tax, l_discount, l_linestatus, l_partkey, l_suppkey)
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_orderkey % 211 = 0 AND p_size > 40
"""

_SQL25_DUCK = """
SELECT * EXCLUDE (l_tax, l_discount, l_linestatus, l_partkey, l_suppkey)
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_orderkey % 211 = 0 AND p_size > 40
"""


@register("sql25_star_except", oracle=_SQL25_DUCK)
def sql25_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SQL25_SPARK)
